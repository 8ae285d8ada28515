ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "crawleepythonspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Pass forked `runMain` output through UNPREFIXED: sbt's default logger
// wraps every child line in "[info] "/"[error] ", which breaks any
// harness that expects graft.Bench's single bare JSON line on stdout
// (the per-round BENCH capture parsed as None through round 3).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // The generated-class cache defaults to 100 entries; one crawl
  // micro-batch alone compiles ~120 whole-stage units, so consecutive
  // batches evicted each other and re-compiled identical sources every
  // batch (1074 janino compiles, 16s, in a 74s 44k-page crawl). Large
  // enough for the whole bench suite; scale-independent.
  "-Dspark.sql.codegen.cache.maxEntries=8192",
  // 32g default (was 8g): local[32] runs 32 concurrent tasks in ONE JVM —
  // at 8g the bench's later queries and the headline crawl ran under heavy
  // GC pressure (crawl measured 112s inside the full bench vs 71s in a
  // fresh JVM, same box/minutes apart). Parameterised for smaller hosts;
  // on a real cluster executor/driver memory comes from spark-submit, not
  // this local-runner flag.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
