package graft.bench

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timing harness: runs ONE catalog query N times in a
  * warm JVM (after the same untimed warm-up as graft.Bench) so a change to
  * one operator can be A/B'd without the noise floor of the full bench
  * sweep. Usage: runMain graft.bench.QueryBench <queryName> [iters]
  * (SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench). Prints one JSON
  * line with every iteration's seconds plus min/median.
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val iters = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expr.UrlFunctions.register(spark)

    val fn = graft.SparkEntry.queries.getOrElse(
      name, sys.error(s"unknown catalog query: $name"))
    fn(spark, sfDir).count() // warm-up iteration (codegen + classloading)
    val times = (1 to iters).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    val sorted = times.sorted
    println(
      s"""{"query":"$name","iters":$iters,"secs":[${times.map(t => f"$t%.3f").mkString(",")}],""" +
        s""""min":${f"${sorted.head}%.3f"},"median":${f"${sorted(iters / 2)}%.3f"}}""")
    spark.stop()
  }
}
