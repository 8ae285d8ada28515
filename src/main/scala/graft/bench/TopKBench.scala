package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B evidence for the custom per-key top-k operator vs the row_number
  * window form it replaces, on a generated corpus large enough for the
  * shuffle difference to dominate (the catalog fixture corpora are too
  * small to time). Usage: runMain graft.bench.TopKBench [rows] [keys] [k]
  * [iters]. Prints one JSON line.
  */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 5000000L
    val keys = if (args.length > 1) args(1).toInt else 1000
    val k = if (args.length > 2) args(2).toInt else 8
    val iters = if (args.length > 3) args(3).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def corpus = spark.range(rows).select(
      pmod(col("id") * 2654435761L, lit(keys.toLong)).as("key"),
      pmod(col("id") * 48271L, lit(1000003L)).as("score"), // MINSTD: no long overflow at 10^11 rows
      col("id"))

    def windowForm = {
      val w = Window.partitionBy(col("key")).orderBy(col("score").asc, col("id").asc)
      corpus.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
    }
    def custom = graft.plans.TopK.perKey(corpus, Seq("key"), Seq("score" -> true, "id" -> true), k)

    // warm both paths once (codegen, classloading)
    windowForm.count(); custom.count()
    def time(f: => Long): Seq[Double] = (1 to iters).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val wSecs = time(windowForm.count())
    val cSecs = time(custom.count())
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    // equality check on a deterministic slice (total order -> identical)
    val wSet = windowForm.filter(col("key") < 3).collect().map(_.toString).toSet
    val cSet = custom.filter(col("key") < 3)
      .select("key", "score", "id", "rank").collect().map(_.toString).toSet
    println(
      s"""{"bench":"topk_perkey","rows":$rows,"keys":$keys,"k":$k,"iters":$iters,""" +
      s""""window_secs":[${wSecs.map(s => f"$s%.3f").mkString(",")}],""" +
      s""""custom_secs":[${cSecs.map(s => f"$s%.3f").mkString(",")}],""" +
      s""""window_median":${f"${med(wSecs)}%.3f"},"custom_median":${f"${med(cSecs)}%.3f"},""" +
      s""""results_equal":${wSet == cSet}}""")
    spark.stop()
  }
}
