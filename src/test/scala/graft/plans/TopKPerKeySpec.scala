package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom per-key top-k operator: result ≡ the row_number window form
  * on a total order, two-phase plan shape (partial prune BEFORE the
  * exchange), and the pruning actually bounds what crosses the shuffle.
  */
class TopKPerKeySpec extends SparkSpec {

  import spark.implicits._

  private def corpus = {
    // 40 keys x 250 rows, deliberately spread over many partitions
    spark.range(10000).repartition(16)
      .select(
        (col("id") % 40).as("key"),
        ((col("id") * 2654435761L) % 1009).as("score"),
        col("id"))
  }

  private def windowForm(k: Int) = {
    val w = Window.partitionBy(col("key")).orderBy(col("score").asc, col("id").asc)
    corpus.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  test("perKey equals the row_number window form on a total order (rank included)") {
    val got = TopK.perKey(corpus, Seq("key"), Seq("score" -> true, "id" -> true), k = 7)
      .select("key", "score", "id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val exp = windowForm(7)
      .select("key", "score", "id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(got == exp)
    assert(got.size == 40 * 7)
  }

  test("descending order and k larger than some groups") {
    val df = Seq(("a", 1L), ("a", 5L), ("a", 3L), ("b", 9L)).toDF("key", "v")
    val got = TopK.perKey(df, Seq("key"), Seq("v" -> false), k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set(("a", 5L, 1), ("a", 3L, 2), ("b", 9L, 1)))
  }

  test("plan: partial prune below the exchange, no WindowExec, no sort of the corpus") {
    val q = TopK.perKey(corpus, Seq("key"), Seq("score" -> true, "id" -> true), k = 5)
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKeyPartial"), p)
    assert(p.contains("TopKPerKeyFinal"), p)
    assert(!p.contains("WindowExec") && !p.contains("WindowGroupLimit"), p)
    assert(!p.contains("SortExec") && !p.contains("Sort "), p)
    // partial runs BELOW the exchange (map-side), final above
    val iPartial = p.indexOf("TopKPerKeyPartial")
    val iExchange = p.indexOf("Exchange")
    val iFinal = p.indexOf("TopKPerKeyFinal")
    assert(iFinal < iExchange && iExchange < iPartial,
      s"expected Final above Exchange above Partial:\n$p")
    assert(p.contains("hashpartitioning(key"), p)
  }

  test("map-side pruning bounds the shuffle: at most partitions*keys*k rows cross") {
    val k = 3
    val q = TopK.perKey(corpus, Seq("key"), Seq("score" -> true, "id" -> true), k = k)
    q.collect()
    // AQE wraps the executed plan: descend into the adaptive final plan and
    // its shuffle query stages to reach the real exchange node
    def findExchanges(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        findExchanges(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        findExchanges(s.plan)
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
        Seq(e) ++ p.children.flatMap(findExchanges)
      case _ => p.children.flatMap(findExchanges)
    }
    val exchanges = findExchanges(q.queryExecution.executedPlan)
    assert(exchanges.nonEmpty, s"expected a shuffle in:\n${q.queryExecution.executedPlan}")
    val m = exchanges.head.metrics
    val rows = m.getOrElse("shuffleRecordsWritten",
      m.getOrElse("numOutputRows",
        fail(s"no row metric among ${m.keys.mkString(", ")}"))).value
    // bound: 16 map partitions x 40 keys x 3 << 10000 input rows
    assert(rows <= 16L * 40 * k, s"shuffle moved $rows rows")
    assert(rows < 10000, s"pruning did not engage: $rows rows crossed the shuffle")
  }

  test("post-shuffle group split across map partitions still yields exactly k") {
    // every row of one key lands in a different input partition
    val df = spark.range(64).repartition(32).select(lit("only").as("key"), col("id"))
    val got = TopK.perKey(df, Seq("key"), Seq("id" -> true), k = 4)
      .collect().map(r => (r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((0L, 1), (1L, 2), (2L, 3), (3L, 4)))
  }

  test("opt-in optimizer rule rewrites the window form to the heap operator (same result, rank preserved)") {
    TopK.installRewrite(spark)
    try {
      val q = windowForm(4)
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("TopKPerKeyFinal"), p)
      assert(!p.contains("WindowExec"), p)
      val got = q.select("key", "score", "id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
      TopK.uninstallRewrite(spark)
      // reference = the untouched window plan
      val exp = windowForm(4).select("key", "score", "id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
      assert(got == exp)

      // residual predicates survive as a Filter above the rewritten node
      // (CombineFilters folds them into the same Filter as rank <= k, so
      // extractLimit must split the And)
      TopK.installRewrite(spark)
      val residual = pmod(col("id"), lit(2)) === 0
      val mixed = windowForm(4).filter(residual)
      assert(mixed.queryExecution.executedPlan.toString.contains("TopKPerKeyFinal"))
      val mixedGot = mixed.select("key", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      TopK.uninstallRewrite(spark)
      val mixedExp = windowForm(4).filter(residual)
        .select("key", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(mixedGot == mixedExp)
      assert(mixedGot.nonEmpty && mixedGot.size < 40 * 4)
    } finally TopK.uninstallRewrite(spark)
  }

  test("optimizer rule leaves non-matching windows alone (rank kept unfiltered; global window)") {
    TopK.installRewrite(spark)
    try {
      // no rank filter -> no rewrite
      val w = Window.partitionBy(col("key")).orderBy(col("score").asc, col("id").asc)
      val unfiltered = corpus.withColumn("rank", row_number().over(w))
      assert(!unfiltered.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(unfiltered.count() == 10000)
      // empty partition spec (global rank) -> no rewrite
      val g = Window.orderBy(col("score").asc, col("id").asc)
      val globalRank = corpus.withColumn("rank", row_number().over(g)).filter(col("rank") <= 5)
      assert(!globalRank.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(globalRank.count() == 5)
    } finally TopK.uninstallRewrite(spark)
  }

  test("multi-column keys") {
    val df = Seq(("a", 1, 10L), ("a", 1, 5L), ("a", 2, 7L), ("b", 1, 1L))
      .toDF("k1", "k2", "v")
    val got = TopK.perKey(df, Seq("k1", "k2"), Seq("v" -> true), k = 1)
      .select("k1", "k2", "v").collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == Set(("a", 1, 5L), ("a", 2, 7L), ("b", 1, 1L)))
  }
}
