package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic sampling: reproducibility, rate accuracy, quota exactness,
  * and salt independence.
  */
class SamplingSpec extends SparkSpec {

  import spark.implicits._

  private def docs = spark.read.parquet(s"${sf()}/documents.parquet")

  test("hashSample is reproducible and rate-accurate") {
    val ids = spark.range(20000).toDF("id")
    val a = Sampling.hashSample(ids, "id", 0.25).collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(ids, "id", 0.25).collect().map(_.getLong(0)).toSet
    assert(a == b, "same salt, same sample")
    val n = a.size.toDouble
    assert(math.abs(n / 20000 - 0.25) < 0.02, s"rate off: ${n / 20000}")
    val c = Sampling.hashSample(ids, "id", 0.25, salt = "other").collect().map(_.getLong(0)).toSet
    assert(c != a, "different salt draws a different sample")
    // a higher rate with the same salt strictly contains the lower-rate sample
    val d = Sampling.hashSample(ids, "id", 0.5).collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(d), "nested samples: rate 0.25 within rate 0.5 at equal salt")
  }

  test("stratifiedSample applies per-stratum rates; absent strata use the default") {
    val df = spark.range(30000)
      .select(col("id"), (pmod(col("id"), lit(3))).cast("string").as("st"))
    val out = Sampling.stratifiedSample(df, "st", "id",
      Map("0" -> 0.9, "1" -> 0.1), defaultRate = 0.5)
      .groupBy("st").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(out("0") / 10000.0 - 0.9) < 0.03, out.toString)
    assert(math.abs(out("1") / 10000.0 - 0.1) < 0.03, out.toString)
    assert(math.abs(out("2") / 10000.0 - 0.5) < 0.03, out.toString)
  }

  test("splitAssign: exhaustive, reproducible, share-accurate, growth-stable") {
    val splits = Seq("train" -> 900000L, "val" -> 50000L, "test" -> 50000L)
    val ids = spark.range(20000).toDF("id")
    val out = Sampling.splitAssign(ids, "id", splits)
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"), counts.toString)
    assert(counts.values.sum == 20000L, "every row lands in exactly one split")
    assert(math.abs(counts("train") / 20000.0 - 0.9) < 0.02, counts.toString)
    assert(math.abs(counts("val") / 20000.0 - 0.05) < 0.01, counts.toString)
    // growth stability: the same ids keep their split when the corpus doubles
    val small = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val grown = Sampling.splitAssign(spark.range(40000).toDF("id"), "id", splits)
      .filter(col("id") < 20000).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(small == grown, "corpus growth must not move existing rows across splits")
    // contract: shares must total 1e6
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(ids, "id", Seq("a" -> 1L, "b" -> 2L))
    }
  }

  test("packSequences: per-shard cumsum intervals, straddlers flagged by seq span") {
    val df = Seq(
      (1L, "s1", 300), (2L, "s1", 300), (3L, "s1", 100),
      (10L, "s2", 512), (11L, "s2", 1)
    ).toDF("id", "shard", "tok")
    val out = Sampling.packSequences(df, "id", "tok", seqLen = 512, shardCol = "shard")
      .collect().map(r => r.getLong(0) -> r).toMap
    // s1: doc1 [0,300) seq 0; doc2 [300,600) seqs 0-1 (straddles); doc3 [600,700) seq 1
    assert(out(1L).getLong(3) == 0L && out(1L).getLong(4) == 300L)
    assert(out(1L).getLong(5) == 0L && out(1L).getLong(6) == 0L)
    assert(out(2L).getLong(5) == 0L && out(2L).getLong(6) == 1L, "straddler spans two seqs")
    assert(out(3L).getLong(5) == 1L && out(3L).getLong(6) == 1L)
    // s2 restarts at 0: doc10 fills seq 0 exactly; doc11 starts seq 1
    assert(out(10L).getLong(3) == 0L && out(10L).getLong(5) == 0L && out(10L).getLong(6) == 0L)
    assert(out(11L).getLong(3) == 512L && out(11L).getLong(5) == 1L && out(11L).getLong(6) == 1L)
  }

  test("stratifiedQuota returns exactly quota rows per stratum (or all when smaller)") {
    val out = Sampling.stratifiedQuota(docs, "source", "doc_id", quota = 5)
    val counts = out.groupBy("source").count().collect().map(r => r.getLong(1))
    assert(counts.forall(_ == 5L), counts.mkString(","))
    // quota larger than any stratum: everything survives
    val all = Sampling.stratifiedQuota(docs, "source", "doc_id", quota = 100000)
    assert(all.count() == docs.count())
    // deterministic: the same five ids per stratum on a second run
    val twice = Sampling.stratifiedQuota(docs, "source", "doc_id", quota = 5)
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      twice.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("mixtureSample: thresholds hit floor((ppm*budget)/avail), capped, untargeted drop") {
    val avail = docs.groupBy("lang").agg(sum("n_chars")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val targets = Map("en" -> 500000L, "zh" -> 300000L, "de" -> 200000L)
    val budget = 100000L
    val out = Sampling.mixtureSample(docs, "lang", "doc_id", "n_chars", targets, budget)
    val thrs = out.select("lang", "mix_thr").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    targets.foreach { case (l, ppm) =>
      val expected = math.min(1000000L, ppm * budget / avail(l))
      assert(thrs.get(l).forall(_ == expected), s"$l: ${thrs.get(l)} vs $expected")
    }
    // zh is oversubscribed at this budget: cap at 1e6 keeps every zh doc
    assert(thrs("zh") == 1000000L)
    val zhAll = docs.filter(col("lang") === "zh").count()
    assert(out.filter(col("lang") === "zh").count() == zhAll)
    // untargeted strata vanish
    assert(out.filter(col("lang").isin("es", "fr")).count() == 0)
  }

  test("mixtureSample: kept set grows monotonically with budget (nested samples)") {
    val targets = Map("en" -> 600000L, "de" -> 400000L)
    val small = Sampling.mixtureSample(docs, "lang", "doc_id", "n_chars", targets, 20000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val big = Sampling.mixtureSample(docs, "lang", "doc_id", "n_chars", targets, 60000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.nonEmpty && small.subsetOf(big), s"${small.size} ⊄ ${big.size}")
  }

  test("mixtureSample stays broadcast + map-only (no corpus shuffle)") {
    val out = Sampling.mixtureSample(
      docs, "lang", "doc_id", "n_chars", Map("en" -> 500000L), 50000L)
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }
}
