package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus-curation operators: CCNet-style LM scoring, DSIR importance
  * weights, pHash dedup survivor election — hand-computed expectations on
  * tiny corpora (the SQL oracles cover the at-scale replay).
  */
class CurationSpec extends SparkSpec {

  import spark.implicits._

  private def r9(x: Double): BigDecimal =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("lmScore: add-one-smoothed bigram log-probs, OOV counting, hand-checked") {
    // reference doc: "a b a b" -> model {"a b": 2, "b a": 1}, T=3, V=2, denom=6
    val docs = Seq(
      (1L, true, "a b a b"),
      (2L, false, "a b x"),
      (3L, false, "x y z w")
    ).toDF("id", "is_ref", "text")
    val out = TextOps.lmScore(docs, col("is_ref"), "id", "text",
        headThreshold = -1.0, tailThreshold = -2.0)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_oov"),
          r.getAs[Double]("lm_score"), r.getAs[String]("lm_bucket")))).toMap

    val lnAB = r9(math.log(3.0 / 6)) // cnt 2 -> (2+1)/6
    val lnBA = r9(math.log(2.0 / 6))
    val lnOov = r9(math.log(1.0 / 6))

    val exp1 = r4(((lnAB * 2 + lnBA) / 3).toDouble)
    assert(out(1L) == ((3L, 0L, exp1, "head")), s"got ${out(1L)}")
    val exp2 = r4(((lnAB + lnOov) / 2).toDouble)
    assert(out(2L) == ((2L, 1L, exp2, "middle")), s"got ${out(2L)}")
    val exp3 = r4(lnOov.toDouble)
    assert(out(3L) == ((3L, 3L, exp3, "middle")), s"got ${out(3L)}")
  }

  test("lmScore drops docs shorter than the gram order") {
    val docs = Seq((1L, true, "a b c"), (2L, false, "single")).toDF("id", "is_ref", "text")
    val ids = TextOps.lmScore(docs, col("is_ref"), "id", "text")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L))
  }

  test("dsirWeights: target-like docs score positive, off-target negative") {
    val docs = Seq(
      (1L, true, "good good good good"),
      (2L, false, "bad bad bad bad")
    ).toDF("id", "tgt", "text")
    val out = TextOps.dsirWeights(docs, col("tgt"), "id", "text")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Double]("dsir_weight"), r.getAs[Boolean]("keep")))).toMap
    // "good good": ct=3, cr=3; "bad bad": ct=0, cr=3; Tt=3, Tr=6, B=4096
    val termGood = r9(math.log((4.0 * (6 + 4096)) / (4.0 * (3 + 4096))))
    val termBad = r9(math.log((1.0 * (6 + 4096)) / (4.0 * (3 + 4096))))
    assert(out(1L) == ((r4((termGood * 3).toDouble), true)), s"got ${out(1L)}")
    assert(out(2L) == ((r4((termBad * 3).toDouble), false)), s"got ${out(2L)}")
    assert(out(1L)._1 > 0 && out(2L)._1 < 0)
  }

  test("phashDedupSurvivors: clusters via banding + CC, best-pixels survivor, singletons kept") {
    // hashes 0,1,3 are pairwise within Hamming 2 -> one cluster; -1 is 62+
    // bits away -> singleton
    val feats = Seq(
      ("a1", 0L, 100L),
      ("a2", 1L, 300L), // most pixels -> survivor
      ("a3", 3L, 300L), // pixel tie with a2 -> a2 wins on id
      ("z9", -1L, 50L)
    ).toDF("id", "phash", "pixels")
    val out = Multimodal.phashDedupSurvivors(feats, maxHamming = 2)
      .collect().map(r => r.getAs[String]("id") ->
        ((r.getAs[String]("component"), r.getAs[Boolean]("is_survivor")))).toMap
    assert(out.keySet == Set("a1", "a2", "a3", "z9"))
    assert(out("a1") == (("a1", false)))
    assert(out("a2") == (("a1", true)), s"got ${out("a2")}")
    assert(out("a3") == (("a1", false)))
    assert(out("z9") == (("z9", true)), "singleton is its own survivor")
  }
}
