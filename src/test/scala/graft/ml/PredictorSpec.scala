package graft.ml

import graft.SparkSpec
import graft.storage.KeyValueStore
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Rendering-type predictor semantics — mirrors the reference suite
  * (tests/unit/crawlers/_adaptive_playwright/test_predictor.py) plus the
  * Spark batch-scoring surface.
  */
class PredictorSpec extends SparkSpec {

  import RenderingTypePredictor.{ClientOnly, Static}

  private val LearningInputs: Seq[(String, String)] = Seq(
    ("http://www.aaa.com/some/stuff", Static),
    ("http://www.aab.com/some/stuff", Static),
    ("http://www.aac.com/some/stuff", Static),
    ("http://www.ddd.com/some/stuff", ClientOnly),
    ("http://www.dde.com/some/stuff", ClientOnly),
    ("http://www.ddf.com/some/stuff", ClientOnly))

  test("jaro-winkler matches DuckDB's values (oracle-compatible)") {
    // pinned against duckdb jaro_winkler_similarity
    assert(math.abs(UrlSimilarity.jaroWinkler("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(UrlSimilarity.jaroWinkler("abc", "") == 0.0)
    assert(UrlSimilarity.jaroWinkler("", "") == 0.0) // duckdb's empty rule
    assert(UrlSimilarity.jaroWinkler("a", "a") == 1.0)
    assert(math.abs(UrlSimilarity.jaroWinkler("detail", "details") - 0.9714285714285714) < 1e-12)
    assert(math.abs(UrlSimilarity.jaroWinkler("product", "category") - 0.4226190476190476) < 1e-12)
  }

  test("url components and similarity (reference get_url_components / calculate_url_similarity)") {
    assert(UrlSimilarity.urlComponents("http://www.aaa.com/some/stuff") ==
      Seq("www.aaa.com", "some", "stuff"))
    assert(UrlSimilarity.urlComponents("http://www.aaa.com") == Seq("www.aaa.com"))
    // different hosts -> 0 regardless of path
    assert(UrlSimilarity.urlSimilarity(
      Seq("a.com", "some", "stuff"), Seq("b.com", "some", "stuff")) == 0.0)
    // identical -> 1
    assert(UrlSimilarity.urlSimilarity(Seq("a.com", "x"), Seq("a.com", "x")) == 1.0)
    // same host, similar tail segments count 1 each; extras compare to ""
    val s = UrlSimilarity.urlSimilarity(
      Seq("a.com", "some", "stuff", "extra"), Seq("a.com", "some", "stuff"))
    assert(s == 2.0 / 3.0)
  }

  test("same-label learning predicts the right class for similar urls (test_predictor_same_label)") {
    for (label <- Seq(Some("some label"), None)) {
      val p = new RenderingTypePredictor()
      LearningInputs.foreach { case (u, rt) => p.storeResult(u, rt, label) }
      val expectations = Seq(
        ("http://www.aaa.com/some/stuff/extra", Static),
        ("http://www.aab.com/some/otherstuff", Static),
        ("http://www.aac.com/some", Static),
        ("http://www.ddd.com/some/stuff/extra", ClientOnly),
        ("http://www.dde.com/some/otherstuff", ClientOnly),
        ("http://www.ddf.com/some", ClientOnly))
      expectations.foreach { case (u, expected) =>
        assert(p.predict(u, label)._1 == expected, s"$u (label=$label)")
      }
    }
  }

  test("uncommon-label detection boost decays 5→1 (test_predictor_new_label_...)") {
    val ratio = 0.01
    val label = Some("some label")
    val p = new RenderingTypePredictor(detectionRatio = ratio)
    p.storeResult("http://www.aaa.com/some/stuff", Static, label)
    var (rt, det) = p.predict("http://www.aaa.com/some/stuffa", label)
    assert(rt == Static && math.abs(det - ratio * 4) < 1e-12)
    p.storeResult("http://www.aaa.com/some/stuffe", Static, label)
    det = p.predict("http://www.aaa.com/some/stuffa", label)._2
    assert(math.abs(det - ratio * 3) < 1e-12)
    p.storeResult("http://www.aaa.com/some/stuffi", Static, label)
    det = p.predict("http://www.aaa.com/some/stuffa", label)._2
    assert(math.abs(det - ratio * 2) < 1e-12)
    p.storeResult("http://www.aaa.com/some/stuffo", Static, label)
    det = p.predict("http://www.aaa.com/some/stuffa", label)._2
    assert(math.abs(det - ratio) < 1e-12)
  }

  test("unreliable and never-trained predictions recommend detection probability 1") {
    // never trained: ('client only', 1)
    val fresh = new RenderingTypePredictor()
    assert(fresh.predict("http://www.unknown.com", Some("new label")) == (ClientOnly, 1.0))
    // conflicting data for one label, prediction for an unseen label ->
    // both features 0 -> probabilities near 0.5 -> unreliable
    val p = new RenderingTypePredictor()
    p.storeResult("http://www.aaa.com/some/stuff", Static, Some("some label"))
    p.storeResult("http://www.aaa.com/some/otherstuff", ClientOnly, Some("some label"))
    assert(p.predict("http://www.unknown.com", Some("new label"))._2 == 1.0)
  }

  test("state persists and restores through the KVS (RecoverableState analogue)") {
    val dir = Files.createTempDirectory("rtp").toString
    val p1 = new RenderingTypePredictor(kvs = Some(new KeyValueStore(spark, dir)))
    LearningInputs.foreach { case (u, rt) => p1.storeResult(u, rt, Some("lbl")) }
    val before = p1.predict("http://www.aaa.com/some/stuff/extra", Some("lbl"))
    val p2 = new RenderingTypePredictor(kvs = Some(new KeyValueStore(spark, dir)))
    assert(p2.predict("http://www.aaa.com/some/stuff/extra", Some("lbl")) == before)
    assert(p2.labelCoefficient("lbl") == 1.0) // decayed coefficients restored
  }

  test("Spark batch scoring equals per-row driver predictions") {
    import spark.implicits._
    val p = new RenderingTypePredictor()
    LearningInputs.foreach { case (u, rt) => p.storeResult(u, rt, Some("l")) }
    val urls = Seq(
      "http://www.aaa.com/some/stuff/extra", "http://www.aab.com/some/otherstuff",
      "http://www.ddd.com/some/stuff/extra", "http://www.ddf.com/some",
      "http://www.unknown.com/x")
    val scored = p.scoreDataFrame(urls.toDF("url").withColumn("label", lit("l")), "url", "label")
      .select(col("url"), col("rendering_type"), col("detection_prob"), col("f_static"), col("f_client"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    urls.foreach { u =>
      val (rt, det) = p.predict(u, Some("l"))
      val (srt, sdet, f1, f2) = scored(u)
      assert(srt == rt, u)
      assert(math.abs(sdet - det) < 1e-9, u)
      val (ef1, ef2) = p.featureVector(u, "l")
      assert(math.abs(f1 - ef1) < 1e-9 && math.abs(f2 - ef2) < 1e-9, u)
    }
  }
}
