package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-min sketch: bounded size, one-sided error, heavy-hitter recovery. */
class SketchesSpec extends SparkSpec {

  import spark.implicits._

  // skewed corpus: key k appears (21-k)*100 times for k in 1..20
  private def skewed = {
    val rows = (1 to 20).flatMap(k => Seq.fill((21 - k) * 100)(s"key$k"))
    rows.toDF("key")
  }

  test("sketch size is bounded by depth*width regardless of input size") {
    val sk = Sketches.countMinSketch(skewed, "key", depth = 4, width = 32)
    assert(sk.count() <= 4L * 32)
  }

  test("estimates never undercount and are exact when width is ample") {
    val exact = skewed.groupBy("key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // narrow sketch: one-sided error only
    val narrow = Sketches.cmsEstimate(
      skewed.select("key").distinct(),
      Sketches.countMinSketch(skewed, "key", 4, 16), "key", 4, 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, c) => assert(narrow(k) >= c, s"$k undercounted: ${narrow(k)} < $c") }
    // ample width: 20 keys in 4x1024 collide with negligible probability
    val ample = Sketches.cmsEstimate(
      skewed.select("key").distinct(),
      Sketches.countMinSketch(skewed, "key", 4, 1024), "key", 4, 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, c) => assert(ample(k) == c, s"$k: ${ample(k)} != $c") }
  }

  test("heavy hitters recover the true top keys on a skewed corpus") {
    val top = Sketches.cmsHeavyHitters(skewed, "key", depth = 4, width = 1024, k = 5)
      .collect().map(_.getString(0))
    assert(top.toSet == Set("key1", "key2", "key3", "key4", "key5"), top.mkString(","))
  }

  test("estimate for a key absent from the corpus can be zero, never negative") {
    val sk = Sketches.countMinSketch(skewed, "key", 4, 1024)
    val est = Sketches.cmsEstimate(Seq("nope").toDF("key"), sk, "key", 4, 1024)
      .collect()(0).getLong(1)
    assert(est >= 0)
  }
}
