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

  // ---- HyperLogLog ---------------------------------------------------------

  private def regMap(df: org.apache.spark.sql.DataFrame): Map[Int, Int] =
    df.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap

  test("HLL registers are bounded by m and insensitive to duplication") {
    val distinct = (0 until 500).map(i => s"url$i").toDF("key")
    val dupped = (0 until 5000).map(i => s"url${i % 500}").toDF("key")
    val a = regMap(Sketches.hllRegisters(distinct, "key", b = 6))
    val b = regMap(Sketches.hllRegisters(dupped, "key", b = 6))
    assert(a.size <= 64)
    assert(a == b, "registers must depend on the distinct key set only")
  }

  test("HLL sketches of input shards merge to the whole-input sketch (max)") {
    val left = (0 until 400).map(i => s"k$i").toDF("key")
    val right = (200 until 700).map(i => s"k$i").toDF("key") // overlap on purpose
    val whole = (0 until 700).map(i => s"k$i").toDF("key")
    val merged = regMap(Sketches.hllMerge(
      Sketches.hllRegisters(left, "key", 6), Sketches.hllRegisters(right, "key", 6)))
    assert(merged == regMap(Sketches.hllRegisters(whole, "key", 6)))
  }

  test("HLL estimate lands within the sketch's error band (m=64 => ~13% sigma)") {
    for (n <- Seq(500, 2000, 8000)) {
      val keys = (0 until n).map(i => s"item-$i").toDF("key")
      val est = Sketches.hllEstimate(Sketches.hllRegisters(keys, "key", 6), 6)
        .collect()(0).getAs[Double]("est")
      // 3 sigma at 1.04/sqrt(64) ~ 39%
      assert(math.abs(est - n) / n < 0.39, s"n=$n est=$est")
    }
  }

  // ---- dyadic histogram ----------------------------------------------------

  test("dyadic histogram: levels, merge-by-union, quantile bounds bracket the exact quantile") {
    val vals = (1 to 1000).map(_.toLong).toDF("v")
    val hist = Sketches.dyadicHistogram(vals, "v")
    val levels = hist.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // level L holds [2^(L-1), 2^L - 1]: 1->{1}, 2->{2,3}, ... 10->{512..1000}
    assert(levels(1) == 1 && levels(2) == 2 && levels(3) == 4 && levels(10) == 489)
    assert(levels.values.sum == 1000)

    val qs = Sketches.dyadicQuantiles(hist, Seq(50, 99))
      .collect().map(r => r.getInt(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
    // exact p50 = 500 (level 9: 256..511), exact p99 = 990 (level 10)
    assert(qs(50) == ((9, 256L, 511L)), qs(50).toString)
    assert(qs(99) == ((10, 512L, 1023L)), qs(99).toString)
    // bracket property: exact quantile inside [lo, hi]
    assert(qs(50)._2 <= 500 && 500 <= qs(50)._3)
    assert(qs(99)._2 <= 990 && 990 <= qs(99)._3)

    // non-positive values land in level 0
    val withZero = Seq(-5L, 0L, 1L).toDF("v")
    val z = Sketches.dyadicHistogram(withZero, "v").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(z(0) == 2 && z(1) == 1)
  }

  test("HLL small-range linear counting engages and is near-exact for tiny sets") {
    val keys = (0 until 8).map(i => s"rare$i").toDF("key")
    val row = Sketches.hllEstimate(Sketches.hllRegisters(keys, "key", 6), 6).collect()(0)
    val zeros = row.getAs[Int]("zeros")
    val est = row.getAs[Double]("est")
    assert(zeros > 0, "8 keys cannot fill 64 registers")
    // linear counting m*ln(m/zeros) is near-exact in this regime
    assert(math.abs(est - 8) < 2.0, s"est=$est")
  }
}
