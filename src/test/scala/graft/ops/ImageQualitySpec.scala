package graft.ops

import graft.SparkSpec
import graft.fixtures.Images
import graft.ops.Multimodal.{MediaMeta, MediaRow}

import java.awt.image.BufferedImage

/** Decoded-pixel quality features (Multimodal.imageQualityFeatures):
  * hand-computed entropy / contrast / sharpness on constructed images, and
  * the operator's distributed-decode path over encoded payloads.
  */
class ImageQualitySpec extends SparkSpec {

  private def rgb(v: Int): Int = (v << 16) | (v << 8) | v

  private def flat(w: Int, h: Int, v: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(v))
    img
  }

  private def checker(n: Int): BufferedImage = {
    val img = new BufferedImage(n, n, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until n; x <- 0 until n) img.setRGB(x, y, rgb(if ((x + y) % 2 == 0) 255 else 0))
    img
  }

  test("luma histogram + Laplacian on constructed images") {
    val f = flat(4, 4, 128)
    val hf = Images.lumaHistogram(f)
    assert(hf(128) == 16 && hf.sum == 16)
    assert(Images.lapSqSum(f) == 0L)

    val c = checker(4)
    val hc = Images.lumaHistogram(c)
    assert(hc(0) == 8 && hc(255) == 8)
    // interior pixels: v = 4·c − 4·opposite = ±1020; 4 interior pixels
    assert(Images.lapSqSum(c) == 4L * 1020 * 1020)
    // sub-3x3 images have no interior
    assert(Images.lapSqSum(flat(2, 5, 10)) == 0L)
  }

  test("operator metrics match hand computation through the encode/decode round trip") {
    import spark.implicits._
    val rows = Seq(
      MediaRow("flat", Images.encode(flat(4, 4, 128), "png"), MediaMeta("image", 4, 4, "png", 0L)),
      MediaRow("check", Images.encode(checker(4), "png"), MediaMeta("image", 4, 4, "png", 0L)))
    val out = Multimodal.imageQualityFeatures(spark.createDataset(rows))
      .collect().map(r => r.getAs[String]("id") -> r).toMap

    val fl = out("flat")
    assert(fl.getAs[Long]("n_pixels") == 16L)
    assert(fl.getAs[Int]("luma_range") == 0)
    assert(fl.getAs[Double]("contrast") == 0.0)
    assert(fl.getAs[Double]("sharpness") == 0.0)
    assert(fl.getAs[Double]("entropy_nats") == 0.0) // single bin: (n/n)·ln(1)

    val ch = out("check")
    assert(ch.getAs[Int]("luma_min") == 0 && ch.getAs[Int]("luma_max") == 255)
    // population variance: (16·520200 − 2040²)/16² = 16256.25
    assert(ch.getAs[Double]("contrast") == 16256.25)
    // 4 interior pixels, each v² = 1020² → 1040400 per interior pixel
    assert(ch.getAs[Double]("sharpness") == 1040400.0)
    // two equal bins: 2 · (1/2)·ln(2), per-term rounded to 9 dp
    val term = BigDecimal(0.5 * math.log(2.0)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    assert(ch.getAs[Double]("entropy_nats") == (term * 2).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("fixture corpus: distributed decode recovers the exporter's raw integers") {
    val out = Multimodal.imageQualityFeatures(Multimodal.syntheticMediaTable(spark, 12)).collect()
    assert(out.length == 12)
    out.foreach { r =>
      assert(r.getAs[Long]("n_pixels") == r.getAs[Int]("w").toLong * r.getAs[Int]("h"))
      assert(r.getAs[Double]("entropy_nats") > 0.0) // procedural images are never flat
      assert(r.getAs[Double]("sharpness") > 0.0)
    }
  }
}
