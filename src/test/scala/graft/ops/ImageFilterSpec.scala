package graft.ops

import graft.SparkSpec

/** Image-set curation filter (Multimodal.imageSetFilter): each rule fires
  * on a literal row constructed to violate exactly that rule, and a clean
  * row keeps. Complements the fixture-driven oracle entry mm_image_filter.
  */
class ImageFilterSpec extends SparkSpec {

  import spark.implicits._

  private def row(
      id: String,
      w: Int = 64,
      h: Int = 64,
      fmt: String = "png",
      nBytes: Int = 4096, // bpp 1.0 on 64x64
      caption: String = "a fine caption here",
      phash: Long = 0x1234abcdL) =
    (id, Array.fill[Byte](nBytes)(7), w, h, fmt, caption, phash)

  test("each rule fires independently; the clean row keeps") {
    val rows = Seq(
      row("clean"),
      row("small", w = 16, h = 16, nBytes = 256),           // ok_dims + ok_pixels fail
      row("stretched", w = 160, h = 32, nBytes = 5120),     // aspect 5.0
      row("badfmt", fmt = "bmp"),
      row("truncated", nBytes = 16),                        // bpp 16/4096 < 0.1
      row("nocap", caption = ""),
      row("shortcap", caption = "x"),
      row("longcap", caption = Seq.fill(100)("pad").mkString(" ")),
      row("flat", phash = 0L),
      row("flatones", phash = -1L)
    ).toDF("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
    val out = Multimodal.imageSetFilter(rows)
    val cols = out.columns
    val byId = out.collect().map(r => r.getString(0) -> r).toMap
    def flag(id: String, c: String): Boolean = byId(id).getBoolean(cols.indexOf(c))

    assert(flag("clean", "keep"), byId("clean").mkString(","))
    assert(!flag("small", "ok_dims") && !flag("small", "ok_pixels") && !flag("small", "keep"))
    assert(flag("small", "ok_aspect") && flag("small", "ok_bpp"), "16x16 at 1 bpp violates only size rules")
    assert(!flag("stretched", "ok_aspect") && flag("stretched", "ok_dims"))
    assert(!flag("badfmt", "ok_fmt") && flag("badfmt", "ok_dims"))
    assert(!flag("truncated", "ok_bpp") && flag("truncated", "ok_fmt"))
    assert(!flag("nocap", "ok_caption_len") && !flag("nocap", "ok_caption_words"))
    assert(!flag("shortcap", "ok_caption_len"))
    assert(!flag("longcap", "ok_caption_words") && flag("longcap", "ok_caption_len"))
    assert(!flag("flat", "ok_phash") && !flag("flatones", "ok_phash"))
    Seq("stretched", "badfmt", "truncated", "nocap", "shortcap", "longcap", "flat")
      .foreach(id => assert(!flag(id, "keep"), id))
  }

  test("aspectBucket assigns the ratio-nearest bucket with index tie-break") {
    val imgs = Seq(
      ("sq", 60, 60), ("wide", 100, 55), ("tall", 30, 52), ("exact", 80, 48)
    ).map { case (id, w, h) => (id, Array[Byte](1), w, h, "png", "cap here ok", 1L) }
      .toDF("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
    val buckets = Seq((64, 64), (80, 48), (48, 80), (80, 64), (64, 80))
    val out = Multimodal.aspectBucket(imgs, buckets)
      .collect().map(r => r.getString(0) -> ((r.getInt(3), r.getInt(4), r.getInt(5)))).toMap
    assert(out("sq") == ((0, 64, 64)))
    assert(out("wide") == ((1, 80, 48)), out("wide").toString)   // 1.82 nearest 5/3
    assert(out("tall") == ((2, 48, 80)), out("tall").toString)   // 0.577 nearest 0.6
    assert(out("exact") == ((1, 80, 48)), "exact ratio match, closeness 1")
    val close = Multimodal.aspectBucket(imgs, buckets)
      .collect().map(r => r.getString(0) -> r.getDouble(6)).toMap
    assert(math.abs(close("exact") - 1.0) < 1e-9)
  }

  test("feature columns carry the rounded values the rules are applied to") {
    val rows = Seq(row("r", w = 48, h = 32, nBytes = 1536)) // aspect 1.5, bpp 1.0
      .toDF("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
    val r = Multimodal.imageSetFilter(rows).collect()(0)
    val cols = Multimodal.imageSetFilter(rows).columns
    assert(r.getLong(cols.indexOf("pixels")) == 1536L)
    assert(math.abs(r.getDouble(cols.indexOf("aspect_ratio")) - 1.5) < 1e-9)
    assert(math.abs(r.getDouble(cols.indexOf("bytes_per_pixel")) - 1.0) < 1e-9)
    assert(r.getInt(cols.indexOf("caption_words")) == 4)
  }

  test("jointDedupSurvivors: a shared caption bridges two phash clusters") {
    import org.apache.spark.sql.functions._
    val rows = Seq(
      // phash cluster 1: a-b within hamming 1
      ("a", 0L, "cap-a"),
      ("b", 1L, "dup"),
      // phash cluster 2: c-d within hamming 1, far from cluster 1
      ("c", 0x0f0f0f0f0f0f0f0fL, "dup"), // caption bridges b<->c
      ("d", 0x0f0f0f0f0f0f0f0eL, "cap-d"),
      // singletons
      ("e", 0x00ff00ff00ff00ffL, "cap-e"),
      ("f", 0xf0f0f0f0f0f0f0f0L, "cap-f")
    ).toDF("image_id", "phash", "caption")
    val out = Multimodal.jointDedupSurvivors(rows, maxHamming = 3)
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
    assert(Seq("a", "b", "c", "d").forall(out(_)._1 == "a"),
      s"caption edge must merge both phash clusters: $out")
    assert(out("e") == (("e", true)) && out("f") == (("f", true)), "singletons survive")
    assert(out("a")._2 && !out("b")._2 && !out("c")._2 && !out("d")._2,
      s"min-id survivor only: $out")
  }

  test("pixelVerifiedNearDupPairs: psnr confirms/rejects hash candidates; jpeg re-encode verifies; dims mismatch never does") {
    import graft.fixtures.Images
    import graft.ops.Multimodal.{MediaMeta, MediaRow}
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaRow]
    val base = Images.renderPixels("pv-base", 32, 32)
    def rowOf(id: String, img: java.awt.image.BufferedImage, fmt: String = "png") =
      MediaRow(id, Images.encode(img, fmt),
        MediaMeta("image", img.getWidth, img.getHeight, fmt, 0L))
    val rows = Seq(
      rowOf("a-clean", base),
      rowOf("b-jpeg", base, "jpeg"), // lossy re-encode of the same pixels: high PSNR
      rowOf("c-near", Images.perturbPixels(base, 4)), // 36 dB: verified
      rowOf("d-far", Images.perturbPixels(base, 24)), // 20.5 dB: candidate but NOT verified
      rowOf("e-dims", Images.renderPixels("pv-base", 16, 16)) // different dims
    )
    val media = spark.createDataset(rows)
    val out = graft.ops.Multimodal
      .pixelVerifiedNearDupPairs(media, maxHamming = 20, minPsnrDb = 27.0)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getDouble(3), r.getBoolean(4))))
      .toMap
    def expectedPsnr(d: Int): Double = 10.0 * math.log10(255.0 * 255.0 / (d.toDouble * d))
    val (cleanNearP, cleanNearV) = out(("a-clean", "c-near"))
    assert(cleanNearV && math.abs(cleanNearP - expectedPsnr(4)) < 1e-9, s"d=4 pair: $cleanNearP")
    val (farP, farV) = out(("a-clean", "d-far"))
    assert(!farV && math.abs(farP - expectedPsnr(24)) < 1e-9, s"d=24 pair: $farP")
    val (jpegP, jpegV) = out(("a-clean", "b-jpeg"))
    assert(jpegV && jpegP > 40.0 && jpegP < 99.0, s"quality-0.95 jpeg re-encode: $jpegP")
    out.collect { case ((a, b), (p, v)) if a == "e-dims" || b == "e-dims" =>
      assert(p == -1.0 && !v, s"dims-mismatched pair ($a,$b) must never verify")
    }
    // bit-identical bytes under two ids: capped 99 dB, verified
    val twin = spark.createDataset(Seq(rowOf("a-clean", base), rowOf("a-twin", base)))
    val t = graft.ops.Multimodal.pixelVerifiedNearDupPairs(twin, 0, 27.0).collect()
    assert(t.length == 1 && t.head.getDouble(3) == 99.0 && t.head.getBoolean(4))
  }

  test("captionAlignment: aligned pairs keep, swapped captions and weak margins drop") {
    import org.apache.spark.sql.functions._
    // orthogonal-ish basis: pair i's image is e_i; aligned captions equal the
    // image vector, misaligned ones a different basis vector
    def basis(i: Int, d: Int = 16): Seq[Double] = Seq.tabulate(d)(j => if (j == i % d) 1.0 else 0.0)
    val rows = (0 until 8).map { i =>
      val img = basis(i)
      // pair 3's caption points at an index no other image uses, so the
      // swap breaks ONLY pair 3 (no accidental hard negative for pair 12)
      val txt = if (i == 3) basis(12) else img
      (i.toLong, img, txt)
    }
    val df = rows.toDF("image_id", "img", "txt")
    val out = Multimodal.captionAlignment(
        df, "image_id", "img", "txt",
        poolPpm = 1000000L, maxPool = 64, minCos = 0.8, margin = 0.1)
      .collect().map(r => r.getLong(0) -> ((r.getAs[Double]("pair_cos"), r.getAs[Boolean]("keep")))).toMap
    assert(out(3)._2 == false, "swapped caption must drop")
    assert(math.abs(out(3)._1) < 1e-9, "swapped pair is orthogonal")
    (0 until 8).filter(_ != 3).foreach { i =>
      assert(out(i.toLong)._1 == 1.0 && out(i.toLong)._2, s"aligned pair $i keeps: ${out(i.toLong)}")
    }
    // margin calibration: a pair whose image also matches a pooled negative
    // caption fails the margin even though its own cosine clears the floor
    val hard = Seq(
      (0L, basis(0), basis(0)),
      (1L, basis(0), basis(0)) // same image vector: each is the other's hardest negative
    ).toDF("image_id", "img", "txt")
    val hardOut = Multimodal.captionAlignment(
        hard, "image_id", "img", "txt",
        poolPpm = 1000000L, maxPool = 64, minCos = 0.8, margin = 0.1)
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    assert(hardOut.values.forall(_ == false), s"ambiguous pairs fail the margin: $hardOut")
    // pool-size contract fails loudly instead of silently truncating
    intercept[IllegalArgumentException] {
      Multimodal.captionAlignment(df, "image_id", "img", "txt",
        poolPpm = 1000000L, maxPool = 2, minCos = 0.8, margin = 0.1)
    }
  }
}
