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
}
