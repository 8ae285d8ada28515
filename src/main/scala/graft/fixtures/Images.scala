package graft.fixtures

import graft.canon.Hashing
import graft.schema.ImageRow

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** Deterministic image+caption payload table (FIXTURES.md §1 — the
  * BASELINE.json input_hint shape). Pure function of image_id: procedural
  * sinusoid + hash-colored tiles, encoded PNG (lossless) or JPEG (lossy)
  * via javax.imageio; 64-bit average-hash phash over the decoded pixels.
  *
  * Pure per-row generation ⇒ embarrassingly parallel
  * (`spark.range(n).mapPartitions`), which is how the table scales to the
  * bench sizes without a driver-side loop.
  */
object Images {

  def idOf(i: Long): String = f"img-$i%08d"

  private def pos(l: Long): Long = l & Long.MaxValue

  def dims(id: String): (Int, Int) = {
    val w = 16 + (pos(Hashing.xxh64("w" + id)) % 5).toInt * 16
    val h = 16 + (pos(Hashing.xxh64("h" + id)) % 5).toInt * 16
    (w, h)
  }

  def fmtOf(id: String): String =
    if (pos(Hashing.xxh64("fmt" + id)) % 2 == 0) "png" else "jpeg"

  def captionOf(id: String): String = {
    val words = Array("crawl", "frontier", "queue", "image", "spark", "bloom",
      "host", "robots", "depth", "batch", "shard", "lease")
    val k = pos(Hashing.xxh64("cap" + id))
    val picks = (0 until 5).map(j => words(((k >> (j * 4)) % words.length).toInt))
    s"caption of $id: ${picks.mkString(" ")}"
  }

  /** Procedural pixels: sinusoid field + 8x8 hash-colored tiles. */
  def renderPixels(id: String, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val seed = Hashing.xxh64("px" + id)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val tile = pos(Hashing.xxh64(s"t$seed:${x / 8}:${y / 8}"))
        // Detail lives in luma (identical across channels); chroma is a
        // smooth gradient only — JPEG 4:2:0 chroma subsampling would
        // otherwise cap PSNR near 31 dB no matter the quality setting.
        val s = math.sin((x + (seed % 17)) * 0.25) * math.cos((y + (seed % 13)) * 0.2)
        val luma = ((s + 1) * 70).toInt + (tile % 48).toInt + 40
        val r = luma + (x * 24 / math.max(w, 1))
        val g = luma + (y * 24 / math.max(h, 1))
        val b = luma + ((x + y) * 12 / math.max(w + h, 1))
        img.setRGB(x, y, ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff))
        x += 1
      }
      y += 1
    }
    img
  }

  /** JPEG is written at quality 0.95 so the lossy round-trip stays above
    * the 40 dB PSNR gate of the input_hint invariant (default quality
    * lands ~35 dB on this pattern).
    */
  def encode(img: BufferedImage, fmt: String): Array[Byte] =
    if (fmt == "jpeg") encodeJpeg(img, 0.95f)
    else {
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, fmt, out)
      out.toByteArray
    }

  def encodeJpeg(img: BufferedImage, quality: Float): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    ios.close()
    writer.dispose()
    out.toByteArray
  }

  def decode(bytes: Array[Byte]): BufferedImage =
    ImageIO.read(new java.io.ByteArrayInputStream(bytes))

  /** 64-bit average-hash over an 8x8 grayscale downsample of the pixels. */
  def phash(img: BufferedImage): Long = {
    val cell = Array.ofDim[Double](64)
    val w = img.getWidth
    val h = img.getHeight
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val gray = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000.0
        cell((y * 8 / h) * 8 + (x * 8 / w)) += gray
        x += 1
      }
      y += 1
    }
    val mean = cell.sum / 64
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (cell(i) > mean) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** Integer luma (0..255) of a packed RGB pixel — the phash gray formula
    * kept in EXACT integer arithmetic so quality statistics built on it
    * (histogram, Laplacian) are cross-engine reproducible.
    */
  @inline def lumaInt(rgb: Int): Int =
    (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000

  /** 256-bin integer luma histogram over the decoded pixels. */
  def lumaHistogram(img: BufferedImage): Array[Long] = {
    val hist = new Array[Long](256)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        hist(lumaInt(img.getRGB(x, y))) += 1
        x += 1
      }
      y += 1
    }
    hist
  }

  /** Sum of squared 4-neighbour Laplacian responses over INTERIOR pixels
    * (v = 4·l(x,y) − l(x±1,y) − l(x,y±1)) — the classic
    * variance-of-Laplacian sharpness signal's exact-integer numerator.
    * |v| ≤ 8·255 so v² ≤ ~4.2e6; the Long sum is overflow-safe for any
    * realistic image.
    */
  def lapSqSum(img: BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    if (w < 3 || h < 3) return 0L
    // one luma row buffer ring avoids re-decoding neighbours 4×
    val l = Array.ofDim[Int](h, w)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { l(y)(x) = lumaInt(img.getRGB(x, y)); x += 1 }
      y += 1
    }
    var s = 0L
    y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        val v = 4 * l(y)(x) - l(y)(x - 1) - l(y)(x + 1) - l(y - 1)(x) - l(y + 1)(x)
        s += v.toLong * v
        x += 1
      }
      y += 1
    }
    s
  }

  /** Oracle side-channel for the image-quality features
    * (Multimodal.imageQualityFeatures): per-image luma histogram +
    * Laplacian sum computed from the GENERATOR's bytes, exported as
    * parquet. The SQL oracle derives every published metric (pixel count,
    * min/max/range, contrast, sharpness, entropy) from these raw integers
    * with its own list/aggregate SQL, while the Spark side recovers them
    * from the distributed binary column through the real decode pipeline.
    */
  val QualityExportBase = "/tmp/graft_image_quality"
  private val exportedQuality = scala.collection.mutable.Set.empty[String]

  def exportExpectedQuality(spark: org.apache.spark.sql.SparkSession, n: Int): String =
    synchronized {
      val path = s"$QualityExportBase/f_$n"
      if (!exportedQuality.contains(path)) {
        import spark.implicits._
        (0 until n).map { i =>
          val r = rowAt(i.toLong)
          val img = decode(r.bytes)
          (r.image_id, img.getWidth, img.getHeight, lumaHistogram(img).toSeq, lapSqSum(img))
        }.toDF("id", "w", "h", "hist", "lap_sq_sum")
          .coalesce(1)
          .write.mode("overwrite").parquet(path)
        exportedQuality += path
      }
      path
    }

  /** PSNR between two same-size images (dB); infinity ⇒ 99.0. */
  def psnr(a: BufferedImage, b: BufferedImage): Double = {
    require(a.getWidth == b.getWidth && a.getHeight == b.getHeight, "size mismatch")
    var mse = 0.0
    var n = 0
    var y = 0
    while (y < a.getHeight) {
      var x = 0
      while (x < a.getWidth) {
        val pa = a.getRGB(x, y)
        val pb = b.getRGB(x, y)
        var c = 0
        while (c < 3) {
          val d = ((pa >> (8 * c)) & 0xff) - ((pb >> (8 * c)) & 0xff)
          mse += d.toDouble * d
          n += 1
          c += 1
        }
        x += 1
      }
      y += 1
    }
    mse /= n
    if (mse <= 1e-12) 99.0 else 10.0 * math.log10(255.0 * 255.0 / mse)
  }

  /** Full deterministic row for image index i. */
  def rowAt(i: Long): ImageRow = {
    val id = idOf(i)
    val (w, h) = dims(id)
    val fmt = fmtOf(id)
    val img = renderPixels(id, w, h)
    val bytes = encode(img, fmt)
    // phash over the DECODED bytes (post-JPEG-loss), so consumers verifying
    // phash against the decoded payload agree bit-for-bit.
    val ph = phash(decode(bytes))
    ImageRow(id, bytes, w, h, fmt, captionOf(id), ph)
  }

  /** Oracle side-channel (VERDICT r3 next-round #8, same trick as the LSH
    * plane export): the fixture's expected per-image features — everything
    * deterministic given the generator: dimensions, format, and the phash
    * of the decoded payload — exported as parquet so the SQL oracle can
    * check the engine's distributed decode pipeline recovered them from
    * the raw bytes. mean_luma stays EXCLUDED (float accumulation over
    * decoder output; disclosed rows-only remainder with PSNR).
    */
  val FeatureExportBase = "/tmp/graft_image_features"
  private val exportedFeatures = scala.collection.mutable.Set.empty[String]

  def exportExpectedFeatures(spark: org.apache.spark.sql.SparkSession, n: Int): String =
    synchronized {
      val path = s"$FeatureExportBase/f_$n"
      if (!exportedFeatures.contains(path)) {
        import spark.implicits._
        (0 until n).map { i =>
          val r = rowAt(i.toLong)
          (r.image_id, r.w, r.h, r.fmt, r.phash)
        }.toDF("id", "w", "h", "fmt", "phash")
          .coalesce(1)
          .write.mode("overwrite").parquet(path)
        exportedFeatures += path
      }
      path
    }

  /** Oracle side-channel for the image-set curation filter
    * (Multimodal.imageSetFilter): the UNDECORATED input columns — including
    * the encoded payload LENGTH, computed here from the generator's bytes —
    * exported as parquet so the SQL oracle can replay the decoration and
    * every rule from the raw inputs while the Spark side computes them from
    * the actual binary column.
    */
  private val exportedFilterInputs = scala.collection.mutable.Set.empty[String]

  def exportFilterInputs(spark: org.apache.spark.sql.SparkSession, n: Int): String =
    synchronized {
      val path = s"$FeatureExportBase/in_$n"
      if (!exportedFilterInputs.contains(path)) {
        import spark.implicits._
        (0 until n).map { i =>
          val r = rowAt(i.toLong)
          (r.image_id, r.w, r.h, r.fmt, r.bytes.length.toLong, r.caption, r.phash)
        }.toDF("image_id", "w", "h", "fmt", "byte_len", "caption", "phash")
          .coalesce(1)
          .write.mode("overwrite").parquet(path)
        exportedFilterInputs += path
      }
      path
    }

  /** Per-row validation per BASELINE.json input_hint: lossless formats must
    * decode bit-identically to the procedural render; lossy must reach
    * PSNR >= 40 dB; caption must match exactly. Returns (valid,
    * failed_check) where the check names fire in a FIXED order — dims →
    * quality → caption → phash — so a tampered row reports exactly the
    * check its tamper targets; "ok" when all pass.
    */
  def validateVerdict(row: ImageRow): (Boolean, String) = {
    val decoded = decode(row.bytes)
    if (decoded == null || decoded.getWidth != row.w || decoded.getHeight != row.h)
      return (false, "dims")
    val expected = renderPixels(row.image_id, row.w, row.h)
    val quality =
      if (row.fmt == "png") psnr(decoded, expected) >= 99.0
      else psnr(decoded, expected) >= 40.0
    if (!quality) (false, "quality")
    else if (row.caption != captionOf(row.image_id)) (false, "caption")
    else if (row.phash != phash(decoded)) (false, "phash")
    else (true, "ok")
  }

  def validate(row: ImageRow): Boolean = validateVerdict(row)._1

  /** Deterministically TAMPERED corpus for the payload-validation oracle
    * (VERDICT r4 next-round #1). kind = i % 6:
    *
    *   0 → untampered                        ⇒ (true,  "ok")
    *   1 → caption corrupted                 ⇒ (false, "caption")
    *   2 → stored phash bit-flipped          ⇒ (false, "phash")
    *   3 → re-encoded JPEG at quality 0.30   ⇒ (false, "quality")  [< 40 dB]
    *   4 → stored width off by one           ⇒ (false, "dims")
    *   5 → one PNG pixel perturbed           ⇒ (false, "quality")  [not bit-exact]
    *
    * For byte-tampering kinds (3, 5) the stored phash is recomputed over
    * the tampered decoded payload so the phash check PASSES and the
    * quality check is the one that fires. The expected verdicts are thus
    * knowable BY CONSTRUCTION — the DuckDB oracle states them analytically
    * from i % 6 with no image decoding on its side, while the Spark path
    * must run the full distributed decode/PSNR/caption/phash pipeline to
    * recover them. ImagesSpec pins the two analytic PSNR claims (quality
    * 0.30 lands < 40 dB on every fixture size; a one-pixel PNG perturb
    * breaks bit-exactness) against real decodes.
    */
  def tamperedRowAt(i: Long): ImageRow = {
    val base = rowAt(i)
    (i % 6) match {
      case 0 => base
      case 1 => base.copy(caption = base.caption + " CORRUPT")
      case 2 => base.copy(phash = base.phash ^ 1L)
      case 3 =>
        val lossy = encodeJpeg(renderPixels(base.image_id, base.w, base.h), 0.30f)
        base.copy(bytes = lossy, fmt = "jpeg", phash = phash(decode(lossy)))
      case 4 => base.copy(w = base.w + 1)
      case _ =>
        val img = renderPixels(base.image_id, base.w, base.h)
        img.setRGB(0, 0, img.getRGB(0, 0) ^ 0x00404040)
        val bytes2 = encode(img, "png")
        base.copy(bytes = bytes2, fmt = "png", phash = phash(decode(bytes2)))
    }
  }

  /** The analytic expected verdict for tamperedRowAt(i) — pure i % 6. */
  def expectedVerdict(i: Long): (Boolean, String) = (i % 6) match {
    case 0 => (true, "ok")
    case 1 => (false, "caption")
    case 2 => (false, "phash")
    case 3 => (false, "quality")
    case 4 => (false, "dims")
    case _ => (false, "quality")
  }

  // ---- near-duplicate corpus (pHash near-dup operator fixtures) -------------

  /** Deterministic NEAR-DUPLICATE image corpus: 3 variants per base image —
    * v0 the PNG original, v1 a JPEG re-encode at quality 0.80, v2 a
    * one-downsample-cell luma perturbation — so within-base pairs land a
    * few pHash bits apart (avg-hash is robust to mild lossy re-encoding,
    * and the cell perturb flips ~1 bit) while cross-base pairs sit near the
    * random-hash expectation (~32 bits). Pure function of i.
    */
  def nearDupIdOf(i: Long): String = f"nd-${i / 3}%06d-${i % 3}"

  def nearDupBytesAt(i: Long): Array[Byte] = {
    val baseId = idOf(i / 3)
    val (w, h) = dims(baseId)
    val img = renderPixels(baseId, w, h)
    (i % 3) match {
      case 0 => encode(img, "png")
      case 1 => encodeJpeg(img, 0.80f)
      case _ =>
        // brighten the pixels feeding phash cell (0,0) — the 8x8 downsample
        // averages x < w/8, y < h/8 — enough to push that cell across the
        // global mean without moving other cells' comparisons
        var y = 0
        while (y < math.max(1, h / 8)) {
          var x = 0
          while (x < math.max(1, w / 8)) {
            val rgb = img.getRGB(x, y)
            def up(c: Int): Int = math.min(255, c + 70)
            img.setRGB(x, y,
              (up((rgb >> 16) & 0xff) << 16) | (up((rgb >> 8) & 0xff) << 8) | up(rgb & 0xff))
            x += 1
          }
          y += 1
        }
        encode(img, "png")
    }
  }

  /** Oracle side-channel (same pattern as [[exportExpectedFeatures]]): the
    * near-dup corpus's per-image pHash over the decoded variant bytes. The
    * SQL oracle recomputes the PAIR ENUMERATION from these exports by brute
    * O(n²) cross join — independent of the banded candidate generation the
    * Spark operator uses — so the entry checks the banding's exact recall.
    */
  val NearDupExportBase = "/tmp/graft_phash_neardup"
  private val exportedNearDup = scala.collection.mutable.Set.empty[String]

  def exportNearDupPhashes(spark: org.apache.spark.sql.SparkSession, n: Int): String =
    synchronized {
      val path = s"$NearDupExportBase/f_$n"
      if (!exportedNearDup.contains(path)) {
        import spark.implicits._
        (0 until n).map(i => (nearDupIdOf(i.toLong), phash(decode(nearDupBytesAt(i.toLong)))))
          .toDF("id", "phash")
          .coalesce(1)
          .write.mode("overwrite").parquet(path)
        exportedNearDup += path
      }
      path
    }

  /** Generator-side facts for the near-dup corpus beyond phash — the
    * curation-rule inputs (dims, format, encoded length) the pipeline
    * oracle replays rules over.
    */
  def exportNearDupFeatures(spark: org.apache.spark.sql.SparkSession, n: Int): String =
    synchronized {
      val path = s"$NearDupExportBase/feat_$n"
      if (!exportedNearDup.contains(path)) {
        import spark.implicits._
        (0 until n).map { i =>
          val bytes = nearDupBytesAt(i.toLong)
          val img = decode(bytes)
          (nearDupIdOf(i.toLong), img.getWidth, img.getHeight,
            if (i % 3 == 1) "jpeg" else "png", bytes.length.toLong, phash(img))
        }.toDF("id", "w", "h", "fmt", "byte_len", "phash")
          .coalesce(1)
          .write.mode("overwrite").parquet(path)
        exportedNearDup += path
      }
      path
    }

  // ---- pixel-PSNR pair-verification fixture --------------------------------
  // Each base image gets one perturbed PNG copy at a base-dependent exact
  // per-channel delta, so the pair's decoded-pixel PSNR is controlled on
  // BOTH sides of a verification threshold; PNG is lossless, so the plan
  // pixels ARE the decoded pixels and every expected value below is
  // computed without touching the codec path the operator under test uses.

  def psnrPairIdOf(base: Long, variant: Char): String = f"pp-$base%04d-$variant"

  /** Per-channel delta for base's perturbed copy: PSNR = 10·log10(255²/d²)
    * ≈ {42.1, 36.1, 30.1, 24.1, 20.5} dB — two of five land below a 27 dB
    * verification gate, none within 3 dB of it.
    */
  def psnrPairDelta(base: Long): Int = Array(2, 4, 8, 16, 24)((base % 5).toInt)

  /** Move every channel AWAY from its nearer bound by exactly d
    * (v ≥ 128 → v−d, else v+d): |diff| = d per channel with no clamping,
    * so the pair MSE is exactly d².
    */
  def perturbPixels(src: BufferedImage, d: Int): BufferedImage = {
    val out = new BufferedImage(src.getWidth, src.getHeight, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < src.getHeight) {
      var x = 0
      while (x < src.getWidth) {
        val rgb = src.getRGB(x, y)
        def mv(c: Int): Int = if (c >= 128) c - d else c + d
        out.setRGB(x, y,
          (mv((rgb >> 16) & 0xff) << 16) | (mv((rgb >> 8) & 0xff) << 8) | mv(rgb & 0xff))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Plan pixels for pair-member (base, variant) — a pixel universe
    * disjoint from the other fixtures' (id salt "pp").
    */
  def psnrPairPixels(base: Long, variant: Char): BufferedImage = {
    val baseId = idOf(base)
    val (w, h) = dims(baseId)
    val img = renderPixels("pp" + baseId, w, h)
    if (variant == 'a') img else perturbPixels(img, psnrPairDelta(base))
  }

  def psnrPairBytesAt(base: Long, variant: Char): Array[Byte] =
    encode(psnrPairPixels(base, variant), "png")

  /** Oracle side-channel: per-image plan pHash (pair enumeration replayed
    * brute-force in SQL, independent of the banded join) and per-pair plan
    * PSNR (pixel-arithmetic replay, independent of the decode path).
    */
  val PsnrPairExportBase = "/tmp/graft_psnr_pairs"
  private val exportedPsnrPairs = scala.collection.mutable.Set.empty[String]

  def exportPsnrPairs(spark: org.apache.spark.sql.SparkSession, nBases: Int): String =
    synchronized {
      val path = s"$PsnrPairExportBase/f_$nBases"
      if (!exportedPsnrPairs.contains(path)) {
        import spark.implicits._
        val hashes = (0 until nBases).flatMap { b =>
          Seq('a', 'b').map(v => (psnrPairIdOf(b.toLong, v), phash(psnrPairPixels(b.toLong, v))))
        }
        hashes.toDF("id", "phash").coalesce(1).write.mode("overwrite").parquet(s"$path/phash")
        val psnrs = (0 until nBases).map { b =>
          (psnrPairIdOf(b.toLong, 'a'), psnrPairIdOf(b.toLong, 'b'),
            psnr(psnrPairPixels(b.toLong, 'a'), psnrPairPixels(b.toLong, 'b')))
        }
        psnrs.toDF("id_a", "id_b", "psnr").coalesce(1).write.mode("overwrite").parquet(s"$path/psnr")
        exportedPsnrPairs += path
      }
      path
    }
}
