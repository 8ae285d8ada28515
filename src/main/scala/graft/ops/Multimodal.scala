package graft.ops

import graft.fixtures.Images
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing: opaque `binary` payload
  * columns with typed metadata, processed by per-partition batch operators
  * (`mapPartitions` over typed rows — the Scala analogue of `mapInPandas`
  * batches: one decode context per partition, vectorized within).
  *
  * Image decode/resize is REAL (javax.imageio ships with the JVM). Audio
  * and video decoders are not available in this container, so those paths
  * are deterministic STUBS behind the same interface — the Spark-side
  * schema, partitioning, and batch shape are what this module tests.
  */
object Multimodal {

  final case class MediaMeta(media_type: String, w: Int, h: Int, fmt: String, duration_ms: Long)
  final case class MediaRow(id: String, bytes: Array[Byte], meta: MediaMeta)
  final case class ImageFeatures(id: String, w: Int, h: Int, fmt: String, phash: Long, mean_luma: Double)
  final case class FrameSample(id: String, frame_idx: Int, ts_ms: Long, frame_phash: Long)

  /** Decode + feature-extract images per partition (real imageio decode).
    * One decoder context per partition; rows stream through it.
    */
  def imageFeatures(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    implicit val enc = Encoders.product[ImageFeatures]
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        try {
          val img = Images.decode(r.bytes)
          if (img == null) None
          else {
            var luma = 0.0
            var n = 0
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                luma += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000.0
                n += 1
                x += 1
              }
              y += 1
            }
            Some(ImageFeatures(r.id, img.getWidth, img.getHeight, r.meta.fmt, Images.phash(img), luma / n))
          }
        } catch { case _: Exception => None }
      }
    }
  }

  final case class ImageQualityRaw(id: String, w: Int, h: Int, hist: Array[Long], lap_sq_sum: Long)

  /** LAION/DataComp-style decoded-pixel QUALITY features: luma dynamic
    * range, contrast (exact-integer variance numerator, one IEEE division),
    * sharpness (variance-of-Laplacian numerator over interior pixels), and
    * Shannon entropy of the 256-bin luma histogram. The decode emits only
    * RAW INTEGERS per image (histogram + Laplacian sum); every published
    * metric is derived from them in Catalyst, so an independent engine
    * replays the identical arithmetic from the same integers — the entropy
    * terms use the round-once-then-DECIMAL-sum form (order-independent,
    * cross-engine exact; same device as TextOps.lmScore).
    *
    * Scale shape: decode is map-only mapPartitions (one decoder context per
    * partition); the aggregation input is 256 histogram rows per image with
    * map-side partial aggregation, so the shuffle carries ≤ a few counters
    * per image — no pixel data ever crosses an exchange.
    *
    * Output: (id, w, h, n_pixels, luma_min, luma_max, luma_range, contrast,
    * sharpness, entropy_nats).
    */
  def imageQualityFeatures(media: Dataset[MediaRow]): DataFrame = {
    implicit val enc = Encoders.product[ImageQualityRaw]
    val raw = media.mapPartitions { rows =>
      rows.flatMap { r =>
        try {
          val img = Images.decode(r.bytes)
          if (img == null) None
          else Some(ImageQualityRaw(
            r.id, img.getWidth, img.getHeight, Images.lumaHistogram(img), Images.lapSqSum(img)))
        } catch { case _: Exception => None }
      }
    }
    val n = (col("w").cast("long") * col("h")).as("__n")
    val e = raw.toDF()
      .select(col("id"), col("w"), col("h"), col("lap_sq_sum"), n,
        posexplode(col("hist")).as(Seq("bin", "cnt")))
    // per-bin entropy term, rounded ONCE then summed as DECIMAL (exact,
    // order-independent); bins with cnt = 0 contribute nothing
    val term = when(col("cnt") > 0,
      round((col("cnt").cast("double") / col("__n").cast("double")) *
        log(col("__n").cast("double") / col("cnt").cast("double")), 9)
        .cast("decimal(18,9)"))
    val agg = e
      .groupBy(col("id"), col("w"), col("h"), col("lap_sq_sum"), col("__n"))
      .agg(
        sum(col("cnt")).as("n_pixels"),
        min(when(col("cnt") > 0, col("bin"))).as("luma_min"),
        max(when(col("cnt") > 0, col("bin"))).as("luma_max"),
        sum(col("bin").cast("long") * col("cnt")).as("__lsum"),
        sum(col("bin").cast("long") * col("bin") * col("cnt")).as("__lsq"),
        sum(term).as("__ent"))
    agg.select(
      col("id"), col("w"), col("h"), col("n_pixels"),
      col("luma_min"), col("luma_max"),
      (col("luma_max") - col("luma_min")).as("luma_range"),
      // population variance of luma: (n·Σl² − (Σl)²) / n² — exact integer
      // numerator and denominator, ONE correctly-rounded division
      round((col("__n") * col("__lsq") - col("__lsum") * col("__lsum")).cast("double") /
        (col("__n") * col("__n")).cast("double"), 6).as("contrast"),
      round(col("lap_sq_sum").cast("double") /
        greatest((col("w").cast("long") - 2) * (col("h") - 2), lit(1L)).cast("double"), 6)
        .as("sharpness"),
      round(col("__ent").cast("double"), 6).as("entropy_nats"))
  }

  /** Resize images to (w, h) per partition; re-encodes as PNG. Real. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        try {
          val img = Images.decode(r.bytes)
          if (img == null) None
          else {
            val scaled = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = scaled.createGraphics()
            g.drawImage(img.getScaledInstance(w, h, java.awt.Image.SCALE_SMOOTH), 0, 0, null)
            g.dispose()
            Some(r.copy(bytes = Images.encode(scaled, "png"), meta = r.meta.copy(w = w, h = h, fmt = "png")))
          }
        } catch { case _: Exception => None }
      }
    }
  }

  final case class AudioRaw(
      id: String, sample_rate: Int, n_samples: Int, sum_sq: Long,
      zero_crossings: Long, peak: Int, n_clipped: Long)

  /** REAL audio decode + feature extraction (closes the "audio is stubbed"
    * disclosure the same way MJPEG closed video): WAV/PCM16 payloads decode
    * through javax.sound.sampled.AudioSystem — a JVM codec path fully
    * independent of the fixture's manual RIFF writer — into exact-integer
    * per-clip statistics (energy, zero crossings, peak, clipping count).
    * Published metrics derive from those integers in Catalyst: duration,
    * RMS (IEEE sqrt is correctly rounded, so one sqrt of an exact ratio is
    * cross-engine reproducible), zero-crossing rate and clipping fraction
    * (one division each).
    *
    * Scale shape: map-only mapPartitions decode (one frame buffer per row,
    * no accumulation beyond a handful of longs) — nothing but per-clip
    * counters ever leaves the partition.
    */
  def audioFeatures(media: Dataset[MediaRow]): DataFrame = {
    implicit val enc = Encoders.product[AudioRaw]
    val raw = media.mapPartitions { rows =>
      rows.flatMap { r =>
        try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.bytes))
          val fmt = in.getFormat
          val bytes = in.readAllBytes()
          in.close()
          if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) None
          else {
            val bb = java.nio.ByteBuffer.wrap(bytes).order(
              if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN else java.nio.ByteOrder.LITTLE_ENDIAN)
            val pcm = new Array[Short](bytes.length / 2)
            var i = 0
            while (i < pcm.length) { pcm(i) = bb.getShort(); i += 1 }
            val st = graft.fixtures.Audio.rawStats(pcm)
            Some(AudioRaw(r.id, fmt.getSampleRate.toInt, st.n_samples, st.sum_sq,
              st.zero_crossings, st.peak, st.n_clipped))
          }
        } catch { case _: Exception => None }
      }
    }
    raw.toDF().select(
      col("id"), col("sample_rate"), col("n_samples"), col("peak"), col("n_clipped"),
      floor((col("n_samples").cast("long") * 1000L).cast("double") / col("sample_rate"))
        .cast("long").as("duration_ms"),
      round(sqrt(col("sum_sq").cast("double") / col("n_samples").cast("double")), 6).as("rms"),
      round(col("zero_crossings").cast("double") /
        greatest(col("n_samples").cast("long") - 1, lit(1L)).cast("double"), 6).as("zcr"),
      round(col("n_clipped").cast("double") / col("n_samples").cast("double"), 6)
        .as("clip_fraction"))
  }

  /** Audio resample by integer DECIMATION (keep every `factor`-th sample —
    * exact, no interpolation filter, so the output is a pure function of
    * the input integers): decode WAV via AudioSystem → decimate → re-encode
    * through the RIFF writer with the reduced sample rate. The mm_resize
    * analogue for audio; consumers re-decode the emitted payload to verify
    * the whole chain ran. Map-only.
    */
  def audioResample(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    require(factor >= 1, s"decimation factor must be >= 1: $factor")
    implicit val enc = Encoders.product[MediaRow]
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.bytes))
          val fmt = in.getFormat
          val bytes = in.readAllBytes()
          in.close()
          if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) None
          else {
            val bb = java.nio.ByteBuffer.wrap(bytes).order(
              if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN else java.nio.ByteOrder.LITTLE_ENDIAN)
            val n = bytes.length / 2
            val out = new Array[Short]((n + factor - 1) / factor)
            var i = 0
            while (i < out.length) { out(i) = bb.getShort(i * factor * 2); i += 1 }
            val rate = fmt.getSampleRate.toInt / factor
            val durMs = out.length.toLong * 1000 / math.max(rate, 1)
            Some(r.copy(
              bytes = graft.fixtures.Audio.encodeWav(out, rate),
              meta = r.meta.copy(duration_ms = durMs)))
          }
        } catch { case _: Exception => None }
      }
    }
  }

  /** Video frame sampling, `everyMs`-spaced. REAL decode for MJPEG
    * (fmt == "mjpeg"): the concatenated-JPEG stream is split by walking
    * the JPEG marker structure (`fixtures.Mjpeg.splitFrames` — no shared
    * state with the fixture generator), the sampled frames decode through
    * javax.imageio, and the emitted phash is computed from the pixels.
    * Other container formats have no JVM codec here and keep the
    * deterministic STUB phash behind the same schema (disclosed).
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long): Dataset[FrameSample] = {
    implicit val enc = Encoders.product[FrameSample]
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val samples = (r.meta.duration_ms / everyMs).toInt
        if (r.meta.fmt == "mjpeg") {
          val frames = graft.fixtures.Mjpeg.splitFrames(r.bytes)
          if (frames.isEmpty) Iterator.empty
          else {
            val interval = math.max(1L, r.meta.duration_ms / frames.size)
            // decode each DISTINCT sampled frame once per row, not per sample
            val wanted = (0 until samples).map(k => (k * everyMs / interval).toInt min (frames.size - 1))
            val decoded = wanted.distinct.map { idx =>
              idx -> Images.phash(Images.decode(frames(idx)))
            }.toMap
            (0 until samples).iterator.map { k =>
              val idx = wanted(k)
              FrameSample(r.id, idx, k * everyMs, decoded(idx))
            }
          }
        } else
          (0 until samples).iterator.map { i =>
            // stub phash for codec-less formats; schema/row shape identical
            FrameSample(r.id, i, i * everyMs, graft.canon.Hashing.xxh64(s"${r.id}#frame$i"))
          }
      }
    }
  }

  /** Wrap the deterministic MJPEG fixture as a media table of `n` videos. */
  def syntheticVideoTable(spark: org.apache.spark.sql.SparkSession, n: Long): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    import spark.implicits._
    spark.range(n).map { v =>
      val id = graft.fixtures.Mjpeg.idOf(v)
      val (w, h) = graft.fixtures.Mjpeg.dims(id)
      MediaRow(id, graft.fixtures.Mjpeg.videoBytes(v),
        MediaMeta("video", w, h, "mjpeg", graft.fixtures.Mjpeg.durationMs(v)))
    }
  }

  /** Wrap the deterministic WAV fixture as a media table of `n` clips. */
  def syntheticAudioTable(spark: org.apache.spark.sql.SparkSession, n: Long): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    import spark.implicits._
    spark.range(n).map { i =>
      val id = graft.fixtures.Audio.idOf(i)
      val durMs = graft.fixtures.Audio.nSamplesOf(id).toLong * 1000 / graft.fixtures.Audio.SampleRate
      MediaRow(id, graft.fixtures.Audio.wavBytes(i), MediaMeta("audio", 0, 0, "wav", durMs))
    }
  }

  /** Wrap the deterministic image fixture as a media table of `n` rows. */
  def syntheticMediaTable(spark: org.apache.spark.sql.SparkSession, n: Long): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    import spark.implicits._
    spark.range(n).map { i =>
      val row = Images.rowAt(i)
      MediaRow(row.image_id, row.bytes, MediaMeta("image", row.w, row.h, row.fmt, 0L))
    }
  }

  /** Per-row payload validation (BASELINE.json input_hint): PSNR >= 40 dB
    * for lossy, bit-exact for lossless, caption + phash equality. Returns
    * (image_id, valid, failed_check) where failed_check names the first
    * failing gate in the fixed order dims → quality → caption → phash
    * ("ok" when valid) — the oracle-checkable verdict column. Raw PSNR dB
    * stays excluded (float accumulation over decoder output; disclosed).
    */
  def validatePayloadVerdict(spark: org.apache.spark.sql.SparkSession, images: DataFrame): DataFrame = {
    import spark.implicits._
    images
      .select(col("image_id"), col("bytes"), col("w"), col("h"), col("fmt"), col("caption"), col("phash"))
      .as[graft.schema.ImageRow]
      .map { r =>
        val (valid, check) = Images.validateVerdict(r)
        (r.image_id, valid, check)
      }
      .toDF("image_id", "valid", "failed_check")
  }

  /** Boolean-only form of [[validatePayloadVerdict]]. */
  def validatePayload(spark: org.apache.spark.sql.SparkSession, images: DataFrame): DataFrame =
    validatePayloadVerdict(spark, images).select(col("image_id"), col("valid"))

  /** Wrap the deterministic near-dup fixture as a media table of `n` rows
    * (3 variants per base image — see `Images.nearDupBytesAt`).
    */
  def syntheticNearDupTable(spark: org.apache.spark.sql.SparkSession, n: Long): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    import spark.implicits._
    spark.range(n).map { i =>
      val (w, h) = Images.dims(Images.idOf(i / 3))
      val fmt = if (i % 3 == 1) "jpeg" else "png"
      MediaRow(Images.nearDupIdOf(i), Images.nearDupBytesAt(i), MediaMeta("image", w, h, fmt, 0L))
    }
  }

  /** Near-duplicate IMAGE pairs by perceptual-hash Hamming distance ≤
    * `maxHamming` — banded candidate generation with EXACT recall: the
    * 64-bit pHash is cut into `maxHamming + 1` disjoint contiguous bands,
    * so by pigeonhole any two hashes within Hamming distance `maxHamming`
    * agree EXACTLY on at least one band; candidates are the equi-join on
    * (band, band bits) and the cheap xor/popcount re-rank restores the
    * precise distance. Never all-pairs: the shuffle is bounded by band
    * buckets (same candidate-generation shape as the MinHash banding in
    * `TextOps`), and pairs sharing several bands are deduped AFTER the
    * distance filter so non-matching candidates never reach the distinct's
    * exchange. A pathologically common band signature (e.g. a flat-bright
    * corpus) makes a hot bucket — AQE's skew-join split keeps partitions
    * bounded and the result stays exact.
    *
    * Output: (id_a, id_b, hamming) with id_a < id_b.
    */
  def phashNearDupPairs(
      features: DataFrame,
      maxHamming: Int,
      idCol: String = "id",
      phashCol: String = "phash"
  ): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, s"maxHamming out of range: $maxHamming")
    val bands = maxHamming + 1
    val bounds = (0 to bands).map(b => b * 64 / bands)
    val bandCols = (0 until bands).map { b =>
      val lo = bounds(b)
      val width = bounds(b + 1) - lo
      // arithmetic shift + mask == logical shift for width ≤ 64 - lo
      val mask = if (width == 64) -1L else (1L << width) - 1L
      struct(lit(b).as("band"), shiftright(col("ph"), lo).bitwiseAND(lit(mask)).as("sig"))
    }
    val banded = features
      .select(col(idCol).cast("string").as("id"), col(phashCol).cast("long").as("ph"))
      .select(col("id"), col("ph"), explode(array(bandCols: _*)).as("bk"))
      .select(col("id"), col("ph"), col("bk.band").as("band"), col("bk.sig").as("sig"))
    banded
      .join(
        banded.select(col("id").as("id_b"), col("ph").as("ph_b"), col("band"), col("sig")),
        Seq("band", "sig"))
      .filter(col("id") < col("id_b"))
      .withColumn("hamming", bit_count(col("ph").bitwiseXOR(col("ph_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id").as("id_a"), col("id_b"), col("hamming"))
      .distinct()
  }

  /** Exactness baseline for [[phashNearDupPairs]]: brute-force all-pairs.
    * O(n²) — tests and tiny corpora only.
    */
  def phashNearDupPairsBrute(
      features: DataFrame,
      maxHamming: Int,
      idCol: String = "id",
      phashCol: String = "phash"
  ): DataFrame = {
    val f = features.select(col(idCol).cast("string").as("id"), col(phashCol).cast("long").as("ph"))
    f.crossJoin(f.select(col("id").as("id_b"), col("ph").as("ph_b")))
      .filter(col("id") < col("id_b"))
      .withColumn("hamming", bit_count(col("ph").bitwiseXOR(col("ph_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id").as("id_a"), col("id_b"), col("hamming"))
  }

  /** Wrap the PSNR-pair fixture as a media table of 2·nBases rows. */
  def syntheticPsnrPairTable(spark: org.apache.spark.sql.SparkSession, nBases: Long): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    import spark.implicits._
    spark.range(nBases * 2).map { i =>
      val base = i / 2
      val variant = if (i % 2 == 0) 'a' else 'b'
      val (w, h) = Images.dims(Images.idOf(base))
      MediaRow(Images.psnrPairIdOf(base, variant), Images.psnrPairBytesAt(base, variant),
        MediaMeta("image", w, h, "png", 0L))
    }
  }

  /** Decoded-pixel PSNR between two images in dB: per-channel squared error
    * over RGB, 99.0 cap when bit-identical (the input_hint's validation
    * formula). −1.0 when the dims differ — a hash collision between
    * different-sized images is by definition not a duplicate.
    */
  def psnrDb(a: java.awt.image.BufferedImage, b: java.awt.image.BufferedImage): Double = {
    if (a.getWidth != b.getWidth || a.getHeight != b.getHeight) return -1.0
    var se = 0.0
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
          se += d.toDouble * d
          n += 1
          c += 1
        }
        x += 1
      }
      y += 1
    }
    val mse = se / n
    if (mse <= 1e-12) 99.0 else 10.0 * math.log10(255.0 * 255.0 / mse)
  }

  /** Pixel-space VERIFICATION of the perceptual-hash candidates — the exact
    * re-rank stage of image dedup (hash recalls, pixels confirm): banded
    * pHash candidates ([[phashNearDupPairs]], exact recall at `maxHamming`)
    * are joined back to their payload bytes, decoded PAIRWISE, and kept as
    * `verified` only when the decoded-pixel PSNR clears `minPsnrDb`
    * (dims-mismatched or undecodable pairs report −1.0 → never verified).
    *
    * Scale shape: decode cost is O(candidate pairs), never O(corpus²) and
    * never O(corpus) re-decodes — the two byte joins move payloads ONLY for
    * ids that appear in a candidate pair (a vanishing fraction after
    * banding), and the PSNR pass is map-only mapPartitions downstream of
    * those joins. At 10^10 images the bytes side is the big table and the
    * candidate side the small one: Catalyst broadcast-joins the candidates
    * against the payload scan, so payload bytes still cross no exchange.
    *
    * Output: (id_a, id_b, hamming, psnr_db, verified).
    */
  def pixelVerifiedNearDupPairs(
      media: Dataset[MediaRow],
      maxHamming: Int,
      minPsnrDb: Double
  ): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val feats = imageFeatures(media).toDF()
    val cand = phashNearDupPairs(feats, maxHamming)
    val bytes = media.toDF().select(col("id"), col("bytes"))
    cand
      .join(bytes.select(col("id").as("id_a"), col("bytes").as("bytes_a")), "id_a")
      .join(bytes.select(col("id").as("id_b"), col("bytes").as("bytes_b")), "id_b")
      .select(col("id_a"), col("id_b"), col("hamming").cast("int").as("hamming"),
        col("bytes_a"), col("bytes_b"))
      .as[(String, String, Int, Array[Byte], Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (a, b, ham, ba, bb) =>
          val p =
            try {
              val ia = Images.decode(ba)
              val ib = Images.decode(bb)
              if (ia == null || ib == null) -1.0 else psnrDb(ia, ib)
            } catch { case _: Exception => -1.0 }
          (a, b, ham, p, p >= minPsnrDb)
        }
      }
      .toDF("id_a", "id_b", "hamming", "psnr_db", "verified")
  }

  /** Vision-transformer token count for an image of (w, h) at `patch`-px
    * patches: ceil(w/p)·ceil(h/p) — integer ceil-division, so packing
    * arithmetic downstream ([[Sampling.packSequences]] over patch counts,
    * the NaViT-style multimodal batch prepass) is exact cross-engine.
    */
  def vitPatchCount(w: Column, h: Column, patch: Int): Column = {
    require(patch > 0)
    def ceilDiv(c: Column): Column = floor((c + lit(patch - 1)) / lit(patch)).cast("long")
    ceilDiv(w) * ceilDiv(h)
  }

  /** The full image-dedup decision (the LAION-style prepass): near-dup
    * PAIRS from the banded pHash join become duplicate CLUSTERS via
    * connected components, and each cluster keeps its best rendition —
    * highest `pixelsCol`, ties to the lowest id — instead of the arbitrary
    * first-seen copy. Images with no near-dup partner are their own
    * singleton cluster (component = own id) without entering the CC loop.
    *
    * Scale shape: candidate generation is the pigeonhole-banded equi-join
    * (never all-pairs, [[phashNearDupPairs]]); components run only over the
    * PAIR graph (a vanishing fraction of the corpus — singletons join in by
    * a left join afterwards); survivor election is one window partitioned
    * by component (dedup clusters are small, so no unpartitioned-window
    * hazard).
    *
    * Output: (id, component, pixels, is_survivor) for EVERY input image.
    */
  def phashDedupSurvivors(
      features: DataFrame,
      maxHamming: Int,
      idCol: String = "id",
      phashCol: String = "phash",
      pixelsCol: String = "pixels"
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val f = features.select(
      col(idCol).cast("string").as("id"), col(phashCol), col(pixelsCol).cast("long").as("pixels"))
    val pairs = phashNearDupPairs(f, maxHamming, "id", phashCol)
    val comps = GraphOps.connectedComponents(pairs, "id_a", "id_b")
    val labeled = f
      .join(comps, f("id") === comps("node"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"), col("pixels"))
    val w = Window.partitionBy(col("component")).orderBy(col("pixels").desc, col("id").asc)
    labeled
      .withColumn("__rn", row_number().over(w))
      .select(col("id"), col("component"), col("pixels"), (col("__rn") === 1).as("is_survivor"))
  }

  /** Cross-modal JOINT dedup over the BASELINE.json input_hint pair table:
    * two rows are duplicates when their pHashes are within `maxHamming`
    * bits OR they carry the exact same caption — the union graph's
    * connected components are the duplicate clusters and min-id is the
    * canonical pair (a re-crawled image keeps one caption; a stock photo
    * captioned identically across hosts collapses too).
    *
    * Scale shape: phash edges come from the banded pigeonhole join
    * ([[phashNearDupPairs]] — exact recall at `maxHamming`, never
    * all-pairs); caption edges are HUB-STAR — one aggregation finds each
    * repeated caption's min-id hub and every other holder links to it, so
    * a boilerplate caption on 10^6 crawled pages contributes 10^6−1 edges,
    * not 10^12 pairs (the classic hot-key blowup of a naive self-join).
    * Components run on the union with per-round lineage cuts
    * ([[GraphOps.connectedComponents]]).
    *
    * Output: (id, component, is_survivor) for every input row.
    */
  def jointDedupSurvivors(
      pairs: DataFrame,
      maxHamming: Int,
      idCol: String = "image_id",
      phashCol: String = "phash",
      captionCol: String = "caption"): DataFrame = {
    val f = pairs.select(
      col(idCol).cast("string").as("id"),
      col(phashCol).cast("long").as("phash"),
      col(captionCol).cast("string").as("caption"))
    val phEdges = phashNearDupPairs(f, maxHamming, "id", "phash")
      .select(col("id_a"), col("id_b"))
    val capHubs = f.groupBy(col("caption"))
      .agg(min(col("id")).as("hub"), count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
      .drop("__n")
    val capEdges = f.join(capHubs, Seq("caption"))
      .filter(col("id") =!= col("hub"))
      .select(col("hub").as("id_a"), col("id").as("id_b"))
    val comps = GraphOps.connectedComponents(phEdges.unionByName(capEdges), "id_a", "id_b")
    f.join(comps, f("id") === comps("node"), "left")
      .select(
        col("id"),
        coalesce(col("component"), col("id")).as("component"))
      // hash-min label propagation converges to the component's min id,
      // so the survivor test is a column compare — no extra window
      .withColumn("is_survivor", col("id") === col("component"))
  }

  /** Aspect-ratio bucketing for batched vision training (the SDXL-style
    * prepass: group images by nearest aspect bucket so a batch shares one
    * shape). Closeness of (w, h) to bucket (bw, bh) is computed from EXACT
    * integer cross-products — min(w*bh, bw*h) / max(w*bh, bw*h) — one IEEE
    * division, no transcendental functions, so an independent engine
    * reproduces the argmax bit-for-bit (log-ratio distance would hinge on
    * libm rounding). Ties break to the lowest bucket index. Map-only.
    * Output: (image_id, w, h, bucket_idx, bucket_w, bucket_h, closeness).
    */
  def aspectBucket(images: DataFrame, buckets: Seq[(Int, Int)]): DataFrame = {
    require(buckets.nonEmpty)
    val cands = buckets.zipWithIndex.map { case ((bw, bh), i) =>
      val cross1 = col("w").cast("long") * bh
      val cross2 = lit(bw.toLong) * col("h")
      val closeness = least(cross1, cross2).cast("double") / greatest(cross1, cross2)
      struct(closeness.as("c"), lit(-i).as("negIdx"), lit(bw).as("bw"), lit(bh).as("bh"))
    }
    val best = if (cands.size == 1) cands.head else greatest(cands: _*)
    images.select(
      col("image_id"), col("w"), col("h"),
      (-best.getField("negIdx")).as("bucket_idx"),
      best.getField("bw").as("bucket_w"),
      best.getField("bh").as("bucket_h"),
      round(best.getField("c"), 6).as("closeness"))
  }

  /** LAION/DataComp-style image+caption curation filter over the
    * BASELINE.json input_hint table (image_id, bytes, w, h, fmt, caption,
    * phash): dimension floors, aspect-ratio cap, pixel floor, format
    * allowlist, encoded-bytes-per-pixel sanity band (catches truncated or
    * padded payloads WITHOUT decoding), caption length/word-count bounds,
    * and degenerate-phash rejection (all-0 / all-1 = flat image). Pure
    * per-row column arithmetic — map-only at any scale; rules apply to the
    * ROUNDED feature values so a cross-engine oracle sees identical
    * boundary behavior.
    */
  def imageSetFilter(
      images: DataFrame,
      minDim: Int = 32,
      maxAspect: Double = 2.5,
      minPixels: Long = 1024,
      fmtAllow: Seq[String] = Seq("png", "jpeg"),
      minBytesPerPixel: Double = 0.1,
      maxBytesPerPixel: Double = 16.0,
      minCaptionChars: Int = 5,
      minCaptionWords: Int = 2,
      maxCaptionWords: Int = 64): DataFrame = {
    // divisors floored at 1 so a degenerate 0-dim row fails ok_dims/ok_pixels
    // deterministically instead of nulling every downstream verdict
    val pixels = (col("w").cast("long") * col("h")).as("pixels")
    val aspect = round(greatest(col("w"), col("h")).cast("double") /
      greatest(least(col("w"), col("h")), lit(1)), 6).as("aspect_ratio")
    val bpp = round(length(col("bytes")).cast("double") /
      greatest(col("w").cast("long") * col("h"), lit(1L)), 6).as("bytes_per_pixel")
    val capWords = size(filter(split(trim(col("caption")), "\\s+"), x => length(x) > 0))
      .as("caption_words")
    val f = images.select(
      col("image_id"), col("fmt"), col("phash"),
      pixels, aspect, bpp,
      length(col("caption")).as("caption_chars"), capWords,
      (col("w") >= minDim && col("h") >= minDim).as("ok_dims"))
    val okAspect = col("aspect_ratio") <= maxAspect
    val okPixels = col("pixels") >= minPixels
    val okFmt = col("fmt").isin(fmtAllow: _*)
    val okBpp = col("bytes_per_pixel") >= minBytesPerPixel &&
      col("bytes_per_pixel") <= maxBytesPerPixel
    val okCapLen = col("caption_chars") >= minCaptionChars
    val okCapWords = col("caption_words") >= minCaptionWords &&
      col("caption_words") <= maxCaptionWords
    val okPhash = col("phash") =!= 0L && col("phash") =!= -1L
    f.select(
      col("image_id"), col("pixels"), col("aspect_ratio"), col("bytes_per_pixel"),
      col("caption_chars"), col("caption_words"),
      col("ok_dims"),
      okAspect.as("ok_aspect"),
      okPixels.as("ok_pixels"),
      okFmt.as("ok_fmt"),
      okBpp.as("ok_bpp"),
      okCapLen.as("ok_caption_len"),
      okCapWords.as("ok_caption_words"),
      okPhash.as("ok_phash"),
      (col("ok_dims") && okAspect && okPixels && okFmt && okBpp &&
        okCapLen && okCapWords && okPhash).as("keep"))
  }

  /** CLIP-score-style image↔caption alignment filter over paired UNIT
    * embeddings (compose with [[VectorOps.unitNormalized]]): keep a pair
    * when its cosine clears `minCos` AND beats the hardest NEGATIVE
    * caption by `margin`. Negatives are a small deterministic hash-drawn
    * pool of other rows' caption vectors — the in-batch-negative
    * calibration of CLIP-filtering pipelines (DataComp-style), made
    * reproducible (md5 draw, pool sorted by id) instead of batch-shaped.
    *
    * Scale shape: the pool is a bounded driver-side k×dims constant
    * shipped in task binaries exactly like the IVF centroid matrix
    * ([[VectorOps.ivfCentroids]]); the pair table itself NEVER shuffles —
    * the whole filter is map-only column arithmetic (`greatest` over
    * ≤ `maxPool` codegen'd dot terms). The pool draw is an O(poolPpm·n)
    * collect guarded by `maxPool`: raising the corpus 100× means lowering
    * `poolPpm` 100×, never widening the plan.
    *
    * This is the soft variant of the reference's exact caption-equality
    * payload check (BASELINE.json input_hint: "caption equality");
    * curation keeps the aligned pairs rather than asserting equality.
    */
  def captionAlignment(
      pairs: DataFrame,
      idCol: String,
      imgCol: String,
      txtCol: String,
      poolPpm: Long,
      maxPool: Int,
      minCos: Double,
      margin: Double,
      salt: String = "alignpool"): DataFrame = {
    graft.expr.VectorFunctions.register(pairs.sparkSession)
    require(poolPpm > 0L && poolPpm <= 1000000L, "poolPpm must be in (0, 1e6]")
    val poolRows = pairs
      .filter(Sampling.drawCol(col(idCol), salt) < poolPpm)
      .select(col(idCol).cast("string"), col(txtCol))
      .collect()
      .map(r => (r.getString(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    require(poolRows.nonEmpty, "empty negative pool — raise poolPpm")
    require(poolRows.length <= maxPool,
      s"negative pool ${poolRows.length} exceeds maxPool=$maxPool — lower poolPpm")
    val negTerms = poolRows.map { case (pid, pvec) =>
      // a pair never competes against its own caption: sentinel below any cosine
      when(col(idCol).cast("string") === lit(pid), lit(-2.0))
        .otherwise(VectorOps.dot(col(imgCol), typedLit(pvec)))
    }
    val negMax = if (negTerms.length == 1) negTerms.head else greatest(negTerms.toSeq: _*)
    pairs
      .withColumn("pair_cos", VectorOps.dot(col(imgCol), col(txtCol)))
      .withColumn("neg_max", negMax)
      .withColumn("keep",
        col("pair_cos") >= minCos && (col("pair_cos") - col("neg_max")) >= margin)
  }
}
