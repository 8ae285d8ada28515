package graft.fixtures

import graft.canon.Hashing

/** Deterministic audio payload fixture: mono 16-bit PCM WAV, generated as a
  * pure function of the clip id (hash-derived sine + per-window hash noise,
  * saturating at the Int16 rails so some rows genuinely clip). The WRITER
  * assembles the RIFF/WAVE container manually (no library), while the
  * engine-side decoder (`Multimodal.audioFeatures`) reads it through
  * javax.sound.sampled.AudioSystem — independent code paths, same
  * independence argument as the MJPEG frame fixture (Mjpeg.scala).
  */
object Audio {

  val SampleRate = 8000

  def idOf(i: Long): String = f"aud-$i%08d"

  private def pos(l: Long): Long = l & Long.MaxValue

  /** Clip length in samples: 400..1520, hash-derived. */
  def nSamplesOf(id: String): Int = 400 + (pos(Hashing.xxh64("n" + id)) % 8).toInt * 160

  /** Deterministic Int16 samples: sine at a hash-derived frequency with a
    * hash-derived amplitude (sometimes ABOVE the rails → saturation =
    * clipping) plus small per-64-sample-window hash noise.
    */
  def samples(id: String): Array[Short] = {
    val n = nSamplesOf(id)
    val seed = Hashing.xxh64("pcm" + id)
    val freq = 50 + (pos(Hashing.xxh64("f" + id)) % 400).toInt // Hz
    val amp = 12000 + (pos(Hashing.xxh64("a" + id)) % 28000).toInt // may exceed 32767
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      val s = math.sin(2.0 * math.Pi * freq * i / SampleRate) * amp
      val noise = ((pos(Hashing.xxh64(s"w$seed:${i / 64}")) % 2001) - 1000).toInt
      val v = math.rint(s).toLong + noise
      out(i) = math.max(Short.MinValue.toLong, math.min(Short.MaxValue.toLong, v)).toShort
      i += 1
    }
    out
  }

  /** Manual RIFF/WAVE assembly: 44-byte canonical header + PCM16LE data. */
  def encodeWav(pcm: Array[Short], sampleRate: Int = SampleRate): Array[Byte] = {
    val dataLen = pcm.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1) // PCM
    bb.putShort(1) // mono
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * 2) // byte rate
    bb.putShort(2) // block align
    bb.putShort(16) // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    pcm.foreach(bb.putShort)
    bb.array()
  }

  def wavBytes(i: Long): Array[Byte] = encodeWav(samples(idOf(i)))

  /** Exact-integer per-clip statistics over raw samples — everything the
    * published audio features derive from. Computed here on the GENERATOR's
    * samples; the engine must recover the identical integers from the
    * encoded bytes through the real AudioSystem decode.
    */
  final case class RawStats(
      n_samples: Int, sum_sq: Long, zero_crossings: Long, peak: Int, n_clipped: Long)

  def rawStats(pcm: Array[Short]): RawStats = {
    var sq = 0L
    var zc = 0L
    var peak = 0
    var clipped = 0L
    var i = 0
    while (i < pcm.length) {
      val v = pcm(i).toInt
      sq += v.toLong * v
      val a = math.abs(v)
      if (a > peak) peak = a
      if (v == Short.MaxValue.toInt || v == Short.MinValue.toInt) clipped += 1
      // sign change between consecutive samples (zero counts as positive —
      // strict product < 0 would miss plateau crossings; the convention is
      // pinned here and mirrored by the oracle's derivation)
      if (i > 0 && ((pcm(i - 1) < 0) != (v < 0))) zc += 1
      i += 1
    }
    RawStats(pcm.length, sq, zc, peak, clipped)
  }

  /** Oracle side-channel (Images.exportExpectedFeatures pattern): expected
    * raw integers per clip, exported as parquet for the SQL oracle to
    * derive the published metrics independently.
    */
  val ExportBase = "/tmp/graft_audio_stats"
  private val exported = scala.collection.mutable.Set.empty[String]

  def exportExpectedStats(spark: org.apache.spark.sql.SparkSession, n: Int): String =
    synchronized {
      val path = s"$ExportBase/f_$n"
      if (!exported.contains(path)) {
        import spark.implicits._
        (0 until n).map { i =>
          val id = idOf(i.toLong)
          val st = rawStats(samples(id))
          (id, SampleRate, st.n_samples, st.sum_sq, st.zero_crossings, st.peak, st.n_clipped)
        }.toDF("id", "sample_rate", "n_samples", "sum_sq", "zero_crossings", "peak", "n_clipped")
          .coalesce(1)
          .write.mode("overwrite").parquet(path)
        exported += path
      }
      path
    }
}
