package graft.ops

import graft.SparkSpec
import graft.fixtures.Audio
import graft.ops.Multimodal.{MediaMeta, MediaRow}

/** Real WAV decode + audio features (Multimodal.audioFeatures): the manual
  * RIFF writer round-trips through javax.sound.sampled.AudioSystem, and the
  * published metrics match hand computation on constructed waveforms.
  */
class AudioSpec extends SparkSpec {

  test("raw stats on constructed waveforms") {
    // alternating +1000 / -1000: every step is a sign change
    val alt = Array.tabulate[Short](8)(i => if (i % 2 == 0) 1000 else -1000)
    val a = Audio.rawStats(alt)
    assert(a.n_samples == 8 && a.zero_crossings == 7 && a.peak == 1000 && a.n_clipped == 0)
    assert(a.sum_sq == 8L * 1000 * 1000)

    // rail-pinned samples count as clipped
    val clip = Array[Short](Short.MaxValue, Short.MinValue, 0, Short.MaxValue)
    val c = Audio.rawStats(clip)
    assert(c.n_clipped == 3 && c.peak == 32768)
    // zero counts as NON-negative: +max → -min crosses, -min → 0 crosses, 0 → +max doesn't
    assert(c.zero_crossings == 2)
  }

  test("manual RIFF writer round-trips through AudioSystem") {
    val pcm = Audio.samples(Audio.idOf(3L))
    val wav = Audio.encodeWav(pcm)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(in.getFormat.getSampleRate.toInt == Audio.SampleRate)
    assert(in.getFormat.getChannels == 1 && in.getFormat.getSampleSizeInBits == 16)
    val bytes = in.readAllBytes()
    in.close()
    assert(bytes.length == pcm.length * 2)
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    pcm.foreach(s => assert(bb.getShort() == s))
  }

  test("operator metrics match hand computation through the distributed decode") {
    import spark.implicits._
    val alt = Array.tabulate[Short](8000)(i => if (i % 2 == 0) 1000 else -1000)
    val rows = Seq(MediaRow("alt", Audio.encodeWav(alt), MediaMeta("audio", 0, 0, "wav", 1000L)))
    val out = Multimodal.audioFeatures(spark.createDataset(rows)).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("duration_ms") == 1000L)
    assert(r.getAs[Double]("rms") == 1000.0)
    assert(r.getAs[Double]("zcr") == BigDecimal(7999.0 / 7999.0).toDouble) // every step crosses
    assert(r.getAs[Double]("clip_fraction") == 0.0)
    assert(r.getAs[Int]("peak") == 1000)
  }

  test("decimation resample keeps every k-th sample and the reduced rate") {
    import spark.implicits._
    val pcm = Array.tabulate[Short](1001)(i => (i % 3000).toShort)
    val rows = Seq(MediaRow("r", Audio.encodeWav(pcm), MediaMeta("audio", 0, 0, "wav", 125L)))
    val out = Multimodal.audioResample(spark.createDataset(rows), 4).collect().head
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(out.bytes))
    assert(in.getFormat.getSampleRate.toInt == Audio.SampleRate / 4)
    val bytes = in.readAllBytes()
    in.close()
    assert(bytes.length / 2 == 251) // ceil(1001 / 4)
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 251).foreach(i => assert(bb.getShort(i * 2) == pcm(i * 4)))
  }

  test("fixture corpus decodes distributed; some rows clip, all have energy") {
    val out = Multimodal.audioFeatures(Multimodal.syntheticAudioTable(spark, 24)).collect()
    assert(out.length == 24)
    out.foreach { r =>
      assert(r.getAs[Double]("rms") > 0.0)
      assert(r.getAs[Long]("duration_ms") >= 50L)
    }
    // amplitude range 12000..40000 guarantees some saturating clips
    assert(out.exists(_.getAs[Double]("clip_fraction") > 0.0))
    assert(out.exists(_.getAs[Double]("clip_fraction") == 0.0))
  }
}
