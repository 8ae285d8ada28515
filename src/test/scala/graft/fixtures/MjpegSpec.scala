package graft.fixtures

import graft.SparkSpec
import graft.ops.Multimodal

/** Real MJPEG frame decode (closes the r4 video-stub gap): the splitter
  * must recover the EXACT per-frame byte ranges from a concatenated
  * stream by parsing JPEG marker structure — the generator's per-frame
  * arrays are the ground truth it never sees.
  */
class MjpegSpec extends SparkSpec {

  test("splitter recovers the generator's exact frame bytes from the concatenation") {
    (0L until 32L).foreach { v =>
      val truth = Mjpeg.frameBytes(v)
      val split = Mjpeg.splitFrames(Mjpeg.videoBytes(v))
      assert(split.size == truth.size, s"vid $v: ${split.size} != ${truth.size}")
      truth.zip(split).zipWithIndex.foreach { case ((t, s), i) =>
        assert(java.util.Arrays.equals(t, s), s"vid $v frame $i bytes differ")
      }
    }
  }

  test("splitter: garbage prefix is skipped; truncated tail yields the decodable prefix") {
    val truth = Mjpeg.frameBytes(7L)
    val stream = Mjpeg.videoBytes(7L)
    // garbage before the first SOI (incl. a lone 0xFF) must not desync
    val noisy = Array[Byte](0x00, 0xff.toByte, 0x41, 0x42) ++ stream
    val split = Mjpeg.splitFrames(noisy)
    assert(split.size == truth.size)
    assert(java.util.Arrays.equals(split.head, truth.head))
    // cut the last frame in half: every COMPLETE frame still comes back
    val cut = stream.take(stream.length - truth.last.length / 2)
    val partial = Mjpeg.splitFrames(cut)
    assert(partial.size == truth.size - 1)
    partial.zip(truth).foreach { case (s, t) => assert(java.util.Arrays.equals(s, t)) }
  }

  test("sampleFrames decodes real MJPEG: phashes match the per-frame ground truth") {
    val media = Multimodal.syntheticVideoTable(spark, 16)
    val out = Multimodal.sampleFrames(media, everyMs = Mjpeg.FrameIntervalMs)
      .collect().map(f => (f.id, f.frame_idx) -> (f.ts_ms, f.frame_phash)).toMap
    (0L until 16L).foreach { v =>
      val id = Mjpeg.idOf(v)
      Mjpeg.frameBytes(v).zipWithIndex.foreach { case (fb, idx) =>
        val expected = Images.phash(Images.decode(fb))
        val (ts, ph) = out((id, idx))
        assert(ts == idx * Mjpeg.FrameIntervalMs)
        assert(ph == expected, s"$id frame $idx phash")
      }
    }
    // consecutive frames of one video are genuinely different content
    val phs = Mjpeg.frameBytes(0L).map(fb => Images.phash(Images.decode(fb)))
    assert(phs.distinct.size > 1)
  }

  test("sampleFrames subsamples at a coarser cadence (every other frame)") {
    val media = Multimodal.syntheticVideoTable(spark, 4)
    val every = Mjpeg.FrameIntervalMs * 2
    val out = Multimodal.sampleFrames(media, everyMs = every).collect()
    out.groupBy(_.id).foreach { case (id, fs) =>
      val v = id.stripPrefix("vid-").toLong
      val n = Mjpeg.frameCount(id)
      assert(fs.length == (Mjpeg.durationMs(v) / every).toInt)
      fs.sortBy(_.ts_ms).zipWithIndex.foreach { case (f, k) =>
        assert(f.ts_ms == k * every)
        assert(f.frame_idx == (k * every / Mjpeg.FrameIntervalMs).toInt.min(n - 1))
      }
    }
  }
}
