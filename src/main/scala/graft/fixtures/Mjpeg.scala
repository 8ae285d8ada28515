package graft.fixtures

import graft.canon.Hashing

import java.awt.image.BufferedImage

/** Deterministic MJPEG video fixture + a real JPEG stream splitter.
  *
  * MJPEG (motion JPEG) is concatenated baseline-JPEG frames — the one
  * video format a bare JVM can decode end-to-end (javax.imageio per
  * frame), which upgrades the engine's frame-sampling operator
  * (reference `_file_download_crawler.py` media surface; VERDICT r4
  * "What's missing" #5) from a stub to a real decoder.
  *
  * The independence argument for the oracle: the GENERATOR knows each
  * frame's bytes because it encoded them one by one; the ENGINE receives
  * only the concatenation and must recover the per-frame byte ranges by
  * PARSING the JPEG marker structure ([[splitFrames]]), then decode and
  * hash the pixels. Generator and splitter share no state — the expected
  * table is exported from the per-frame bytes pre-concatenation.
  */
object Mjpeg {

  /** frame cadence of every fixture video (ms per frame) */
  val FrameIntervalMs: Long = 100L

  def idOf(v: Long): String = f"vid-$v%06d"

  private def pos(l: Long): Long = l & Long.MaxValue

  /** 4–8 frames per video; small fixed dims per video. */
  def frameCount(id: String): Int = 4 + (pos(Hashing.xxh64("nf" + id)) % 5).toInt

  def dims(id: String): (Int, Int) = {
    val w = 24 + (pos(Hashing.xxh64("vw" + id)) % 3).toInt * 8
    val h = 24 + (pos(Hashing.xxh64("vh" + id)) % 3).toInt * 8
    (w, h)
  }

  /** Frame pixels: the image fixture's procedural field, keyed per frame
    * so consecutive frames differ (distinct phashes).
    */
  def framePixels(id: String, idx: Int, w: Int, h: Int): BufferedImage =
    Images.renderPixels(s"$id#f$idx", w, h)

  /** One video's frames as SEPARATE JPEG byte arrays (the generator-side
    * ground truth the splitter must recover).
    */
  def frameBytes(v: Long): Seq[Array[Byte]] = {
    val id = idOf(v)
    val (w, h) = dims(id)
    (0 until frameCount(id)).map(i => Images.encodeJpeg(framePixels(id, i, w, h), 0.9f))
  }

  /** The concatenated MJPEG stream. */
  def videoBytes(v: Long): Array[Byte] = frameBytes(v).toArray.flatten

  def durationMs(v: Long): Long = frameCount(idOf(v)).toLong * FrameIntervalMs

  /** Split a raw MJPEG stream into per-frame JPEG byte arrays by walking
    * the JPEG marker structure (NOT a naive FFD8/FFD9 scan — segment
    * payloads and entropy-coded data are handled per the JFIF framing
    * rules, so table bytes that happen to contain marker-like pairs can't
    * desynchronize the split):
    *   - SOI/EOI (FFD8/FFD9) and RST0-7 / TEM (FF01) are standalone;
    *   - every other marker carries a 2-byte big-endian length covering
    *     its payload;
    *   - after SOS the entropy-coded data runs until a marker byte that
    *     is neither a stuffed 0x00 nor a restart marker.
    * Malformed trailing bytes are dropped (a truncated final frame does
    * not throw — the decoded prefix is returned).
    */
  def splitFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    val n = bytes.length
    var i = 0
    def u8(k: Int): Int = bytes(k) & 0xff
    while (i + 1 < n) {
      // seek SOI
      if (u8(i) == 0xff && u8(i + 1) == 0xd8) {
        val start = i
        i += 2
        var end = -1
        var broken = false
        while (end < 0 && !broken) {
          if (i + 1 >= n || u8(i) != 0xff) broken = true
          else {
            val m = u8(i + 1)
            if (m == 0xd9) { end = i + 2 } // EOI
            else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // standalone
            else if (m == 0xda) {
              // SOS: skip header, then entropy-coded data
              if (i + 3 >= n) broken = true
              else {
                i += 2 + ((u8(i + 2) << 8) | u8(i + 3))
                var inScan = true
                while (inScan && !broken) {
                  if (i + 1 >= n) broken = true
                  else if (u8(i) == 0xff && u8(i + 1) != 0x00 &&
                    !(u8(i + 1) >= 0xd0 && u8(i + 1) <= 0xd7)) inScan = false
                  else i += 1
                }
              }
            } else {
              // segment with a length field
              if (i + 3 >= n) broken = true
              else i += 2 + ((u8(i + 2) << 8) | u8(i + 3))
            }
          }
        }
        if (end > 0) { out += java.util.Arrays.copyOfRange(bytes, start, end); i = end }
        else i = n // truncated tail: stop
      } else i += 1
    }
    out.result()
  }

  /** Oracle side-channel: every fixture frame's (id, frame_idx, ts_ms,
    * frame_phash), phash computed from the PER-FRAME bytes the generator
    * encoded — the engine must recover the same values from the
    * concatenated streams.
    */
  val FrameExportBase = "/tmp/graft_video_frames"
  private val exported = scala.collection.mutable.Set.empty[String]

  def exportExpectedFrames(spark: org.apache.spark.sql.SparkSession, n: Int): String =
    synchronized {
      val path = s"$FrameExportBase/f_$n"
      if (!exported.contains(path)) {
        import spark.implicits._
        (0 until n).flatMap { v =>
          frameBytes(v.toLong).zipWithIndex.map { case (fb, idx) =>
            (idOf(v.toLong), idx, idx * FrameIntervalMs, Images.phash(Images.decode(fb)))
          }
        }.toDF("id", "frame_idx", "ts_ms", "frame_phash")
          .coalesce(1)
          .write.mode("overwrite").parquet(path)
        exported += path
      }
      path
    }
}
