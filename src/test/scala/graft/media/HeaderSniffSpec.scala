package graft.media

import graft.SparkSpec
import graft.expr.MediaFunctions
import graft.fixtures.{Audio, Images}
import org.apache.spark.sql.functions._

import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

class HeaderSniffSpec extends SparkSpec {

  private def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = Images.renderPixels(s"sniff-$fmt-$w-$h", w, h)
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, out), s"imageio cannot encode $fmt")
    out.toByteArray
  }

  test("jpeg/png sniff matches the real decoder on the 64-image fixture") {
    (0L until 64L).foreach { i =>
      val r = Images.rowAt(i)
      assert(HeaderSniff.format(r.bytes) == r.fmt, r.image_id)
      assert(HeaderSniff.width(r.bytes) == r.w, r.image_id)
      assert(HeaderSniff.height(r.bytes) == r.h, r.image_id)
    }
  }

  test("gif and bmp dimensions from the container header") {
    Seq("gif", "bmp").foreach { fmt =>
      val bytes = encode(fmt, 33, 21)
      assert(HeaderSniff.format(bytes) == fmt)
      assert(HeaderSniff.width(bytes) == 33)
      assert(HeaderSniff.height(bytes) == 21)
    }
  }

  test("wav geometry: rate/channels/bits/frames from the RIFF chunks") {
    (0L until 16L).foreach { i =>
      val bytes = Audio.wavBytes(i)
      assert(HeaderSniff.format(bytes) == "wav")
      assert(HeaderSniff.sampleRate(bytes) == Audio.SampleRate)
      assert(HeaderSniff.channels(bytes) == 1)
      assert(HeaderSniff.bitsPerSample(bytes) == 16)
      assert(HeaderSniff.audioFrames(bytes) == Audio.nSamplesOf(Audio.idOf(i)))
    }
  }

  test("corrupt and truncated payloads give sentinels, never throw") {
    val png = encode("png", 20, 20)
    val jpg = Images.encodeJpeg(Images.renderPixels("t", 32, 32), 0.8f)
    val cases = Seq(
      Array.emptyByteArray,
      Array[Byte](1, 2, 3),
      "not an image at all".getBytes("UTF-8"),
      png.take(10), // PNG magic but no IHDR
      jpg.take(3), // JPEG magic only
      jpg.take(6) // mid-segment truncation
    )
    cases.foreach { b =>
      HeaderSniff.format(b) // must not throw
      assert(HeaderSniff.width(b) == -1, b.length)
      assert(HeaderSniff.height(b) == -1, b.length)
      assert(HeaderSniff.audioFrames(b) == -1, b.length)
    }
    // SOS reached before any SOF: dims unavailable
    val sosFirst = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xda.toByte, 0, 4, 0, 0)
    assert(HeaderSniff.width(sosFirst) == -1)
  }

  test("expressions ride whole-stage codegen with no ScalaUDF") {
    MediaFunctions.register(spark)
    import spark.implicits._
    // spark.range, not a local Seq: ConvertToLocalRelation would fold a
    // LocalTableScan and leave nothing for codegen to prove.
    val df = graft.ops.Multimodal.syntheticMediaTable(spark, 8).toDF()
      .select(
        col("id"),
        MediaFunctions.mediaFormat(col("bytes")).as("fmt"),
        MediaFunctions.mediaWidth(col("bytes")).as("w"),
        MediaFunctions.mediaHeight(col("bytes")).as("h"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" is the WholeStageCodegen stage marker in plan strings
    assert(!plan.contains("ScalaUDF") && plan.contains("*(1) Project"), plan)
    val rows = df.collect()
    rows.foreach { r =>
      val exp = Images.rowAt(r.getString(0).drop(4).toLong)
      assert(r.getString(1) == exp.fmt)
      assert(r.getInt(2) == exp.w && r.getInt(3) == exp.h)
    }
    // null payload → null out (nullSafeEval path)
    val n = Seq((1, null: Array[Byte])).toDF("id", "bytes")
      .select(MediaFunctions.mediaFormat(col("bytes")), MediaFunctions.mediaWidth(col("bytes")))
      .collect()(0)
    assert(n.isNullAt(0) && n.isNullAt(1))
  }
}
