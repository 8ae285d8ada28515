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

  test("EXIF orientation: both TIFF byte orders, absent tag, foreign formats") {
    (0L until 48L).foreach { i =>
      val (o, p, g) = graft.fixtures.Containers.expected(i)
      val b = graft.fixtures.Containers.bytesAt(i)
      assert(HeaderSniff.exifOrientation(b) == o, s"orientation at $i")
      assert(HeaderSniff.jpegProgressive(b) == p, s"progressive at $i")
      assert(HeaderSniff.gifFrames(b) == g, s"gif frames at $i")
    }
    // a plain imageio JPEG (no APP1) and non-JPEG formats report 0 / -1
    val plainJpeg = Images.encodeJpeg(Images.renderPixels("t", 32, 32), 0.8f)
    assert(HeaderSniff.exifOrientation(plainJpeg) == 0)
    assert(HeaderSniff.jpegProgressive(plainJpeg) == 0) // baseline SOF0
    assert(HeaderSniff.gifFrames(plainJpeg) == -1)
    val png = encode("png", 20, 20)
    assert(HeaderSniff.exifOrientation(png) == 0)
    assert(HeaderSniff.jpegProgressive(png) == -1)
    assert(HeaderSniff.gifFrames(png) == -1)
    val wav = graft.fixtures.Audio.wavBytes(0L)
    assert(HeaderSniff.exifOrientation(wav) == 0)
    assert(HeaderSniff.gifFrames(wav) == -1)
    // a single-frame imageio GIF counts exactly 1
    assert(HeaderSniff.gifFrames(encode("gif", 12, 9)) == 1)
    // truncation inside the TIFF IFD / GIF block stream never throws
    (0L until 48L).foreach { i =>
      val b = graft.fixtures.Containers.bytesAt(i)
      Seq(3, 8, 16, 24, b.length / 2).foreach { cut =>
        HeaderSniff.exifOrientation(b.take(cut))
        HeaderSniff.jpegProgressive(b.take(cut))
        HeaderSniff.gifFrames(b.take(cut))
      }
    }
    // an orientation value outside 1..8 is rejected, not propagated: craft
    // SOI + a big-endian APP1 whose orientation SHORT reads 9
    val badO = Array[Byte](
      0xff.toByte, 0xd8.toByte, 0xff.toByte, // SOI + fill for isJpeg
      0xff.toByte, 0xe1.toByte, 0x00, 34, // APP1, len 34
      'E', 'x', 'i', 'f', 0, 0,
      'M', 'M', 0x00, 42, 0x00, 0x00, 0x00, 0x08, // TIFF BE, IFD0 at +8
      0x00, 0x01, // one entry
      0x01, 0x12, 0x00, 0x03, 0x00, 0x00, 0x00, 0x01, // tag/type/count
      0x00, 0x09, 0x00, 0x00, // value 9 (out of range)
      0x00, 0x00, 0x00, 0x00 // next IFD
    )
    assert(HeaderSniff.exifOrientation(badO) == 0)
  }

  test("EXIF GPS/DateTime extraction and the strip scrub over the PII corpus") {
    import graft.fixtures.Containers
    (0L until 60L).foreach { i =>
      val b = Containers.gpsBytesAt(i)
      val (lat, lon, dt) = Containers.gpsExpected(i)
      assert(HeaderSniff.exifGpsMicroLat(b) == lat, s"lat at $i")
      assert(HeaderSniff.exifGpsMicroLon(b) == lon, s"lon at $i")
      assert(HeaderSniff.exifDateTime(b).toString == dt, s"datetime at $i")
      val stripped = HeaderSniff.exifStrip(b)
      if (i % 7 == 6 || i % 5 == 4) {
        // nothing to scrub: identity, reference-equal (cheap no-op detection)
        assert(stripped eq b, s"identity strip at $i")
      } else {
        assert(stripped.length < b.length, s"strip dropped bytes at $i")
        assert(HeaderSniff.exifGpsMicroLat(stripped) == HeaderSniff.NoGps)
        assert(HeaderSniff.exifDateTime(stripped).toString == "")
        assert(HeaderSniff.exifOrientation(stripped) == 0)
      }
      val (w, h) = Containers.gpsExpectedDims(i)
      assert(HeaderSniff.width(stripped) == w, s"width after strip at $i")
      assert(HeaderSniff.height(stripped) == h, s"height after strip at $i")
    }
    // the scrub never re-encodes: decoded pixels are bit-identical
    Seq(0L, 1L, 2L, 5L, 12L).foreach { i =>
      val b = Containers.gpsBytesAt(i)
      val stripped = HeaderSniff.exifStrip(b)
      val a0 = ImageIO.read(new java.io.ByteArrayInputStream(b))
      val a1 = ImageIO.read(new java.io.ByteArrayInputStream(stripped))
      assert(a0.getWidth == a1.getWidth && a0.getHeight == a1.getHeight)
      var y = 0
      while (y < a0.getHeight) {
        var x = 0
        while (x < a0.getWidth) {
          assert(a0.getRGB(x, y) == a1.getRGB(x, y), s"pixel $x,$y at row $i")
          x += 1
        }
        y += 1
      }
    }
    // truncation anywhere in the walk gives sentinels / identity, never throws
    (0L until 60L by 7L).foreach { i =>
      val b = Containers.gpsBytesAt(i)
      Seq(3, 8, 16, 24, 40, b.length / 2).foreach { cut =>
        val t = b.take(cut)
        HeaderSniff.exifGpsMicroLat(t)
        HeaderSniff.exifGpsMicroLon(t)
        HeaderSniff.exifDateTime(t)
        HeaderSniff.exifStrip(t)
      }
    }
  }
}
