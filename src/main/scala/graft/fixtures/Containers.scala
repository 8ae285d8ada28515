package graft.fixtures

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic mixed-container corpus for the decode-free sniffers
  * (media/HeaderSniff): JPEGs with hand-spliced EXIF APP1 segments (both
  * TIFF byte orders), progressive- and baseline-encoded JPEGs, and animated
  * GIFs with a known frame count.
  *
  * Independence argument (the mm_audio_features pattern in reverse): the
  * payloads are produced by javax.imageio writers + a byte-level APP1
  * splice, while the engine recovers the facts by walking the container
  * byte stream — two unrelated code paths meeting at the spec'd byte
  * layout. The expected values are analytic functions of the row index,
  * exported as parquet for the DuckDB side (`mm_container_sniff`).
  *
  * Row plan (pure function of i — embarrassingly parallel on executors):
  *   i %% 3 == 2 -> animated GIF with (i %% 4) + 1 frames
  *   else       -> JPEG; progressive iff i %% 2 == 1;
  *                 EXIF orientation absent iff i %% 5 == 4,
  *                 else (i %% 8) + 1, TIFF order `II` iff i %% 2 == 0.
  */
object Containers {

  def idOf(i: Long): String = f"ct-$i%06d"

  /** (orientation, progressive, gifFrames) the sniffers must report. */
  def expected(i: Long): (Int, Int, Int) =
    if (i % 3 == 2) (0, -1, ((i % 4) + 1).toInt)
    else {
      val o = if (i % 5 == 4) 0 else ((i % 8) + 1).toInt
      val p = if (i % 2 == 1) 1 else 0
      (o, p, -1)
    }

  def bytesAt(i: Long): Array[Byte] =
    if (i % 3 == 2) animatedGif(i)
    else {
      val id = Images.idOf(i)
      val (w, h) = Images.dims(id)
      val jpeg = encodeJpegMode(Images.renderPixels(id, w, h), progressive = i % 2 == 1)
      if (i % 5 == 4) jpeg
      else spliceExifApp1(jpeg, ((i % 8) + 1).toInt, littleEndian = i % 2 == 0)
    }

  private def encodeJpegMode(img: BufferedImage, progressive: Boolean): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setProgressiveMode(
      if (progressive) ImageWriteParam.MODE_DEFAULT else ImageWriteParam.MODE_DISABLED)
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(img, null, null), params)
    ios.close()
    writer.dispose()
    out.toByteArray
  }

  /** Minimal spec-conformant APP1: Exif\0\0 + TIFF header + a one-entry
    * IFD0 holding only tag 0x0112 (orientation, SHORT, count 1). The SHORT
    * value is left-justified in the 4-byte value field in file byte order,
    * per TIFF 6.0 §2.
    */
  private def exifApp1(orientation: Int, littleEndian: Boolean): Array[Byte] = {
    val tiff = new Array[Byte](26)
    def p16(o: Int, v: Int): Unit =
      if (littleEndian) { tiff(o) = (v & 0xff).toByte; tiff(o + 1) = ((v >> 8) & 0xff).toByte }
      else { tiff(o) = ((v >> 8) & 0xff).toByte; tiff(o + 1) = (v & 0xff).toByte }
    def p32(o: Int, v: Int): Unit =
      if (littleEndian) { p16(o, v & 0xffff); p16(o + 2, v >>> 16) }
      else { p16(o, v >>> 16); p16(o + 2, v & 0xffff) }
    tiff(0) = (if (littleEndian) 'I' else 'M').toByte
    tiff(1) = tiff(0)
    p16(2, 42)
    p32(4, 8) // IFD0 at offset 8 from the TIFF base
    p16(8, 1) // one entry
    p16(10, 0x0112); p16(12, 3); p32(14, 1); p16(18, orientation)
    p32(22, 0) // no next IFD
    val payload = Array[Byte]('E', 'x', 'i', 'f', 0, 0) ++ tiff
    val len = payload.length + 2
    Array(0xff.toByte, 0xe1.toByte, ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++ payload
  }

  private def spliceExifApp1(jpeg: Array[Byte], o: Int, littleEndian: Boolean): Array[Byte] =
    jpeg.take(2) ++ exifApp1(o, littleEndian) ++ jpeg.drop(2)

  private def animatedGif(i: Long): Array[Byte] = {
    val frames = ((i % 4) + 1).toInt
    val w = 8 + (i % 5).toInt
    val h = 6 + (i % 3).toInt
    val out = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < frames) {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, (((i * 31 + f * 7 + x * 3 + y) % 255).toInt << 16) | 0x4080)
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(new IIOImage(img, null, null), null)
      f += 1
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    out.toByteArray
  }

  /** (id, bytes) — generated per-row on executors, never on the driver. */
  def table(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).map(i => (idOf(i), bytesAt(i))).toDF("id", "bytes")
  }

  val ExportBase = "/tmp/graft_container_sniff"
  private val exported = scala.collection.mutable.Set.empty[String]

  /** Oracle side-channel: the analytically-expected sniff results. */
  def exportExpected(spark: SparkSession, n: Int): String = synchronized {
    val path = s"$ExportBase/f_$n"
    if (!exported.contains(path)) {
      import spark.implicits._
      (0 until n).map { i =>
        val (o, p, g) = expected(i.toLong)
        (idOf(i.toLong), o, p, g)
      }.toDF("id", "orientation", "progressive", "gif_frames")
        .coalesce(1)
        .write.mode("overwrite").parquet(path)
      exported += path
    }
    path
  }
}
