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

  // --------------------------------------------------------------------
  // GPS / DateTime EXIF corpus for the image-PII gate (mm_exif_pii):
  // full multi-IFD APP1 segments (IFD0: orientation + DateTime + GPS-IFD
  // pointer; GPS IFD: hemisphere refs + RATIONAL×3 coordinates at
  // TIFF value offsets) hand-spliced into imageio-written JPEGs, plus
  // EXIF-free JPEGs and non-JPEG (GIF) rows proving the sentinels.
  //
  // Row plan (pure function of i):
  //   i %% 7 == 6 -> animated GIF        (all sentinels; strip = identity)
  //   i %% 5 == 4 -> JPEG without EXIF   (all sentinels; strip = identity)
  //   else        -> JPEG + full APP1, TIFF order II iff i %% 2 == 0,
  //                  GPS present iff i %% 4 != 3.
  // --------------------------------------------------------------------

  /** Plan-side GPS rationals: (deg, min, sec*100, negative). */
  def gpsPlan(i: Long): ((Long, Long, Long, Boolean), (Long, Long, Long, Boolean)) = (
    ((i * 13) % 90, (i * 7) % 60, (i * 311) % 6000, i % 3 == 0),
    ((i * 29) % 180, (i * 11) % 60, (i * 577) % 6000, i % 2 == 0)
  )

  def dateTimePlan(i: Long): String =
    f"20${10 + i % 15}%02d:${1 + i % 12}%02d:${1 + i % 28}%02d ${i % 24}%02d:${i % 60}%02d:${(i * 7) % 60}%02d"

  /** (microlat, microlon, datetime) the GPS sniffers must report;
    * sentinels for the GIF / no-EXIF / no-GPS rows.
    */
  def gpsExpected(i: Long): (Long, Long, String) = {
    import graft.media.HeaderSniff.{microDegrees, NoGps}
    if (i % 7 == 6 || i % 5 == 4) (NoGps, NoGps, "")
    else {
      val dt = dateTimePlan(i)
      if (i % 4 == 3) (NoGps, NoGps, dt)
      else {
        val ((ad, am, as, an), (od, om, os, on)) = gpsPlan(i)
        (microDegrees(ad, 1, am, 1, as, 100, an),
          microDegrees(od, 1, om, 1, os, 100, on), dt)
      }
    }
  }

  /** Pixel width the engine must report both before and after the strip
    * (the strip must not touch geometry).
    */
  def gpsExpectedDims(i: Long): (Int, Int) =
    if (i % 7 == 6) (8 + (i % 5).toInt, 6 + (i % 3).toInt)
    else Images.dims(Images.idOf(i))

  def gpsBytesAt(i: Long): Array[Byte] =
    if (i % 7 == 6) animatedGif(i)
    else {
      val id = Images.idOf(i)
      val (w, h) = Images.dims(id)
      val jpeg = encodeJpegMode(Images.renderPixels(id, w, h), progressive = false)
      if (i % 5 == 4) jpeg
      else {
        val gps = if (i % 4 == 3) None else Some(gpsPlan(i))
        jpeg.take(2) ++ exifFullApp1(((i % 8) + 1).toInt, dateTimePlan(i), gps,
          littleEndian = i % 2 == 0) ++ jpeg.drop(2)
      }
    }

  /** APP1 with IFD0 = {orientation, DateTime, [GPS pointer]} and an
    * optional GPS IFD = {LatRef, Lat, LonRef, Lon} with the RATIONAL
    * triplets in the data area, per TIFF 6.0 value-offset rules.
    */
  private def exifFullApp1(
      orientation: Int,
      dateTime: String,
      gps: Option[((Long, Long, Long, Boolean), (Long, Long, Long, Boolean))],
      littleEndian: Boolean): Array[Byte] = {
    val n0 = if (gps.isDefined) 3 else 2
    val ifd0 = 8
    val ifd0Size = 2 + n0 * 12 + 4
    val gpsIfd = ifd0 + ifd0Size
    val gpsIfdSize = if (gps.isDefined) 2 + 4 * 12 + 4 else 0
    val dtOff = gpsIfd + gpsIfdSize
    val latOff = dtOff + 20
    val lonOff = latOff + 24
    val total = if (gps.isDefined) lonOff + 24 else dtOff + 20
    val tiff = new Array[Byte](total)
    def p16(o: Int, v: Int): Unit =
      if (littleEndian) { tiff(o) = (v & 0xff).toByte; tiff(o + 1) = ((v >> 8) & 0xff).toByte }
      else { tiff(o) = ((v >> 8) & 0xff).toByte; tiff(o + 1) = (v & 0xff).toByte }
    def p32(o: Int, v: Long): Unit = {
      val x = (v & 0xffffffffL).toInt
      if (littleEndian) { p16(o, x & 0xffff); p16(o + 2, x >>> 16) }
      else { p16(o, x >>> 16); p16(o + 2, x & 0xffff) }
    }
    def entry(e: Int, tag: Int, typ: Int, count: Long): Unit = {
      p16(e, tag); p16(e + 2, typ); p32(e + 4, count)
    }
    tiff(0) = (if (littleEndian) 'I' else 'M').toByte
    tiff(1) = tiff(0)
    p16(2, 42)
    p32(4, ifd0.toLong)
    // IFD0 (tags ascending per spec)
    p16(ifd0, n0)
    var e = ifd0 + 2
    entry(e, 0x0112, 3, 1L); p16(e + 8, orientation); e += 12
    entry(e, 0x0132, 2, 20L); p32(e + 8, dtOff.toLong); e += 12
    if (gps.isDefined) { entry(e, 0x8825, 4, 1L); p32(e + 8, gpsIfd.toLong); e += 12 }
    p32(e, 0) // next IFD
    gps.foreach { case ((ad, am, as, an), (od, om, os, on)) =>
      p16(gpsIfd, 4)
      var g = gpsIfd + 2
      entry(g, 0x0001, 2, 2L); tiff(g + 8) = (if (an) 'S' else 'N').toByte; g += 12
      entry(g, 0x0002, 5, 3L); p32(g + 8, latOff.toLong); g += 12
      entry(g, 0x0003, 2, 2L); tiff(g + 8) = (if (on) 'W' else 'E').toByte; g += 12
      entry(g, 0x0004, 5, 3L); p32(g + 8, lonOff.toLong); g += 12
      p32(g, 0)
      def rats(off: Int, d: Long, m: Long, s100: Long): Unit = {
        p32(off, d); p32(off + 4, 1L)
        p32(off + 8, m); p32(off + 12, 1L)
        p32(off + 16, s100); p32(off + 20, 100L)
      }
      rats(latOff, ad, am, as)
      rats(lonOff, od, om, os)
    }
    val dtb = dateTime.getBytes("US-ASCII")
    System.arraycopy(dtb, 0, tiff, dtOff, math.min(19, dtb.length)) // byte 20 stays NUL
    val payload = Array[Byte]('E', 'x', 'i', 'f', 0, 0) ++ tiff
    val len = payload.length + 2
    Array(0xff.toByte, 0xe1.toByte, ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++ payload
  }

  /** (id, bytes) for the GPS corpus — generated per-row on executors. */
  def gpsTable(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).map(i => (idOf(i), gpsBytesAt(i))).toDF("id", "bytes")
  }

  val GpsExportBase = "/tmp/graft_exif_pii"
  private val gpsExported = scala.collection.mutable.Set.empty[String]

  /** Oracle side-channel: the analytically-expected PII extraction plus
    * the post-strip invariants (GPS gone, geometry untouched).
    */
  def exportGpsExpected(spark: SparkSession, n: Int): String = synchronized {
    val path = s"$GpsExportBase/f_$n"
    if (!gpsExported.contains(path)) {
      import spark.implicits._
      (0 until n).map { i =>
        val (lat, lon, dt) = gpsExpected(i.toLong)
        val (w, h) = gpsExpectedDims(i.toLong)
        (idOf(i.toLong), lat, lon, dt, graft.media.HeaderSniff.NoGps, w, h)
      }.toDF("id", "gps_microlat", "gps_microlon", "exif_datetime",
          "strip_gps", "strip_w", "strip_h")
        .coalesce(1)
        .write.mode("overwrite").parquet(path)
      gpsExported += path
    }
    path
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
