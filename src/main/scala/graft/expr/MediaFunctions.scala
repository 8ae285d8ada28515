package graft.expr

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.sql.{Column, SparkSession}

/** Decode-free media header sniffing as native codegen'd expressions over
  * the raw `binary` column (graft.media.HeaderSniff): format, pixel
  * dimensions, WAV PCM geometry — each one static call per row inside
  * whole-stage codegen, no Scala UDF serialization, no decoder allocation
  * (the HtmlToTextExpr pattern). This is the metadata fast path a 100 TB
  * media pass runs INSTEAD of `Multimodal.imageFeatures`' full decode when
  * it only needs dimensions/format for filtering and routing.
  */
case class MediaFormatExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "media_format"
  override protected def nullSafeEval(input: Any): Any =
    graft.media.HeaderSniff.formatUTF8(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.media.HeaderSniff.formatUTF8($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** charset_of(bytes) / charset_source(bytes): the three-tier charset
  * detection (graft.media.CharsetSniff) as native codegen calls — BOM,
  * declared `charset=`, UTF-8 validation sniff.
  */
case class CharsetExpr(child: Expression, wantSource: Boolean) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = if (wantSource) "charset_source" else "charset_of"
  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (wantSource) graft.media.CharsetSniff.sourceUTF8(b)
    else graft.media.CharsetSniff.detectUTF8(b)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (wantSource) "sourceUTF8" else "detectUTF8"
    defineCodeGen(ctx, ev, c => s"graft.media.CharsetSniff.$m($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One class per HeaderSniff int field; `method` names the static helper
  * (validated at construction so codegen can splice it verbatim).
  */
case class MediaSniffIntExpr(child: Expression, method: String) extends UnaryExpression {
  require(MediaSniffIntExpr.Methods.contains(method), s"unknown sniff field: $method")
  override def dataType: DataType = IntegerType
  override def prettyName: String = s"media_$method"
  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    method match {
      case "width"         => graft.media.HeaderSniff.width(b)
      case "height"        => graft.media.HeaderSniff.height(b)
      case "sampleRate"    => graft.media.HeaderSniff.sampleRate(b)
      case "channels"      => graft.media.HeaderSniff.channels(b)
      case "bitsPerSample" => graft.media.HeaderSniff.bitsPerSample(b)
      case "audioFrames"   => graft.media.HeaderSniff.audioFrames(b)
      case "exifOrientation" => graft.media.HeaderSniff.exifOrientation(b)
      case "jpegProgressive" => graft.media.HeaderSniff.jpegProgressive(b)
      case "gifFrames"       => graft.media.HeaderSniff.gifFrames(b)
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.media.HeaderSniff.$method($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MediaSniffIntExpr {
  val Methods: Set[String] =
    Set("width", "height", "sampleRate", "channels", "bitsPerSample", "audioFrames",
      "exifOrientation", "jpegProgressive", "gifFrames")
}

/** exif_gps_microlat / exif_gps_microlon: Exif GPS IFD coordinates as
  * signed micro-degrees (HeaderSniff.NoGps = Long.MinValue sentinel when
  * absent) — the decode-free image-PII gate.
  */
case class ExifGpsExpr(child: Expression, wantLon: Boolean) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = if (wantLon) "exif_gps_microlon" else "exif_gps_microlat"
  override protected def nullSafeEval(input: Any): Any =
    graft.media.HeaderSniff.exifGpsMicro(input.asInstanceOf[Array[Byte]], wantLon)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.media.HeaderSniff.exifGpsMicro($c, $wantLon)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** exif_datetime(bytes): IFD0 DateTime string, "" when absent. */
case class ExifDateTimeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "exif_datetime"
  override protected def nullSafeEval(input: Any): Any =
    graft.media.HeaderSniff.exifDateTime(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.media.HeaderSniff.exifDateTime($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** exif_strip(bytes): the JPEG with every Exif APP1 segment spliced out —
  * pixels and all other segments byte-identical (no re-encode). The PII
  * scrub runs as one static call per row inside whole-stage codegen; at
  * 100 TB the cost is the memcpy, not a decode.
  */
case class ExifStripExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "exif_strip"
  override protected def nullSafeEval(input: Any): Any =
    graft.media.HeaderSniff.exifStrip(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.media.HeaderSniff.exifStrip($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MediaFunctions {

  import org.apache.spark.sql.functions.call_function

  def mediaFormat(bytes: Column): Column = call_function("media_format", bytes)
  def mediaWidth(bytes: Column): Column = call_function("media_width", bytes)
  def mediaHeight(bytes: Column): Column = call_function("media_height", bytes)
  def wavSampleRate(bytes: Column): Column = call_function("wav_sample_rate", bytes)
  def wavChannels(bytes: Column): Column = call_function("wav_channels", bytes)
  def wavBits(bytes: Column): Column = call_function("wav_bits", bytes)
  def wavFrames(bytes: Column): Column = call_function("wav_frames", bytes)
  def exifOrientation(bytes: Column): Column = call_function("exif_orientation", bytes)
  def jpegProgressive(bytes: Column): Column = call_function("jpeg_progressive", bytes)
  def gifFrames(bytes: Column): Column = call_function("gif_frames", bytes)
  def charsetOf(bytes: Column): Column = call_function("charset_of", bytes)
  def charsetSource(bytes: Column): Column = call_function("charset_source", bytes)
  def exifGpsMicroLat(bytes: Column): Column = call_function("exif_gps_microlat", bytes)
  def exifGpsMicroLon(bytes: Column): Column = call_function("exif_gps_microlon", bytes)
  def exifDateTime(bytes: Column): Column = call_function("exif_datetime", bytes)
  def exifStrip(bytes: Column): Column = call_function("exif_strip", bytes)

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "media_format", exprs => MediaFormatExpr(exprs(0)), "scala_udf")
    Seq(
      "media_width" -> "width",
      "media_height" -> "height",
      "wav_sample_rate" -> "sampleRate",
      "wav_channels" -> "channels",
      "wav_bits" -> "bitsPerSample",
      "wav_frames" -> "audioFrames",
      "exif_orientation" -> "exifOrientation",
      "jpeg_progressive" -> "jpegProgressive",
      "gif_frames" -> "gifFrames"
    ).foreach { case (name, method) =>
      reg.createOrReplaceTempFunction(
        name, exprs => MediaSniffIntExpr(exprs(0), method), "scala_udf")
    }
    reg.createOrReplaceTempFunction(
      "charset_of", exprs => CharsetExpr(exprs(0), wantSource = false), "scala_udf")
    reg.createOrReplaceTempFunction(
      "charset_source", exprs => CharsetExpr(exprs(0), wantSource = true), "scala_udf")
    reg.createOrReplaceTempFunction(
      "exif_gps_microlat", exprs => ExifGpsExpr(exprs(0), wantLon = false), "scala_udf")
    reg.createOrReplaceTempFunction(
      "exif_gps_microlon", exprs => ExifGpsExpr(exprs(0), wantLon = true), "scala_udf")
    reg.createOrReplaceTempFunction(
      "exif_datetime", exprs => ExifDateTimeExpr(exprs(0)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "exif_strip", exprs => ExifStripExpr(exprs(0)), "scala_udf")
  }
}
