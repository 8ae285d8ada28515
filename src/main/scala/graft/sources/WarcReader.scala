package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

/** WARC/1.0 ingestion — the Common Crawl front end of a web-scale
  * training-data pipeline (S-surface beyond the reference: the reference
  * crawler PRODUCES page corpora; a 100 TB pipeline also has to CONSUME
  * archived ones). Streams response records out of (optionally per-record
  * gzip-membered) WARC files:
  *
  *   - Parallelism unit = the FILE (Common Crawl segments, ~1 GB each;
  *     10^5 segments at the 100 TB design point): `binaryFiles` +
  *     `PortableDataStream`, so a file is an input split streamed through a
  *     bounded buffer — memory per task is O(one record), NOT O(file),
  *     regardless of segment size. No whole-file binary column.
  *   - Multi-member gzip is handled by java's GZIPInputStream (it resumes
  *     at each member header), which is exactly the Common Crawl layout:
  *     one member per record so consumers can range-request records.
  *   - Record framing is binary-safe: bodies are read by Content-Length,
  *     never by delimiter scanning, so payloads containing CRLF / 0x00 /
  *     arbitrary bytes survive (WarcSpec pins this).
  *   - Non-response records (warcinfo, request, metadata) are skipped by
  *     WARC-Type; a truncated tail record ends the file's iterator instead
  *     of failing the task (archived crawls contain truncated segments).
  *
  * Output: (warc_file, url, warc_date, status, mime, body BINARY).
  */
object WarcReader {

  final case class WarcRow(
      warc_file: String, url: String, warc_date: String, status: Int, mime: String,
      body: Array[Byte])

  def read(spark: SparkSession, pathGlob: String, minPartitions: Int = 0): DataFrame = {
    val parts = if (minPartitions > 0) minPartitions else spark.sparkContext.defaultParallelism
    val rdd = spark.sparkContext
      .binaryFiles(pathGlob, parts)
      .flatMap { case (file, pds) => records(file, pds.open()) }
    spark.createDataset(rdd)(Encoders.product[WarcRow]).toDF()
  }

  /** Batch split of an already-materialized WARC payload (the streaming
    * source's row shape). Same parser as [[records]].
    */
  def recordsFromBytes(file: String, bytes: Array[Byte]): Iterator[WarcRow] =
    records(file, new java.io.ByteArrayInputStream(bytes))

  /** STREAMING ingestion of a WARC landing directory (Structured
    * Streaming): new `.warc.gz` segments dropped into `pathGlob` flow
    * through checkpointed file-source offsets — each segment is consumed
    * exactly once across restarts, and `maxFilesPerTrigger` bounds a
    * micro-batch's intake (the S6 back-pressure shape applied to archive
    * ingestion). The binaryFile streaming source materializes one file per
    * row, so memory per task is O(segment) here — size landing segments
    * accordingly (a few hundred MB); the batch [[read]] path keeps the
    * O(record) PortableDataStream contract for arbitrarily large archives.
    */
  def readStream(spark: SparkSession, pathGlob: String, maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // file streaming sources require the schema up front (no inference pass)
    val binaryFileSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    val base = spark.readStream.format("binaryFile").schema(binaryFileSchema)
    val src = maxFilesPerTrigger.fold(base)(n => base.option("maxFilesPerTrigger", n))
    src.load(pathGlob)
      .select(org.apache.spark.sql.functions.col("path"),
        org.apache.spark.sql.functions.col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, c) => recordsFromBytes(p, c) }(Encoders.product[WarcRow])
      .toDF()
  }

  /** Stream records from one WARC (possibly .gz) input stream. */
  def records(file: String, rawIn: InputStream): Iterator[WarcRow] = {
    val buf = new BufferedInputStream(rawIn, 1 << 16)
    buf.mark(2)
    val m1 = buf.read(); val m2 = buf.read()
    buf.reset()
    val in: InputStream =
      if (m1 == 0x1f && m2 == 0x8b) new BufferedInputStream(new GZIPInputStream(buf, 1 << 16), 1 << 16)
      else buf

    new Iterator[WarcRow] {
      private var nextRow: WarcRow = null
      private var done = false

      private def advance(): Unit = {
        while (nextRow == null && !done) {
          try {
            val headers = readHeaderBlock(in) match {
              case None => done = true; in.close(); return
              case Some(h) => h
            }
            val len = headers.getOrElse("content-length", "0").trim.toInt
            val content = readN(in, len)
            consumeRecordGap(in)
            if (headers.getOrElse("warc-type", "") == "response" &&
                headers.getOrElse("content-type", "").startsWith("application/http")) {
              parseHttp(content).foreach { case (status, mime, body) =>
                nextRow = WarcRow(
                  file,
                  headers.getOrElse("warc-target-uri", ""),
                  headers.getOrElse("warc-date", ""),
                  status, mime, body)
              }
            }
          } catch {
            // truncated tail record (archived crawls contain them): stop
            case _: EOFException => done = true; in.close()
          }
        }
      }

      override def hasNext: Boolean = { advance(); nextRow != null }
      override def next(): WarcRow = {
        advance()
        if (nextRow == null) throw new NoSuchElementException("end of WARC")
        val r = nextRow; nextRow = null; r
      }
    }
  }

  /** Read one CRLF-terminated header line; None at clean EOF. */
  private def readLine(in: InputStream): Option[String] = {
    val sb = new java.io.ByteArrayOutputStream(128)
    var c = in.read()
    if (c < 0) return None
    while (c >= 0 && c != '\n') { sb.write(c); c = in.read() }
    val bytes = sb.toByteArray
    val n = if (bytes.nonEmpty && bytes.last == '\r') bytes.length - 1 else bytes.length
    Some(new String(bytes, 0, n, StandardCharsets.UTF_8))
  }

  /** Header block: "WARC/…" version line, then k: v lines to a blank line.
    * Leading blank lines (inter-record gaps) are tolerated. None at EOF.
    */
  private def readHeaderBlock(in: InputStream): Option[Map[String, String]] = {
    var first = readLine(in)
    while (first.exists(_.isEmpty)) first = readLine(in)
    first match {
      case None => None
      case Some(v) if !v.startsWith("WARC/") =>
        throw new EOFException(s"not a WARC record head: ${v.take(40)}")
      case Some(_) =>
        val m = Map.newBuilder[String, String]
        var line = readLine(in)
        while (line.exists(_.nonEmpty)) {
          val l = line.get
          val idx = l.indexOf(':')
          if (idx > 0) m += l.substring(0, idx).trim.toLowerCase -> l.substring(idx + 1).trim
          line = readLine(in)
        }
        if (line.isEmpty) throw new EOFException("EOF inside header block")
        Some(m.result())
    }
  }

  private def readN(in: InputStream, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(out, off, n - off)
      if (r < 0) throw new EOFException(s"EOF at $off/$n of record content")
      off += r
    }
    out
  }

  /** The two CRLFs that terminate every record (missing at a truncated
    * tail — tolerated).
    */
  private def consumeRecordGap(in: InputStream): Unit = {
    var i = 0
    while (i < 4) { if (in.read() < 0) return; i += 1 }
  }

  /** Split an application/http response block into (status, mime, body). */
  private def parseHttp(content: Array[Byte]): Option[(Int, String, Array[Byte])] = {
    // find header/body boundary: first CRLFCRLF
    var i = 0
    var boundary = -1
    while (boundary < 0 && i + 3 < content.length) {
      if (content(i) == '\r' && content(i + 1) == '\n' &&
          content(i + 2) == '\r' && content(i + 3) == '\n') boundary = i
      i += 1
    }
    if (boundary < 0) return None
    val head = new String(content, 0, boundary, StandardCharsets.UTF_8)
    val lines = head.split("\r\n")
    val statusLine = lines.headOption.getOrElse("")
    val status = statusLine.split(" ").lift(1).flatMap(_.toIntOption).getOrElse(-1)
    val mime = lines.iterator
      .drop(1)
      .map(_.split(":", 2))
      .collectFirst { case Array(k, v) if k.trim.equalsIgnoreCase("content-type") => v.trim.split(";")(0).trim }
      .getOrElse("")
    val body = java.util.Arrays.copyOfRange(content, boundary + 4, content.length)
    Some((status, mime, body))
  }
}
