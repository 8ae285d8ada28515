package graft.fixtures

import graft.canon.Hashing

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPOutputStream

/** Deterministic WARC/1.0 fixture (the Common-Crawl container shape): one
  * warcinfo record followed by response records wrapping the HtmlDocs
  * corpus, optionally with each record as its OWN GZIP MEMBER concatenated
  * into a `.warc.gz` — the layout Common Crawl ships and the detail readers
  * must actually handle (a single-member reader silently truncates after
  * record one). Pure function of the record index.
  */
object Warc {

  def urlOf(i: Long): String = s"https://w${i % 7}.example.org/doc/$i"

  def dateOf(i: Long): String = f"2026-01-${(i % 27) + 1}%02dT${i % 24}%02d:00:00Z"

  def statusOf(i: Long): Int = if (i % 13 == 0) 404 else 200

  def mimeOf(i: Long): String = if (i % 11 == 0) "text/plain" else "text/html"

  /** Response body: the deterministic HtmlDocs HTML (or a short plain-text
    * body for the text/plain and 404 rows). Index 5 embeds RAW BINARY bytes
    * (0x00, 0xFF, CRLF) to pin binary-safe Content-Length framing.
    */
  def bodyOf(i: Long): Array[Byte] =
    if (i == 5) Array[Byte](0x00, -1, 0x0d, 0x0a, 0x0d, 0x0a, 0x42, 0x00, 0x7f)
    else if (statusOf(i) == 404) s"not found: $i".getBytes(StandardCharsets.UTF_8)
    else if (mimeOf(i) == "text/plain") s"plain text doc $i ${Hashing.xxh64(s"t$i")}".getBytes(StandardCharsets.UTF_8)
    else HtmlDocs.serialize(HtmlDocs.docTree(i)).getBytes(StandardCharsets.UTF_8)

  private def crlf(sb: StringBuilder, s: String): Unit = { sb.append(s); sb.append("\r\n") }

  /** One WARC response record (headers + HTTP block), uncompressed. */
  def responseRecord(i: Long): Array[Byte] = {
    val body = bodyOf(i)
    val http = new StringBuilder
    crlf(http, s"HTTP/1.1 ${statusOf(i)} ${if (statusOf(i) == 200) "OK" else "Not Found"}")
    crlf(http, s"Content-Type: ${mimeOf(i)}")
    crlf(http, s"Content-Length: ${body.length}")
    crlf(http, "")
    val httpHead = http.toString.getBytes(StandardCharsets.UTF_8)
    val contentLen = httpHead.length + body.length

    val h = new StringBuilder
    crlf(h, "WARC/1.0")
    crlf(h, "WARC-Type: response")
    crlf(h, s"WARC-Record-ID: <urn:uuid:${Hashing.sha256Hex(s"rec$i".getBytes(StandardCharsets.UTF_8)).substring(0, 32)}>")
    crlf(h, s"WARC-Target-URI: ${urlOf(i)}")
    crlf(h, s"WARC-Date: ${dateOf(i)}")
    crlf(h, "Content-Type: application/http; msgtype=response")
    crlf(h, s"Content-Length: $contentLen")
    crlf(h, "")
    val out = new ByteArrayOutputStream()
    out.write(h.toString.getBytes(StandardCharsets.UTF_8))
    out.write(httpHead)
    out.write(body)
    out.write("\r\n\r\n".getBytes(StandardCharsets.UTF_8))
    out.toByteArray
  }

  /** The leading warcinfo record readers must SKIP. */
  def warcinfoRecord(fileTag: String): Array[Byte] = {
    val body = s"software: graft-fixture\r\nisPartOf: $fileTag\r\n".getBytes(StandardCharsets.UTF_8)
    val h = new StringBuilder
    crlf(h, "WARC/1.0")
    crlf(h, "WARC-Type: warcinfo")
    crlf(h, s"WARC-Record-ID: <urn:uuid:${Hashing.sha256Hex(s"info$fileTag".getBytes(StandardCharsets.UTF_8)).substring(0, 32)}>")
    crlf(h, "Content-Type: application/warc-fields")
    crlf(h, s"Content-Length: ${body.length}")
    crlf(h, "")
    val out = new ByteArrayOutputStream()
    out.write(h.toString.getBytes(StandardCharsets.UTF_8))
    out.write(body)
    out.write("\r\n\r\n".getBytes(StandardCharsets.UTF_8))
    out.toByteArray
  }

  private def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(out)
    gz.write(bytes)
    gz.finish()
    gz.close()
    out.toByteArray
  }

  /** Assemble a WARC file over record ids [from, until): warcinfo +
    * responses; `gzipPerRecord` concatenates one gzip member per record
    * (the Common Crawl layout).
    */
  def fileBytes(fileTag: String, from: Long, until: Long, gzipPerRecord: Boolean): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val records = warcinfoRecord(fileTag) +: (from until until).map(responseRecord)
    records.foreach(r => out.write(if (gzipPerRecord) gzipMember(r) else r))
    out.toByteArray
  }

  /** Write a deterministic multi-file corpus + export expected per-record
    * facts for the oracle (body length + sha256 over the EXACT payload
    * bytes). Returns (filesDir, exportPath).
    */
  val Base = "/tmp/graft_warc"
  private val written = scala.collection.mutable.Set.empty[String]

  def writeCorpus(spark: org.apache.spark.sql.SparkSession, files: Int, perFile: Int): (String, String) =
    synchronized {
      val filesDir = s"$Base/files_${files}_$perFile"
      val export = s"$Base/expected_${files}_$perFile"
      if (!written.contains(filesDir)) {
        val dir = java.nio.file.Paths.get(filesDir)
        java.nio.file.Files.createDirectories(dir)
        (0 until files).foreach { f =>
          val bytes = fileBytes(s"seg-$f", f.toLong * perFile, (f.toLong + 1) * perFile, gzipPerRecord = true)
          java.nio.file.Files.write(dir.resolve(f"seg-$f%05d.warc.gz"), bytes)
        }
        import spark.implicits._
        (0L until files.toLong * perFile).map { i =>
          val body = bodyOf(i)
          (urlOf(i), dateOf(i), statusOf(i), mimeOf(i), body.length.toLong,
            Hashing.sha256Hex(body))
        }.toDF("url", "warc_date", "status", "mime", "body_len", "body_sha")
          .coalesce(1)
          .write.mode("overwrite").parquet(export)
        written += filesDir
      }
      (filesDir, export)
    }
}
