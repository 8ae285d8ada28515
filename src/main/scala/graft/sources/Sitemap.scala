package graft.sources

import graft.canon.{EnqueueStrategy, UrlCanon}

import java.io.{ByteArrayInputStream, StringReader}
import java.time.Instant
import java.util.zip.GZIPInputStream
import javax.xml.parsers.SAXParserFactory
import org.xml.sax.helpers.DefaultHandler
import org.xml.sax.{Attributes, InputSource}

/** Sitemap parsing (SURVEY.md S3-S5), mirroring the reference
  * /root/reference/src/crawlee/_utils/sitemap.py:
  *   - XML urlset: loc / lastmod (ISO, 'Z' tolerated) / changefreq
  *     (validated against the protocol's enum) / priority (float)
  *   - XML sitemapindex: nested sitemap locs
  *   - TXT: one URL per line, blank lines skipped (:145-177)
  *   - gzip payloads inflated, 50 MB decompressed cap (:40-41)
  *   - nested recursion depth-capped at 10 (:46-47), dedup by URL,
  *     strategy-filtered (the loader, _sitemap_request_loader.py:353-446)
  *
  * The parse itself is a pure function String→items, used inside a
  * `flatMap` over the sitemap-document table (the Catalyst Generator shape);
  * recursion over nested sitemaps is a bounded driver loop of joins.
  */
object Sitemap {

  val ValidChangeFreqs: Set[String] =
    Set("always", "hourly", "daily", "weekly", "monthly", "yearly", "never")
  val MaxSitemapSize: Int = 50 * 1024 * 1024
  val DefaultMaxDepth = 10

  /** One `<image:image>` block of the Google image-sitemap extension
    * (https://www.google.com/schemas/sitemap-image/1.1 — beyond the
    * reference's URL-only parser; the image-frontier seed source for the
    * image+caption crawl: each block names an image payload URL and its
    * publisher-declared caption/title).
    */
  final case class SitemapImage(loc: String, caption: Option[String], title: Option[String])

  final case class SitemapUrl(
      loc: String,
      lastmod: Option[Instant],
      changefreq: Option[String],
      priority: Option[Double],
      originSitemapUrl: Option[String],
      images: Seq[SitemapImage] = Seq.empty
  )

  final case class ParseResult(urls: Seq[SitemapUrl], nestedSitemaps: Seq[String])

  /** Inflate gzip bytes with the 50 MB decompressed cap; pass-through
    * non-gzip payloads.
    */
  def inflate(bytes: Array[Byte]): String = {
    val isGzip = bytes.length > 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b
    if (!isGzip) new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    else {
      val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var total = 0
      var n = in.read(buf)
      while (n != -1 && total < MaxSitemapSize) {
        val take = math.min(n, MaxSitemapSize - total)
        out.write(buf, 0, take)
        total += take
        n = if (total < MaxSitemapSize) in.read(buf) else -1
      }
      new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    }
  }

  /** TXT sitemap: one URL per line (reference :145-177). */
  def parseTxt(content: String, origin: String = null): ParseResult =
    ParseResult(
      content.linesIterator.map(_.trim).filter(_.nonEmpty)
        .map(u => SitemapUrl(u, None, None, None, Option(origin))).toSeq,
      Seq.empty
    )

  /** XML sitemap (urlset or sitemapindex), SAX streaming. Malformed tails
    * are tolerated: items parsed before the error are kept (the reference's
    * chunked feed logs-and-keeps, sitemap.py:189-204).
    */
  def parseXml(content: String, origin: String = null): ParseResult = {
    val urls = scala.collection.mutable.ArrayBuffer.empty[SitemapUrl]
    val nested = scala.collection.mutable.ArrayBuffer.empty[String]

    val handler = new DefaultHandler {
      var rootTag: String = _
      var currentTag: String = _
      val buffer = new StringBuilder
      var loc: String = _
      var lastmod: Option[Instant] = None
      var changefreq: Option[String] = None
      var priority: Option[Double] = None
      val images = scala.collection.mutable.ArrayBuffer.empty[SitemapImage]
      var insideImage = false
      var imgLoc: String = _
      var imgCaption: Option[String] = None
      var imgTitle: Option[String] = None

      override def startElement(uri: String, localName: String, qName: String, attrs: Attributes): Unit = {
        if (rootTag == null && (qName == "urlset" || qName == "sitemapindex")) rootTag = qName
        if (qName == "image:image") {
          insideImage = true
          imgLoc = null; imgCaption = None; imgTitle = None
        }
        if (qName == "loc" || qName == "lastmod" || qName == "changefreq" || qName == "priority" ||
          (insideImage && (qName == "image:loc" || qName == "image:caption" || qName == "image:title"))) {
          currentTag = qName
          buffer.clear()
        }
      }

      override def characters(ch: Array[Char], start: Int, length: Int): Unit =
        if (currentTag != null) buffer.appendAll(ch, start, length)

      override def endElement(uri: String, localName: String, qName: String): Unit = {
        if (qName == currentTag) {
          val text = buffer.toString.trim
          qName match {
            case "loc" =>
              if (rootTag == "sitemapindex") { if (text.nonEmpty) nested += text }
              else if (text.nonEmpty) loc = text
            case "lastmod" if text.nonEmpty =>
              lastmod =
                try Some(Instant.parse(if (text.endsWith("Z") || text.contains("+")) text else text + "T00:00:00Z"))
                catch {
                  case _: Exception =>
                    try Some(java.time.OffsetDateTime.parse(text).toInstant)
                    catch {
                      case _: Exception =>
                        try Some(java.time.LocalDate.parse(text).atStartOfDay(java.time.ZoneOffset.UTC).toInstant)
                        catch { case _: Exception => None }
                    }
                }
            case "priority" if text.nonEmpty =>
              priority = try Some(text.toDouble) catch { case _: Exception => None }
            case "changefreq" if ValidChangeFreqs.contains(text) =>
              changefreq = Some(text)
            case "image:loc" if text.nonEmpty => imgLoc = text
            case "image:caption" if text.nonEmpty => imgCaption = Some(text)
            case "image:title" if text.nonEmpty => imgTitle = Some(text)
            case _ =>
          }
          currentTag = null
        }
        if (qName == "image:image") {
          if (imgLoc != null) images += SitemapImage(imgLoc, imgCaption, imgTitle)
          insideImage = false
        }
        if (qName == "url") {
          if (loc != null)
            urls += SitemapUrl(loc, lastmod, changefreq, priority, Option(origin), images.toSeq)
          loc = null; lastmod = None; changefreq = None; priority = None
          images.clear()
        }
      }
    }

    try {
      val factory = SAXParserFactory.newInstance()
      factory.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
      val parser = factory.newSAXParser()
      parser.parse(new InputSource(new StringReader(content)), handler)
    } catch {
      case _: Exception => // keep what was parsed before the malformed tail
    }
    ParseResult(urls.toSeq, nested.toSeq)
  }

  /** Content-type / extension dispatch (reference _get_parser, :223-231):
    * `.gz` stripped before classifying, text/plain or `.txt` → TXT parser.
    */
  def parse(content: String, contentType: String = "", url: String = null): ParseResult = {
    val path = if (url == null) "" else UrlCanon.parse(url).path.stripSuffix(".gz")
    if (contentType.toLowerCase.contains("text/plain") || path.endsWith(".txt"))
      parseTxt(content, url)
    else parseXml(content, url)
  }

  /** Depth-bounded nested-sitemap expansion (S5): `fetch` resolves a sitemap
    * URL to its (contentType, bytes); visited URLs are deduped; URLs are
    * strategy-filtered relative to their sitemap's origin.
    */
  def loadRecursive(
      roots: Seq[String],
      fetch: String => Option[(String, Array[Byte])],
      strategy: String = EnqueueStrategy.All,
      maxDepth: Int = DefaultMaxDepth
  ): Seq[SitemapUrl] = {
    val visited = scala.collection.mutable.HashSet.empty[String]
    val seenUrls = scala.collection.mutable.HashSet.empty[String]
    val out = scala.collection.mutable.ArrayBuffer.empty[SitemapUrl]
    var frontier = roots.distinct
    var depth = 0
    while (frontier.nonEmpty && depth <= maxDepth) {
      val next = scala.collection.mutable.ArrayBuffer.empty[String]
      frontier.foreach { sm =>
        if (visited.add(sm)) {
          fetch(sm).foreach { case (ct, bytes) =>
            val result = parse(inflate(bytes), ct, sm)
            result.urls.foreach { u =>
              if (EnqueueStrategy.filterUrl(u.loc, strategy, sm)._1 && seenUrls.add(u.loc)) out += u
            }
            result.nestedSitemaps.foreach { n =>
              if (EnqueueStrategy.filterUrl(n, strategy, sm)._1 && !visited.contains(n)) next += n
            }
          }
        }
      }
      frontier = next.toSeq.distinct
      depth += 1
    }
    out.toSeq
  }
}
