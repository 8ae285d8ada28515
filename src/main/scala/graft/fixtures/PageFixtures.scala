package graft.fixtures

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Plan-generated fixtures for the page-metadata, image-reference, and
  * charset-detection oracles. Same independence pattern as BoilerDocs:
  * the plan constructs the markup/bytes AND the expected facts; the engine
  * recovers the facts by parsing the serialized artifact.
  */
object PageFixtures {

  // ---- page meta + image refs ----------------------------------------------

  final case class PagePlan(
      html: String,
      meta: Seq[(String, String, String)], // (kind, key, value) in doc order
      refs: Seq[(Int, String, String, String)]) // (img_idx, url, descriptor, alt)

  private val Topics = Vector("crawl", "frontier", "dedup", "parquet", "shuffle", "index")
  private val Alts = Vector("a red tile", "sine waves", "hash mosaic", "") // empty alt happens

  def pagePlanOf(docId: Long): PagePlan = {
    val rnd = new Random(docId * 0x9e3779b97f4a7c15L + 101)
    val topic = Topics(rnd.nextInt(Topics.length))
    val meta = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]

    def m(key: String, value: String, prop: Boolean = false): String = {
      meta += (("meta", key, value))
      val attr = if (prop) "property" else "name"
      s"""<meta $attr="$key" content="$value">"""
    }
    def lk(rel: String, href: String): String = {
      meta += (("link", rel, href))
      s"""<link rel="$rel" href="$href">"""
    }

    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    if (rnd.nextInt(2) == 0) { meta += (("meta", "charset", "utf-8")); parts += """<meta charset="utf-8">""" }
    val title = s"$topic page $docId"
    parts += s"<title>$title</title>"
    meta += (("title", "title", title))
    parts += m("description", s"all about $topic number $docId")
    if (rnd.nextInt(3) == 0) parts += m("robots", if (rnd.nextBoolean()) "noindex" else "noindex, nofollow")
    parts += m("og:title", s"OG $topic", prop = true)
    parts += m("og:image", s"/img/$topic-$docId.jpg", prop = true)
    parts += lk("canonical", s"https://example.com/$topic/$docId")
    if (rnd.nextInt(2) == 0) parts += lk("icon", "/favicon.ico")

    // body: imgs with src and sometimes srcset; one <picture> sometimes
    val refs = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String)]
    val body = scala.collection.mutable.ArrayBuffer.empty[String]
    var imgIdx = 0
    val nImgs = 1 + rnd.nextInt(3)
    (0 until nImgs).foreach { _ =>
      val base = s"/i/$topic-$imgIdx"
      val alt = Alts(rnd.nextInt(Alts.length))
      if (rnd.nextInt(2) == 0) {
        refs += ((imgIdx, s"$base.jpg", "1x", alt))
        refs += ((imgIdx, s"$base.jpg", "1x", alt)) // src + srcset 1x candidate
        refs += ((imgIdx, s"$base@2x.jpg", "2x", alt))
        body += s"""<p>fig <img src="$base.jpg" srcset="$base.jpg 1x, $base@2x.jpg 2x" alt="$alt"></p>"""
      } else {
        refs += ((imgIdx, s"$base.png", "1x", alt))
        body += s"""<p>fig <img alt="$alt" src="$base.png"></p>"""
      }
      imgIdx += 1
    }
    if (rnd.nextInt(3) == 0) {
      val base = s"/i/$topic-pic"
      refs += ((imgIdx, s"$base-800.webp", "800w", ""))
      refs += ((imgIdx, s"$base-1600.webp", "1600w", ""))
      body += s"""<picture><source srcset="$base-800.webp 800w, $base-1600.webp 1600w"></picture>"""
      imgIdx += 1
    }

    val html = "<html><head>\n" + parts.mkString("\n") +
      s"\n</head><body>\n<p>$topic body text</p>\n" + body.mkString("\n") + "\n</body></html>"
    PagePlan(html, meta.toSeq, refs.toSeq)
  }

  // ---- charset payloads -----------------------------------------------------

  /** (bytes, charset, source) per the CharsetSniff three-tier rule — the
    * payload is CONSTRUCTED to exercise exactly one tier.
    */
  def charsetCaseOf(i: Long): (Array[Byte], String, String) = (i % 7) match {
    case 0 =>
      (Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
        s"<html>bom utf8 $i</html>".getBytes("UTF-8"), "utf-8", "bom")
    case 1 =>
      (Array[Byte](0xff.toByte, 0xfe.toByte) ++
        s"<html>$i</html>".getBytes("UTF-16LE"), "utf-16le", "bom")
    case 2 =>
      (s"""<html><head><meta charset="ISO-8859-1"></head><body>doc $i</body></html>"""
        .getBytes("US-ASCII"), "iso-8859-1", "declared")
    case 3 =>
      (s"""<html><head><meta http-equiv="Content-Type" content="text/html; charset=Windows-1251"></head>doc $i"""
        .getBytes("US-ASCII"), "windows-1251", "declared")
    case 4 =>
      (s"<html><body>plain ascii doc $i</body></html>".getBytes("US-ASCII"), "us-ascii", "ascii")
    case 5 =>
      (s"<html><body>café naïve $i</body></html>".getBytes("UTF-8"), "utf-8", "utf8")
    case _ =>
      // lone 0xE9 (latin-1 é) makes the UTF-8 validation fail -> web default
      (s"<html><body>caf".getBytes("US-ASCII") ++ Array(0xe9.toByte) ++
        s" $i</body></html>".getBytes("US-ASCII"), "windows-1252", "fallback")
  }

  // ---- tables + exports -----------------------------------------------------

  def idOf(i: Long): String = f"pf-$i%06d"

  def pagesTable(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).map(i => (idOf(i), pagePlanOf(i).html)).toDF("doc_id", "html")
  }

  def charsetTable(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).map(i => (idOf(i), charsetCaseOf(i)._1)).toDF("id", "bytes")
  }

  val ExportBase = "/tmp/graft_page_fixtures"
  private val exported = scala.collection.mutable.Set.empty[String]

  def export(spark: SparkSession, n: Int): String = synchronized {
    val base = s"$ExportBase/$n"
    if (!exported.contains(base)) {
      import spark.implicits._
      val plans = (0 until n).map(i => i.toLong -> pagePlanOf(i.toLong))
      plans.flatMap { case (id, p) =>
        p.meta.zipWithIndex.map { case ((kind, key, value), mi) => (idOf(id), mi, kind, key, value) }
      }.toDF("doc_id", "meta_idx", "kind", "key", "value")
        .coalesce(1).write.mode("overwrite").parquet(s"$base/meta")
      plans.flatMap { case (id, p) =>
        p.refs.zipWithIndex.map { case ((imgIdx, url, d, alt), ri) => (idOf(id), ri, imgIdx, url, d, alt) }
      }.toDF("doc_id", "ref_idx", "img_idx", "url", "descriptor", "alt")
        .coalesce(1).write.mode("overwrite").parquet(s"$base/refs")
      (0 until n).map { i =>
        val (_, cs, src) = charsetCaseOf(i.toLong)
        (idOf(i.toLong), cs, src)
      }.toDF("id", "charset", "source")
        .coalesce(1).write.mode("overwrite").parquet(s"$base/charset")
      exported += base
    }
    base
  }
}
