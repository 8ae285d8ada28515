package graft.fixtures

import scala.collection.mutable
import scala.util.Random

/** Deterministic synthetic HTML corpus for the html_to_text oracle
  * (VERDICT r3 next-round #1).
  *
  * Each doc is a random document TREE (seeded by doc id); the fixture
  * serializes it to messy-but-escaped HTML (attributes, comments, raw-text
  * script/style bodies, entities, self-closing tags) AND computes the
  * expected plain text by walking the TREE with the reference rules
  * (_parsel/_utils.py:16-76). The engine side must recover the same text
  * by PARSING the serialized string — generator and extractor share no
  * code path, so the exported `expected` column is an independent oracle
  * (same trick as the LSH plane / IVF centroid exports).
  */
object HtmlDocs {

  sealed trait GNode
  final case class GText(s: String) extends GNode
  final case class GElem(tag: String, attrs: Seq[(String, String)], children: Seq[GNode]) extends GNode
  final case class GComment(s: String) extends GNode

  private val BlockPool = Vector("p", "div", "h1", "h2", "h3", "ul", "li", "blockquote", "table", "tr")
  private val InlinePool = Vector("span", "b", "i", "em", "strong", "a", "code")
  private val SkipPool = Vector("script", "style", "title", "svg", "noscript")
  private val Words = Vector(
    "lorem", "ipsum", "dolor", "sit", "amet", "web", "crawl", "frontier", "page", "index",
    "data", "pipeline", "tokens&more", "a<b", "x>y", "it's", "\"quoted\"", "tail")

  // ---- generation ----------------------------------------------------------

  def docTree(docId: Long): Seq[GNode] = {
    val rnd = new Random(docId * 0x9e3779b97f4a7c15L + 17)
    Seq(GElem("html", Nil, Seq(
      GElem("head", Nil, Seq(
        GElem("title", Nil, Seq(GText("skip me " + docId))),
        GElem("style", Nil, Seq(GText("body { color: red; } /* a > b */"))))),
      GElem("body", Seq("class" -> s"doc doc-$docId"), genChildren(rnd, depth = 0)))))
  }

  private def genText(rnd: Random): GText = {
    val n = 1 + rnd.nextInt(6)
    val sb = new StringBuilder
    (0 until n).foreach { i =>
      if (i > 0) sb.append(rnd.nextInt(4) match {
        case 0 => " "
        case 1 => "  "
        case 2 => "\n  "
        case _ => "\t"
      })
      sb.append(Words(rnd.nextInt(Words.length)))
    }
    if (rnd.nextInt(3) == 0) sb.insert(0, " ")
    if (rnd.nextInt(3) == 0) sb.append("\n")
    GText(sb.toString)
  }

  private def genChildren(rnd: Random, depth: Int): Seq[GNode] = {
    val n = 1 + rnd.nextInt(5)
    (0 until n).map { _ =>
      rnd.nextInt(12) match {
        case 0 | 1 | 2 | 3 => genText(rnd)
        case 4 | 5 if depth < 4 =>
          GElem(BlockPool(rnd.nextInt(BlockPool.length)),
            if (rnd.nextBoolean()) Seq("id" -> s"e${rnd.nextInt(1000)}") else Nil,
            genChildren(rnd, depth + 1))
        case 6 | 7 if depth < 4 =>
          val tag = InlinePool(rnd.nextInt(InlinePool.length))
          val attrs = if (tag == "a") Seq("href" -> s"/p/${rnd.nextInt(100)}?a=1&b=2") else Nil
          GElem(tag, attrs, genChildren(rnd, depth + 1))
        case 8 => GElem("br", Nil, Nil)
        case 9 if depth < 3 =>
          GElem("td", Nil, Seq(genText(rnd)))
        case 10 =>
          rnd.nextInt(3) match {
            case 0 => GElem(SkipPool(rnd.nextInt(SkipPool.length)), Nil,
              Seq(GText("if (a < b && c > d) { hide(); }")))
            case 1 => GComment(s"comment ${rnd.nextInt(100)} with <tags> & stuff")
            case _ => GElem("pre", Nil, Seq(GText("  raw   text\n\twith   runs " + rnd.nextInt(10))))
          }
        case _ => genText(rnd)
      }
    }
  }

  // ---- serialization (escaped, messy-but-valid markup) ---------------------

  private def escText(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
  private def escAttr(s: String): String =
    escText(s).replace("\"", "&quot;")

  private val VoidTags = Set("br", "hr", "img", "meta", "link", "input")
  private val RawTags = Set("script", "style", "title")

  def serialize(nodes: Seq[GNode]): String = {
    val sb = new StringBuilder
    def ser(n: GNode): Unit = n match {
      case GComment(s) => sb.append("<!-- ").append(s).append(" -->")
      case GText(s) => sb.append(escText(s))
      case GElem(tag, attrs, children) =>
        sb.append('<').append(tag)
        attrs.foreach { case (k, v) => sb.append(' ').append(k).append("=\"").append(escAttr(v)).append('"') }
        if (VoidTags.contains(tag) && children.isEmpty) sb.append("/>")
        else {
          sb.append('>')
          if (RawTags.contains(tag)) // raw-text elements keep content verbatim
            children.foreach { case GText(s) => sb.append(s); case other => ser(other) }
          else children.foreach(ser)
          sb.append("</").append(tag).append('>')
        }
    }
    nodes.foreach(ser)
    sb.toString
  }

  // ---- expected text (independent walker over the TREE) --------------------

  private val SkipTags = Set("script", "style", "canvas", "svg", "noscript", "title")
  private val BlockTags = Set(
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "ol", "ul", "li", "pre", "address",
    "blockquote", "dl", "div", "fieldset", "form", "table", "tr", "select", "option")

  def expectedText(nodes: Seq[GNode]): String = {
    val out = new StringBuilder
    def wsEnd: Boolean = out.isEmpty || Character.isWhitespace(out.charAt(out.length - 1))
    def nlEnd: Boolean = out.isEmpty || out.charAt(out.length - 1) == '\n'
    def emit(nodes: Seq[GNode], parentPre: Boolean): Unit = nodes.foreach {
      case GComment(_) => ()
      case GText(raw) =>
        var t =
          if (parentPre) raw
          else raw.split("\\s+", -1).mkString(" ") match {
            // split removes the info of leading/trailing runs collapsing to
            // one char — rebuild: any leading/trailing ws run becomes " "
            case s => s
          }
        if (t.nonEmpty && (t.charAt(0) == ' ' || t.charAt(0) == '\n') && wsEnd) t = t.substring(1)
        out.append(t)
      case GElem(tag, _, children) =>
        if (SkipTags.contains(tag)) ()
        else if (tag == "br") out.append('\n')
        else if (tag == "td") { emit(children, parentPre = false); out.append('\t') }
        else {
          val block = BlockTags.contains(tag)
          if (block && !nlEnd) out.append('\n')
          emit(children, parentPre = tag == "pre")
          if (block && !(out.nonEmpty && out.charAt(out.length - 1) == '\n')) out.append('\n')
        }
    }
    emit(nodes, parentPre = false)
    out.toString.trim
  }

  def htmlOf(docId: Long): String = serialize(docTree(docId))
  def expectedOf(docId: Long): String = expectedText(docTree(docId))

  // ---- parquet export (oracle side channel) --------------------------------

  val ExportBase = "/tmp/graft_html_docs"
  private val exported = mutable.Set.empty[String]

  /** Export (doc_id, html, expected) for docs 0..n-1; idempotent per JVM. */
  def export(spark: org.apache.spark.sql.SparkSession, n: Int): String = synchronized {
    val path = s"$ExportBase/docs_$n"
    if (!exported.contains(path)) {
      import spark.implicits._
      (0 until n).map(i => (i.toLong, htmlOf(i.toLong), expectedOf(i.toLong)))
        .toDF("doc_id", "html", "expected")
        .coalesce(1)
        .write.mode("overwrite").parquet(path)
      exported += path
    }
    path
  }
}
