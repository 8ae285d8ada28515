package graft.text

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Anchor-text extraction: every `<a href=...>` with its visible text — the
  * classic link-graph training signal (anchor-text corpora describe the
  * TARGET page; reference link extraction keeps only the URL,
  * _abstract_http_crawler.py:185-266, so this is the ranking-side
  * complement). Rides the same lenient parser as [[HtmlToText]]; the href
  * comes from the element's raw attribute span, parsed quote-aware and
  * entity-decoded, the text from the subtree with the block walker's
  * whitespace rules.
  */
object Anchors {

  final case class Anchor(idx: Int, href: String, text: String)

  /** Parse one attribute value out of a raw attribute span: name match is
    * case-insensitive and word-exact; values may be double-quoted,
    * single-quoted, or bare; entities decode. Null when absent.
    */
  def attrValue(attrs: String, name: String): String = {
    val n = attrs.length
    var i = 0
    while (i < n) {
      // skip whitespace and stray '/'
      while (i < n && (Character.isWhitespace(attrs.charAt(i)) || attrs.charAt(i) == '/')) i += 1
      if (i >= n) return null
      val start = i
      while (i < n && !Character.isWhitespace(attrs.charAt(i)) &&
        attrs.charAt(i) != '=' && attrs.charAt(i) != '/') i += 1
      val key = attrs.substring(start, i)
      while (i < n && Character.isWhitespace(attrs.charAt(i))) i += 1
      var value: String = null
      if (i < n && attrs.charAt(i) == '=') {
        i += 1
        while (i < n && Character.isWhitespace(attrs.charAt(i))) i += 1
        if (i < n && (attrs.charAt(i) == '"' || attrs.charAt(i) == '\'')) {
          val q = attrs.charAt(i)
          i += 1
          val vs = i
          while (i < n && attrs.charAt(i) != q) i += 1
          value = attrs.substring(vs, i)
          if (i < n) i += 1
        } else {
          val vs = i
          while (i < n && !Character.isWhitespace(attrs.charAt(i))) i += 1
          value = attrs.substring(vs, i)
        }
      }
      if (key.equalsIgnoreCase(name)) return if (value == null) null else HtmlToText.decodeEntities(value)
    }
    null
  }

  /** All anchors in document order. Anchors without an href are skipped
    * (they are targets, not links); nested anchors (invalid HTML) each
    * report their own subtree text.
    */
  def extract(html: String): Seq[Anchor] = {
    if (html == null) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[Anchor]

    def textOf(nodes: scala.collection.Seq[HtmlToText.Node], sb: StringBuilder): Unit =
      nodes.foreach {
        case HtmlToText.Text(t) =>
          var i = 0
          while (i < t.length) {
            val c = t.charAt(i)
            if (Character.isWhitespace(c)) {
              if (sb.nonEmpty && sb.charAt(sb.length - 1) != ' ') sb.append(' ')
            } else sb.append(c)
            i += 1
          }
        case HtmlToText.Elem(tag, children, _) =>
          if (!HtmlToText.SkipTags.contains(tag)) textOf(children, sb)
      }

    def walk(nodes: scala.collection.Seq[HtmlToText.Node]): Unit =
      nodes.foreach {
        case HtmlToText.Text(_) => ()
        case HtmlToText.Elem(tag, children, attrs) =>
          if (HtmlToText.SkipTags.contains(tag)) ()
          else {
            if (tag == "a") {
              val href = attrValue(attrs, "href")
              if (href != null) {
                val sb = new StringBuilder
                textOf(children, sb)
                out += Anchor(out.length, href, sb.toString.trim)
              }
            }
            walk(children)
          }
      }

    walk(HtmlToText.parse(html))
    out.toSeq
  }

  /** Codegen entry: anchors as ArrayData of (idx, href, text) rows. */
  def anchorsArrayData(html: UTF8String): ArrayData = {
    if (html == null) return null
    new GenericArrayData(extract(html.toString).map { a =>
      InternalRow(a.idx, UTF8String.fromString(a.href), UTF8String.fromString(a.text))
    }.toArray[Any])
  }
}
