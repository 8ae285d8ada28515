package graft.text

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Page-metadata extraction over the parsed tree: `<meta>` name/property +
  * content pairs (OpenGraph, twitter cards, robots directives, charset),
  * `<link rel>` targets (canonical, alternates, icons), and the `<title>`
  * text. This is the page-level routing signal a crawl pipeline reads
  * before anything else — canonical URLs collapse duplicates upstream of
  * content dedup, `og:image` seeds the image frontier, and
  * `meta robots noindex/nofollow` gates indexing/enqueue.
  *
  * Emitted as (kind, key, value) rows in document order:
  *   kind "meta"  — key = lowercased `name` or `property`, value = content
  *   kind "link"  — key = lowercased `rel`, value = href
  *   kind "title" — key = "title", value = title text (whitespace-compressed)
  * Elements missing their key or value attribute are skipped.
  */
object PageMeta {

  final case class Entry(idx: Int, kind: String, key: String, value: String)

  def extract(html: String): Seq[Entry] = {
    if (html == null) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[Entry]

    def add(kind: String, key: String, value: String): Unit =
      if (key != null && key.nonEmpty && value != null)
        out += Entry(out.length, kind, key.toLowerCase, value)

    def walk(nodes: scala.collection.Seq[HtmlToText.Node]): Unit =
      nodes.foreach {
        case HtmlToText.Text(_) => ()
        case HtmlToText.Elem(tag, children, attrs) =>
          tag match {
            case "meta" =>
              val content = Anchors.attrValue(attrs, "content")
              val charset = Anchors.attrValue(attrs, "charset")
              if (charset != null) add("meta", "charset", charset)
              else {
                val key = Option(Anchors.attrValue(attrs, "name"))
                  .getOrElse(Anchors.attrValue(attrs, "property"))
                add("meta", key, content)
              }
            case "link" =>
              add("link", Anchors.attrValue(attrs, "rel"), Anchors.attrValue(attrs, "href"))
            case "title" =>
              val sb = new StringBuilder
              children.foreach {
                case HtmlToText.Text(t) =>
                  var i = 0
                  while (i < t.length) {
                    val c = t.charAt(i)
                    if (Character.isWhitespace(c)) {
                      if (sb.nonEmpty && sb.charAt(sb.length - 1) != ' ') sb.append(' ')
                    } else sb.append(c)
                    i += 1
                  }
                case _ => ()
              }
              add("title", "title", sb.toString.trim)
            case _ => walk(children)
          }
      }

    walk(HtmlToText.parse(html))
    out.toSeq
  }

  /** Codegen entry: entries as ArrayData of (idx, kind, key, value) rows. */
  def metaArrayData(html: UTF8String): ArrayData = {
    if (html == null) return null
    new GenericArrayData(extract(html.toString).map { e =>
      InternalRow(e.idx, UTF8String.fromString(e.kind), UTF8String.fromString(e.key),
        UTF8String.fromString(e.value))
    }.toArray[Any])
  }
}
