package graft.text

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Block segmentation for boilerplate removal (the jusText / trafilatura
  * family, Pomikálek 2011): a page splits into text blocks at block-level
  * tag boundaries, each carrying the integer features the classifier needs —
  * total chars, chars inside `<a>` anchors (link density), word count, and
  * stopword count. Reuses the lenient [[HtmlToText]] parser; the walk is a
  * different fold over the same tree (segments at block tags instead of
  * emitting newlines).
  *
  * Everything downstream of this call is pure Catalyst arithmetic
  * (`TextOps.boilerBlocks` / `mainContent`), so one static call per row
  * inside whole-stage codegen is the entire non-SQL surface — the
  * HtmlToTextExpr pattern.
  */
object HtmlBlocks {

  final case class Block(idx: Int, text: String, chars: Int, linkChars: Int,
      words: Int, stopWords: Int)

  /** jusText-style function-word list (fixed, lowercase). Kept deliberately
    * small: the classifier needs a density signal, not lexicon coverage.
    */
  val Stopwords: Set[String] = Set(
    "the", "a", "an", "of", "and", "or", "to", "in", "is", "it", "on",
    "for", "with", "as", "at", "by", "this", "that", "are", "was", "be")

  /** Split `html` into text blocks. A block is the text accumulated between
    * block-level tag boundaries (entering OR leaving a block tag flushes);
    * skip-tag subtrees contribute nothing; whitespace is compressed and
    * trimmed; empty blocks are dropped. `linkChars` counts the characters
    * contributed while inside at least one `<a>` element.
    */
  def blocks(html: String): Seq[Block] = {
    if (html == null) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[Block]
    val sb = new StringBuilder
    var linkChars = 0

    def flush(): Unit = {
      // trim; count trimmed leading/trailing ws against linkChars never
      // (anchors are inline — the serializer's inter-block ws is outside
      // them), so plain trim on the text is safe
      val t = sb.toString.trim
      if (t.nonEmpty) {
        var words = 0
        var stops = 0
        var i = 0
        val n = t.length
        while (i < n) {
          while (i < n && t.charAt(i) == ' ') i += 1
          if (i < n) {
            val start = i
            while (i < n && t.charAt(i) != ' ') i += 1
            words += 1
            if (Stopwords.contains(t.substring(start, i).toLowerCase)) stops += 1
          }
        }
        out += Block(out.length, t, t.length, math.min(linkChars, t.length), words, stops)
      }
      sb.clear()
      linkChars = 0
    }

    def append(s: String, inLink: Boolean): Unit = {
      // compress whitespace runs to single spaces as HtmlToText does
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (Character.isWhitespace(c)) {
          if (sb.nonEmpty && sb.charAt(sb.length - 1) != ' ') { sb.append(' '); if (inLink) linkChars += 1 }
        } else {
          sb.append(c)
          if (inLink) linkChars += 1
        }
        i += 1
      }
    }

    def walk(nodes: scala.collection.Seq[HtmlToText.Node], linkDepth: Int): Unit =
      nodes.foreach {
        case HtmlToText.Text(t) => append(t, linkDepth > 0)
        case HtmlToText.Elem(tag, children, _) =>
          if (HtmlToText.SkipTags.contains(tag)) ()
          else if (HtmlToText.BlockTags.contains(tag)) {
            flush()
            walk(children, linkDepth)
            flush()
          } else walk(children, linkDepth + (if (tag == "a") 1 else 0))
      }

    walk(HtmlToText.parse(html), 0)
    flush()
    out.toSeq
  }

  /** Codegen entry: blocks as Catalyst ArrayData of (idx, text, chars,
    * link_chars, words, stop_words) rows.
    */
  def blocksArrayData(html: UTF8String): ArrayData = {
    if (html == null) return null
    val bs = blocks(html.toString)
    new GenericArrayData(bs.map { b =>
      InternalRow(b.idx, UTF8String.fromString(b.text), b.chars, b.linkChars, b.words, b.stopWords)
    }.toArray[Any])
  }
}
