package graft.text

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Image-reference extraction for an image crawl: every `<img>` yields its
  * `src` plus each `srcset` candidate with its width/density descriptor,
  * and the alt text (the free image-caption signal LAION-style pipelines
  * pair with pixels). `<source srcset>` inside `<picture>` elements counts
  * the same way. Descriptors follow the HTML spec's comma-separated
  * `URL [w-descriptor|x-descriptor]` grammar; a candidate without a
  * descriptor reports "1x".
  *
  * Emitted as (idx, url, descriptor, alt) rows in document order — the
  * descriptor lets the pipeline keep only the highest-resolution variant
  * per image (max w/x per img group = the idx of the owning element).
  */
object ImageRefs {

  final case class Ref(idx: Int, imgIdx: Int, url: String, descriptor: String, alt: String)

  /** Split a srcset attribute into (url, descriptor) candidates. Commas
    * inside URLs are legal only when not followed by whitespace; the spec
    * splits on commas that terminate a candidate — this parser takes the
    * pragmatic whitespace-grammar: candidates are comma-separated, each
    * `url [descriptor]`.
    */
  def srcsetCandidates(srcset: String): Seq[(String, String)] =
    if (srcset == null) Nil
    else srcset.split(',').toSeq.flatMap { cand =>
      val parts = cand.trim.split("\\s+", 2)
      if (parts.isEmpty || parts(0).isEmpty) None
      else Some(parts(0) -> (if (parts.length > 1) parts(1).trim else "1x"))
    }

  def extract(html: String): Seq[Ref] = {
    if (html == null) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[Ref]
    var imgIdx = 0

    def emit(attrs: String, withSrc: Boolean): Unit = {
      val alt = Option(Anchors.attrValue(attrs, "alt")).getOrElse("")
      if (withSrc) {
        val src = Anchors.attrValue(attrs, "src")
        if (src != null && src.nonEmpty) out += Ref(out.length, imgIdx, src, "1x", alt)
      }
      srcsetCandidates(Anchors.attrValue(attrs, "srcset")).foreach { case (u, d) =>
        out += Ref(out.length, imgIdx, u, d, alt)
      }
      imgIdx += 1
    }

    def walk(nodes: scala.collection.Seq[HtmlToText.Node]): Unit =
      nodes.foreach {
        case HtmlToText.Text(_) => ()
        case HtmlToText.Elem(tag, children, attrs) =>
          if (tag == "img") emit(attrs, withSrc = true)
          else if (tag == "source") emit(attrs, withSrc = false)
          else if (!HtmlToText.SkipTags.contains(tag)) walk(children)
      }

    walk(HtmlToText.parse(html))
    out.toSeq
  }

  /** Codegen entry: refs as ArrayData of (idx, img_idx, url, descriptor,
    * alt) rows.
    */
  def imageRefsArrayData(html: UTF8String): ArrayData = {
    if (html == null) return null
    new GenericArrayData(extract(html.toString).map { r =>
      InternalRow(r.idx, r.imgIdx, UTF8String.fromString(r.url),
        UTF8String.fromString(r.descriptor), UTF8String.fromString(r.alt))
    }.toArray[Any])
  }
}
