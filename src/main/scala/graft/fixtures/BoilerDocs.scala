package graft.fixtures

import scala.util.Random

import org.apache.spark.sql.SparkSession

/** Deterministic boilerplate-removal corpus: each doc is a PLAN of typed
  * segments (nav chrome, content paragraphs, short connectors, footer
  * chrome), serialized to HTML for the engine and kept as structured facts
  * for the oracle.
  *
  * Independence (the HtmlDocs trick): the plan side computes every block
  * feature (chars, link chars, words, stopwords) from the strings it
  * CONSTRUCTED and classifies them with plan-level Scala; the engine must
  * recover the same blocks by PARSING the serialized markup and classify
  * them with Catalyst columns + a window pass. The two sides share only
  * the rule constants (TextOps.BoilerMaxLinkDensity & co) and the spec'd
  * byte layout of HTML.
  */
object BoilerDocs {

  /** `anchors` = (href, anchor text) pairs the segment embeds, in order —
    * the plan-side ground truth for the anchor-text oracle.
    */
  final case class Seg(html: String, text: String, linkChars: Int,
      anchors: Seq[(String, String)] = Nil)

  private val ContentWords = Vector(
    "crawl", "frontier", "parquet", "shuffle", "broadcast", "partition",
    "lineage", "catalyst", "codegen", "executor", "manifest", "snapshot",
    "politeness", "sitemap", "robots", "dedup", "shingle", "signature")
  private val StopWords = graft.text.HtmlBlocks.Stopwords.toVector.sorted
  private val LinkWords = Vector(
    "home", "about", "contact", "archive", "search", "login", "terms",
    "privacy", "careers", "press", "docs", "blog")

  private def hrefOf(words: String): String = "/" + words.replace(' ', '-')

  private def anchor(words: String): String = s"""<a href="${hrefOf(words)}">$words</a>"""

  private def navSeg(rnd: Random): Seg = {
    val k = 3 + rnd.nextInt(3)
    val labels = Vector.fill(k)(LinkWords(rnd.nextInt(LinkWords.length)))
    Seg(
      html = "<div>" + labels.map(anchor).mkString(" | ") + "</div>",
      text = labels.mkString(" | "),
      linkChars = labels.map(_.length).sum,
      anchors = labels.map(l => hrefOf(l) -> l))
  }

  private def contentSeg(rnd: Random): Seg = {
    val n = 16 + rnd.nextInt(14)
    val words = (0 until n).map { i =>
      if (i % 3 == 1) StopWords(rnd.nextInt(StopWords.length))
      else ContentWords(rnd.nextInt(ContentWords.length))
    }.toVector
    val text = words.mkString(" ")
    // sometimes one short inline anchor (low link density on a long block)
    if (rnd.nextInt(3) == 0 && n >= 18) {
      val j = 2 + rnd.nextInt(n - 6)
      val linked = words(j) + " " + words(j + 1)
      val html = "<p>" + (words.take(j) ++ Vector(anchor(linked)) ++ words.drop(j + 2))
        .mkString(" ") + "</p>"
      Seg(html, text, linked.length, Seq(hrefOf(linked) -> linked))
    } else Seg("<p>" + text + "</p>", text, 0)
  }

  private def shortSeg(rnd: Random): Seg = {
    val n = 2 + rnd.nextInt(3)
    val text = Vector.fill(n)(ContentWords(rnd.nextInt(ContentWords.length))).mkString(" ")
    Seg("<p>" + text + "</p>", text, 0)
  }

  private def footerSeg(rnd: Random): Seg = {
    val k = 2 + rnd.nextInt(3)
    val labels = Vector.fill(k)(LinkWords(rnd.nextInt(LinkWords.length)))
    val tail = "copyright 2026"
    Seg(
      html = "<div>" + labels.map(anchor).mkString(" · ") + " · " + tail + "</div>",
      text = labels.mkString(" · ") + " · " + tail,
      linkChars = labels.map(_.length).sum,
      anchors = labels.map(l => hrefOf(l) -> l))
  }

  def planOf(docId: Long): Seq[Seg] = {
    val rnd = new Random(docId * 0x9e3779b97f4a7c15L + 41)
    val body = scala.collection.mutable.ArrayBuffer.empty[Seg]
    if (rnd.nextInt(4) == 0) body += shortSeg(rnd) // leading short: edge rule -> dropped
    body += navSeg(rnd)
    val paras = 2 + rnd.nextInt(3)
    (0 until paras).foreach { p =>
      body += contentSeg(rnd)
      if (p < paras - 1 && rnd.nextInt(2) == 0) body += shortSeg(rnd) // between good: kept
    }
    if (rnd.nextInt(4) == 0) body += shortSeg(rnd) // short before footer: dropped
    body += footerSeg(rnd)
    body.toSeq
  }

  def htmlOf(plan: Seq[Seg]): String =
    "<html><head><title>chrome</title></head><body>\n" +
      plan.map(_.html).mkString("\n") + "\n</body></html>"

  // ---- plan-side features + classification (the oracle's ground truth) ----

  /** (chars, linkChars, words, stopWords) from the constructed strings. */
  def featuresOf(s: Seg): (Int, Int, Int, Int) = {
    val words = s.text.split(' ').filter(_.nonEmpty)
    (s.text.length, s.linkChars, words.length,
      words.count(w => graft.text.HtmlBlocks.Stopwords.contains(w.toLowerCase)))
  }

  /** Spark Round semantics exactly (BigDecimal.valueOf + HALF_UP). */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  def clsOf(chars: Int, linkChars: Int, words: Int, stops: Int): String = {
    val ld = round6(linkChars.toDouble / math.max(chars, 1))
    val sd = round6(stops.toDouble / math.max(words, 1))
    if (ld > graft.ops.TextOps.BoilerMaxLinkDensity) "bad"
    else if (chars >= graft.ops.TextOps.BoilerMinChars &&
      sd >= graft.ops.TextOps.BoilerMinStopDensity) "good"
    else "short"
  }

  /** Final keep verdicts after the neighbor pass (plan-level recursion-free
    * scan, the independent twin of the engine's window pass).
    */
  def keepsOf(plan: Seq[Seg]): Seq[Boolean] = {
    val cls = plan.map { s => val (c, l, w, st) = featuresOf(s); clsOf(c, l, w, st) }
    cls.zipWithIndex.map {
      case ("good", _) => true
      case ("bad", _) => false
      case (_, i) =>
        val prev = cls.take(i).reverse.find(_ != "short")
        val next = cls.drop(i + 1).find(_ != "short")
        prev.contains("good") && next.contains("good")
    }
  }

  def expectedContent(plan: Seq[Seg]): String =
    plan.zip(keepsOf(plan)).collect { case (s, true) => s.text }.mkString("\n")

  // ---- exports -------------------------------------------------------------

  val ExportBase = "/tmp/graft_boiler_docs"
  private val exported = scala.collection.mutable.Set.empty[String]

  /** Writes two side-channels: `blocks_N` (doc_id, block_idx, chars,
    * link_chars, words, stop_words — the oracle reclassifies these in SQL)
    * and `docs_N` (doc_id, html, expected_content). Returns the base dir.
    */
  def export(spark: SparkSession, n: Int): String = synchronized {
    val base = s"$ExportBase/$n"
    if (!exported.contains(base)) {
      import spark.implicits._
      val plans = (0 until n).map(i => i.toLong -> planOf(i.toLong))
      plans.flatMap { case (id, plan) =>
        plan.zipWithIndex.map { case (s, bi) =>
          val (c, l, w, st) = featuresOf(s)
          (f"bd-$id%06d", bi, c, l, w, st)
        }
      }.toDF("doc_id", "block_idx", "chars", "link_chars", "words", "stop_words")
        .coalesce(1).write.mode("overwrite").parquet(s"$base/blocks")
      plans.map { case (id, plan) =>
        (f"bd-$id%06d", htmlOf(plan), expectedContent(plan))
      }.toDF("doc_id", "html", "expected_content")
        .coalesce(1).write.mode("overwrite").parquet(s"$base/docs")
      plans.flatMap { case (id, plan) =>
        plan.flatMap(_.anchors).zipWithIndex.map { case ((href, text), ai) =>
          (f"bd-$id%06d", ai, href, text)
        }
      }.toDF("doc_id", "anchor_idx", "href", "text")
        .coalesce(1).write.mode("overwrite").parquet(s"$base/anchors")
      exported += base
    }
    base
  }
}
