package graft.text

import graft.SparkSpec
import graft.fixtures.BoilerDocs
import graft.ops.TextOps
import org.apache.spark.sql.functions._

class BoilerplateSpec extends SparkSpec {

  test("block segmentation: boundaries, whitespace, link chars, skip tags") {
    val html =
      """<html><head><title>nope</title><style>p{}</style></head><body>
        |<div><a href="/h">home</a> | <a href="/a">about us</a></div>
        |<p>one   two
        |three <a href="/x">four five</a> six</p>
        |text outside blocks <b>bold</b>
        |</body></html>""".stripMargin
    val bs = HtmlBlocks.blocks(html)
    assert(bs.map(_.text) == Seq(
      "home | about us",
      "one two three four five six",
      "text outside blocks bold"))
    val nav = bs(0)
    assert(nav.chars == "home | about us".length)
    assert(nav.linkChars == "home".length + "about us".length)
    assert(nav.words == 4) // home, |, about, us
    val p = bs(1)
    assert(p.linkChars == "four five".length)
    assert(p.words == 6 && p.chars == p.text.length)
    assert(bs(2).linkChars == 0)
  }

  test("stopword counting is case-insensitive and word-exact") {
    val bs = HtmlBlocks.blocks("<p>The cat AND a hat of thing</p>")
    assert(bs.head.words == 7)
    assert(bs.head.stopWords == 4) // the, and, a, of
  }

  test("engine block features agree with the plan for the whole corpus") {
    (0L until 100L).foreach { id =>
      val plan = BoilerDocs.planOf(id)
      val got = HtmlBlocks.blocks(BoilerDocs.htmlOf(plan))
      assert(got.length == plan.length, s"doc $id block count")
      plan.zip(got).zipWithIndex.foreach { case ((seg, b), i) =>
        val (c, l, w, st) = BoilerDocs.featuresOf(seg)
        assert(b.text == seg.text, s"doc $id block $i text")
        assert((b.chars, b.linkChars, b.words, b.stopWords) == ((c, l, w, st)),
          s"doc $id block $i features")
      }
    }
  }

  test("classification: chrome dropped, content kept, shorts resolved by neighbors") {
    import spark.implicits._
    // hand-built page covering every rule: nav(bad) content(good) short
    // (kept: between goods) content(good) short(dropped: next is bad)
    // footer(bad)
    val good1 = "the crawl of the frontier and the parquet in a shuffle of the broadcast and a partition of it"
    val good2 = "the lineage of the catalyst and the codegen in a executor of the manifest and a snapshot of it"
    val html = "<html><body>" +
      """<div><a href="/h">home</a> | <a href="/a">about</a> | <a href="/c">contact</a></div>""" +
      s"<p>$good1</p><p>mid connector</p><p>$good2</p><p>tail note</p>" +
      """<div><a href="/t">terms</a> · <a href="/p">privacy</a> · c</div>""" +
      "</body></html>"
    val df = Seq(("d0", html)).toDF("doc_id", "html")
    val blocks = TextOps.boilerBlocks(df, "doc_id", "html")
      .orderBy("block_idx").collect()
    assert(blocks.map(_.getAs[String]("cls")).toSeq ==
      Seq("bad", "good", "short", "good", "short", "bad"))
    assert(blocks.map(_.getAs[Boolean]("keep")).toSeq ==
      Seq(false, true, true, true, false, false))
    val content = TextOps.mainContent(df, "doc_id", "html").collect()(0).getString(1)
    assert(content == s"$good1\nmid connector\n$good2")
  }

  test("corpus end-to-end: engine mainContent equals the plan's expected text") {
    import spark.implicits._
    val docs = (0L until 100L).map { id =>
      val plan = BoilerDocs.planOf(id)
      (f"bd-$id%06d", BoilerDocs.htmlOf(plan), BoilerDocs.expectedContent(plan))
    }.toDF("doc_id", "html", "expected")
    val got = TextOps.mainContent(docs, "doc_id", "html")
      .join(docs.select("doc_id", "expected"), "doc_id")
    assert(got.filter(col("content") =!= col("expected")).count() == 0)
    // the corpus must actually exercise all three classes
    val cls = TextOps.boilerBlocks(docs, "doc_id", "html")
      .groupBy("cls").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cls.keySet == Set("good", "bad", "short"), cls.toString)
  }

  test("anchor extraction: hrefs quote-aware + entity-decoded, text from the subtree") {
    val html =
      """<html><body>
        |<p>see <a href="/a?x=1&amp;y=2">the <b>first</b>
        |link</a> and <a href='/b' rel=nofollow>second</a>
        |and <a href=/bare>bare</a> and <a name="target">no href</a></p>
        |<div><a href="/outer">outer <a href="/inner">inner</a></a></div>
        |</body></html>""".stripMargin
    val as = Anchors.extract(html)
    assert(as.map(a => a.href -> a.text) == Seq(
      "/a?x=1&y=2" -> "the first link",
      "/b" -> "second",
      "/bare" -> "bare",
      "/outer" -> "outer inner", // nested anchors: outer text spans the subtree
      "/inner" -> "inner"))
    assert(as.map(_.idx) == Seq(0, 1, 2, 3, 4))
    // attr parsing corners
    assert(Anchors.attrValue(""" class="x" HREF = '/y' """, "href") == "/y")
    assert(Anchors.attrValue(""" hreflang="en" """, "href") == null)
    assert(Anchors.attrValue("href", "href") == null)
  }

  test("anchor extraction agrees with the plan across the corpus") {
    (0L until 100L).foreach { id =>
      val plan = BoilerDocs.planOf(id)
      val got = Anchors.extract(BoilerDocs.htmlOf(plan)).map(a => a.href -> a.text)
      assert(got == plan.flatMap(_.anchors), s"doc $id")
    }
  }

  test("plan quality: no ScalaUDF anywhere in the boilerplate pipeline") {
    import spark.implicits._
    val df = (0L until 8L).map(i => (s"d$i", BoilerDocs.htmlOf(BoilerDocs.planOf(i))))
      .toDF("doc_id", "html")
    val plan = TextOps.boilerBlocks(df, "doc_id", "html").queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    // mainContent's groupBy rides the window's hash partitioning on the
    // SAME doc key: exactly one Exchange for the whole classify+reassemble
    // pipeline (a second one would mean the agg re-shuffles what the
    // window already co-located)
    val mcPlan = TextOps.mainContent(df, "doc_id", "html").queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(mcPlan).length == 1, mcPlan)
  }
}
