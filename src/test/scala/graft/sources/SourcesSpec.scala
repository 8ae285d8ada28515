package graft.sources

import graft.SparkSpec
import graft.storage.{KeyValueStore, ResultDataset}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Sitemap parsing (reference tests/unit/_utils/test_sitemap.py semantics),
  * RequestList cursor/consistency, KVS persist/resume, Dataset surface.
  */
class SourcesSpec extends SparkSpec {

  val urlsetXml: String =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <url>
      |    <loc>http://example.com/page1</loc>
      |    <lastmod>2024-01-15</lastmod>
      |    <changefreq>daily</changefreq>
      |    <priority>0.8</priority>
      |  </url>
      |  <url><loc>http://example.com/page2</loc><changefreq>bogus</changefreq></url>
      |  <url><lastmod>2024-01-01</lastmod></url>
      |</urlset>""".stripMargin

  test("XML urlset: loc/lastmod/changefreq/priority; invalid freq dropped; loc-less url dropped") {
    val r = Sitemap.parseXml(urlsetXml, "http://example.com/sitemap.xml")
    assert(r.urls.map(_.loc) == Seq("http://example.com/page1", "http://example.com/page2"))
    val p1 = r.urls.head
    assert(p1.changefreq.contains("daily") && p1.priority.contains(0.8))
    assert(p1.lastmod.contains(java.time.Instant.parse("2024-01-15T00:00:00Z")))
    assert(r.urls(1).changefreq.isEmpty)
    assert(r.nestedSitemaps.isEmpty)
  }

  test("image-sitemap extension: per-url image blocks with caption/title; loc-less block dropped") {
    val xml =
      """<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"
        |        xmlns:image="http://www.google.com/schemas/sitemap-image/1.1">
        |  <url>
        |    <loc>http://example.com/page1</loc>
        |    <image:image>
        |      <image:loc>http://cdn.example.com/a.jpg</image:loc>
        |      <image:caption>cats &amp; dogs</image:caption>
        |      <image:title>A</image:title>
        |    </image:image>
        |    <image:image><image:loc>http://cdn.example.com/b.jpg</image:loc></image:image>
        |    <image:image><image:caption>no loc, dropped</image:caption></image:image>
        |  </url>
        |  <url><loc>http://example.com/page2</loc></url>
        |</urlset>""".stripMargin
    val r = Sitemap.parseXml(xml, "http://example.com/sitemap.xml")
    assert(r.urls.map(_.loc) == Seq("http://example.com/page1", "http://example.com/page2"))
    val imgs = r.urls.head.images
    assert(imgs == Seq(
      Sitemap.SitemapImage("http://cdn.example.com/a.jpg", Some("cats & dogs"), Some("A")),
      Sitemap.SitemapImage("http://cdn.example.com/b.jpg", None, None)))
    assert(r.urls(1).images.isEmpty, "images must not leak across <url> boundaries")
  }

  test("XML sitemapindex: nested locs, no urls") {
    val xml =
      """<sitemapindex><sitemap><loc>http://example.com/s1.xml</loc></sitemap>
        |<sitemap><loc>http://example.com/s2.xml</loc></sitemap></sitemapindex>""".stripMargin
    val r = Sitemap.parseXml(xml)
    assert(r.urls.isEmpty)
    assert(r.nestedSitemaps == Seq("http://example.com/s1.xml", "http://example.com/s2.xml"))
  }

  test("TXT sitemap: one URL per line, blanks skipped") {
    val r = Sitemap.parseTxt("http://a.com/1\n\n  http://a.com/2  \n")
    assert(r.urls.map(_.loc) == Seq("http://a.com/1", "http://a.com/2"))
  }

  test("gzip inflate + .gz extension classification") {
    val txt = "http://a.com/x\nhttp://a.com/y"
    val out = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(txt.getBytes("UTF-8")); gz.close()
    val content = Sitemap.inflate(out.toByteArray)
    val r = Sitemap.parse(content, url = "http://a.com/sitemap.txt.gz")
    assert(r.urls.map(_.loc) == Seq("http://a.com/x", "http://a.com/y"))
  }

  test("malformed XML keeps items parsed before the error") {
    val broken = "<urlset><url><loc>http://a.com/ok</loc></url><url><loc>http://a.com/also"
    val r = Sitemap.parseXml(broken)
    assert(r.urls.map(_.loc) == Seq("http://a.com/ok"))
  }

  test("nested recursion: depth cap, dedup, strategy filter") {
    val docs = Map(
      "https://h0.test/sitemap.xml" ->
        ("application/xml", """<sitemapindex><sitemap><loc>https://h0.test/s1.xml</loc></sitemap>
          |<sitemap><loc>https://h0.test/sitemap.xml</loc></sitemap>
          |<sitemap><loc>https://other.test/s.xml</loc></sitemap></sitemapindex>""".stripMargin),
      "https://h0.test/s1.xml" ->
        ("application/xml", """<urlset><url><loc>https://h0.test/p1</loc></url>
          |<url><loc>https://other.test/px</loc></url>
          |<url><loc>https://h0.test/p1</loc></url></urlset>""".stripMargin),
      "https://other.test/s.xml" ->
        ("application/xml", "<urlset><url><loc>https://other.test/p9</loc></url></urlset>")
    )
    val fetch = (u: String) => docs.get(u).map { case (ct, c) => (ct, c.getBytes("UTF-8")) }
    // same-hostname: other.test sitemap + urls filtered out; self-reference deduped
    val urls = Sitemap.loadRecursive(Seq("https://h0.test/sitemap.xml"), fetch, "same-hostname")
    assert(urls.map(_.loc) == Seq("https://h0.test/p1"))
    // all: cross-host sitemap followed
    val all = Sitemap.loadRecursive(Seq("https://h0.test/sitemap.xml"), fetch, "all")
    assert(all.map(_.loc).toSet == Set("https://h0.test/p1", "https://other.test/px", "https://other.test/p9"))
  }

  test("RequestList: cursor resume + consistency check") {
    val rl = RequestList.fromUrls(spark, Seq("https://a.com/1", "https://a.com/2", "https://a.com/3"))
    val (next, key) = rl.cursorAfter(0)
    assert(next == 1 && key.contains("https://a.com/2"))
    val rest = rl.fromCursor(next, key).select("url").collect().map(_.getString(0))
    assert(rest.toSeq == Seq("https://a.com/2", "https://a.com/3"))
    intercept[IllegalStateException] {
      rl.fromCursor(1, Some("https://changed.com/x")).collect()
    }
  }

  test("KeyValueStore: set/get/delete/exists + persist/resume") {
    val dir = Files.createTempDirectory("kvs").toString
    val kvs = new KeyValueStore(spark, dir)
    kvs.setJson("state", """{"cursor": 5}""")
    kvs.setValue("blob", Array[Byte](1, 2, 3))
    assert(kvs.recordExists("state") && kvs.getJson("state").contains("""{"cursor": 5}"""))
    kvs.persist()
    kvs.setJson("state", """{"cursor": 9}""")
    kvs.persist()
    kvs.delete("blob")
    // resume: new instance reads the last persisted snapshot (blob delete was never persisted)
    val resumed = new KeyValueStore(spark, dir)
    assert(resumed.getJson("state").contains("""{"cursor": 9}"""))
    assert(resumed.recordExists("blob"))
    assert(resumed.iterateKeys().toSet == Set("state", "blob"))
  }

  test("ResultDataset: push/getData full surface (D1-D9)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("rds").toString
    val ds = new ResultDataset(spark, dir)
    ds.push(Seq(
      ("a", Seq(1, 2), "x1", "h1"),
      ("b", Seq(3), null.asInstanceOf[String], "h2"),
      ("c", Seq.empty[Int], "x3", null.asInstanceOf[String])
    ).toDF("name", "nums", "note", "#hidden"))
    assert(ds.itemCount == 3)

    // D2/D3: pagination in insertion order, desc
    val page = ds.getData(ds.GetDataOptions(offset = 1, limit = 1))
    assert(page.select("name").collect().map(_.getString(0)).toSeq == Seq("b"))
    val desc = ds.getData(ds.GetDataOptions(desc = true, limit = 2))
    assert(desc.select("name").collect().map(_.getString(0)).toSeq == Seq("c", "b"))

    // D5/D6: fields / omit
    assert(ds.getData(ds.GetDataOptions(fields = Seq("note", "name"))).columns.toSeq == Seq("note", "name"))
    assert(!ds.getData(ds.GetDataOptions(omit = Seq("nums"))).columns.contains("nums"))

    // D7: unwind
    val unwound = ds.getData(ds.GetDataOptions(unwind = Some("nums")))
    assert(unwound.count() == 3) // a->2 rows, b->1, c empties out

    // D9: skip_hidden
    assert(!ds.getData(ds.GetDataOptions(skipHidden = true)).columns.exists(_.startsWith("#")))
  }

  test("ResultDataset: flatten (D8) and exports (D10/D11)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("rds2").toString
    val ds = new ResultDataset(spark, dir)
    ds.push(Seq(("a", (1, "u")), ("b", (2, "v"))).toDF("name", "nested"))
    val flat = ds.getData(ds.GetDataOptions(flatten = Some("nested")))
    assert(flat.columns.toSet == Set("name", "_1", "_2"))

    val csvDir = Files.createTempDirectory("csv").toString + "/out"
    val cols = ds.exportCsv(csvDir, collectAllKeys = true)
    assert(cols.contains("name"))
    val back = spark.read.option("header", "true").csv(csvDir)
    assert(back.count() == 2)

    val jsonDir = Files.createTempDirectory("json").toString + "/out"
    ds.exportJson(jsonDir)
    assert(spark.read.json(jsonDir).count() == 2)
  }

  test("sitemap tandem: loader feeds the frontier with persisted cursor; kill+resume has no duplicates") {
    import org.apache.spark.sql.functions.col
    val origin = "https://sm.example.com"
    def urlset(ids: Seq[String]): String =
      "<urlset>" + ids.map(u => s"<url><loc>$u</loc></url>").mkString + "</urlset>"
    val docs = Map(
      s"$origin/index.xml" ->
        ("<sitemapindex>" + (0 to 1).map(i =>
          s"<sitemap><loc>$origin/c$i.xml</loc></sitemap>").mkString + "</sitemapindex>"),
      s"$origin/c0.xml" -> urlset((0 to 3).map(j => s"$origin/p/$j")),
      s"$origin/c1.xml" -> urlset((2 to 6).map(j => s"$origin/p/$j")) // overlaps c0 (dedup)
    )
    var fetches = 0
    val fetch: String => Option[(String, Array[Byte])] = u => {
      fetches += 1
      docs.get(u).map(x => ("application/xml", x.getBytes("UTF-8")))
    }
    val root = Files.createTempDirectory("tandem").toString
    val store = new graft.queue.FrontierStore(spark, root + "/q")
    // level 0 only, then "crash"
    val l1 = new SitemapRequestLoader(spark, store,
      new graft.storage.KeyValueStore(spark, root + "/kv"), fetch)
    assert(l1.run(Seq(s"$origin/index.xml"), maxLevelsThisCall = 1) == 1)
    assert(!l1.isFinished)
    val fetchesAfterLevel0 = fetches
    // resume with a FRESH loader + kvs instance (new process)
    val l2 = new SitemapRequestLoader(spark, store,
      new graft.storage.KeyValueStore(spark, root + "/kv"), fetch)
    l2.run(Seq(s"$origin/index.xml"))
    assert(l2.isFinished)
    // the resumed run never re-fetched the already-processed index
    assert(fetches == fetchesAfterLevel0 + 2)
    val urls = store.state().select(col("url")).collect().map(_.getString(0)).toSet
    assert(urls == (0 to 6).map(j => s"$origin/p/$j").toSet)
    assert(store.state().count() == 7) // overlap deduped
    // idempotent once done
    assert(l2.run(Seq(s"$origin/index.xml")) == 0)
  }

  test("sitemap tandem with includeImages: image seeds carry caption/title user_data; cross-host loc kept") {
    import org.apache.spark.sql.functions.col
    val origin = "https://sm.example.com"
    val docs = Map(
      s"$origin/s.xml" ->
        ("""<urlset><url><loc>""" + origin + """/p/1</loc>""" +
          """<image:image><image:loc>https://cdn.other.com/i/1.jpg</image:loc>""" +
          """<image:caption>a "quoted" cap</image:caption></image:image>""" +
          """<image:image><image:loc>""" + origin + """/i/2.png</image:loc>""" +
          """<image:title>t2</image:title></image:image>""" +
          """</url></urlset>""")
    )
    val fetch: String => Option[(String, Array[Byte])] =
      u => docs.get(u).map(x => ("application/xml", x.getBytes("UTF-8")))
    val root = Files.createTempDirectory("tandem-img").toString
    val store = new graft.queue.FrontierStore(spark, root + "/q")
    val loader = new SitemapRequestLoader(spark, store,
      new graft.storage.KeyValueStore(spark, root + "/kv"), fetch,
      strategy = graft.canon.EnqueueStrategy.SameHostname, includeImages = true)
    loader.run(Seq(s"$origin/s.xml"))
    val rows = store.state()
      .select(col("url"), col("label"), col("user_data_json"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(rows.keySet == Set(
      s"$origin/p/1", "https://cdn.other.com/i/1.jpg", s"$origin/i/2.png"),
      s"page gate is strategy-filtered, declared images are not: ${rows.keySet}")
    assert(rows(s"$origin/p/1")._1 == null)
    val (lbl1, ud1) = rows("https://cdn.other.com/i/1.jpg")
    assert(lbl1 == "image")
    val parsed = graft.util.Json.obj(graft.util.Json.parse(ud1))
    assert(graft.util.Json.str(parsed("caption")) == "a \"quoted\" cap")
    assert(graft.util.Json.bool(parsed("from_sitemap_image")))
    val ud2 = graft.util.Json.obj(graft.util.Json.parse(rows(s"$origin/i/2.png")._2))
    assert(graft.util.Json.str(ud2("title")) == "t2" && !ud2.contains("caption"))
  }

  test("Statistics: error tracker groups similar messages") {
    import spark.implicits._
    val errors = Seq(
      "timeout after 30 seconds", "timeout after 45 seconds",
      "no such host 'a.com'", "no such host 'b.org'",
      "completely different"
    ).toDF("message")
    val groups = graft.stats.Statistics.errorGroups(errors).collect()
    assert(groups.length == 3)
    assert(groups.head.getLong(1) == 2) // top group has 2 occurrences
  }
}
