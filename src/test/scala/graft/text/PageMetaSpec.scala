package graft.text

import graft.SparkSpec
import graft.fixtures.PageFixtures
import graft.media.CharsetSniff

class PageMetaSpec extends SparkSpec {

  test("meta extraction: names, properties, charset form, links, title") {
    val html =
      """<html><head>
        |<meta charset="utf-8">
        |<title>A   Title
        | here</title>
        |<meta name="description" content="desc &amp; more">
        |<meta property="og:image" content="/i.jpg">
        |<meta name="keywords">
        |<link rel="canonical" href="https://x.example/a">
        |<link rel="stylesheet">
        |</head><body><p>no meta here</p></body></html>""".stripMargin
    val got = PageMeta.extract(html).map(e => (e.kind, e.key, e.value))
    assert(got == Seq(
      ("meta", "charset", "utf-8"),
      ("title", "title", "A Title here"),
      ("meta", "description", "desc & more"),
      ("meta", "og:image", "/i.jpg"),
      ("link", "canonical", "https://x.example/a")))
  }

  test("image refs: src, srcset descriptors, picture sources, alt") {
    val html =
      """<body>
        |<img src="/a.jpg" alt="first pic">
        |<img src="/b.jpg" srcset="/b.jpg 1x, /b@2x.jpg 2x" alt="second">
        |<picture><source srcset="/c-800.webp 800w, /c-1600.webp 1600w"><img src="/c.webp"></picture>
        |<img srcset="/bare.png">
        |</body>""".stripMargin
    val got = ImageRefs.extract(html).map(r => (r.imgIdx, r.url, r.descriptor, r.alt))
    assert(got == Seq(
      (0, "/a.jpg", "1x", "first pic"),
      (1, "/b.jpg", "1x", "second"),
      (1, "/b.jpg", "1x", "second"),
      (1, "/b@2x.jpg", "2x", "second"),
      (2, "/c-800.webp", "800w", ""),
      (2, "/c-1600.webp", "1600w", ""),
      (3, "/c.webp", "1x", ""),
      (4, "/bare.png", "1x", "")))
  }

  test("page plan corpus: parse agrees with the plan for meta and refs") {
    (0L until 100L).foreach { id =>
      val plan = PageFixtures.pagePlanOf(id)
      val meta = PageMeta.extract(plan.html).map(e => (e.kind, e.key, e.value))
      assert(meta == plan.meta, s"doc $id meta")
      val refs = ImageRefs.extract(plan.html).map(r => (r.imgIdx, r.url, r.descriptor, r.alt))
      assert(refs == plan.refs, s"doc $id refs")
    }
  }

  test("charset detection: every tier fires and matches its constructed case") {
    (0L until 70L).foreach { i =>
      val (bytes, cs, src) = PageFixtures.charsetCaseOf(i)
      assert(CharsetSniff.detect(bytes) == cs, s"case $i charset")
      assert(CharsetSniff.source(bytes) == src, s"case $i source")
    }
    // corners: empty, BOM precedence over a declaration, truncated UTF-8 tail
    assert(CharsetSniff.detectWithSource(Array.emptyByteArray) == (("us-ascii", "ascii")))
    val bomAndDecl = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      """<meta charset="latin1">""".getBytes("US-ASCII")
    assert(CharsetSniff.detectWithSource(bomAndDecl) == (("utf-8", "bom")))
    val cut = "ok ".getBytes("US-ASCII") ++ Array(0xc3.toByte) // lead byte, payload ends
    assert(CharsetSniff.detectWithSource(cut) == (("windows-1252", "fallback")))
  }
}
