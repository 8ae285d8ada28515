package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** html_to_text semantics (reference crawlers/_parsel/_utils.py:16-76 +
  * _utils/html_to_text.py constants) — hand-pinned cases mirroring the
  * reference behavior, then full-corpus agreement with the independent
  * tree-walk expected text of the HtmlDocs fixture.
  */
class HtmlToTextSpec extends AnyFunSuite {

  private def conv(html: String): String = HtmlToText.convert(html)

  test("whitespace runs compress; block tags newline-separate") {
    assert(conv("<p>hello   world</p><p>again</p>") == "hello world\nagain")
    assert(conv("<div>a</div><div>b</div><div>c</div>") == "a\nb\nc")
    // inline tags add no separators
    assert(conv("<span>a</span><b>b</b>c") == "abc")
    assert(conv("one\n\n  two") == "one two")
  }

  test("skip tags drop whole subtrees; comments and doctype are invisible") {
    assert(conv("<script>var a = 1 < 2;</script>visible") == "visible")
    assert(conv("<style>p { color: red }</style>x") == "x")
    assert(conv("<title>nope</title>yes") == "yes")
    assert(conv("<svg><circle r=\"4\"/>inner</svg>after") == "after")
    assert(conv("<noscript>no js</noscript>ok") == "ok")
    assert(conv("<!DOCTYPE html><!-- note <b>bold</b> -->text") == "text")
  }

  test("br emits newline, td emits tab after its content") {
    assert(conv("a<br>b") == "a\nb")
    assert(conv("a<br/>b<br />c") == "a\nb\nc")
    assert(conv("<table><tr><td>c1</td><td>c2</td></tr></table>") == "c1\tc2")
  }

  test("pre keeps raw whitespace for its DIRECT text children only") {
    assert(conv("<pre>  a   b\n\tc</pre>") == "a   b\n\tc")
    // nested element inside pre reverts to compression (direct-parent rule)
    // (no separator appears between the raw run and the span's own text —
    // inline tags contribute nothing, exactly like the reference walker)
    assert(conv("<pre>raw  run<span>x   y</span></pre>") == "raw  runx y")
  }

  test("leading whitespace is dropped when text already ends in whitespace") {
    assert(conv("a <span> b</span>") == "a b")
    assert(conv("<p>x</p>   y") == "x\ny")
  }

  test("entities decode; attribute values with > and quotes don't break parsing") {
    assert(conv("a &amp; b &lt;tag&gt; &#65;&#x42;") == "a & b <tag> AB")
    assert(conv("""<a href="/x?a=1&amp;b=2" title="a > b">link</a>""") == "link")
    assert(conv("""<img src="broken>no" alt="t"/>after""") == "after")
  }

  test("lenient parsing: unclosed and mismatched tags don't lose text") {
    assert(conv("<div><p>open") == "open")
    assert(conv("<b>x</i>y</b>z") == "xyz")
    assert(conv("</div>orphan close") == "orphan close")
  }

  test("reference shape: nested blocks never double newlines; result is trimmed") {
    assert(conv("<div><p>inner</p></div>tail") == "inner\ntail")
    assert(conv("  <p>  padded  </p>  ") == "padded")
  }

  test("engine parse agrees with the independent tree-walk oracle on all 400 fixture docs") {
    var checked = 0
    (0L until 400L).foreach { id =>
      val html = graft.fixtures.HtmlDocs.htmlOf(id)
      val expected = graft.fixtures.HtmlDocs.expectedOf(id)
      val got = conv(html)
      assert(got == expected, s"doc $id mismatch:\n--- got ---\n$got\n--- expected ---\n$expected")
      checked += 1
    }
    assert(checked == 400)
    // and the corpus is non-trivial: most docs have content, some have pre/td
    val texts = (0L until 400L).map(graft.fixtures.HtmlDocs.expectedOf)
    assert(texts.count(_.nonEmpty) > 350)
    assert(texts.exists(_.contains("\t")))
    assert(texts.exists(_.contains("\n")))
  }
}
