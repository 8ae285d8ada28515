package graft.canon

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Golden values pinned by the reference's own tests
  * (/root/reference/tests/unit/_utils/test_requests.py:9-38) plus
  * property tests the reference lacks (SURVEY.md §5).
  */
class UrlCanonSpec extends AnyFunSuite {
  import UrlCanon._

  test("remove_utm_params") {
    assert(normalizeUrl("https://example.com/?utm_source=test&utm_medium=test&key=value") ==
      "https://example.com/?key=value")
  }
  test("retain_sort_non_utm_params") {
    assert(normalizeUrl("http://example.com/?key=value&another_key=another_value") ==
      "http://example.com/?another_key=another_value&key=value")
  }
  test("convert_scheme_netloc_to_lowercase") {
    assert(normalizeUrl("HTTPS://EXAMPLE.COM/?KEY=VALUE") == "https://example.com/?key=value")
  }
  test("handle_empty_url") { assert(normalizeUrl("") == "") }
  test("retain_fragment") {
    assert(normalizeUrl("http://example.com/#fragment", keepFragment = true) ==
      "http://example.com/#fragment")
  }
  test("remove_fragment") {
    assert(normalizeUrl("http://example.com/#fragment") == "http://example.com")
  }
  test("trim_whitespace") {
    assert(normalizeUrl("  https://example.com/  ") == "https://example.com")
  }
  test("sort_query_params") {
    assert(normalizeUrl("http://example.com/?b=2&a=1") == "http://example.com/?a=1&b=2")
  }
  test("strip one trailing slash only") {
    assert(normalizeUrl("https://example.com/a/b/") == "https://example.com/a/b")
    assert(normalizeUrl("https://example.com/a/b") == "https://example.com/a/b")
  }
  test("punycode host") {
    assert(normalizeUrl("https://müller.example.com/p") == "https://xn--mller-kva.example.com/p")
  }
  test("default port dropped, explicit kept") {
    assert(normalizeUrl("https://example.com:443/x") == "https://example.com/x")
    assert(normalizeUrl("https://example.com:8443/x") == "https://example.com:8443/x")
  }
  test("duplicate keys sorted by (k,v)") {
    assert(normalizeUrl("https://example.com/p?a=2&a=1") == "https://example.com/p?a=1&a=2")
  }
  test("percent-encoding: unreserved decoded, reserved kept") {
    assert(normalizeUrl("https://example.com/%7Euser/a%2Fb") == "https://example.com/~user/a%2fb")
  }

  test("normalization is idempotent (property)") {
    val urlGen = for {
      host <- Gen.oneOf("example.com", "Sub.EXample.org", "h0.test")
      path <- Gen.oneOf("", "/", "/a/b/", "/Upper/Case", "/p%20q")
      q <- Gen.oneOf("", "?b=2&a=1", "?utm_source=x&k=v", "?A=1&a=2")
      f <- Gen.oneOf("", "#frag")
    } yield s"https://$host$path$q$f"
    val params = org.scalacheck.Gen.Parameters.default
    (0 until 300).foreach { i =>
      urlGen(params, org.scalacheck.rng.Seed(i.toLong)).foreach { url =>
        val once = normalizeUrl(url)
        assert(normalizeUrl(once) == once, s"not idempotent for $url")
      }
    }
  }

  test("resolve: RFC 3986 relative references") {
    assert(resolve("https://a.com/b/c/d;p?q", "g") == "https://a.com/b/c/g")
    assert(resolve("https://a.com/b/c/d", "/x/y") == "https://a.com/x/y")
    assert(resolve("https://a.com/b/c/d", "../e") == "https://a.com/b/e")
    assert(resolve("https://a.com/b/", "./f") == "https://a.com/b/f")
    assert(resolve("https://a.com/b", "//other.org/z") == "https://other.org/z")
    assert(resolve("https://a.com/b", "https://abs.com/p") == "https://abs.com/p")
    assert(resolve("https://a.com/b", "?q=1") == "https://a.com/b?q=1")
    assert(resolve("https://a.com/b", "mailto:x@y.com") == null)
  }

  test("isAbsolute") {
    assert(isAbsolute("https://a.com/x"))
    assert(!isAbsolute("/x"))
    assert(!isAbsolute("mailto:x@y.com"))
    assert(isAbsolute("//a.com/x") == false) // no scheme
  }

  test("scheme gate") {
    assert(isSupportedScheme("https://a.com"))
    assert(isSupportedScheme("http://a.com"))
    assert(!isSupportedScheme("ftp://a.com"))
    assert(!isSupportedScheme("mailto:x@y.com"))
  }
}
