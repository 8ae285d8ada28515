package graft.canon

import org.scalatest.funsuite.AnyFunSuite

/** Golden values from /root/reference/tests/unit/_utils/test_requests.py:41-125,
  * test_globs.py, test_robots.py, and test_urls.py.
  */
class CanonSpec extends AnyFunSuite {

  // ---- UniqueKey ---------------------------------------------------------

  test("unique key basic: GET and POST collapse to normalized url") {
    val url = "https://crawlee.dev"
    assert(UniqueKey.compute(url, "GET") == url)
    assert(UniqueKey.compute(url, "POST") == url)
  }

  test("unique key fragments") {
    val url = "https://crawlee.dev/#fragment"
    assert(UniqueKey.compute(url, keepUrlFragment = true) == url)
    assert(UniqueKey.compute(url, "GET") == "https://crawlee.dev")
  }

  test("extended unique key with payload") {
    val url = "https://crawlee.dev"
    val payload = """{"key": "value"}""".getBytes("UTF-8")
    assert(UniqueKey.compute(url, "POST", payload = payload) == url)
    assert(UniqueKey.compute(url, "POST", payload = null, useExtendedUniqueKey = true) ==
      "POST|e3b0c442|e3b0c442|https://crawlee.dev")
    assert(UniqueKey.compute(url, "POST", payload = payload, useExtendedUniqueKey = true) ==
      "POST|e3b0c442|9724c1e2|https://crawlee.dev")
  }

  test("extended unique key with headers: only whitelisted participate") {
    val url = "https://crawlee.dev"
    val headers = Seq("Accept" -> "*/*", "Content-Type" -> "application/json")
    assert(UniqueKey.compute(url, headers = headers) == url)
    assert(UniqueKey.compute(url, headers = headers, useExtendedUniqueKey = true) ==
      "GET|4e1a2cf6|e3b0c442|https://crawlee.dev")
    val withEncoding = Seq("Accept" -> "*/*", "Accept-Encoding" -> "gzip, deflate", "Content-Type" -> "application/json")
    assert(UniqueKey.compute(url, headers = withEncoding, useExtendedUniqueKey = true) ==
      "GET|4e1a2cf6|e3b0c442|https://crawlee.dev")
  }

  test("extended unique key complex with session") {
    val url = "https://crawlee.dev"
    val headers = Seq("Accept" -> "*/*", "Content-Type" -> "application/json")
    val payload = """{"key": "value"}""".getBytes("UTF-8")
    assert(UniqueKey.compute(url, "POST", headers, payload, sessionId = "test_session") == url)
    assert(UniqueKey.compute(url, "POST", headers, payload, sessionId = "test_session",
      useExtendedUniqueKey = true) == "POST|4e1a2cf6|9724c1e2|test_session|https://crawlee.dev")
  }

  // ---- Globs (test_globs.py) --------------------------------------------

  test("glob single asterisk") {
    assert(!Globs.matches("foo/*", "bar/"))
    assert(Globs.matches("foo/*", "foo/bar"))
    assert(!Globs.matches("foo/*", "foo/bar/baz"))
  }

  test("glob double asterisk") {
    assert(!Globs.matches("foo/**", "bar/"))
    assert(Globs.matches("foo/**", "foo/bar"))
    assert(Globs.matches("foo/**", "foo/bar/baz"))
  }

  test("glob on full URLs (enqueue include/exclude shape)") {
    assert(Globs.matches("https://example.com/**", "https://example.com/a/b/c"))
    assert(Globs.matches("https://example.com/*", "https://example.com/a"))
    assert(!Globs.matches("https://example.com/*", "https://example.com/a/b"))
    assert(Globs.matches("https://*.example.com/**", "https://sub.example.com/x"))
  }

  // ---- EnqueueStrategy (test_urls.py semantics, _types.py:153-168) -------

  test("strategy all accepts cross-host but scheme gate still applies") {
    assert(EnqueueStrategy.filterUrl("https://other.org/x", "all", "https://h0.example.com")._1)
    val (ok, reason) = EnqueueStrategy.filterUrl("ftp://other.org/x", "all", "https://h0.example.com")
    assert(!ok && reason == EnqueueStrategy.UnsupportedSchemeMessage)
  }

  test("strategy same-hostname") {
    val origin = "https://h0.example.com/page"
    assert(EnqueueStrategy.matches("https://h0.example.com/other", "same-hostname", origin))
    assert(!EnqueueStrategy.matches("https://sub.h0.example.com/x", "same-hostname", origin))
    assert(!EnqueueStrategy.matches("https://other.org/x", "same-hostname", origin))
  }

  test("strategy same-domain via public suffix") {
    val origin = "https://h0.example.com/page"
    assert(EnqueueStrategy.matches("https://sub.h0.example.com/x", "same-domain", origin))
    assert(EnqueueStrategy.matches("https://example.com/x", "same-domain", origin))
    assert(!EnqueueStrategy.matches("https://other.org/x", "same-domain", origin))
    // co.uk must not collapse to uk
    assert(!EnqueueStrategy.matches("https://a.co.uk/x", "same-domain", "https://b.co.uk/x"))
    assert(EnqueueStrategy.matches("https://x.a.co.uk/x", "same-domain", "https://a.co.uk/x"))
    // github.io is a public suffix: two users are different domains
    assert(!EnqueueStrategy.matches("https://alice.github.io/x", "same-domain", "https://bob.github.io/x"))
  }

  test("strategy same-origin: scheme and port matter") {
    val origin = "https://h0.example.com/page"
    assert(EnqueueStrategy.matches("https://h0.example.com:443/x", "same-origin", origin))
    assert(!EnqueueStrategy.matches("http://h0.example.com/x", "same-origin", origin))
    assert(!EnqueueStrategy.matches("https://h0.example.com:8443/x", "same-origin", origin))
  }

  test("host-less target fails all strategies except all") {
    assert(EnqueueStrategy.matches("mailto:x@y.com", "all", "https://a.com"))
    assert(!EnqueueStrategy.matches("mailto:x@y.com", "same-hostname", "https://a.com"))
  }

  // ---- Robots (test_robots.py) -------------------------------------------

  val robotsBody: String =
    """User-agent: *
      |Disallow: *deny_all/
      |crawl-delay: 10
      |User-agent: Googlebot
      |Disallow: *deny_googlebot/""".stripMargin

  test("robots allow/disallow with wildcard rules") {
    val robots = Robots.parse("http://not-exists.com/robots.txt", robotsBody)
    assert(robots.isAllowed("https://crawlee.dev")) // other origin always allowed
    assert(robots.isAllowed("http://not-exists.com/something/page.html"))
    assert(robots.isAllowed("http://not-exists.com/deny_googlebot/page.html"))
    assert(!robots.isAllowed("http://not-exists.com/deny_googlebot/page.html", "Googlebot"))
    assert(!robots.isAllowed("http://not-exists.com/x/deny_all/page.html"))
    assert(robots.crawlDelay() == Some(10))
  }

  test("4xx allows all, 5xx disallows all, fetch error allows all") {
    val r404 = Robots.fromFetch("https://a.com", 404, "User-agent: *\nDisallow: /")
    assert(r404.isAllowed("https://a.com/anything"))
    val r500 = Robots.fromFetch("https://a.com", 500, "User-agent: *\nAllow: /")
    assert(!r500.isAllowed("https://a.com/anything"))
    val rErr = Robots.fromFetch("https://a.com", -1, null)
    assert(rErr.isAllowed("https://a.com/anything"))
  }

  test("longest match wins, allow beats disallow on tie") {
    val body = "User-agent: *\nDisallow: /private\nAllow: /private/public"
    val r = Robots.parse("https://a.com", body)
    assert(!r.isAllowed("https://a.com/private/x"))
    assert(r.isAllowed("https://a.com/private/public/x"))
    assert(r.isAllowed("https://a.com/other"))
  }

  test("dollar anchor") {
    val r = Robots.parse("https://a.com", "User-agent: *\nDisallow: /*.pdf$")
    assert(!r.isAllowed("https://a.com/doc.pdf"))
    assert(r.isAllowed("https://a.com/doc.pdf.html"))
  }

  test("robots url derivation") {
    assert(Robots.robotsUrl("https://h0.example.com/deep/page?x=1") == "https://h0.example.com/robots.txt")
    assert(Robots.robotsUrl("https://h0.example.com:8443/p") == "https://h0.example.com:8443/robots.txt")
  }

  test("sitemap directives collected") {
    val body = "User-agent: *\nSitemap: http://example.com/s1.xml\nSitemap: http://example.com/s2.xml"
    val r = Robots.parse("http://example.com/robots.txt", body)
    assert(r.sitemaps == Seq("http://example.com/s1.xml", "http://example.com/s2.xml"))
  }

  // ---- PublicSuffix -------------------------------------------------------

  test("registrable domain") {
    val psl = PublicSuffix.default
    assert(psl.registrableDomain("a.b.example.com") == "example.com")
    assert(psl.registrableDomain("example.com") == "example.com")
    assert(psl.registrableDomain("sub.example.co.uk") == "example.co.uk")
    assert(psl.registrableDomain("com") == "")
    assert(psl.registrableDomain("192.168.0.1") == "")
    assert(psl.registrableDomain("alice.github.io") == "alice.github.io")
    assert(psl.registrableDomain("deep.alice.github.io") == "alice.github.io")
  }

  // ---- Hashing ------------------------------------------------------------

  test("short hash matches reference sha256 prefixes") {
    // e3b0c442... = sha256 of empty input (well-known)
    assert(Hashing.shortHash(Array.emptyByteArray) == "e3b0c442")
    assert(Hashing.shortHash("""{"key": "value"}""".getBytes("UTF-8")) == "9724c1e2")
  }

  test("robots parse cache keys on (host, status, body) — no stale rules (ADVICE r3 #2)") {
    val host = "cachekey-test.example"
    val r1 = Robots.cachedFromFetch(host, 200, "User-agent: *\nDisallow: /private")
    assert(!r1.isAllowed(s"https://$host/private/x"))
    // same host, DIFFERENT body (e.g. refreshed robots table mid-crawl, or a
    // second run in the same JVM): must re-parse, not serve the stale rules
    val r2 = Robots.cachedFromFetch(host, 200, "User-agent: *\nAllow: /")
    assert(r2.isAllowed(s"https://$host/private/x"))
    // and a different STATUS flips semantics even with the same body
    val r3 = Robots.cachedFromFetch(host, 503, "User-agent: *\nAllow: /")
    assert(!r3.isAllowed(s"https://$host/anything"))
    // identical triple hits the cache (same instance back)
    assert(Robots.cachedFromFetch(host, 200, "User-agent: *\nAllow: /") eq r2)
  }

  test("xxh64 known-answer vectors (seed 42, Spark-compatible)") {
    // Cross-checked against Spark's xxhash64 in SparkParitySpec
    assert(Hashing.xxh64(Array.emptyByteArray, 42L) == Hashing.xxh64("".getBytes("UTF-8"), 42L))
    assert(Hashing.xxh64("abc") != Hashing.xxh64("abd"))
    // determinism across lengths covering all code paths (tail <4, 4-7, 8-31, >=32)
    val lengths = Seq(0, 1, 3, 4, 7, 8, 15, 31, 32, 33, 64, 100)
    val hashes = lengths.map(n => Hashing.xxh64(("x" * n).getBytes("UTF-8"), 42L))
    assert(hashes.distinct.size == hashes.size)
  }
}
