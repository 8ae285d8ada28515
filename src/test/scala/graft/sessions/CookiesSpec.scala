package graft.sessions

import graft.SparkSpec
import graft.storage.KeyValueStore

import java.nio.file.Files

/** Session cookie jar + pool persistence (reference sessions/_cookies.py:
  * 60-283 and the SessionPool persistence surface): cookies key on
  * (name, domain, path), same_site is validated, equality is order-free,
  * and the jar persists/restores WITH the pool.
  */
class CookiesSpec extends SparkSpec {

  test("set keys on (name, domain, path); same key overwrites (_cookies.py:88-136)") {
    val c = new SessionCookies
    c.set("sid", "1", domain = "example.com")
    c.set("sid", "2", domain = "example.com") // overwrite
    c.set("sid", "3", domain = "other.org") // distinct key
    assert(c.size == 2)
    assert(c.getCookiesAsDicts.map(_.value).sorted == Seq("2", "3"))
  }

  test("invalid same_site is rejected (_cookies.py:279-283)") {
    val c = new SessionCookies
    c.set("a", "1", sameSite = Some("Lax"))
    intercept[IllegalArgumentException](c.set("b", "2", sameSite = Some("lax")))
  }

  test("cookiesFor applies domain, path and secure matching") {
    val c = new SessionCookies
    c.set("host_only", "1", domain = "example.com")
    c.set("subdomains", "2", domain = ".example.com")
    c.set("deep_path", "3", domain = "example.com", path = "/app")
    c.set("tls_only", "4", domain = "example.com", secure = true)
    c.set("other", "5", domain = "other.org")

    val http = c.cookiesFor("http://example.com/").map(_.name)
    assert(http.contains("host_only") && http.contains("subdomains"))
    assert(!http.contains("deep_path") && !http.contains("tls_only") && !http.contains("other"))

    val sub = c.cookiesFor("http://www.example.com/").map(_.name)
    assert(sub.contains("subdomains") && !sub.contains("host_only"))

    val app = c.cookiesFor("https://example.com/app/page").map(_.name)
    assert(app.contains("deep_path") && app.contains("tls_only"))
  }

  test("equality is by cookie set, order-free (_cookies.py:262-277); JSON round-trips") {
    val a = new SessionCookies
    a.set("x", "1", domain = "d.com")
    a.set("y", "va\"lue", domain = "d.com", httpOnly = true, expires = Some(123L), sameSite = Some("Strict"))
    val b = new SessionCookies
    b.set("y", "va\"lue", domain = "d.com", httpOnly = true, expires = Some(123L), sameSite = Some("Strict"))
    b.set("x", "1", domain = "d.com")
    assert(a == b)
    assert(SessionCookies.fromJson(a.toJson) == a)
    assert(a.copy() == a)
  }

  test("hostile values round-trip: quotes, brackets, braces, control chars (ADVICE r3 #5)") {
    val a = new SessionCookies
    a.set("tricky", """va"l]u}e with \ and	tab""", domain = "d.com")
    a.set("nested", """{"looks":"like json","arr":[1,2]}""", domain = "d.com")
    a.set("nl", "line1\nline2", domain = "d.com")
    assert(SessionCookies.fromJson(a.toJson) == a)
    // a whole pool whose session carries hostile cookie values + a bound id
    // with a quote persists and restores losslessly
    val dir = Files.createTempDirectory("pool-hostile").toString
    val pool = new SessionPool(maxPoolSize = 2, maxUsageCount = 100)
    pool.fillTo(2, 0L)
    val s = pool.getById("session_000000").get
    s.cookies.set("k", """]}"quote""", domain = "x.com")
    pool.persistTo(new KeyValueStore(spark, dir))
    val pool2 = new SessionPool(maxPoolSize = 2, maxUsageCount = 100)
    assert(pool2.restoreFrom(new KeyValueStore(spark, dir)))
    assert(pool2.getById("session_000000").get.cookies.get("k").contains("""]}"quote"""))
    assert(pool2.sessionCount == 2)
  }

  test("pool persists sessions WITH cookies and counters; restore resumes rotation") {
    val dir = Files.createTempDirectory("pool-kvs").toString
    val pool = new SessionPool(maxPoolSize = 3, maxUsageCount = 100)
    pool.fillTo(3, 0L)
    val s0 = pool.getSession(0L) // advances rr to 1
    s0.cookies.set("auth", "tok-abc", domain = "example.com", secure = true)
    s0.markGood()
    pool.getById("session_000001").get.cookies.set("pref", "dark", domain = "example.com")
    pool.persistTo(new KeyValueStore(spark, dir))

    val pool2 = new SessionPool(maxPoolSize = 3, maxUsageCount = 100)
    assert(pool2.restoreFrom(new KeyValueStore(spark, dir)))
    assert(pool2.sessionCount == 3)
    assert(pool2.createdSessionCount == 3)
    val r0 = pool2.getById("session_000000").get
    assert(r0.usageCount == 1)
    assert(r0.cookies.get("auth").contains("tok-abc"))
    assert(pool2.getById("session_000001").get.cookies.get("pref").contains("dark"))
    assert(pool2.getById("session_000002").get.cookies.isEmpty)
    // rotation resumes where it left off: next dispatch is session_000001
    assert(pool2.getSession(0L).id == "session_000001")
  }
}
