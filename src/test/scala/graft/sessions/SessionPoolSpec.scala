package graft.sessions

import org.scalatest.funsuite.AnyFunSuite

/** Session pool (R4) semantics — reference sessions/_session.py /
  * _session_pool.py; rotation on error/retire, usage wear-out, age expiry.
  */
class SessionPoolSpec extends AnyFunSuite {

  test("session wears out at max usage and is replaced") {
    val pool = new SessionPool(maxPoolSize = 1, maxUsageCount = 3)
    val ids = (0 until 9).map(_ => pool.getSession(0L).id)
    assert(ids == Seq("session_000000", "session_000000", "session_000000",
      "session_000001", "session_000001", "session_000001",
      "session_000002", "session_000002", "session_000002"))
    assert(pool.retiredSessionCount == 2)
  }

  test("error score: three bad marks block the session; good marks walk it back") {
    val s = new Session("s")
    s.markBad(); s.markBad()
    assert(!s.isBlocked)
    s.markGood() // 2.0 -> 1.5
    s.markBad(); s.markBad() // 3.5 -> blocked
    assert(s.isBlocked)
  }

  test("retire() blocks immediately and the pool rotates past it") {
    val pool = new SessionPool(maxPoolSize = 2, maxUsageCount = 100)
    pool.fillTo(2, 0L)
    val a = pool.getSession(0L)
    a.retire()
    val next = pool.getSession(0L)
    assert(next.id != a.id)
    // the retired session is evicted on the next dispatch
    assert(pool.getById(a.id).isEmpty || !pool.getById(a.id).get.isUsable(0L))
  }

  test("age expiry: sessions older than max_age are unusable") {
    val s = new Session("s", createdAtMs = 0L, maxAgeMs = 1000L)
    assert(s.isUsable(999L))
    assert(!s.isUsable(1001L))
  }

  test("blocked-content detection (F11): status and selector markers") {
    import graft.canon.Blocked
    assert(Blocked.blockedReason(403, "anything").contains("blocked status 403"))
    assert(Blocked.blockedReason(401, null).isDefined)
    assert(Blocked.blockedReason(429, "ok").isEmpty) // 429 is the throttle path
    assert(Blocked.blockedReason(200,
      """<iframe src="https://challenges.cloudflare.com/t"></iframe>""").exists(_.contains("cloudflare")))
    assert(Blocked.blockedReason(200, "src=/_Incapsula_Resource?x").exists(_.contains("Incapsula")))
    assert(Blocked.blockedReason(200, "<html>fine</html>").isEmpty)
    assert(Blocked.RotateProxyErrors.contains("ECONNRESET"))
  }
}
