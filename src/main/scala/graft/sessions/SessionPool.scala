package graft.sessions

import scala.collection.mutable

/** Session state — reference sessions/_session.py:1-235: a session carries a
  * usage count, an error score, and an age; it becomes unusable when blocked
  * (error score >= max), worn out (usage >= max) or expired (age > max_age).
  * Successful use decrements the error score by `errorScoreDecrement`.
  */
final class Session(
    val id: String,
    val createdAtMs: Long = 0L,
    val maxAgeMs: Long = 50L * 60L * 1000L,
    val maxErrorScore: Double = 3.0,
    val errorScoreDecrement: Double = 0.5,
    val maxUsageCount: Int = 50
) extends Serializable {

  var usageCount: Int = 0
  var errorScore: Double = 0.0

  /** Per-session cookie jar (reference _session.py:75, sessions/_cookies.py)
    * — persisted with the pool state.
    */
  val cookies = new SessionCookies

  /** Per-session browser-like header identity (reference fingerprint_suite
    * _header_generator.py via the session pool): deterministic in the
    * session id, stable across every dispatch of this session.
    */
  lazy val headers: Map[String, String] = graft.fingerprint.HeaderGenerator.forSession(id)

  def isBlocked: Boolean = errorScore >= maxErrorScore
  def isMaxUsageCountReached: Boolean = usageCount >= maxUsageCount
  def isExpired(nowMs: Long): Boolean = nowMs - createdAtMs > maxAgeMs
  def isUsable(nowMs: Long): Boolean = !isBlocked && !isMaxUsageCountReached && !isExpired(nowMs)

  def markUsed(): Unit = usageCount += 1

  /** Successful use walks the error score back toward 0 (_session.py:198-204). */
  def markGood(): Unit = if (errorScore > 0) errorScore = math.max(0.0, errorScore - errorScoreDecrement)

  def markBad(): Unit = errorScore += 1.0

  /** Hard retire: blocked immediately (_session.py:206-214). */
  def retire(): Unit = errorScore = maxErrorScore
}

/** Session pool (R4) — reference sessions/_session_pool.py:36-225.
  *
  * Documented substitution: the reference picks a RANDOM usable session per
  * request; this pool picks round-robin so crawls are reproducible (the
  * anti-blocking property — spreading load over many identities — is the
  * same; only the schedule is deterministic). Retired sessions are removed
  * and replaced lazily up to `maxPoolSize`.
  */
final class SessionPool(
    val maxPoolSize: Int = 1000,
    val maxUsageCount: Int = 50,
    val maxErrorScore: Double = 3.0,
    val maxAgeMs: Long = 50L * 60L * 1000L
) extends Serializable {

  private val sessions = mutable.ArrayBuffer.empty[Session]
  private var createdTotal: Long = 0L
  private var retiredTotal: Long = 0L
  private var rr: Int = 0

  private def newSession(nowMs: Long): Session = {
    val s = new Session(f"session_$createdTotal%06d", createdAtMs = nowMs,
      maxAgeMs = maxAgeMs, maxErrorScore = maxErrorScore, maxUsageCount = maxUsageCount)
    createdTotal += 1
    s
  }

  /** Drop unusable sessions (reference _remove_retired_sessions). */
  private def evict(nowMs: Long): Unit = {
    val before = sessions.size
    sessions.filterInPlace(_.isUsable(nowMs))
    retiredTotal += before - sessions.size
    if (rr >= sessions.size) rr = 0
  }

  def sessionCount: Int = sessions.size
  def usableSessionCount(nowMs: Long): Int = sessions.count(_.isUsable(nowMs))
  def retiredSessionCount: Long = retiredTotal
  def createdSessionCount: Long = createdTotal

  /** Round-robin usable session; creates lazily up to maxPoolSize. Marks it
    * used (every get is a dispatch, _session_pool.py:180-198).
    */
  def getSession(nowMs: Long): Session = {
    evict(nowMs)
    // lazy top-up: replace what retirement removed, one per dispatch, up to
    // the cap (the reference's eager fill-to-max is available via fillTo)
    if (sessions.isEmpty) sessions += newSession(nowMs)
    val s = sessions(rr % sessions.size)
    rr = (rr + 1) % sessions.size
    s.markUsed()
    s
  }

  /** Grow the pool toward a target (callers wanting reference-style
    * pre-fill; capped at maxPoolSize).
    */
  def fillTo(n: Int, nowMs: Long): Unit = {
    evict(nowMs)
    while (sessions.size < math.min(n, maxPoolSize)) sessions += newSession(nowMs)
  }

  def getById(id: String): Option[Session] = sessions.find(_.id == id)

  // ---- bulk (bench-mode) accounting: the engine computes the round-robin
  // assignment as a COLUMN over the dispatch batch (sess_idx = (rr +
  // dispatch_rank - 1) % size) and folds the per-session counts back in one
  // driver step — same schedule as getSession() one-by-one, minus the
  // per-row driver loop. Precondition: a stable pool (no mid-batch
  // retirement), which bulk callers assert by configuration. ----

  /** Current round-robin cursor (the next session index to dispatch). */
  def rrIndex: Int = rr

  def sessionAt(i: Int): Session = sessions(i)

  /** Record `n` bulk-assigned dispatches for session `i` and advance the
    * cursor by the batch total after all per-session counts are folded.
    */
  def recordBulkUse(i: Int, n: Long): Unit = sessionAt(i).usageCount += n.toInt

  def recordBulkUse(s: Session, n: Long): Unit = s.usageCount += n.toInt

  /** Fold a batch's per-session outcome aggregates into session state:
    * `goods` successful dispatches walk the error score down by the same
    * closed form as `goods` sequential markGood() calls (monotone with a 0
    * floor, so the fold commutes), and any blocked dispatch retires the
    * session. Exact across batch boundaries under the bulk precondition
    * (no mid-batch state transition feeding back into the same batch's
    * schedule).
    */
  def recordBulkOutcomes(s: Session, goods: Long, blocked: Long): Unit = {
    if (goods > 0 && s.errorScore > 0)
      s.errorScore = math.max(0.0, s.errorScore - goods * s.errorScoreDecrement)
    if (blocked > 0) s.retire()
  }

  def advanceRr(total: Long): Unit =
    if (sessions.nonEmpty) rr = ((rr + total) % sessions.size).toInt

  // ---- persistence (reference RecoverableState over SessionPool state +
  // cookies, _session_pool.py persistence surface + _session.py:79-97) ----

  def toJson: String = {
    import SessionCookies.{q => jq}
    val ss = sessions.map { s =>
      s"""{"id":${jq(s.id)},"created_at":${s.createdAtMs},"usage":${s.usageCount},""" +
        s""""error_score":${s.errorScore},"cookies":${s.cookies.toJson}}"""
    }.mkString("[", ",", "]")
    s"""{"created_total":$createdTotal,"retired_total":$retiredTotal,"rr":$rr,"sessions":$ss}"""
  }

  /** Persist the full pool state (sessions, counters, cookie jars) to the
    * KVS under `key`.
    */
  def persistTo(kvs: graft.storage.KeyValueStore, key: String = "__SESSION_POOL_STATE"): Unit = {
    kvs.setJson(key, toJson)
    kvs.persist()
  }

  /** Restore pool state persisted by [[persistTo]]; a missing key leaves
    * the pool empty (fresh start). Returns whether state was restored.
    * Escape-aware (ADVICE r3 #5): ids and cookie values containing quotes
    * or brackets round-trip exactly through the real JSON parser.
    */
  def restoreFrom(kvs: graft.storage.KeyValueStore, key: String = "__SESSION_POOL_STATE"): Boolean =
    kvs.getJson(key) match {
      case None => false
      case Some(json) =>
        import graft.util.Json
        val root = Json.obj(Json.parse(json))
        sessions.clear()
        createdTotal = root.get("created_total").map(Json.long).getOrElse(0L)
        retiredTotal = root.get("retired_total").map(Json.long).getOrElse(0L)
        rr = root.get("rr").map(Json.long).getOrElse(0L).toInt
        root.get("sessions").map(Json.arr).getOrElse(Vector.empty).foreach { sv =>
          val o = Json.obj(sv)
          val s = new Session(Json.str(o("id")),
            createdAtMs = o.get("created_at").map(Json.long).getOrElse(0L),
            maxAgeMs = maxAgeMs, maxErrorScore = maxErrorScore, maxUsageCount = maxUsageCount)
          s.usageCount = o.get("usage").map(Json.long).getOrElse(0L).toInt
          s.errorScore = o.get("error_score").map(Json.double).getOrElse(0.0)
          o.get("cookies").map(Json.arr).getOrElse(Vector.empty)
            .foreach(cv => s.cookies.setCookies(Seq(SessionCookies.cookieFromValue(cv))))
          sessions += s
        }
        if (rr >= sessions.size) rr = 0
        true
    }
}
