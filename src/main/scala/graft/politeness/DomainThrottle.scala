package graft.politeness

import scala.collection.mutable

/** Per-host politeness state on the engine's virtual batch clock
  * (SURVEY.md §2.5). Semantics from the reference ThrottlingRequestManager
  * (/root/reference/src/crawlee/request_loaders/_throttling_request_manager.py):
  *
  *   - P3: consecutive-429 exponential backoff, delay = 2s * 2^(n-1) capped
  *     at 60s (`:78-79,291-337`); success resets the counter.
  *   - P4: robots `Crawl-delay` locked at first value per domain
  *     (`:339-354`); each dispatch pushes next-allowed by the delay
  *     (`:398-405`). The batch analogue: per-host quota =
  *     floor(batchPeriod / delay), minimum 1 when the host is not throttled.
  *
  * Driver-side state, re-broadcast each micro-batch via the claim's quota
  * map — the Spark form of the reference's in-memory DomainState.
  */
final class DomainThrottle(crawlDelaySecs: Map[String, Int]) extends Serializable {

  val BackoffBaseMs = 2000L
  val BackoffCapMs = 60000L

  private val consecutive429 = mutable.HashMap.empty[String, Int].withDefaultValue(0)
  private val throttledUntilMs = mutable.HashMap.empty[String, Long].withDefaultValue(0L)

  def backoffMs(n: Int): Long =
    math.min(BackoffBaseMs * (1L << math.max(0, n - 1)), BackoffCapMs)

  /** Hosts fully blocked at `nowMs` (still inside a 429 backoff window). */
  def blockedHosts(nowMs: Long): Set[String] =
    throttledUntilMs.collect { case (h, until) if until > nowMs => h }.toSet

  /** Per-host claim quota for a batch of `batchPeriodMs` starting at nowMs.
    * Hosts without crawl-delay get no entry (unlimited).
    */
  def quotas(nowMs: Long, batchPeriodMs: Long): Map[String, Int] =
    crawlDelaySecs.collect {
      case (host, delay) if delay > 0 =>
        val q =
          if (throttledUntilMs(host) > nowMs) 0
          else math.max(1L, batchPeriodMs / (delay * 1000L)).toInt
        host -> q
    }

  /** Fold one batch's fetch outcome into the state.
    *
    * `retryAfterSecsPerHost`: max Retry-After header seen on this batch's
    * 429 responses per host. When present it takes PRIORITY over the
    * exponential schedule (_throttling_request_manager.py:311-326: the
    * parsed header value is used as the delay; the consecutive-429 counter
    * still advances so a later header-less 429 resumes the schedule at the
    * right step).
    */
  def update(
      nowMs: Long,
      claimedPerHost: Map[String, Long],
      got429PerHost: Map[String, Long],
      retryAfterSecsPerHost: Map[String, Int] = Map.empty
  ): Unit = {
    claimedPerHost.foreach { case (host, _) =>
      if (got429PerHost.getOrElse(host, 0L) > 0) {
        val n = consecutive429(host) + 1
        consecutive429(host) = n
        val delayMs = retryAfterSecsPerHost.get(host) match {
          // header value is still capped at the max delay (reference
          // _throttling_request_manager.py:311-318 caps either source)
          case Some(secs) if secs >= 0 => math.min(secs.toLong * 1000L, BackoffCapMs)
          case _ => backoffMs(n)
        }
        throttledUntilMs(host) = nowMs + delayMs
      } else {
        // success resets the schedule — REMOVE the entries rather than
        // writing 0, so driver state size tracks hosts in an active 429
        // episode only, never every host ever claimed (at the 10^10 design
        // point ~10^8 distinct hosts would otherwise accumulate here).
        consecutive429.remove(host)
        throttledUntilMs.remove(host)
        // crawl-delay dispatch push: next batch naturally rate-limited by quota
      }
    }
  }

  def state: Map[String, (Int, Long)] =
    (consecutive429.keySet ++ throttledUntilMs.keySet)
      .map(h => h -> ((consecutive429(h), throttledUntilMs(h)))).toMap
}

object DomainThrottle {

  /** Parse a Retry-After header value into delay SECONDS — int delay-seconds
    * (non-negative per RFC 7231; malformed negatives ignored) or an
    * HTTP-date, with a naive date treated as UTC. Mirrors the reference's
    * parse_retry_after_header (tests pinned at
    * tests/unit/test_throttling_request_manager.py:533-575).
    */
  def parseRetryAfter(value: String, nowEpochMs: Long): Option[Long] = {
    if (value == null) return None
    val t = value.trim
    if (t.isEmpty) return None
    t.toLongOption match {
      case Some(secs) => if (secs >= 0) Some(secs) else None
      case None =>
        val fromDate =
          try {
            val dt = java.time.ZonedDateTime
              .parse(t, java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)
            Some(dt.toInstant.toEpochMilli)
          } catch {
            case _: Exception =>
              try {
                val ldt = java.time.LocalDateTime.parse(
                  t,
                  java.time.format.DateTimeFormatter
                    .ofPattern("EEE, dd MMM yyyy HH:mm:ss", java.util.Locale.US)
                )
                Some(ldt.toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
              } catch { case _: Exception => None }
          }
        fromDate.map(epochMs => math.max(0L, (epochMs - nowEpochMs) / 1000L))
    }
  }
}
