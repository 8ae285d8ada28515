package graft.stats

import graft.storage.KeyValueStore

/** Persistent crawler-run statistics state — the reference's
  * `StatisticsState` held in a `RecoverableState` and persisted to the KVS
  * under `__CRAWLER_STATISTICS_{id}` (statistics/_statistics.py:80,95-103,
  * 284-299; models at statistics/_models.py:60-120): monotone counters +
  * dense retry histogram + accumulated crawler runtime. A restarted crawl
  * RESUMES these counters instead of starting from zero
  * (tests/unit/crawlers/_basic/test_basic_crawler.py:2155-2248).
  *
  * The histogram is dense (index = retry count), like the reference's
  * serialized `request_retry_histogram`.
  */
final case class StatisticsState(
    requestsFinished: Long = 0L,
    requestsFailed: Long = 0L,
    requestsRetries: Long = 0L,
    retryHistogram: Vector[Long] = Vector.empty,
    crawlerRuntimeMs: Long = 0L
) {
  def requestsTotal: Long = requestsFinished + requestsFailed

  def toJson: String = {
    val hist = retryHistogram.mkString("[", ",", "]")
    s"""{"requests_finished":$requestsFinished,"requests_failed":$requestsFailed,""" +
      s""""requests_retries":$requestsRetries,"retry_histogram":$hist,""" +
      s""""crawler_runtime_ms":$crawlerRuntimeMs}"""
  }
}

object StatisticsState {
  private def longField(json: String, name: String): Long = {
    val m = java.util.regex.Pattern.compile("\"" + name + "\"\\s*:\\s*(-?\\d+)").matcher(json)
    if (m.find()) m.group(1).toLong else 0L
  }

  def fromJson(json: String): StatisticsState = {
    val histM = java.util.regex.Pattern
      .compile("\"retry_histogram\"\\s*:\\s*\\[([^\\]]*)\\]").matcher(json)
    val hist =
      if (histM.find() && histM.group(1).trim.nonEmpty)
        histM.group(1).split(",").map(_.trim.toLong).toVector
      else Vector.empty[Long]
    StatisticsState(
      requestsFinished = longField(json, "requests_finished"),
      requestsFailed = longField(json, "requests_failed"),
      requestsRetries = longField(json, "requests_retries"),
      retryHistogram = hist,
      crawlerRuntimeMs = longField(json, "crawler_runtime_ms")
    )
  }
}

/** Driver-side mutable statistics bound to a KVS for persistence/resume.
  * Mirrors the reference Statistics lifecycle: construct -> (implicitly)
  * resume any persisted state -> record per-request outcomes -> persist on
  * the PERSIST_STATE cadence and at crawl end.
  */
final class RunStatistics(kvs: KeyValueStore, key: String = "__CRAWLER_STATISTICS_0") {

  var state: StatisticsState =
    kvs.getJson(key).map(StatisticsState.fromJson).getOrElse(StatisticsState())

  private def bump(hist: Vector[Long], retryCount: Int, n: Long): Vector[Long] = {
    val padded = if (hist.size > retryCount) hist else hist ++ Vector.fill(retryCount + 1 - hist.size)(0L)
    padded.updated(retryCount, padded(retryCount) + n)
  }

  /** A request reached its terminal state; `retryCount` is its final retry
    * count (reference _save_retry_count_for_request,
    * _statistics.py:291-299).
    */
  def recordTerminal(finished: Boolean, retryCount: Int, n: Long = 1L): Unit = {
    var s = state
    s =
      if (finished) s.copy(requestsFinished = s.requestsFinished + n)
      else s.copy(requestsFailed = s.requestsFailed + n)
    if (retryCount > 0) s = s.copy(requestsRetries = s.requestsRetries + n)
    state = s.copy(retryHistogram = bump(s.retryHistogram, retryCount, n))
  }

  def addRuntime(ms: Long): Unit = state = state.copy(crawlerRuntimeMs = state.crawlerRuntimeMs + ms)

  /** Persist to the KVS and commit a snapshot (PERSIST_STATE analogue). */
  def persist(): Unit = {
    kvs.setJson(key, state.toJson)
    kvs.persist()
  }
}
