package graft.stats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Run statistics (SURVEY.md §2.8 A1-A8) over the per-request log table —
  * the reference's Statistics/StatisticsState
  * (/root/reference/src/crawlee/statistics/_statistics.py:60-299) recomputed
  * as aggregates instead of mutated counters:
  *
  *   A1 finished/failed/retry totals, A2 duration min/max/total/avg,
  *   A3 retry histogram (dense list), A4 per-status-code counts,
  *   A5 requests/minute rates (the BASELINE throughput metric),
  *   A6 error tracker with message wildcarding, A8 queue metadata counts.
  *
  * Log rows follow graft.schema.RequestLogRow.
  */
object Statistics {

  /** A1 + A2 + A5: the FinalStatistics scalar block. */
  def finalStatistics(log: DataFrame, crawlerRuntimeMs: Long): DataFrame = {
    val runtimeMin = math.max(crawlerRuntimeMs / 60000.0, 1e-9)
    log.agg(
      count(when(col("outcome") === "handled", 1)).as("requests_finished"),
      count(when(col("outcome").isin("fail", "exhausted"), 1)).as("requests_failed"),
      sum(when(col("retry_count") > 0, 1).otherwise(0)).as("requests_retried"),
      min(col("duration_ms")).as("request_min_duration_ms"),
      max(col("duration_ms")).as("request_max_duration_ms"),
      sum(col("duration_ms")).as("request_total_duration_ms"),
      avg(col("duration_ms")).as("request_avg_duration_ms"),
      (count(when(col("outcome") === "handled", 1)) / runtimeMin).as("requests_finished_per_minute"),
      (count(when(col("outcome").isin("fail", "exhausted"), 1)) / runtimeMin).as("requests_failed_per_minute"),
      sum(col("n_images_emitted")).as("images_emitted"),
      sum(col("n_links_extracted")).as("links_extracted")
    )
  }

  /** A3: retry histogram as (retry_count, freq) — serialized dense by the
    * caller (the reference stores a dense list, statistics/_models.py:97-105).
    */
  def retryHistogram(log: DataFrame): DataFrame =
    log.groupBy(col("retry_count")).agg(count(lit(1)).as("freq")).orderBy(col("retry_count"))

  def denseRetryHistogram(log: DataFrame): Seq[Long] = {
    val rows = retryHistogram(log).collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    if (rows.isEmpty) Seq.empty
    else (0 to rows.keys.max).map(i => rows.getOrElse(i, 0L))
  }

  /** A4: per-status-code counts. */
  def statusCodeCounts(log: DataFrame): DataFrame =
    log.groupBy(col("status_code")).agg(count(lit(1)).as("cnt")).orderBy(col("status_code"))

  /** A6: error tracker — groups similar messages by wildcarding varying
    * tokens (numbers, quoted strings, hex ids), mirroring the reference
    * ErrorTracker's message generalization (statistics/_error_tracker.py).
    */
  def errorGroups(errors: DataFrame, messageCol: String = "message"): DataFrame = {
    val wildcarded = regexp_replace(
      regexp_replace(
        regexp_replace(col(messageCol), "'[^']*'", "'***'"),
        "\\b[0-9a-fA-F]{8,}\\b", "***"),
      "\\b\\d+\\b", "***")
    errors
      .withColumn("error_group", wildcarded)
      .groupBy(col("error_group"))
      .agg(count(lit(1)).as("occurrences"), countDistinct(col(messageCol)).as("distinct_messages"))
      .orderBy(col("occurrences").desc, col("error_group"))
  }

  /** A8: queue metadata snapshot per batch: status -> count. */
  def queueCounts(frontierState: DataFrame): DataFrame =
    frontierState.groupBy(col("status")).agg(count(lit(1)).as("cnt")).orderBy(col("status"))
}
