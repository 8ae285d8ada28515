package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.UrlFunctions

/** Frontier-analytics operators: the per-host / per-URL aggregate signals a
  * 10^10-URL crawl scheduler feeds back into prioritization — spam-farm
  * demotion and change-rate-driven revisit scheduling. Both are single
  * map-combinable aggregations whose output is one row per host/URL (tiny
  * against the corpus), so the shuffle moves statistics, not pages.
  */
object CrawlAnalytics {

  /** Host-level crawl-quality signals (SEO-farm / crawler-trap demotion —
    * the frontier-side counterpart of the document-quality filters): per
    * registrable host, URL-shape statistics and a composite spam score.
    *
    * Signals (each a ratio in [0,1], rounded once to 6 dp so the composite
    * is reproducible cross-engine):
    *  - dup_path_ratio: 1 − distinct(path)/urls — calendar traps and
    *    session-id explosions revisit the same paths under varying queries;
    *  - deep_ratio: fraction of URLs deeper than `deepDepth` segments —
    *    infinite-recursion traps grow arbitrarily deep paths;
    *  - param_ratio: fraction of URLs carrying a query string — faceted
    *    search / tracking-parameter farms.
    *
    * spam_score = 0.5·dup + 0.3·deep + 0.2·param (computed FROM the rounded
    * ratios), flagged at `threshold`. Host parsing is the native
    * [[graft.expr.UrlFunctions.hostOf]] codegen expression; path depth is
    * regex + split (no UDF).
    *
    * Scale shape: one groupBy(host) with count / count-distinct partials —
    * output rows = distinct hosts. The scheduler joins the (host, score)
    * table back into claim prioritization the same way crawl-delay quotas
    * ride [[graft.queue.FrontierStore]]'s quota table.
    *
    * Output: (host, n_urls, n_paths, dup_path_ratio, deep_ratio,
    * param_ratio, spam_score, is_spam).
    */
  def hostQuality(
      df: DataFrame,
      urlCol: String,
      deepDepth: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    UrlFunctions.register(df.sparkSession) // host_of is a session temp function
    val path = regexp_extract(col(urlCol), "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    val depth = size(filter(split(path, "/"), s => length(s) > 0))
    val shaped = df.select(
      UrlFunctions.hostOf(col(urlCol)).as("host"),
      path.as("__path"),
      depth.as("__depth"),
      col(urlCol).contains("?").cast("int").as("__has_q"))
    val agg = shaped
      .groupBy(col("host"))
      .agg(
        count(lit(1)).as("n_urls"),
        countDistinct(col("__path")).as("n_paths"),
        sum(when(col("__depth") > deepDepth, 1L).otherwise(0L)).as("__n_deep"),
        sum(col("__has_q")).as("__n_q"))
    val dup = round(lit(1.0) - col("n_paths").cast("double") / col("n_urls"), 6)
    val deep = round(col("__n_deep").cast("double") / col("n_urls"), 6)
    val par = round(col("__n_q").cast("double") / col("n_urls"), 6)
    agg
      .select(col("host"), col("n_urls"), col("n_paths"),
        dup.as("dup_path_ratio"), deep.as("deep_ratio"), par.as("param_ratio"))
      .withColumn("spam_score",
        round(lit(0.5) * col("dup_path_ratio") + lit(0.3) * col("deep_ratio") +
          lit(0.2) * col("param_ratio"), 6))
      .withColumn("is_spam", col("spam_score") >= threshold)
  }

  /** Change-rate estimation + revisit scheduling (Cho & Garcia-Molina 2003,
    * "Estimating frequency of change"): for each URL with `n` visits of
    * which `x` detected a changed payload, the bias-corrected estimator of
    * the per-visit change probability is
    *
    *   r̂ = −ln((n − x + 0.5) / (n + 0.5))
    *
    * (the naive x/n systematically underestimates fast-changing pages a
    * uniform revisit cadence can't catch twice). Both 0.5-offset operands
    * are exactly representable halves, the division is one correctly-
    * rounded IEEE op, and the single ln is rounded once to 9 dp — so an
    * independent engine reproduces the schedule bit-for-bit.
    *
    * The bucket thresholds compare the ROUNDED rate: fast (r̂ ≥ fastCut)
    * pages revisit every cycle, slow (r̂ < slowCut) pages fall to the
    * archive cadence, the rest hold the default.
    *
    * Scale shape: one groupBy(url) over the visit log — counts only; the
    * (url, bucket) table is the input to the next crawl's priority column.
    *
    * Input: (urlCol, changedCol boolean). Output: (url, n_visits,
    * n_changes, change_rate, revisit_bucket).
    */
  /** Recrawl snapshot diff (the CDC question between two crawl epochs):
    * classify every URL present in either snapshot as added / removed /
    * changed / unchanged by content hash. One full-outer equi-join on the
    * URL — both sides shuffle-partitioned by the same key, no skew beyond
    * the URL distribution itself; output feeds [[revisitSchedule]]'s
    * `changed` flag for the next epoch's scheduling.
    *
    * Output: (url, prev_hash, curr_hash, status).
    */
  def crawlDiff(
      prev: DataFrame,
      curr: DataFrame,
      urlCol: String,
      hashCol: String): DataFrame = {
    val p = prev.select(col(urlCol).as("url"), col(hashCol).as("prev_hash"))
    val c = curr.select(col(urlCol).as("url"), col(hashCol).as("curr_hash"))
    p.join(c, Seq("url"), "full_outer")
      .select(
        col("url"), col("prev_hash"), col("curr_hash"),
        when(col("prev_hash").isNull, lit("added"))
          .when(col("curr_hash").isNull, lit("removed"))
          .when(col("prev_hash") === col("curr_hash"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  def revisitSchedule(
      history: DataFrame,
      urlCol: String,
      changedCol: String,
      fastCut: Double = 0.7,
      slowCut: Double = 0.1): DataFrame = {
    val agg = history
      .groupBy(col(urlCol).as("url"))
      .agg(
        count(lit(1)).as("n_visits"),
        sum(when(col(changedCol), 1L).otherwise(0L)).as("n_changes"))
    val rate = round(
      -log((col("n_visits") - col("n_changes") + lit(0.5)) / (col("n_visits") + lit(0.5))),
      9)
    agg.select(
      col("url"), col("n_visits"), col("n_changes"),
      rate.as("change_rate"),
      when(rate >= fastCut, lit("fast"))
        .when(rate < slowCut, lit("slow"))
        .otherwise(lit("default")).as("revisit_bucket"))
  }
}
