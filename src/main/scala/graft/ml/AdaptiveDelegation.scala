package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Adaptive rendering-type delegation — the reference's ML feedback loop
  * (crawlers/_adaptive_playwright/_adaptive_playwright_crawler.py:376-446):
  * per request, the predictor picks a sub-crawler ("static" HTTP vs
  * "browser"); a decaying fraction of requests runs BOTH, compares the two
  * runs' pushed datasets (_result_comparator.py:37-39, push-data-only
  * comparator), and feeds the detection back into
  * [[RenderingTypePredictor.storeResult]] so future claims route cheaply.
  *
  * Spark-first: routing is COLUMNS over the claim batch (model scoring =
  * one broadcast join + aggregate via scoreDataFrame; roll/route/detection
  * are column arithmetic). Only the detection rows — bounded by the
  * decaying detection probability — reach the driver, in claim order,
  * exactly like the reference's sequential store_result calls.
  */
final case class AdaptiveCrawl(
    predictor: RenderingTypePredictor,
    // result_checker (reference :125,149): validates a static-only run —
    // (eff_status, pushed image ids) => valid. A failing static run is a
    // tracked misprediction and falls through to the browser path
    // (:400-409). None = reference default (always valid).
    resultChecker: Option[(Int, Seq[String]) => Boolean] = None,
    // detection roll: the reference draws random() per request (:385); the
    // engine substitutes a deterministic uniform from the unique key
    // (documented substitution, same family as C6/C7 determinism). Oracle
    // entries pass a data-derived roll so DuckDB can recompute it.
    rollExpr: Option[Column] = None
) extends Serializable

object AdaptiveDelegation {

  import RenderingTypePredictor.{ClientOnly, Static}

  val RouteStatic = "static"
  val RouteBrowser = "browser"

  /** Deterministic uniform [0,1) from a key column (the random() stand-in). */
  def hash01(c: Column): Column =
    pmod(xxhash64(c), lit(1000000L)).cast("double") / lit(1000000.0)

  /** Score + route a claim batch: adds
    *   __rt      — predicted rendering type,
    *   __dp      — detection-probability recommendation,
    *   __detect  — this request runs both sub-crawlers (roll < __dp),
    *   __route   — "static" iff confidently static and not detecting,
    *               else "browser" (reference :385-446 control flow).
    * Scoring touches only a (key, url, label) projection; the model rides
    * a broadcast join (scoreDataFrame) and the result joins back on the
    * batch-bounded key.
    */
  def routeColumns(
      ac: AdaptiveCrawl,
      batch: DataFrame,
      urlCol: String,
      labelCol: String,
      keyCol: String): DataFrame = {
    val scored = ac.predictor
      .scoreDataFrame(batch.select(col(keyCol), col(urlCol), col(labelCol)), urlCol, labelCol)
      .select(col(keyCol).as("__ak"),
        col("rendering_type").as("__rt"), col("detection_prob").as("__dp"))
    val roll = ac.rollExpr.getOrElse(hash01(col(keyCol)))
    batch
      .join(scored, batch(keyCol) === col("__ak"), "left")
      .drop("__ak")
      .withColumn("__detect", roll < col("__dp"))
      .withColumn("__route",
        when(!col("__detect") && col("__rt") === Static, lit(RouteStatic))
          .otherwise(lit(RouteBrowser)))
  }

  /** Push-data-only result comparator as a column
    * (_result_comparator.py:37-39): the static and browser sub-runs'
    * pushed datasets compared for equality. A page without a rendered
    * variant pushes identically under both sub-crawlers.
    */
  def detectionCol(staticPush: Column, renderedPush: Column): Column =
    when(coalesce(renderedPush, staticPush) <=> staticPush, lit(Static))
      .otherwise(lit(ClientOnly))
}
