package graft.ml

import graft.SparkSpec
import graft.canon.Robots
import graft.engine.CrawlEngine
import graft.oracle.{CrawlConfig, SeedRequest}
import graft.queue.FrontierStore

import java.nio.file.Files

/** End-to-end adaptive delegation (VERDICT r4 next-round #6; reference
  * _adaptive_playwright_crawler.py:376-446): a two-family web — a static
  * catalog whose pages render identically under both sub-crawlers, and a
  * client-only app whose static HTML is an empty shell (no links, no
  * images) with the real content only in the rendered DOM. The engine
  * must (a) crawl the app family through the "browser" body so its links
  * and images exist at all, (b) detect both families correctly and feed
  * the predictor, (c) route the catalog family to the cheap static path
  * once the model is warm, without changing crawl RESULTS, and (d) track
  * checker-failed static runs as mispredictions.
  */
class AdaptiveCrawlSpec extends SparkSpec {

  private val Host = "mix.example.com"
  private val N = 16

  private def itemUrl(i: Int) = s"https://$Host/catalog/item-$i"
  private def viewUrl(i: Int) = s"https://$Host/app/view-$i"

  /** pages DF: url, host, status, redirect_to, body, image_ids
    * (+ rendered_body / rendered_images for the adaptive surface).
    */
  private def pagesDf(trapEmptyImages: Boolean = false) = {
    import spark.implicits._
    def link(u: String) = s"""<a href="$u">x</a>"""
    val items = (0 until N).map { i =>
      val next = if (i + 1 < N) link(itemUrl(i + 1)) else ""
      val imgs = if (trapEmptyImages && i == N - 1) Array.empty[String] else Array(s"s-img-$i")
      (itemUrl(i), Host, 200, null: String,
        s"<html>$next</html>", imgs,
        null: String, null: Array[String]) // renders identically
    }
    val views = (0 until N).map { i =>
      val next = if (i + 1 < N) link(viewUrl(i + 1)) else ""
      (viewUrl(i), Host, 200, null: String,
        "<html><p>loading...</p></html>", Array.empty[String], // empty shell
        s"<html>$next</html>", Array(s"c-img-$i")) // the rendered DOM
    }
    (items ++ views).toDF(
      "url", "host", "status", "redirect_to", "body", "image_ids",
      "rendered_body", "rendered_images")
  }

  private val robots = Map(Host -> Robots.fromFetch(s"https://$Host", 404, ""))

  private def mkEngine(ac: AdaptiveCrawl, trap: Boolean = false): CrawlEngine =
    new CrawlEngine(
      spark,
      new FrontierStore(spark, Files.createTempDirectory("adaptive").toString),
      pagesDf(trap), robots,
      CrawlConfig(adaptive = Some(ac)),
      claimBatchSize = 4)

  private val seeds = Seq(SeedRequest(itemUrl(0)), SeedRequest(viewUrl(0)))

  test("cold crawl: browser body drives discovery, detections label both families") {
    val predictor = new RenderingTypePredictor()
    val cold = mkEngine(AdaptiveCrawl(predictor)).runRequests(seeds)

    // the app family is reachable ONLY through rendered links — full discovery
    // proves browser-routed pages crawl their rendered DOM
    assert(cold.processedCount == 2L * N, s"processed ${cold.processedCount}")
    // pushed data: static pages push their static images, app pages push
    // their RENDERED images (the empty static shell would push nothing)
    val imgs = cold.emittedImageIds.toSet
    assert((0 until N).forall(i => imgs(s"s-img-$i")), imgs.toSeq.sorted.take(5).toString)
    assert((0 until N).forall(i => imgs(s"c-img-$i")), imgs.toSeq.sorted.take(5).toString)
    // detections are per-family correct
    val det = cold.adaptiveDetections
    assert(det.nonEmpty)
    assert(det.collect { case (u, d) if u.contains("/catalog/") => d }.forall(_ == "static"), det)
    assert(det.collect { case (u, d) if u.contains("/app/") => d }.forall(_ == "client only"), det)
    // every dispatch this run was routed somewhere
    assert(cold.httpOnlyRuns + cold.browserRuns >= 2L * N)
    assert(cold.browserRuns >= N.toLong) // the app family can never go static
    assert(cold.renderingMispredictions == 0L) // no checker configured

    // the trained model generalizes to fresh family members
    assert(predictor.predict(itemUrl(99))._1 == "static")
    assert(predictor.predict(viewUrl(99))._1 == "client only")

    // warm crawl over the SAME web with the trained predictor: the catalog
    // family now rides the cheap static path more, the app family still
    // goes browser, and crawl RESULTS are identical (routing changes cost,
    // never output)
    val warm = mkEngine(AdaptiveCrawl(predictor)).runRequests(seeds)
    assert(warm.processedCount == cold.processedCount)
    assert(warm.emittedImageIds.toSet == imgs)
    assert(warm.httpOnlyRuns > cold.httpOnlyRuns,
      s"warm ${warm.httpOnlyRuns} !> cold ${cold.httpOnlyRuns}")
    assert(warm.browserRuns < cold.browserRuns,
      s"warm ${warm.browserRuns} !< cold ${cold.browserRuns}")
    assert(warm.browserRuns >= N.toLong)
  }

  test("result checker: a suspicious static run is a tracked misprediction and falls to browser") {
    // warm a predictor so the catalog family is confidently static
    val predictor = new RenderingTypePredictor()
    mkEngine(AdaptiveCrawl(predictor)).runRequests(seeds)
    // the last catalog page now has NO images; the checker treats an empty
    // push as suspicious (reference :400-409 — the static result fails
    // result_checker, the request falls through to the browser sub-crawler
    // and the misprediction counter advances)
    val checked = mkEngine(
      AdaptiveCrawl(predictor, resultChecker = Some((st, imgs) => st == 200 && imgs.nonEmpty)),
      trap = true).runRequests(seeds)
    assert(checked.processedCount == 2L * N)
    assert(checked.renderingMispredictions >= 1L, checked.renderingMispredictions.toString)
    // mispredicted rows count as BOTH a static attempt and a browser run
    assert(checked.httpOnlyRuns >= checked.renderingMispredictions)
  }

  test("routing columns: no-model batch routes everything to browser with detection on") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val ac = AdaptiveCrawl(new RenderingTypePredictor())
    val batch = Seq(("k1", itemUrl(1), null: String), ("k2", viewUrl(2), null: String))
      .toDF("unique_key", "url", "label")
    val routed = AdaptiveDelegation.routeColumns(ac, batch, "url", "label", "unique_key")
      .select(col("unique_key"), col("__rt"), col("__detect"), col("__route"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2), r.getString(3)))
    assert(routed.forall { case (_, rt, det, route) =>
      rt == "client only" && det && route == "browser" }, routed.toSeq.toString)
  }
}
