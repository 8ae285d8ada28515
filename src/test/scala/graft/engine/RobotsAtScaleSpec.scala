package graft.engine

import graft.SparkSpec
import graft.canon.Robots
import graft.fixtures.{SyntheticWeb, WebSpec}
import graft.oracle.{CrawlConfig, CrawlOracle, SeedRequest}
import graft.queue.FrontierStore

import java.nio.file.Files

/** Robots-at-scale (SCALE.md §Crawl loop; VERDICT r2 #7): robots rules as
  * a TABLE joined against the claim set and the enqueue candidates, with
  * NO whole-map driver/broadcast structure — the engine is constructed
  * with an EMPTY robotsByHost map and thousands of hosts' rules living
  * only in the table. Crawl results are identical to the broadcast-map
  * engine on the same web.
  */
class RobotsAtScaleSpec extends SparkSpec {

  // 4002 hosts: far beyond anything a test would want in one driver map
  val spec: WebSpec = WebSpec(hosts = 4000, pagesPerHost = 3, otherOrgPages = 2, subHostPages = 2, nImages = 10)

  private def pagesDf = {
    import spark.implicits._
    spark.createDataset((0L until spec.totalPages.toLong).map(g => SyntheticWeb.pageAt(spec, g))).toDF()
  }

  private def robotsRows = SyntheticWeb.allRobots(spec)

  private def statusFn: (String, Int) => Int = { val sp = spec
    (url, attempt) => {
      val host = graft.canon.UrlCanon.parse(url).host
      SyntheticWeb.statusAt(sp, CrawlOracle.hostIdx(sp, host), CrawlOracle.pageIdx(url), attempt)
    }
  }

  test("robots-table join mode == broadcast-map mode on a 4000-host web") {
    import spark.implicits._
    val cfg = CrawlConfig()
    // seeds spanning robots variants: Disallow /private, Crawl-delay, 404
    // (allow-all), 503 (disallow-all)
    val variantHosts = robotsRows.groupBy(r => (r.status, r.body.take(30))).map(_._2.head.host).toSeq.sorted
    val seeds = variantHosts.take(4).map(h => SeedRequest(s"https://$h/p/0")) :+
      SeedRequest(s"https://${variantHosts.head}/private/p/0")

    val mapEngine = new CrawlEngine(
      spark, new FrontierStore(spark, Files.createTempDirectory("robots-map").toString),
      pagesDf,
      robotsRows.map(r => r.host -> Robots.fromFetch(s"https://${r.host}", r.status, r.body)).toMap,
      cfg, claimBatchSize = 8, statusAtFn = statusFn)
    val mapRes = mapEngine.runRequests(seeds)

    val joinEngine = new CrawlEngine(
      spark, new FrontierStore(spark, Files.createTempDirectory("robots-join").toString),
      pagesDf,
      Map.empty, // NO whole-map structure anywhere on the driver
      cfg, claimBatchSize = 8, statusAtFn = statusFn,
      robotsTable = Some(spark.createDataset(robotsRows).toDF()))
    val joinRes = joinEngine.runRequests(seeds)

    assert(joinRes.seenKeys == mapRes.seenKeys)
    assert(joinRes.handledOkKeys == mapRes.handledOkKeys)
    assert(joinRes.failedKeys == mapRes.failedKeys)
    assert(joinRes.skippedRobotsKeys == mapRes.skippedRobotsKeys)
    assert(joinRes.crawlOrder.sorted == mapRes.crawlOrder.sorted)
    // robots actually bit: something was seen and the rules were not all-allow
    assert(joinRes.seenKeys.nonEmpty)
  }

  test("join mode enforces robots: disallowed /private seed never enqueues, disallow-all host skips at fetch") {
    import spark.implicits._
    val cfg = CrawlConfig()
    // variant 0 host: "Disallow: /private"; variant 3 host: 503 => disallow all
    val disallowPrivate = robotsRows.find(r => r.status == 200 && r.body.contains("/private")).get.host
    val disallowAll = robotsRows.find(_.status == 503).get.host
    val engine = new CrawlEngine(
      spark, new FrontierStore(spark, Files.createTempDirectory("robots-join2").toString),
      pagesDf, Map.empty, cfg, claimBatchSize = 4, statusAtFn = statusFn,
      robotsTable = Some(spark.createDataset(robotsRows).toDF()))
    val res = engine.runRequests(Seq(
      SeedRequest(s"https://$disallowPrivate/private/p/0"), // F7: dropped at seed gate
      SeedRequest(s"https://$disallowAll/p/0"))) // allowed at seed?  No: disallow-all drops it too
    // both seeds are robots-dropped at the gate -> nothing was ever fetched
    assert(res.crawlOrder.isEmpty)
    assert(res.seenKeys.isEmpty)
  }
}
