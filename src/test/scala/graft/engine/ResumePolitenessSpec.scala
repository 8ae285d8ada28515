package graft.engine

import graft.SparkSpec
import graft.canon.Robots
import graft.fixtures.{SyntheticWeb, WebSpec}
import graft.oracle.{CrawlConfig, CrawlOracle}
import graft.queue.FrontierStore
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Checkpoint/resume (north rule: "a killed job resumes exactly") and
  * politeness enforcement (P2-P4) at the engine level.
  */
class ResumePolitenessSpec extends SparkSpec {

  val spec: WebSpec = WebSpec(hosts = 2, pagesPerHost = 18, otherOrgPages = 6, subHostPages = 6, nImages = 40)
  val seeds = Seq("https://h0.example.com/p/0", "https://h1.example.com/p/0")

  private def mkEngine(root: String, cfg: CrawlConfig, batchSize: Int,
      politeness: Boolean = false, statusOverride: (String, Int) => Int = null): CrawlEngine = {
    import spark.implicits._
    val pagesDf = spark
      .createDataset((0L until spec.totalPages.toLong).map(g => SyntheticWeb.pageAt(spec, g)))
      .toDF()
    val robots = SyntheticWeb.allRobots(spec)
      .map(r => r.host -> Robots.fromFetch(s"https://${r.host}", r.status, r.body)).toMap
    val store = new FrontierStore(spark, root)
    val sp = spec // local copy: the closure must not capture the test class
    new CrawlEngine(
      spark, store, pagesDf, robots, cfg, claimBatchSize = batchSize,
      enforcePoliteness = politeness,
      statusAtFn = if (statusOverride != null) statusOverride
        else (url, attempt) => {
          val host = graft.canon.UrlCanon.parse(url).host
          SyntheticWeb.statusAt(sp, CrawlOracle.hostIdx(sp, host), CrawlOracle.pageIdx(url), attempt)
        }
    )
  }

  test("kill + resume: interrupted crawl continues to the identical final state") {
    val full = CrawlOracle.run(spec, seeds, CrawlConfig())
    val fullTotal = full.handledOkKeys.size + full.failedKeys.size
    val interruptAt = fullTotal / 2
    assert(interruptAt >= 2, s"fixture too small for a meaningful resume test (total $fullTotal)")

    // phase 1: "crash" after an artificial budget (nothing special is saved —
    // resume state IS the committed frontier manifest)
    val root = Files.createTempDirectory("resume").toString
    val phase1 = mkEngine(root, CrawlConfig(maxRequestsPerCrawl = interruptAt), batchSize = 4).run(seeds)
    info(s"phase1: order=${phase1.crawlOrder.mkString("|")} ok=${phase1.handledOkKeys.size} fail=${phase1.failedKeys.size} batches=${phase1.batches}")
    info(s"full oracle: total=$fullTotal order=${full.crawlOrder.take(12).mkString("|")}")
    assert(phase1.handledOkKeys.size + phase1.failedKeys.size == interruptAt)

    // phase 2: fresh store + engine on the same root; re-adding the seeds is
    // dedup-safe; the crawl drains to completion
    val phase2 = mkEngine(root, CrawlConfig(), batchSize = 8).run(seeds)
    val handledOk = phase1.handledOkKeys ++ phase2.handledOkKeys
    val failed = phase1.failedKeys ++ phase2.failedKeys
    assert(phase2.seenKeys == full.seenKeys) // seen set identical to uninterrupted run
    assert(handledOk == full.handledOkKeys)
    assert(failed == full.failedKeys)

    // the metrics table recorded both phases' batches
    val metrics = spark.read.parquet(s"$root/metrics")
    assert(metrics.count() == phase1.batches + phase2.batches)
    // per-run processed counters sum to the uninterrupted total
    assert(phase1.processedCount + phase2.processedCount ==
      full.handledOkKeys.size + full.failedKeys.size)
  }

  test("P4 crawl-delay quota: a delay-2s host is claimed at most 1/batch") {
    // h1 (index 1 % 4 == 1) carries Crawl-delay: 2; batchPeriod 1s -> quota 1
    val root = Files.createTempDirectory("polite").toString
    val cfg = CrawlConfig()
    val engine = mkEngine(root, cfg, batchSize = 16, politeness = true)
    val result = engine.run(Seq("https://h1.example.com/p/0"))
    // every h1 fetch needed its own batch: batches >= fetch count
    assert(result.batches >= result.crawlOrder.size,
      s"batches ${result.batches} < fetches ${result.crawlOrder.size} — quota not enforced")
    // and the crawl still completed (same seen set as an unthrottled run)
    val unthrottled = mkEngine(Files.createTempDirectory("polite2").toString, cfg, 16).run(Seq("https://h1.example.com/p/0"))
    assert(result.seenKeys == unthrottled.seenKeys)
  }

  test("P3 429 backoff: a throttled host pauses, then succeeds after cooldown") {
    // every first fetch on h0 returns 429; second attempt succeeds
    val attempts = scala.collection.mutable.HashMap.empty[String, Int]
    val statusFn: (String, Int) => Int = (url, attempt) => if (attempt == 0) 429 else 200
    val root = Files.createTempDirectory("backoff").toString
    val engine = mkEngine(root, CrawlConfig(maxRequestsPerCrawl = 6), batchSize = 4,
      politeness = true, statusOverride = statusFn)
    val result = engine.run(Seq("https://h0.example.com/p/0"))
    val _ = attempts
    // all processed urls required a retry -> every fetch appears twice in order
    assert(result.handledOkKeys.nonEmpty)
    assert(result.crawlOrder.size > result.handledOkKeys.size) // retries happened
    // backoff inserted idle batches: batch count exceeds fetch count
    assert(result.batches > result.handledOkKeys.size)
  }
}
