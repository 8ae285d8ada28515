package graft.engine

import graft.SparkSpec
import graft.canon.Robots
import graft.fixtures.{SyntheticWeb, WebSpec}
import graft.oracle.{CrawlConfig, CrawlOracle, SeedRequest}
import graft.proxy.ProxyConfiguration
import graft.queue.FrontierStore

import java.nio.file.Files

/** Per-request proxy assignment in the crawl loop (reference
  * `_get_proxy_info` in _basic_crawler.py + proxy_configuration.py):
  * every dispatched request carries a ProxyInfo — session-affine
  * rotation for flat configs, per-domain tier hill-climb for tiered ones,
  * with a retry's previous tier counted as an error. Engine and oracle
  * produce identical assignments.
  *
  * NOTE each run needs a FRESH ProxyConfiguration (rotation state is
  * mutable), hence the cfg factories.
  */
class ProxyCrawlSpec extends SparkSpec {

  val spec: WebSpec = WebSpec(hosts = 2, pagesPerHost = 300, otherOrgPages = 6, subHostPages = 6, nImages = 40)

  private def mkEngine(cfg: CrawlConfig, batchSize: Int): CrawlEngine =
    mkEngineAt(Files.createTempDirectory("proxycrawl").toString, cfg, batchSize)

  private def mkEngineAt(root: String, cfg: CrawlConfig, batchSize: Int,
      trackOrder: Boolean = true): CrawlEngine = {
    import spark.implicits._
    val pagesDf = spark
      .createDataset((0L until spec.totalPages.toLong).map(g => SyntheticWeb.pageAt(spec, g)))
      .toDF()
    val robots = SyntheticWeb
      .allRobots(spec)
      .map(r => r.host -> Robots.fromFetch(s"https://${r.host}", r.status, r.body))
      .toMap
    new CrawlEngine(
      spark, new FrontierStore(spark, root),
      pagesDf, robots, cfg,
      claimBatchSize = batchSize,
      trackOrder = trackOrder,
      trackImages = trackOrder,
      statusAtFn = { val sp = spec
        (url, attempt) => {
          val host = graft.canon.UrlCanon.parse(url).host
          SyntheticWeb.statusAt(sp, CrawlOracle.hostIdx(sp, host), CrawlOracle.pageIdx(url), attempt)
        }
      }
    )
  }

  private val okIdx: Seq[Int] =
    (1 until 300).filter(i => i % 17 != 0 && SyntheticWeb.baseStatus(spec, 0, i) == 200)
  // a page that 500s on every attempt -> retries exhaust, tiers climb
  private val iHard500: Int =
    (1 until 300).find { i =>
      i % 17 != 0 && SyntheticWeb.baseStatus(spec, 0, i) == 500 &&
        SyntheticWeb.statusAt(spec, 0, i, 1) == 500
    }.getOrElse(fail("fixture has no hard-500 page on h0 below 300"))

  test("flat rotation is session-affine and parity-exact (batch 1 and 4)") {
    def cfg() = CrawlConfig(
      maxCrawlDepth = 0,
      preFillSessions = 2, sessionPoolSize = 2, sessionMaxUsage = 1000,
      proxyConfiguration = Some(new ProxyConfiguration(proxyUrls = Seq(
        Some("http://p1.proxy.com:1111"), Some("http://p2.proxy.com:2222"), Some("http://p3.proxy.com:3333")))))
    val seeds = okIdx.take(4).map(i => SeedRequest(s"https://h0.example.com/p/$i"))

    val oracle = CrawlOracle.runRequests(spec, seeds, cfg())
    assert(oracle.proxyAssignments.size == 4)
    // 2 sessions round-robin over 4 requests; each session pins ONE proxy
    assert(oracle.proxyAssignments.values.map(_._1).toSet ==
      Set("http://p1.proxy.com:1111", "http://p2.proxy.com:2222"))

    val e1 = mkEngine(cfg(), batchSize = 1).runRequests(seeds)
    assert(e1.proxyAssignments == oracle.proxyAssignments)
    val e4 = mkEngine(cfg(), batchSize = 4).runRequests(seeds)
    assert(e4.proxyAssignments == oracle.proxyAssignments)
  }

  test("tiered config: a retrying request climbs the tier ladder (parity)") {
    def cfg() = CrawlConfig(
      maxCrawlDepth = 0, maxRetries = 3,
      preFillSessions = 1, sessionPoolSize = 1, sessionMaxUsage = 1000,
      proxyConfiguration = Some(new ProxyConfiguration(tieredProxyUrls = Seq(
        Seq(Some("http://t0.proxy.com:1000")),
        Seq(Some("http://t1.proxy.com:1001"))))))
    val seeds = Seq(
      SeedRequest(s"https://h0.example.com/p/${okIdx(0)}"), // healthy: stays tier 0
      SeedRequest(s"https://h0.example.com/p/$iHard500")) // hard-500: retries, climbs

    val oracle = CrawlOracle.runRequests(spec, seeds, cfg())
    val hardKey = seeds(1).uniqueKey
    // the failing request's LAST dispatch rode a higher tier; its URL stays
    // the session-pinned tier-0 one — the reference caches the URL per
    // session id even for tiered configs (proxy_configuration.py:216-221),
    // and a fresh session (rotation) is what moves the URL in practice
    assert(oracle.proxyAssignments(hardKey)._2.contains(1))
    assert(oracle.proxyAssignments(hardKey)._1 == "http://t0.proxy.com:1000")
    // the healthy request stayed on tier 0
    assert(oracle.proxyAssignments(seeds.head.uniqueKey)._2.contains(0))
    // a session-free probe of the same tracker state confirms the domain
    // now predicts the higher tier's URL
    assert(cfg().proxyConfiguration.get // fresh config: fresh domain state
      .newProxyInfo(requestHost = Some("h0.example.com"), lastProxyTier = Some(0))
      .get.proxyTier.contains(1))

    val e1 = mkEngine(cfg(), batchSize = 1).runRequests(seeds)
    assert(e1.proxyAssignments == oracle.proxyAssignments)
  }

  test("bench mode assigns sessions/proxies executor-side: multiset equals parity mode (VERDICT r3 #6)") {
    def cfg() = CrawlConfig(
      maxCrawlDepth = 0,
      preFillSessions = 3, sessionPoolSize = 3, sessionMaxUsage = 1000,
      proxyConfiguration = Some(new ProxyConfiguration(proxyUrls = Seq(
        Some("http://p1.proxy.com:1111"), Some("http://p2.proxy.com:2222")))))
    // 7 healthy seeds (no retries, no robots skips): the bulk-assignment
    // precondition (stable pool) holds by construction
    val seeds = okIdx.take(7).map(i => SeedRequest(s"https://h0.example.com/p/$i"))

    val parity = mkEngine(cfg(), batchSize = 4).runRequests(seeds)
    val parityMultiset = parity.proxyAssignments.values.toSeq.map(_._1)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(parityMultiset.values.sum == 7L)

    val bench = mkEngineAt(Files.createTempDirectory("proxybench").toString,
      cfg(), batchSize = 4, trackOrder = false).runRequests(seeds)
    assert(bench.proxyAssignments.isEmpty) // no per-key driver bookkeeping
    assert(bench.proxyAssignmentCounts == parityMultiset,
      s"bench ${bench.proxyAssignmentCounts} != parity $parityMultiset")
  }

  // a hard-500 page on h1 (second host) — exercises the per-host isolation
  // of the executor-side tier fold
  private val iHard500h1: Int =
    (1 until 300).find { i =>
      i % 17 != 0 && SyntheticWeb.baseStatus(spec, 1, i) == 500 &&
        SyntheticWeb.statusAt(spec, 1, i, 1) == 500
    }.getOrElse(fail("fixture has no hard-500 page on h1 below 300"))

  test("bench mode tiered proxies: executor-side tier fold matches parity climb (VERDICT r4 #5)") {
    def cfg() = CrawlConfig(
      maxCrawlDepth = 0, maxRetries = 3,
      preFillSessions = 1, sessionPoolSize = 1, sessionMaxUsage = 1000,
      proxyConfiguration = Some(new ProxyConfiguration(tieredProxyUrls = Seq(
        Seq(Some("http://t0.proxy.com:1000")),
        Seq(Some("http://t1.proxy.com:1001")),
        Seq(Some("http://t2.proxy.com:1002"))))))
    // two hosts, each with a healthy page and a hard-500 retry chain: the
    // climbs are per-domain and must not bleed across hosts in the fold
    val seeds = Seq(
      SeedRequest(s"https://h0.example.com/p/${okIdx(0)}"),
      SeedRequest(s"https://h0.example.com/p/$iHard500"),
      SeedRequest(s"https://h1.example.com/p/$iHard500h1"),
      SeedRequest(s"https://h1.example.com/p/${okIdx(1)}"))

    val parity = mkEngine(cfg(), batchSize = 2).runRequests(seeds)
    assert(parity.proxyTierCounts.keySet.exists(_ > 0), "fixture must climb tiers")

    val bench = mkEngineAt(Files.createTempDirectory("proxybenchtier").toString,
      cfg(), batchSize = 2, trackOrder = false).runRequests(seeds)
    assert(bench.proxyAssignments.isEmpty) // no per-key driver bookkeeping
    assert(bench.proxyTierCounts == parity.proxyTierCounts,
      s"bench tier climb ${bench.proxyTierCounts} != parity ${parity.proxyTierCounts}")
    assert(bench.proxyAssignmentCounts == parity.proxyAssignmentCounts,
      s"bench urls ${bench.proxyAssignmentCounts} != parity ${parity.proxyAssignmentCounts}")
  }

  test("bench tiered kill + resume: the persisted tier state table continues the climb") {
    def cfg() = CrawlConfig(
      maxCrawlDepth = 0, maxRetries = 3,
      preFillSessions = 1, sessionPoolSize = 1, sessionMaxUsage = 1000,
      proxyConfiguration = Some(new ProxyConfiguration(tieredProxyUrls = Seq(
        Seq(Some("http://t0.proxy.com:1000")),
        Seq(Some("http://t1.proxy.com:1001")),
        Seq(Some("http://t2.proxy.com:1002"))))))
    val seeds = Seq(
      SeedRequest(s"https://h0.example.com/p/$iHard500"),
      SeedRequest(s"https://h0.example.com/p/${okIdx(0)}"))

    val full = mkEngineAt(Files.createTempDirectory("proxybenchfull").toString,
      cfg(), batchSize = 1, trackOrder = false).runRequests(seeds)
    assert(full.proxyTierCounts.keySet.exists(_ > 0), "fixture must climb tiers")

    val root = Files.createTempDirectory("proxybenchresume").toString
    val p1 = mkEngineAt(root, cfg().copy(maxRequestsPerCrawl = 1),
      batchSize = 1, trackOrder = false).runRequests(seeds)
    assert(p1.processedCount == 1)
    val p2 = mkEngineAt(root, cfg(), batchSize = 1, trackOrder = false).runRequests(Seq.empty)
    val merged = (p1.proxyTierCounts.keySet ++ p2.proxyTierCounts.keySet).map { t =>
      t -> (p1.proxyTierCounts.getOrElse(t, 0L) + p2.proxyTierCounts.getOrElse(t, 0L))
    }.toMap
    assert(merged == full.proxyTierCounts,
      s"resumed climb $merged != uninterrupted ${full.proxyTierCounts}")
  }

  test("kill + resume continues the tier climb — persisted proxy state (VERDICT r3 #4)") {
    def cfg() = CrawlConfig(
      maxCrawlDepth = 0, maxRetries = 3,
      preFillSessions = 1, sessionPoolSize = 1, sessionMaxUsage = 1000,
      proxyConfiguration = Some(new ProxyConfiguration(tieredProxyUrls = Seq(
        Seq(Some("http://t0.proxy.com:1000")),
        Seq(Some("http://t1.proxy.com:1001")),
        Seq(Some("http://t2.proxy.com:1002"))))))
    // hard-500 first: it gets one dispatch (retry), then the healthy seed's
    // terminal hits the budget and "kills" the run mid-climb
    val seeds = Seq(
      SeedRequest(s"https://h0.example.com/p/$iHard500"),
      SeedRequest(s"https://h0.example.com/p/${okIdx(0)}"))
    val hardKey = seeds.head.uniqueKey

    val full = mkEngine(cfg(), batchSize = 1).runRequests(seeds)
    assert(full.proxyAssignments(hardKey)._2.exists(_ > 0), "fixture must climb tiers")

    val root = Files.createTempDirectory("proxyresume").toString
    val p1 = mkEngineAt(root, cfg().copy(maxRequestsPerCrawl = 1), batchSize = 1).runRequests(seeds)
    assert(p1.processedCount == 1)
    assert(p1.proxyAssignments(hardKey)._2.contains(0)) // climb only started

    // resume with a FRESH config instance on the same store: rotation,
    // tier histograms and the request's last tier restore from the KVS —
    // the final assignment equals the uninterrupted run's
    val p2 = mkEngineAt(root, cfg(), batchSize = 1).runRequests(Seq.empty)
    assert(p2.proxyAssignments(hardKey) == full.proxyAssignments(hardKey),
      s"resumed climb ${p2.proxyAssignments.get(hardKey)} != uninterrupted ${full.proxyAssignments.get(hardKey)}")
    assert(p1.failedKeys ++ p2.failedKeys == full.failedKeys)
  }
}
