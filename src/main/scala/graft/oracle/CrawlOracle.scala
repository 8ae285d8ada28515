package graft.oracle

import graft.canon.{EnqueueStrategy, Globs, Robots, RobotsRules, UniqueKey, UrlCanon}
import graft.fixtures.{SyntheticWeb, WebSpec}

import scala.collection.mutable

/** Single-threaded reference oracle (SURVEY.md §5): a direct Scala port of
  * the reference memory queue
  * (/root/reference/src/crawlee/storage_clients/_memory/_request_queue_client.py:44-300)
  * plus the BasicCrawler loop semantics at concurrency 1
  * (robots check F6, status classification F12, enqueue pipeline L1-L4,
  * depth gate F10, max_requests R6, retries R1-R3). The Spark engine must
  * reproduce its crawl order (claim batch 1) and final URL-seen set.
  */
final class MemoryQueueOracle {

  final case class OracleRequest(
      uniqueKey: String,
      url: String,
      depth: Int,
      var retryCount: Int = 0,
      var noRetry: Boolean = false
  )

  private val pending = mutable.LinkedHashMap.empty[String, OracleRequest]
  private val handled = mutable.HashMap.empty[String, OracleRequest]
  private val inProgress = mutable.HashMap.empty[String, OracleRequest]

  final case class Processed(uniqueKey: String, wasPresent: Boolean, wasHandled: Boolean)

  /** _memory/_request_queue_client.py:141-210 */
  def addBatch(requests: Seq[OracleRequest], forefront: Boolean = false): Seq[Processed] =
    requests.map { request =>
      val wasHandled = handled.contains(request.uniqueKey)
      val isInProgress = inProgress.contains(request.uniqueKey)
      val wasPresent = wasHandled || isInProgress || pending.contains(request.uniqueKey)
      if (wasHandled) Processed(request.uniqueKey, wasPresent = true, wasHandled = true)
      else if (isInProgress) Processed(request.uniqueKey, wasPresent = true, wasHandled = false)
      else {
        if (!wasPresent) pending(request.uniqueKey) = request
        if (forefront) moveToFront(request.uniqueKey)
        Processed(request.uniqueKey, wasPresent, wasHandled = false)
      }
    }

  private def moveToFront(key: String): Unit = {
    val entry = pending.remove(key)
    entry.foreach { e =>
      val rest = pending.toSeq
      pending.clear()
      pending(key) = e
      rest.foreach { case (k, v) => pending(k) = v }
    }
  }

  def fetchNext(): Option[OracleRequest] =
    pending.headOption.map { case (k, req) =>
      pending.remove(k)
      inProgress(k) = req
      req
    }

  def markHandled(req: OracleRequest): Unit =
    if (inProgress.contains(req.uniqueKey)) {
      inProgress.remove(req.uniqueKey)
      handled(req.uniqueKey) = req
    }

  def reclaim(req: OracleRequest, forefront: Boolean = false): Unit =
    if (inProgress.contains(req.uniqueKey)) {
      inProgress.remove(req.uniqueKey)
      pending(req.uniqueKey) = req
      if (forefront) moveToFront(req.uniqueKey)
    }

  def isEmpty: Boolean = pending.isEmpty
  def isFinished: Boolean = pending.isEmpty && inProgress.isEmpty
  def handledKeys: Set[String] = handled.keySet.toSet
  def seenKeys: Set[String] = (pending.keySet ++ handled.keySet ++ inProgress.keySet).toSet
}

/** Crawl configuration shared by oracle and Spark engine. */
/** F9 user hook: rewrite a discovered request before enqueue, tag it with a
  * label, or drop it (None) — the reference's transform_request_function
  * (_abstract_http_crawler.py:240-245). Must be a pure function (it runs
  * inside executors and on the oracle).
  */
final case class RequestOptions(url: String, label: Option[String])

final case class CrawlConfig(
    strategy: String = EnqueueStrategy.SameHostname,
    includePatterns: Seq[String] = Seq.empty,
    excludePatterns: Seq[String] = Seq.empty,
    maxCrawlDepth: Int = Int.MaxValue,
    maxRequestsPerCrawl: Long = Long.MaxValue,
    maxRetries: Int = 3,
    respectRobots: Boolean = true,
    linksPerPageLimit: Int = Int.MaxValue,
    transformRequest: Option[RequestOptions => Option[RequestOptions]] = None
) extends Serializable

final case class OracleResult(
    crawlOrder: Seq[String], // URLs in fetch order
    seenKeys: Set[String],
    handledOkKeys: Set[String],
    failedKeys: Set[String],
    skippedRobotsKeys: Set[String],
    emittedImageIds: Seq[String],
    attempts: Map[String, Int]
)

object CrawlOracle {

  /** HTML href extractor shared with the engine (regex-based; FIXTURES.md
    * pages carry well-formed quoted hrefs).
    */
  val HrefRe = """(?i)<a\s[^>]*href\s*=\s*"([^"]*)"""".r
  val BaseRe = """(?i)<base\s[^>]*href\s*=\s*"([^"]*)"""".r

  def extractHrefs(body: String): Seq[String] =
    HrefRe.findAllMatchIn(body).map(_.group(1)).toSeq

  def extractBase(body: String): Option[String] =
    BaseRe.findFirstMatchIn(body).map(_.group(1))

  /** Run the full reference crawl at concurrency 1 over the synthetic web. */
  def run(spec: WebSpec, seeds: Seq[String], cfg: CrawlConfig): OracleResult = {
    val queue = new MemoryQueueOracle
    import queue.OracleRequest

    val pagesByUrl: Map[String, graft.schema.PageRow] =
      (0L until spec.totalPages.toLong).map(g => SyntheticWeb.pageAt(spec, g)).map(p => p.url -> p).toMap

    val robotsByHost: Map[String, RobotsRules] =
      SyntheticWeb.allRobots(spec).map { r =>
        r.host -> Robots.fromFetch(s"https://${r.host}", r.status, r.body)
      }.toMap

    val include = cfg.includePatterns.map(Globs.compile)
    val exclude = cfg.excludePatterns.map(Globs.compile)

    def patternsOk(url: String): Boolean = {
      if (exclude.exists(_.matcher(url).matches())) return false
      if (include.isEmpty) true else include.exists(_.matcher(url).matches())
    }

    def robotsAllowed(url: String): Boolean = {
      if (!cfg.respectRobots) return true
      val host = UrlCanon.normalizeHost(UrlCanon.parse(url).host)
      robotsByHost.get(host).forall(_.isAllowed(url))
    }

    // seed enqueue (robots-filtered per _basic_crawler.py:841-867)
    val seedReqs = seeds.flatMap { url =>
      if (!robotsAllowed(url)) None
      else Some(OracleRequest(UniqueKey.compute(url), url, depth = 0))
    }
    queue.addBatch(seedReqs)

    val crawlOrder = mutable.ArrayBuffer.empty[String]
    val handledOk = mutable.HashSet.empty[String]
    val failed = mutable.HashSet.empty[String]
    val skippedRobots = mutable.HashSet.empty[String]
    val images = mutable.ArrayBuffer.empty[String]
    val attempts = mutable.HashMap.empty[String, Int].withDefaultValue(0)
    var processedTotal = 0L

    while (!queue.isFinished && processedTotal < cfg.maxRequestsPerCrawl) {
      queue.fetchNext() match {
        case None => // only in-progress left; single-threaded ⇒ done
          processedTotal = cfg.maxRequestsPerCrawl
        case Some(req) =>
          // robots re-check at fetch time (F6): skip as handled, no count
          if (!robotsAllowed(req.url)) {
            queue.markHandled(req)
            skippedRobots += req.uniqueKey
          } else {
            val attempt = attempts(req.uniqueKey)
            attempts(req.uniqueKey) = attempt + 1
            crawlOrder += req.url

            // fetch: resolve page (following one redirect hop)
            val page0 = pagesByUrl.get(req.url)
            page0 match {
              case None =>
                // unknown URL = 404 client error: no retry (F12)
                failed += req.uniqueKey
                queue.markHandled(req)
                processedTotal += 1
              case Some(p0) =>
                var status = SyntheticWeb.statusAt(spec, hostIdx(spec, p0.host), pageIdx(p0.url), attempt)
                var page = p0
                var loadedUrl = req.url
                var redirectFailedStrategy = false
                if (status == 301) {
                  loadedUrl = p0.redirect_to
                  // redirect strategy re-check vs ORIGINAL url (F8)
                  val (ok, _) = EnqueueStrategy.filterUrl(loadedUrl, cfg.strategy, req.url)
                  if (!ok) redirectFailedStrategy = true
                  else {
                    page = pagesByUrl(loadedUrl)
                    status = SyntheticWeb.statusAt(spec, hostIdx(spec, page.host), pageIdx(page.url), attempt)
                    if (status == 301) status = 200 // fixture guarantees non-redirect targets
                  }
                }
                if (redirectFailedStrategy) {
                  // request interrupted: handled without output (F8)
                  queue.markHandled(req)
                  processedTotal += 1
                } else if (status == 200) {
                  // handler: extract links, enqueue, emit images (L1-L4)
                  val base = extractBase(page.body).getOrElse(loadedUrl)
                  val links = extractHrefs(page.body).iterator
                    .map(l => if (UrlCanon.isAbsolute(l)) l else UrlCanon.resolve(base, l))
                    .filter(_ != null)
                    .toSeq
                  val eligible = links.filter { l =>
                    EnqueueStrategy.filterUrl(l, cfg.strategy, req.url)._1 && patternsOk(l)
                  }.take(cfg.linksPerPageLimit)
                  // F9 user transform: rewrite / drop before robots + enqueue
                  val transformed = cfg.transformRequest match {
                    case Some(fn) => eligible.flatMap(l => fn(RequestOptions(l, None)).map(_.url))
                    case None => eligible
                  }
                  // robots partition at enqueue (F5)
                  val (allowedLinks, _) = transformed.partition(robotsAllowed)
                  val children = allowedLinks
                    .filter(_ => req.depth + 1 <= cfg.maxCrawlDepth) // F10
                    .map(l => OracleRequest(UniqueKey.compute(l), l, req.depth + 1))
                  queue.addBatch(children)
                  images ++= page.image_ids
                  handledOk += req.uniqueKey
                  queue.markHandled(req)
                  processedTotal += 1
                } else if (status == 404) {
                  failed += req.uniqueKey
                  queue.markHandled(req)
                  processedTotal += 1
                } else { // 429 / 500: retryable (F12, R1)
                  if (req.retryCount < cfg.maxRetries) {
                    req.retryCount += 1
                    queue.reclaim(req)
                  } else {
                    failed += req.uniqueKey
                    queue.markHandled(req)
                    processedTotal += 1
                  }
                }
            }
          }
      }
    }

    OracleResult(
      crawlOrder.toSeq,
      queue.seenKeys,
      handledOk.toSet,
      failed.toSet,
      skippedRobots.toSet,
      images.toSeq,
      attempts.toMap
    )
  }

  def hostIdx(spec: WebSpec, host: String): Int =
    if (host == "other.org") spec.hosts
    else if (host.startsWith("sub.")) spec.hosts + 1
    else host.drop(1).takeWhile(_.isDigit).toInt

  def pageIdx(url: String): Int =
    url.substring(url.lastIndexOf('/') + 1).toInt
}
