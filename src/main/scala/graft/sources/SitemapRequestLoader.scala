package graft.sources

import graft.canon.EnqueueStrategy
import graft.queue.FrontierStore
import graft.storage.KeyValueStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sitemap → frontier tandem with persisted progress (SURVEY S5 loader;
  * reference _sitemap_request_loader.py:43-100 — the loader streams sitemap
  * URLs with a resumable parse state — and _request_manager_tandem.py:24-111
  * — reads from the loader and adds to the RequestQueue until both drain).
  *
  * Spark shape: sitemap expansion is the bounded driver recursion of
  * Sitemap.loadRecursive run ONE LEVEL at a time; after each level the
  * discovered URLs are enqueued as one addBatch (the store's dedup makes
  * replays idempotent) and the cursor — processed sitemap set + the next
  * level's frontier — is persisted to the KeyValueStore. A killed load
  * resumes from the last committed level with no duplicates and no
  * re-fetch of completed sitemaps.
  */
final class SitemapRequestLoader(
    spark: SparkSession,
    store: FrontierStore,
    kvs: KeyValueStore,
    fetch: String => Option[(String, Array[Byte])],
    strategy: String = EnqueueStrategy.All,
    maxDepth: Int = Sitemap.DefaultMaxDepth,
    includeImages: Boolean = false
) {

  private val StateKey = "sitemap_loader_state"

  /** state JSON: {"depth":N,"frontier":[...],"visited":[...],"done":bool}.
    * Entries are URL-encoded so URLs containing commas/quotes/brackets
    * can't corrupt the comma-split parse on resume.
    */
  private def enc(x: String): String =
    java.net.URLEncoder.encode(x, java.nio.charset.StandardCharsets.UTF_8)
  private def dec(x: String): String =
    java.net.URLDecoder.decode(x, java.nio.charset.StandardCharsets.UTF_8)

  private def saveState(depth: Int, frontier: Seq[String], visited: Set[String], done: Boolean): Unit = {
    def arr(xs: Iterable[String]) = xs.map(x => "\"" + enc(x) + "\"").mkString("[", ",", "]")
    kvs.setJson(StateKey, s"""{"depth":$depth,"frontier":${arr(frontier)},"visited":${arr(visited)},"done":$done}""")
    kvs.persist()
  }

  private def loadState(): Option[(Int, Seq[String], Set[String], Boolean)] =
    kvs.getJson(StateKey).map { json =>
      def arrOf(k: String): Seq[String] =
        s""""$k":\\s*\\[([^\\]]*)\\]""".r.findFirstMatchIn(json).map(_.group(1)).filter(_.nonEmpty)
          .map(_.split(",").toSeq.map(x => dec(x.trim.stripPrefix("\"").stripSuffix("\""))))
          .getOrElse(Seq.empty)
      val depth = """"depth":\s*(\d+)""".r.findFirstMatchIn(json).map(_.group(1).toInt).getOrElse(0)
      val done = json.contains(""""done":true""")
      (depth, arrOf("frontier"), arrOf("visited").toSet, done)
    }

  def isFinished: Boolean = loadState().exists(_._4)

  /** Load (or resume) the whole sitemap tree into the frontier. Returns the
    * number of level commits performed in THIS call. `maxLevelsThisCall`
    * bounds the work per call (tests use it to simulate a mid-load kill).
    */
  def run(roots: Seq[String], maxLevelsThisCall: Int = Int.MaxValue): Int = {
    import spark.implicits._
    var (depth, frontier, visited, done) = loadState().getOrElse((0, roots.distinct, Set.empty[String], false))
    if (done) return 0
    var levels = 0
    while (frontier.nonEmpty && depth <= maxDepth && levels < maxLevelsThisCall) {
      val next = scala.collection.mutable.ArrayBuffer.empty[String]
      val found = scala.collection.mutable.ArrayBuffer.empty[String]
      // (image loc, caption, title) from <image:image> blocks of ALLOWED
      // pages. Image payloads are NOT strategy-filtered themselves: a
      // publisher-declared image of an in-scope page is in-scope even on a
      // CDN host (the Googlebot-Image convention) — the page gate already
      // bounds what can declare them.
      val foundImages = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
      frontier.foreach { sm =>
        if (!visited.contains(sm)) {
          visited += sm
          fetch(sm).foreach { case (ct, bytes) =>
            val result = Sitemap.parse(Sitemap.inflate(bytes), ct, sm)
            result.urls.foreach { u =>
              if (EnqueueStrategy.filterUrl(u.loc, strategy, sm)._1) {
                found += u.loc
                if (includeImages)
                  u.images.foreach(im => foundImages += ((im.loc, im.caption.orNull, im.title.orNull)))
              }
            }
            result.nestedSitemaps.foreach { n =>
              if (EnqueueStrategy.filterUrl(n, strategy, sm)._1 && !visited.contains(n)) next += n
            }
          }
        }
      }
      // one addBatch per level; the frontier's dedup-on-add makes a replay
      // of a level whose state save was lost idempotent (L4 deferred commit)
      if (found.nonEmpty) {
        graft.expr.UrlFunctions.register(spark)
        val adds = found.toSeq.zipWithIndex.toDF("url", "ord").select(
          graft.expr.UrlFunctions.uniqueKeyCol(col("url")).as("unique_key"),
          col("url"),
          graft.expr.UrlFunctions.hostOf(col("url")).as("host"),
          lit(null).cast("string").as("label"),
          lit("GET").as("method"),
          lit(0).as("depth"),
          lit(false).as("forefront"),
          col("ord").cast("long").as("cand_order")
        )
        store.addBatch(adds)
      }
      // image seeds commit in the same level (second addBatch, still
      // idempotent under replay): label "image", declared caption/title in
      // user_data_json — the (image_id, bytes, caption) target table's seed
      // rows carry their caption from the sitemap straight to the fetch.
      if (foundImages.nonEmpty) {
        graft.expr.UrlFunctions.register(spark)
        val userData = (cap: String, title: String) => graft.util.Json.render(
          (Map("from_sitemap_image" -> true) ++
            Option(cap).map("caption" -> _) ++ Option(title).map("title" -> _)): Any)
        val adds = foundImages.toSeq.zipWithIndex
          .map { case ((u, cap, title), i) => (u, userData(cap, title), i.toLong) }
          .toDF("url", "user_data_json", "ord")
          .select(
            graft.expr.UrlFunctions.uniqueKeyCol(col("url")).as("unique_key"),
            col("url"),
            graft.expr.UrlFunctions.hostOf(col("url")).as("host"),
            lit("image").as("label"),
            lit("GET").as("method"),
            lit(0).as("depth"),
            lit(false).as("forefront"),
            col("ord").as("cand_order"),
            col("user_data_json")
          )
        store.addBatch(adds)
      }
      depth += 1
      frontier = next.toSeq.distinct
      levels += 1
      saveState(depth, frontier, visited, frontier.isEmpty)
    }
    levels
  }
}
