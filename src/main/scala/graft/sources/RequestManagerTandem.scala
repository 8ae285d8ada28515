package graft.sources

import graft.expr.UrlFunctions
import graft.queue.FrontierStore
import graft.storage.KeyValueStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Read-only request source that can be drained batch-wise into a
  * RequestManager — the reference's `RequestLoader` abstract surface
  * (request_loaders/_request_loader.py): total/handled counts, emptiness,
  * fetch-next, mark-handled. Batch-native here: one fetch returns a whole
  * adds-shaped DataFrame (unique_key, url, host, label, method, depth,
  * forefront, cand_order).
  */
trait RequestLoader {
  /** Next batch of at most `n` requests; empty when drained. */
  def fetchNextBatch(n: Int): DataFrame

  /** Acknowledge the batch most recently served by [[fetchNextBatch]] —
    * advances (and persists) the loader cursor.
    */
  def markServedHandled(): Unit

  def isFinished: Boolean
  def totalCount: Long
  def handledCount: Long
}

/** Composition of a read-only [[RequestLoader]] with the read-write
  * frontier — the reference's `RequestManagerTandem`
  * (request_loaders/_request_manager_tandem.py:24-111): loader contents
  * transfer into the manager (at the FOREFRONT, ":88" add_request
  * forefront=True), new requests enqueue to the manager, and the tandem is
  * finished only when BOTH sides are (":49-50").
  *
  * Works for any loader — RequestList ([[RequestListLoader]]) and the
  * sitemap loader are the two shipped sources. Crash-safe: the store's
  * dedup makes a replayed transfer idempotent, and the loader cursor only
  * advances after the adds commit.
  */
final class RequestManagerTandem(loader: RequestLoader, store: FrontierStore) {

  def isEmpty(nowMs: Long): Boolean = loader.isFinished && store.isEmpty(nowMs)
  def isFinished(nowMs: Long): Boolean = loader.isFinished && store.isFinished(nowMs)

  /** total = loader total + manager total (":41-43"). */
  def totalCount: Long = loader.totalCount + store.metadata()("total_request_count")
  def handledCount: Long = store.metadata()("handled_request_count")

  /** Transfer up to `n` loader requests into the manager (forefront), then
    * advance the loader cursor. Returns the number transferred.
    */
  def transferNext(n: Int): Long = {
    if (loader.isFinished) return 0L
    val batch = loader.fetchNextBatch(n)
    val cnt = batch.count()
    if (cnt > 0) {
      store.addBatch(batch.withColumn("forefront", lit(true)))
      loader.markServedHandled() // only after the adds committed
    }
    cnt
  }

  /** Drain the whole loader into the manager. */
  def drainLoader(batchSize: Int = 1000): Long = {
    var total = 0L
    var moved = transferNext(batchSize)
    while (moved > 0) { total += moved; moved = transferNext(batchSize) }
    total
  }

  /** Write-side passthrough (":52-74"): new requests go to the manager. */
  def addBatch(adds: DataFrame): DataFrame = store.addBatch(adds)
}

/** [[RequestList]] exposed as a resumable [[RequestLoader]]: the cursor
  * (next index + expected key) persists to the KVS exactly like the
  * reference RequestList state (request_loaders/_request_list.py:19-24,
  * 129-140), with the same changed-seed-list consistency check on resume.
  */
final class RequestListLoader(
    spark: SparkSession,
    seeds: DataFrame, // (seq, unique_key, url)
    kvs: KeyValueStore
) extends RequestLoader {

  UrlFunctions.register(spark) // hostOf rides the adds projection

  private val StateKey = "request_list_loader_cursor"
  private val list = new RequestList(seeds)
  private val maxSeq: Long =
    seeds.agg(max(col("seq"))).collect().headOption.flatMap(r => Option(r.get(0)).map(_ => r.getLong(0))).getOrElse(-1L)
  private val total: Long = maxSeq + 1

  private var cursor: Long = 0L
  private var served: Long = -1L // through-seq of the last un-acked fetch

  // resume: validate the persisted cursor against the current seed list
  kvs.getJson(StateKey).foreach { json =>
    val next = """"next":\s*(\d+)""".r.findFirstMatchIn(json).map(_.group(1).toLong).getOrElse(0L)
    val key = """"key":\s*"([^"]*)"""".r.findFirstMatchIn(json).map(_.group(1))
    if (next <= maxSeq) list.fromCursor(next, key) // throws on changed list
    cursor = next
  }

  override def fetchNextBatch(n: Int): DataFrame = {
    served = math.min(cursor + n - 1, maxSeq)
    seeds
      .filter(col("seq") >= cursor && col("seq") <= served)
      .select(
        col("unique_key"),
        col("url"),
        UrlFunctions.hostOf(col("url")).as("host"),
        lit(null).cast("string").as("label"),
        lit("GET").as("method"),
        lit(0).as("depth"),
        lit(false).as("forefront"),
        col("seq").as("cand_order"))
  }

  override def markServedHandled(): Unit = if (served >= cursor) {
    cursor = served + 1
    val key =
      if (cursor > maxSeq) ""
      else seeds.filter(col("seq") === cursor).select(col("unique_key")).collect().head.getString(0)
    kvs.setJson(StateKey, s"""{"next":$cursor,"key":"$key"}""")
    kvs.persist()
    served = -1L
  }

  override def isFinished: Boolean = cursor > maxSeq
  override def totalCount: Long = total
  override def handledCount: Long = cursor
}
