package graft.queue

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S11 backend 4 — the distributed event-log [[FrontierStore]] exposed
  * through the [[RequestQueueClient]] contract. This is the scale backend
  * (the reference's server-backed client slot): adds, claims and commits
  * are Spark jobs over the partitioned frontier state, so the same
  * call-for-call API the single-node backends implement drives a store
  * that holds 10^10 requests.
  *
  * Single-request `fetchNext` is the contract's granularity; the engine
  * bypasses this adapter and uses [[FrontierStore.claim]] with
  * batch-sized N directly (one Spark job per micro-batch, not per
  * request). The adapter exists so the four backends are interchangeable
  * behind one trait — reference
  * `storage_clients/_base/_request_queue_client.py` — and is contract-
  * tested against the other three.
  *
  * Timestamp metadata (created/accessed/modified) is tracked adapter-side:
  * the store's manifest persists counters, not clock times (documented
  * substitution; counter fields come from the store itself).
  */
final class FrontierQueueClient(
    val store: graft.queue.FrontierStore,
    clock: () => Long = () => System.currentTimeMillis()
) extends RequestQueueClient {

  private val spark: SparkSession = store.spark

  def id: String = store.id

  private val createdAt = clock()
  private var accessedAt = createdAt
  private var modifiedAt = createdAt

  private def touch(modified: Boolean): Unit = {
    accessedAt = clock()
    if (modified) modifiedAt = accessedAt
  }

  private def hostOf(url: String): String =
    if (url == null) ""
    else graft.canon.UrlCanon.normalizeHost(graft.canon.UrlCanon.parse(url).host)

  private val addsSchema = StructType(Seq(
    StructField("unique_key", StringType), StructField("url", StringType),
    StructField("host", StringType), StructField("label", StringType),
    StructField("method", StringType), StructField("depth", IntegerType),
    StructField("forefront", BooleanType), StructField("cand_order", LongType)
  ))

  override def metadata: QueueMetadata = {
    val m = store.metadata()
    QueueMetadata(
      id = id, name = store.name,
      handledRequestCount = m.getOrElse("handled_request_count", 0L),
      // reference pending_request_count counts everything not yet handled
      pendingRequestCount =
        m.getOrElse("pending_request_count", 0L) + m.getOrElse("in_progress_request_count", 0L),
      totalRequestCount = m.getOrElse("total_request_count", 0L),
      createdAtMs = createdAt, accessedAtMs = accessedAt, modifiedAtMs = modifiedAt)
  }

  override def addBatch(requests: Seq[QueueRequest], forefront: Boolean): AddRequestsResponse = {
    if (requests.isEmpty) return AddRequestsResponse(Nil, Nil)
    val rows = requests.zipWithIndex.map { case (r, i) =>
      Row(r.uniqueKey, r.url, hostOf(r.url), r.label.orNull, r.method, 0, forefront, i.toLong)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), addsSchema)
    // one report row per candidate (in-batch duplicates included); pick the
    // first-occurrence row per key (the one not flagged as a duplicate) and
    // emit in input order — duplicates report present=true (module Q1 rule)
    val byKey = store.addBatch(FrontierStore.normalizeAdds(df), candBound = requests.size.toLong)
      .select("unique_key", "was_already_present", "was_already_handled")
      .collect()
      .map(r => ProcessedRequest(r.getString(0), r.getBoolean(1), r.getBoolean(2)))
      .groupBy(_.uniqueKey)
    val firstReport = byKey.map { case (k, rs) => k -> rs.find(!_.wasAlreadyPresent).getOrElse(rs.head) }
    touch(modified = true)
    val seen = scala.collection.mutable.HashSet.empty[String]
    val processed = requests.map { r =>
      val fr = firstReport(r.uniqueKey)
      if (seen.add(r.uniqueKey)) fr
      else ProcessedRequest(r.uniqueKey, wasAlreadyPresent = true, wasAlreadyHandled = fr.wasAlreadyHandled)
    }
    AddRequestsResponse(processed, Nil)
  }

  private def rowToRequest(r: Row): QueueRequest = {
    def str(c: String): Option[String] = {
      val i = r.fieldIndex(c)
      if (r.isNullAt(i)) None else Some(r.getString(i))
    }
    def intAt(c: String): Int = {
      val i = r.fieldIndex(c)
      if (r.isNullAt(i)) 0 else r.getInt(i)
    }
    QueueRequest(
      uniqueKey = r.getString(r.fieldIndex("unique_key")),
      url = str("url").getOrElse(""),
      method = str("method").getOrElse("GET"),
      label = str("label"),
      retryCount = intAt("retry_count"))
  }

  override def fetchNext(): Option[QueueRequest] = {
    val claimed = store.claim(1, clock()).collect()
    touch(modified = true)
    claimed.headOption.map(rowToRequest)
  }

  override def getRequest(uniqueKey: String): Option[QueueRequest] = {
    touch(modified = false)
    store.getRequest(uniqueKey).map(rowToRequest)
  }

  private def statusOf(uniqueKey: String): Option[Int] =
    store.getRequest(uniqueKey).map(r => r.getInt(r.fieldIndex("status")))

  override def markHandled(request: QueueRequest): Option[ProcessedRequest] = {
    if (!statusOf(request.uniqueKey).contains(graft.schema.Status.InProgress)) return None
    val df = spark.createDataFrame(
      java.util.List.of(Row(request.uniqueKey, true, graft.schema.RequestState.Done)),
      StructType(Seq(
        StructField("unique_key", StringType), StructField("handled_ok", BooleanType),
        StructField("state", IntegerType))))
    store.markHandled(df)
    touch(modified = true)
    Some(ProcessedRequest(request.uniqueKey, wasAlreadyPresent = true, wasAlreadyHandled = true))
  }

  override def reclaim(request: QueueRequest, forefront: Boolean): Option[ProcessedRequest] = {
    if (!statusOf(request.uniqueKey).contains(graft.schema.Status.InProgress)) return None
    val df = spark.createDataFrame(
      java.util.List.of(Row(request.uniqueKey, forefront, request.retryCount)),
      StructType(Seq(
        StructField("unique_key", StringType), StructField("forefront", BooleanType),
        StructField("retry_count", IntegerType))))
    store.reclaim(df)
    touch(modified = true)
    Some(ProcessedRequest(request.uniqueKey, wasAlreadyPresent = true, wasAlreadyHandled = false))
  }

  override def isEmpty: Boolean = store.isEmpty(clock())

  override def isFinished: Boolean = store.isFinished(clock())

  override def purge(): Unit = { store.purge(); touch(modified = true) }

  override def drop(): Unit = { store.drop(); touch(modified = true) }
}
