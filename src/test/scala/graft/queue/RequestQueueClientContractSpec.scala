package graft.queue

import java.nio.file.Files

import graft.SparkSpec

/** S11 — one contract, four interchangeable backends (reference
  * `storage_clients/_base/_request_queue_client.py`; its test suite runs
  * every queue test over each storage client the same way). Each scenario
  * below runs against memory, file-system, Derby-SQL and the event-log
  * FrontierStore adapter and must produce identical dispositions.
  */
class RequestQueueClientContractSpec extends SparkSpec {

  private var clockMs = 1000000L
  private def clock(): Long = { clockMs += 1; clockMs }

  private def freshBackends(): Seq[(String, RequestQueueClient)] = Seq(
    "memory" -> new MemoryRequestQueueClient(clock = clock _),
    "fs" -> new FileSystemRequestQueueClient(
      Files.createTempDirectory("fsrq").toString, clock = clock _),
    "sql" -> new SqlRequestQueueClient(
      Files.createTempDirectory("sqlrq").toString + "/db", clock = clock _),
    "frontier" -> new FrontierQueueClient(
      new FrontierStore(spark, Files.createTempDirectory("frq").toString), clock = clock _)
  )

  private def req(i: Int): QueueRequest =
    QueueRequest(uniqueKey = s"https://example.com/p/$i", url = s"https://example.com/p/$i")

  private def drain(c: RequestQueueClient, handle: Boolean = true): Seq[String] = {
    val out = Seq.newBuilder[String]
    var next = c.fetchNext()
    while (next.isDefined) {
      out += next.get.uniqueKey
      if (handle) c.markHandled(next.get)
      next = c.fetchNext()
    }
    out.result()
  }

  test("FIFO order + dedup first-wins + add report flags") {
    for ((label, c) <- freshBackends()) {
      val r = c.addBatch(Seq(req(1), req(2), req(1), req(3)))
      assert(r.processed.map(_.wasAlreadyPresent) == Seq(false, false, true, false), label)
      assert(r.processed.forall(!_.wasAlreadyHandled), label)
      // re-add of a pending key: present, position unchanged
      val r2 = c.addBatch(Seq(req(2)))
      assert(r2.processed == Seq(ProcessedRequest(req(2).uniqueKey, true, false)), label)
      assert(drain(c) == Seq(1, 2, 3).map(req(_).uniqueKey), label)
      // re-add of a handled key reports handled
      val r3 = c.addBatch(Seq(req(3)))
      assert(r3.processed == Seq(ProcessedRequest(req(3).uniqueKey, true, true)), label)
      assert(c.isFinished, label)
      c.drop()
    }
  }

  test("forefront LIFO ahead of FIFO, and forefront re-add repositions") {
    for ((label, c) <- freshBackends()) {
      c.addBatch(Seq(req(1), req(2), req(3)))
      c.addBatch(Seq(req(10)), forefront = true)
      c.addBatch(Seq(req(11)), forefront = true)
      // reposition pending regular req(3) to the very front
      c.addBatch(Seq(req(3)), forefront = true)
      val order = drain(c)
      assert(order == Seq(3, 11, 10, 1, 2).map(req(_).uniqueKey), label)
      c.drop()
    }
  }

  test("reclaim to back and to front; reclaimed object supersedes") {
    for ((label, c) <- freshBackends()) {
      c.addBatch(Seq(req(1), req(2), req(3)))
      val first = c.fetchNext().get
      assert(first.uniqueKey == req(1).uniqueKey, label)
      // reclaim to the BACK with accumulated state
      val back = c.reclaim(first.copy(retryCount = 7))
      assert(back.contains(ProcessedRequest(first.uniqueKey, true, false)), label)
      val second = c.fetchNext().get
      assert(second.uniqueKey == req(2).uniqueKey, label)
      // reclaim to the FRONT: fetched again before req(3)
      c.reclaim(second, forefront = true)
      val again = c.fetchNext().get
      assert(again.uniqueKey == req(2).uniqueKey, label)
      c.markHandled(again)
      val third = c.fetchNext().get
      assert(third.uniqueKey == req(3).uniqueKey, label)
      c.markHandled(third)
      val reclaimed = c.fetchNext().get
      assert(reclaimed.uniqueKey == req(1).uniqueKey, label)
      assert(reclaimed.retryCount == 7, s"$label: reclaim must supersede")
      c.markHandled(reclaimed)
      assert(c.isFinished, label)
      c.drop()
    }
  }

  test("markHandled / reclaim of a non-in-progress request returns None") {
    for ((label, c) <- freshBackends()) {
      c.addBatch(Seq(req(1)))
      assert(c.reclaim(req(1)).isEmpty, label)
      val f = c.fetchNext().get
      c.markHandled(f)
      assert(c.markHandled(f).isEmpty, s"$label: double-handle")
      assert(c.reclaim(f).isEmpty, s"$label: reclaim after handled")
      c.drop()
    }
  }

  test("isEmpty / isFinished transitions and metadata counters") {
    for ((label, c) <- freshBackends()) {
      assert(c.isEmpty && c.isFinished, label)
      c.addBatch(Seq(req(1), req(2)))
      assert(!c.isEmpty && !c.isFinished, label)
      val f = c.fetchNext().get
      val g = c.fetchNext().get
      // everything claimed: nothing to fetch, but not finished
      assert(c.isEmpty && !c.isFinished, label)
      c.markHandled(f); c.markHandled(g)
      assert(c.isEmpty && c.isFinished, label)
      val m = c.metadata
      assert(m.handledRequestCount == 2, label)
      assert(m.pendingRequestCount == 0, label)
      assert(m.totalRequestCount == 2, label)
      assert(m.id == c.id, label)
      c.drop()
    }
  }

  test("getRequest point lookup in every state") {
    for ((label, c) <- freshBackends()) {
      assert(c.getRequest(req(1).uniqueKey).isEmpty, label)
      c.addBatch(Seq(req(1)))
      assert(c.getRequest(req(1).uniqueKey).map(_.url).contains(req(1).url), label)
      val f = c.fetchNext().get
      assert(c.getRequest(req(1).uniqueKey).isDefined, s"$label: in progress")
      c.markHandled(f)
      assert(c.getRequest(req(1).uniqueKey).isDefined, s"$label: handled")
      c.drop()
    }
  }

  test("purge empties but keeps the storage usable") {
    for ((label, c) <- freshBackends()) {
      c.addBatch(Seq(req(1), req(2)))
      c.purge()
      assert(c.isEmpty && c.isFinished, label)
      assert(c.metadata.totalRequestCount == 0, label)
      c.addBatch(Seq(req(3)))
      assert(drain(c) == Seq(req(3).uniqueKey), label)
      c.drop()
    }
  }

  test("FS backend: restart recovers order, in-progress and handled state") {
    val dir = Files.createTempDirectory("fsrq-restart").toString
    val a = new FileSystemRequestQueueClient(dir, clock = clock _)
    a.addBatch(Seq(req(1), req(2), req(3)))
    a.addBatch(Seq(req(9)), forefront = true)
    val f = a.fetchNext().get // req(9), forefront
    a.markHandled(f)
    val g = a.fetchNext().get // req(1) — left in progress across the "restart"
    assert(g.uniqueKey == req(1).uniqueKey)

    val b = new FileSystemRequestQueueClient(dir, clock = clock _)
    assert(b.id == a.id, "stable id across restart")
    val m = b.metadata
    assert(m.handledRequestCount == 1 && m.totalRequestCount == 4)
    // in-progress survives the restart: req(1) is not re-fetched
    assert(drain(b) == Seq(2, 3).map(req(_).uniqueKey))
    assert(!b.isFinished, "req(1) still in progress")
    assert(b.markHandled(g).isDefined)
    assert(b.isFinished)
    b.drop()
  }

  test("SQL backend: lease expiry makes a fetched request claimable again") {
    val dir = Files.createTempDirectory("sqlrq-lease").toString + "/db"
    var now = 5000000L
    val c = new SqlRequestQueueClient(dir, clock = () => now, blockMs = 1000L, fetchBatchSize = 1)
    c.addBatch(Seq(req(1), req(2)))
    val f = c.fetchNext().get
    assert(f.uniqueKey == req(1).uniqueKey)
    // within the lease: req(1) is blocked, fetch yields req(2)
    now += 10
    val g = c.fetchNext().get
    assert(g.uniqueKey == req(2).uniqueKey)
    c.markHandled(g)
    // req(1)'s lease expires: it is claimable again (stale-lease recovery, Q8)
    now += 5000
    assert(c.fetchNext().get.uniqueKey == req(1).uniqueKey)
    assert(c.fetchNext().isEmpty, "fresh lease blocks re-fetch")
    c.close()
  }

  test("SQL backend: batched fetch serves the cache in sequence order") {
    val dir = Files.createTempDirectory("sqlrq-batch").toString + "/db"
    val c = new SqlRequestQueueClient(dir, clock = clock _, fetchBatchSize = 10)
    c.addBatch((1 to 5).map(req))
    // one SELECT leases all five; the cache serves 2..5 without new queries
    assert(drain(c) == (1 to 5).map(req(_).uniqueKey))
    assert(c.isFinished)
    c.close()
  }

  test("C10 request id: sha256(unique_key)[:15], file name on disk, column form agrees") {
    val key = "https://example.com/p/1"
    val rid = QueueRequest.requestId(key)
    assert(rid.length == 15 && rid.forall(ch => "0123456789abcdef".contains(ch)))

    val dir = Files.createTempDirectory("fsrq-c10").toString
    val c = new FileSystemRequestQueueClient(dir, clock = clock _)
    c.addBatch(Seq(req(1)))
    assert(Files.exists(java.nio.file.Paths.get(dir, s"$rid.json")),
      "FS backend file named by the C10 hash")
    c.drop()

    import org.apache.spark.sql.functions._
    val fromCol = spark.range(1)
      .select(QueueRequest.requestIdCol(lit(key)).as("rid"))
      .head().getString(0)
    assert(fromCol == rid, "column form bit-matches the Scala form")

    // SQL backend integer form: int(sha256(unique_key)[:15], 16)
    assert(java.lang.Long.parseLong(rid, 16) >= 0)
  }
}
