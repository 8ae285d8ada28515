package graft.sources

import graft.SparkSpec
import graft.queue.FrontierStore
import graft.storage.KeyValueStore
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Generic RequestManagerTandem semantics (reference
  * _request_manager_tandem.py:24-111) over a RequestList loader: loader
  * contents transfer to the frontier at the forefront, finished only when
  * both sides drain, counts compose, and a killed transfer resumes from
  * the persisted cursor without duplicates.
  */
class TandemSpec extends SparkSpec {

  private def seedsDf(urls: Seq[String]) = {
    import spark.implicits._
    urls.zipWithIndex
      .map { case (u, i) => (i.toLong, graft.canon.UniqueKey.compute(u), u) }
      .toDF("seq", "unique_key", "url")
  }

  private val urls = (0 until 10).map(i => s"https://tandem.example.com/p/$i")

  test("loader drains into the manager; finished only when both sides drain (:41-50)") {
    val store = new FrontierStore(spark, Files.createTempDirectory("tandem").toString)
    val kvs = new KeyValueStore(spark, Files.createTempDirectory("tandem-kvs").toString)
    val loader = new RequestListLoader(spark, seedsDf(urls), kvs)
    val tandem = new RequestManagerTandem(loader, store)

    assert(tandem.totalCount == 10) // all still on the loader side
    assert(!tandem.isFinished(0L))

    assert(tandem.transferNext(4) == 4)
    assert(tandem.transferNext(100) == 6)
    assert(tandem.transferNext(100) == 0) // loader drained
    assert(loader.isFinished)
    assert(store.metadata()("pending_request_count") == 10)
    assert(!tandem.isFinished(0L)) // manager still has pending work

    // manager side still accepts new requests (:52-74)
    import spark.implicits._
    tandem.addBatch(
      Seq(("k-extra", "https://tandem.example.com/extra", "tandem.example.com",
        null.asInstanceOf[String], "GET", 0, false, 999L))
        .toDF("unique_key", "url", "host", "label", "method", "depth", "forefront", "cand_order"))
    assert(tandem.totalCount == 21) // 10 loader + 11 manager rows

    // drain the manager
    var claimed = store.claim(100, 0L)
    val keys = claimed.select(col("unique_key")).collect().map(_.getString(0)).toSeq
    store.markHandled(keys.map(k => (k, true, graft.schema.RequestState.Done))
      .toDF("unique_key", "handled_ok", "state"))
    assert(tandem.handledCount == 11)
    assert(tandem.isFinished(0L))
  }

  test("loader requests enter at the forefront (:88 add_request forefront=True)") {
    import spark.implicits._
    val store = new FrontierStore(spark, Files.createTempDirectory("tandem-ff").toString)
    // pre-existing FIFO work in the manager
    store.addBatch(
      Seq(("old-1", "https://t.example.com/old", "t.example.com",
        null.asInstanceOf[String], "GET", 0, false, 0L))
        .toDF("unique_key", "url", "host", "label", "method", "depth", "forefront", "cand_order"))
    val kvs = new KeyValueStore(spark, Files.createTempDirectory("tandem-ff-kvs").toString)
    val tandem = new RequestManagerTandem(new RequestListLoader(spark, seedsDf(urls.take(2)), kvs), store)
    tandem.drainLoader()
    val order = (1 to 3).map { _ =>
      val k = store.claim(1, 0L).select(col("unique_key")).collect().head.getString(0)
      store.markHandled(Seq((k, true, graft.schema.RequestState.Done))
        .toDF("unique_key", "handled_ok", "state"))
      k
    }
    // the two loader requests jump ahead of the pre-existing FIFO row
    assert(order.last == "old-1")
    assert(order.take(2).toSet == urls.take(2).map(graft.canon.UniqueKey.compute(_)).toSet)
  }

  test("killed transfer resumes from the persisted cursor, no duplicates (_request_list.py:129-140)") {
    val storeDir = Files.createTempDirectory("tandem-resume").toString
    val kvsDir = Files.createTempDirectory("tandem-resume-kvs").toString
    val store = new FrontierStore(spark, storeDir)
    val tandem = new RequestManagerTandem(
      new RequestListLoader(spark, seedsDf(urls), new KeyValueStore(spark, kvsDir)), store)
    assert(tandem.transferNext(4) == 4)

    // a seed list changed UNDER the persisted cursor is detected on resume
    val changed = seedsDf(urls.updated(4, "https://tandem.example.com/CHANGED"))
    intercept[IllegalStateException](
      new RequestListLoader(spark, changed, new KeyValueStore(spark, kvsDir)))

    // "kill": rebuild loader + store from persisted state (original list)
    val store2 = new FrontierStore(spark, storeDir)
    val tandem2 = new RequestManagerTandem(
      new RequestListLoader(spark, seedsDf(urls), new KeyValueStore(spark, kvsDir)), store2)
    assert(tandem2.transferNext(100) == 6) // resumes at index 4
    assert(store2.metadata()("pending_request_count") == 10)
    assert(store2.metadata()("total_request_count") == 10) // no duplicates
  }
}
