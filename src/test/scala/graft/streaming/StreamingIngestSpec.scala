package graft.streaming

import graft.SparkSpec
import graft.queue.FrontierStore
import org.apache.spark.sql.SaveMode

import java.nio.file.Files

/** Streaming request ingest into the frontier: files dropped into the
  * watched directory land exactly once (checkpointed offsets + dedup-on-
  * add idempotence), across separate drain cycles and a simulated replay.
  */
class StreamingIngestSpec extends SparkSpec {

  private def addsFile(dir: String, urls: Seq[String]): Unit = {
    import spark.implicits._
    // append part-files directly into the watched directory (the file
    // stream source does not recurse into subdirectories)
    urls.map(u => (graft.canon.UniqueKey.compute(u), u, "stream.example.com", null.asInstanceOf[String], 0))
      .toDF("unique_key", "url", "host", "label", "depth")
      .coalesce(1).write.mode(SaveMode.Append).parquet(dir)
  }

  test("files land in the frontier exactly once across drain cycles") {
    val in = Files.createTempDirectory("ingest-in").toString
    val ck = Files.createTempDirectory("ingest-ck").toString
    val store = new FrontierStore(spark, Files.createTempDirectory("ingest-store").toString)
    val ingest = new StreamingRequestIngest(spark, store, in)

    addsFile(in, (0 until 20).map(i => s"https://stream.example.com/p/$i"))
    ingest.drainAvailable(ck)
    assert(store.metadata()("pending_request_count") == 20)

    // second producer drop, SAME checkpoint: only the new file is read
    addsFile(in, (15 until 30).map(i => s"https://stream.example.com/p/$i")) // 5 dups
    ingest.drainAvailable(ck)
    assert(store.metadata()("pending_request_count") == 30) // 20 + 10 new, 5 deduped

    // replay simulation: a FRESH checkpoint re-reads everything; the
    // frontier's dedup-on-add makes the replay a no-op
    ingest.drainAvailable(Files.createTempDirectory("ingest-ck2").toString)
    assert(store.metadata()("pending_request_count") == 30)
    assert(store.metadata()("total_request_count") == 30)
  }

  test("bounded buffer (S6): maxFilesPerTrigger caps each frontier commit's intake") {
    val in = Files.createTempDirectory("bb-in").toString
    val ck = Files.createTempDirectory("bb-ck").toString
    val store = new FrontierStore(spark, Files.createTempDirectory("bb-store").toString)
    val ingest = new StreamingRequestIngest(spark, store, in)

    // five producer files of 6 urls each, dropped BEFORE the query starts
    (0 until 5).foreach(f => addsFile(in, (0 until 6).map(i => s"https://stream.example.com/b/$f/$i")))
    val before = store.batchId
    val q = ingest.start(ck, maxFilesPerTrigger = Some(1))
    q.awaitTermination()
    // everything landed exactly once...
    assert(store.metadata()("pending_request_count") == 30)
    // ...but across BOUNDED micro-batches: one commit per file, not one
    // flood commit (the reference's max_buffer_size back-pressure shape)
    assert(store.batchId - before == 5, s"expected 5 bounded commits, got ${store.batchId - before}")
  }
}
