package graft.sources

import graft.SparkSpec
import graft.fixtures.Warc

import java.io.ByteArrayInputStream
import java.util.zip.GZIPOutputStream

/** WARC ingestion (WarcReader): multi-member gzip splitting, binary-safe
  * Content-Length framing, warcinfo skipping, truncation tolerance, and the
  * distributed read over a multi-file corpus.
  */
class WarcSpec extends SparkSpec {

  private def readAll(bytes: Array[Byte]): Seq[WarcReader.WarcRow] =
    WarcReader.records("test", new ByteArrayInputStream(bytes)).toSeq

  test("uncompressed file: responses recovered, warcinfo skipped, bodies byte-exact") {
    val rows = readAll(Warc.fileBytes("t", 0, 16, gzipPerRecord = false))
    assert(rows.length == 16) // warcinfo skipped
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.url == Warc.urlOf(i.toLong))
      assert(r.status == Warc.statusOf(i.toLong))
      assert(r.mime == Warc.mimeOf(i.toLong))
      assert(r.body.sameElements(Warc.bodyOf(i.toLong)))
    }
    // record 5 is the raw-binary body (contains 0x00 and a CRLFCRLF)
    assert(rows(5).body.sameElements(Array[Byte](0x00, -1, 0x0d, 0x0a, 0x0d, 0x0a, 0x42, 0x00, 0x7f)))
  }

  test("per-record gzip members (Common Crawl layout) and whole-file gzip both parse") {
    val multi = readAll(Warc.fileBytes("t", 0, 12, gzipPerRecord = true))
    assert(multi.length == 12)

    val plain = Warc.fileBytes("t", 0, 12, gzipPerRecord = false)
    val out = new java.io.ByteArrayOutputStream()
    val gz = new GZIPOutputStream(out)
    gz.write(plain); gz.close()
    val whole = readAll(out.toByteArray)
    assert(whole.map(_.url) == multi.map(_.url))
  }

  test("truncated tail record yields the complete prefix without failing") {
    val full = Warc.fileBytes("t", 0, 8, gzipPerRecord = false)
    // cut into the middle of the last record's body
    val cut = java.util.Arrays.copyOfRange(full, 0, full.length - 40)
    val rows = readAll(cut)
    assert(rows.length == 7)
    assert(rows.map(_.url) == (0 until 7).map(i => Warc.urlOf(i.toLong)))
  }

  test("streaming ingestion: segments consumed exactly once, bounded per trigger") {
    import java.nio.file.{Files, Paths}
    val in = Files.createTempDirectory("warc-stream-in").toString
    val ck = Files.createTempDirectory("warc-stream-ck").toString
    // two segments dropped before the query starts
    Files.write(Paths.get(in, "seg-0.warc.gz"), Warc.fileBytes("s0", 0, 8, gzipPerRecord = true))
    Files.write(Paths.get(in, "seg-1.warc.gz"), Warc.fileBytes("s1", 8, 20, gzipPerRecord = true))

    val q = WarcReader.readStream(spark, in, maxFilesPerTrigger = Some(1))
      .writeStream
      .format("memory")
      .queryName("warc_stream")
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.sql("SELECT url FROM warc_stream").collect().map(_.getString(0)).sorted
    assert(got.toSeq == (0L until 20L).map(Warc.urlOf).sorted)
    // one file per micro-batch: offsets checkpoint records 2 batches
    assert(q.recentProgress.count(_.numInputRows > 0) == 2)
  }

  test("distributed read over a multi-file .warc.gz corpus") {
    val (filesDir, _) = Warc.writeCorpus(spark, 3, 10)
    val df = WarcReader.read(spark, filesDir + "/*.warc.gz")
    val rows = df.collect()
    assert(rows.length == 30)
    assert(df.select("url").distinct().count() == 30)
    // every row's body hashes to the generator's expectation
    val got = df
      .select(org.apache.spark.sql.functions.col("url"),
        org.apache.spark.sql.functions.sha2(org.apache.spark.sql.functions.col("body"), 256).as("sha"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    (0L until 30L).foreach { i =>
      assert(got(Warc.urlOf(i)) == graft.canon.Hashing.sha256Hex(Warc.bodyOf(i)))
    }
  }
}
