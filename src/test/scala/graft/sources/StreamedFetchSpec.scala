package graft.sources

import graft.SparkSpec

import java.nio.file.Files
import java.security.MessageDigest
import java.util.concurrent.ConcurrentHashMap

/** S10 streamed fetch: chunked consumption with bounded memory, an
  * incremental digest, chunk-granular size-cap abort, and a chunkwise
  * file sink — the reference `stream()`/`read_stream()` contract.
  *
  * Closures live in the companion (no suite capture); the pull counter is
  * JVM-static so executor-side increments are visible to the driver in
  * local mode.
  */
object StreamedFetchSpec {
  val pulled = new ConcurrentHashMap[String, Integer]()

  def chunkOf(url: String, k: Int): Array[Byte] = s"$url#chunk$k;".getBytes("UTF-8")

  def countingSource(n: Int): String => Iterator[Array[Byte]] = { url =>
    (0 until n).iterator.map { k =>
      pulled.merge(url, 1, (a, b) => a + b) // counts LAZY pulls
      chunkOf(url, k)
    }
  }

  def sizedSource(url: String): Iterator[Array[Byte]] = {
    val n = 1 + url.last.toString.toInt % 5
    (0 until n).iterator.map(k => chunkOf(url, k))
  }

  def hexDigest(chunks: Seq[Array[Byte]]): String = {
    val md = MessageDigest.getInstance("SHA-256")
    chunks.foreach(md.update)
    md.digest().map(b => f"${b & 0xff}%02x").mkString
  }
}

class StreamedFetchSpec extends SparkSpec {
  import StreamedFetchSpec._

  test("digest and byte counts match a reference computation; sink files hold the exact bytes") {
    import spark.implicits._
    val urls = (0 until 20).map(i => s"https://files.example.com/f/$i")
    val dir = Files.createTempDirectory("streamed").toString
    val out = StreamedFetch
      .stream(urls.toDF("url"), "url", sizedSource, maxBytes = Long.MaxValue,
        sinkDir = Some(dir))
      .collect().map(d => d.url -> d).toMap
    urls.foreach { u =>
      val chunks = (0 until (1 + u.last.toString.toInt % 5)).map(chunkOf(u, _))
      val d = out(u)
      assert(d.n_chunks == chunks.size && !d.truncated)
      assert(d.total_bytes == chunks.map(_.length.toLong).sum)
      assert(d.sha256 == hexDigest(chunks))
      val onDisk = Files.readAllBytes(java.nio.file.Paths.get(dir, StreamedFetch.fileNameFor(u)))
      assert(java.util.Arrays.equals(onDisk, chunks.toArray.flatten))
    }
  }

  test("size cap aborts mid-stream at chunk granularity and stops pulling the source") {
    import spark.implicits._
    val url = "https://files.example.com/big"
    pulled.clear()
    // 100 chunks of ~34 bytes; cap admits only the first 3
    val cap = (0 until 3).map(chunkOf(url, _).length.toLong).sum
    val d = StreamedFetch
      .stream(Seq(url).toDF("url"), "url", countingSource(100), maxBytes = cap)
      .collect().head
    assert(d.truncated)
    assert(d.n_chunks == 3)
    assert(d.total_bytes == cap)
    // the violating 4th pull ends consumption; the other 96 chunks are
    // NEVER materialized — the bounded-memory contract
    assert(pulled.get(url) == 4, s"pulled ${pulled.get(url)}")
    // the digest covers exactly the consumed prefix
    assert(d.sha256 == hexDigest((0 until 3).map(chunkOf(url, _))))
  }

  test("empty stream: zero chunks, empty-digest sha, not truncated") {
    import spark.implicits._
    val d = StreamedFetch
      .stream(Seq("https://files.example.com/empty").toDF("url"), "url",
        _ => Iterator.empty, maxBytes = 10)
      .collect().head
    assert(d.n_chunks == 0 && d.total_bytes == 0L && !d.truncated)
    assert(d.sha256 == hexDigest(Seq.empty))
  }
}
