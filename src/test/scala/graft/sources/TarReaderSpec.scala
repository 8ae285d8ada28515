package graft.sources

import graft.SparkSpec
import graft.fixtures.Tar

import java.io.ByteArrayInputStream

class TarReaderSpec extends SparkSpec {

  private def parse(bytes: Array[Byte]): Seq[TarReader.TarRow] =
    TarReader.members("t", new ByteArrayInputStream(bytes)).toSeq

  test("ustar members round-trip the hand-rolled writer (names, sizes, bytes)") {
    val plan = Tar.membersOf(0, 12)
    val got = parse(Tar.tarBytes(0, 12))
    assert(got.map(_.name) == plan.map(_._1))
    plan.zip(got).foreach { case ((name, bytes), row) =>
      assert(row.size == bytes.length, name)
      assert(java.util.Arrays.equals(row.bytes, bytes), name)
    }
  }

  test("gzip is sniffed from the magic, not the extension") {
    val raw = Tar.tarBytes(2, 5)
    val out = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(raw); gz.close()
    assert(parse(out.toByteArray).map(_.name) == parse(raw).map(_.name))
  }

  test("truncated tail keeps the members already parsed, never throws") {
    val raw = Tar.tarBytes(0, 6)
    val whole = parse(raw)
    // cut mid-way through the archive: strictly fewer members, no exception
    val cut = parse(raw.take(raw.length / 2))
    assert(cut.nonEmpty && cut.length < whole.length)
    cut.zip(whole).foreach { case (c, w) => assert(c.name == w.name) }
    // cut inside the very first header
    assert(parse(raw.take(100)).isEmpty)
  }

  test("GNU long-name records name the following member") {
    val longName = "deep/" + ("d" * 120) + "/file.txt"
    val payload = "hello tar".getBytes("UTF-8")
    val out = new java.io.ByteArrayOutputStream()
    // 'L' record: header named ././@LongLink, data = the real name
    def hdr(name: String, size: Long, tf: Char): Array[Byte] = {
      val h = new Array[Byte](512)
      val nb = name.getBytes("UTF-8"); System.arraycopy(nb, 0, h, 0, nb.length)
      def put(off: Int, s: String): Unit = {
        val b = s.getBytes("US-ASCII"); System.arraycopy(b, 0, h, off, b.length)
      }
      put(124, f"$size%011o" + " ")
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      h(156) = tf.toByte
      put(257, "ustar ")
      var sum = 0L; h.foreach(b => sum += (b & 0xff)); put(148, f"$sum%06o" + "  ")
      h
    }
    def padded(b: Array[Byte]): Array[Byte] =
      b ++ new Array[Byte]((512 - (b.length % 512)) % 512)
    out.write(hdr("././@LongLink", longName.length.toLong, 'L'))
    out.write(padded(longName.getBytes("UTF-8")))
    out.write(hdr("truncated-name", payload.length.toLong, '0'))
    out.write(padded(payload))
    out.write(new Array[Byte](1024))
    val rows = parse(out.toByteArray)
    assert(rows.map(_.name) == Seq(longName))
    assert(new String(rows.head.bytes, "UTF-8") == "hello tar")
  }

  test("first-dot sample keys: multi-dot extensions and directories") {
    assert(TarReader.splitKey("s00/sample0001.jpg") == (("s00/sample0001", "jpg")))
    assert(TarReader.splitKey("s00/sample0001.meta.json") == (("s00/sample0001", "meta.json")))
    assert(TarReader.splitKey("noext") == (("noext", "")))
    assert(TarReader.splitKey("a/b/c.tar.gz") == (("a/b/c", "tar.gz")))
  }

  test("distributed read + sample grouping over a mixed plain/gzip shard dir") {
    import org.apache.spark.sql.functions._
    val dir = Tar.writeCorpus(spark, 3, 9)
    val df = TarReader.read(spark, dir + "/*")
    // every member of every shard arrives exactly once
    val expected = (0 until 3).flatMap(s => Tar.membersOf(s, 9)).map(_._1).sorted
    assert(df.select("name").collect().map(_.getString(0)).sorted.toSeq == expected)
    // shard 1 is gzipped with a .tar name: its members must be present
    assert(df.filter(col("name").startsWith("s01/")).count() > 0)
  }
}
