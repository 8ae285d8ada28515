package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

import org.apache.spark.sql.functions._

/** Byte-level half of the TarWriter contract (the packing-plan half is the
  * `mm_wds_reshard_plan` oracle entry): written shards round-trip through
  * TarReader byte-for-byte, planned in-file offsets equal the offsets an
  * independent header walk recovers from the written files, size bounds
  * hold up to one-sample overflow, and gzip + GNU long names survive.
  */
class TarWriterSpec extends SparkSpec {

  private def corpusMembers = {
    val dir = graft.fixtures.Tar.writeCorpus(spark, 4, 18)
    TarReader.withSampleColumns(TarReader.read(spark, dir + "/*"))
      .select(col("key"), col("name"), col("bytes"))
  }

  /** Independent offset walk over one written (uncompressed) shard file:
    * 512-block stepping, octal size field, data rounded to whole blocks.
    * Shares no code with TarWriter or TarReader.
    */
  private def walkOffsets(path: String): Seq[(String, Long)] = {
    val all = Files.readAllBytes(Paths.get(path))
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    var off = 0L
    var pendingLong: String = null
    while (off + 512 <= all.length && all((off).toInt) != 0) {
      val h = java.util.Arrays.copyOfRange(all, off.toInt, off.toInt + 512)
      val name = new String(h.takeWhile(_ != 0), "UTF-8")
      val sizeStr = new String(h.slice(124, 136)).trim.takeWhile(c => c >= '0' && c <= '7')
      val size = java.lang.Long.parseLong(sizeStr, 8)
      val typeflag = h(156).toChar
      if (typeflag == 'L') {
        pendingLong = new String(all, off.toInt + 512, size.toInt, "UTF-8").takeWhile(_ != 0)
      } else {
        val n = if (pendingLong != null) pendingLong else name
        out += ((n, off))
        pendingLong = null
      }
      off += 512 + ((size + 511) / 512) * 512
    }
    out.toSeq
  }

  test("round trip: written shards regroup to the same (name, sha) member set") {
    val outDir = Files.createTempDirectory("tarwriter_rt").toString
    val manifest = TarWriter.writeShards(corpusMembers, outDir, maxShardBytes = 16384, tasks = 3)
    assert(manifest.count() > 3, "expected multiple shards across tasks")

    val back = TarReader.read(spark, outDir + "/*")
      .select(col("name"), sha2(col("bytes"), 256).as("sha"))
    val orig = corpusMembers.select(col("name"), sha2(col("bytes"), 256).as("sha"))
    assert(back.exceptAll(orig).count() === 0)
    assert(orig.exceptAll(back).count() === 0)

    // samples stay atomic: every key's members live in exactly one shard
    val spread = TarReader.withSampleColumns(TarReader.read(spark, outDir + "/*"))
      .groupBy(col("key")).agg(countDistinct(col("shard")).as("nshards"))
      .filter(col("nshards") > 1)
    assert(spread.count() === 0)
  }

  test("planned offsets match an independent header walk of the written files") {
    val outDir = Files.createTempDirectory("tarwriter_off").toString
    val manifest = TarWriter.writeShards(corpusMembers, outDir, maxShardBytes = 16384, tasks = 3)
      .collect()
    val planned = TarWriter.plan(
      corpusMembers.withColumn("size", length(col("bytes")).cast("long")),
      maxShardBytes = 16384, tasks = 3)
      .select(col("__task"), col("__shard"), col("name"), col("__file_offset"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getString(2)), r.getLong(3)))
      .toMap
    var checked = 0
    manifest.foreach { m =>
      val task = m.getAs[Long]("task"); val shard = m.getAs[Long]("shard")
      walkOffsets(m.getAs[String]("path")).foreach { case (name, off) =>
        assert(planned((task, shard, name)) === off, s"offset mismatch for $name")
        checked += 1
      }
    }
    assert(checked > 100, s"walked only $checked members")
  }

  test("size bound: every shard fits maxShardBytes plus at most one sample") {
    val outDir = Files.createTempDirectory("tarwriter_sz").toString
    val bound = 16384L
    val manifest = TarWriter.writeShards(corpusMembers, outDir, bound, tasks = 3).collect()
    val maxSample = TarWriter.plan(
      corpusMembers.withColumn("size", length(col("bytes")).cast("long")), bound, 3)
      .groupBy(col("key")).agg(sum(col("__padded")).as("sb"))
      .agg(max(col("sb"))).head.getLong(0)
    manifest.foreach { m =>
      val fileBytes = m.getAs[Long]("file_bytes")
      assert(fileBytes <= bound + maxSample + 1024, s"shard over bound: $fileBytes")
      // trailer: uncompressed files end in two zero blocks
      val all = Files.readAllBytes(Paths.get(m.getAs[String]("path")))
      assert(all.takeRight(1024).forall(_ == 0))
    }
  }

  test("gzip output round-trips through the reader's magic sniff") {
    val outDir = Files.createTempDirectory("tarwriter_gz").toString
    TarWriter.writeShards(corpusMembers, outDir, maxShardBytes = 32768, tasks = 2, gzipOut = true)
    val files = Files.list(Paths.get(outDir)).toArray.map(_.toString)
    assert(files.nonEmpty && files.forall(_.endsWith(".tar.gz")))
    val back = TarReader.read(spark, outDir + "/*")
      .select(col("name"), sha2(col("bytes"), 256).as("sha"))
    val orig = corpusMembers.select(col("name"), sha2(col("bytes"), 256).as("sha"))
    assert(back.exceptAll(orig).count() === 0)
    assert(orig.exceptAll(back).count() === 0)
  }

  test("GNU long names (>=100 bytes) write an 'L' record and round-trip") {
    import spark.implicits._
    val longKey = "deep/" + ("d" * 110)
    val rows = Seq(
      (longKey, s"$longKey.txt", "long-name payload".getBytes("UTF-8")),
      ("short", "short.txt", "short payload".getBytes("UTF-8")))
    val df = rows.toDF("key", "name", "bytes")
    val outDir = Files.createTempDirectory("tarwriter_long").toString
    TarWriter.writeShards(df, outDir, maxShardBytes = 1 << 20, tasks = 1)
    val back = TarReader.read(spark, outDir + "/*")
      .select(col("name"), col("bytes").cast("string").as("text"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(back(s"$longKey.txt") === "long-name payload")
    assert(back("short.txt") === "short payload")
  }

  test("packing plan rides one exchange: no second shuffle between windows") {
    val planned = TarWriter.plan(
      corpusMembers.withColumn("size", length(col("bytes")).cast("long")),
      maxShardBytes = 16384, tasks = 3)
    val p = planned.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges === 1, s"expected exactly one exchange, plan:\n$p")
  }
}
