package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.file.{Files, Path, Paths}

/** Partitioned Bloom "URL-seen" filter (SURVEY.md Q2; north rule).
  *
  * Semantics follow the reference's Redis bloom dedup mode
  * (/root/reference/src/crawlee/storage_clients/_redis/_request_queue_client.py:269-339,
  * default FPR 1e-7, documented as "possibility 1e-7 that requests will be
  * skipped"): a key the filter reports as present is treated as already
  * seen — accepting the false-positive drop rate in exchange for dedup with
  * NO exact anti-join against the 10^10-row frontier.
  *
  * Scale design: one sketch per key-hash bucket (`pmod(key64, buckets)`),
  * so at 10^10 keys / 1e-7 FPR (≈42 bits/key ≈ 52 GB total) each shard is
  * ~13 MB with 4096 buckets — built and probed partition-locally after a
  * repartition on the bucket column, never broadcast whole (SURVEY §7.4.3).
  * At local test scale the shard map is small enough to broadcast, which is
  * the code path below; the bucket math is identical.
  *
  * Shards are persisted per commit (one binary blob per bucket) so a
  * resumed job reloads the exact seen-set.
  */
final class BloomSeenFilter private (
    val buckets: Int,
    val expectedPerBucket: Long,
    val fpp: Double,
    private val shards: Array[BloomFilter]
) extends Serializable {

  def bucketOf(key64: Long): Int = (((key64 % buckets) + buckets) % buckets).toInt

  def put(key64: Long): Unit = shards(bucketOf(key64)).putLong(key64)

  def mightContain(key64: Long): Boolean = shards(bucketOf(key64)).mightContainLong(key64)

  def mergeFrom(other: BloomSeenFilter): Unit = {
    require(other.buckets == buckets, "bucket count mismatch")
    var i = 0
    while (i < buckets) { shards(i).mergeInPlace(other.shards(i)); i += 1 }
  }

  /** Serialized size across all shards (bytes). */
  def sizeBytes: Long = shards.map { s =>
    val out = new ByteArrayOutputStream(); s.writeTo(out); out.size().toLong
  }.sum

  def save(dir: String): Unit = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    shards.zipWithIndex.foreach { case (s, i) =>
      val out = new ByteArrayOutputStream()
      s.writeTo(out)
      Files.write(d.resolve(f"shard-$i%04d.bloom"), out.toByteArray)
    }
    Files.writeString(d.resolve("meta"), s"$buckets,$expectedPerBucket,$fpp")
  }
}

object BloomSeenFilter {

  def create(buckets: Int = 64, expectedPerBucket: Long = 1000000L, fpp: Double = 1e-7): BloomSeenFilter =
    new BloomSeenFilter(
      buckets, expectedPerBucket, fpp,
      Array.fill(buckets)(BloomFilter.create(expectedPerBucket, fpp))
    )

  def load(dir: String): Option[BloomSeenFilter] = {
    val d = Paths.get(dir)
    if (!Files.exists(d.resolve("meta"))) return None
    val Array(b, e, f) = Files.readString(d.resolve("meta")).split(",")
    val buckets = b.toInt
    val shards = (0 until buckets).map { i =>
      val bytes = Files.readAllBytes(d.resolve(f"shard-$i%04d.bloom"))
      BloomFilter.readFrom(new ByteArrayInputStream(bytes))
    }.toArray
    Some(new BloomSeenFilter(buckets, e.toLong, f.toDouble, shards))
  }

  /** Build a filter from the key64 column of `df` — distributed build: one
    * partial filter per partition (mapPartitions), merged on the driver.
    * NOTE: every partial allocates the FULL filter size (merge requires
    * equal bit widths), so executor memory must cover
    * partitions_in_flight × sizeBytes — coalesce the keys or size the
    * filter accordingly. The frontier's per-commit fold uses a driver-side
    * collect of the (bare Long) key column instead, which is cheaper until
    * batches reach tens of millions of keys.
    */
  def build(
      spark: SparkSession,
      keys: DataFrame, // single LongType column
      buckets: Int = 64,
      expectedPerBucket: Long = 1000000L,
      fpp: Double = 1e-7
  ): BloomSeenFilter = {
    import spark.implicits._
    val col0 = keys.columns.head
    val partials = keys
      .select(col(col0).cast("long"))
      .as[Long]
      .mapPartitions { it =>
        val f = create(buckets, expectedPerBucket, fpp)
        it.foreach(f.put)
        Iterator.single(serialize(f))
      }
      .collect()
    val merged = create(buckets, expectedPerBucket, fpp)
    partials.foreach(bytes => merged.mergeFrom(deserialize(bytes)))
    merged
  }

  def serialize(f: BloomSeenFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(out)
    oos.writeInt(f.buckets)
    oos.writeLong(f.expectedPerBucket)
    oos.writeDouble(f.fpp)
    f.shards.foreach { s =>
      val b = new ByteArrayOutputStream()
      s.writeTo(b)
      oos.writeInt(b.size())
      oos.write(b.toByteArray)
    }
    oos.flush()
    out.toByteArray
  }

  def deserialize(bytes: Array[Byte]): BloomSeenFilter = {
    val ois = new java.io.ObjectInputStream(new ByteArrayInputStream(bytes))
    val buckets = ois.readInt()
    val expected = ois.readLong()
    val fpp = ois.readDouble()
    val shards = Array.fill(buckets) {
      val n = ois.readInt()
      val buf = new Array[Byte](n)
      ois.readFully(buf)
      BloomFilter.readFrom(new ByteArrayInputStream(buf))
    }
    new BloomSeenFilter(buckets, expected, fpp, shards)
  }
}
