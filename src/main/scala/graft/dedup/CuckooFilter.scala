package graft.dedup

import graft.canon.Hashing

/** Cuckoo filter — the deletion-capable dedup tier (north rule: "bloom/
  * cuckoo URL-seen dedup ... cuckoo-filter spill tier for deletions").
  *
  * Bloom filters cannot delete, so re-crawlable keys (purged queues,
  * scheduled re-crawls) spill to this tier. Standard partial-key cuckoo
  * hashing per Fan et al., "Cuckoo Filter: Practically Better Than Bloom"
  * (CoNEXT 2014, public): 4-slot buckets, 16-bit fingerprints, alternate
  * bucket = bucket XOR hash(fingerprint), bounded eviction chain.
  */
final class CuckooFilter(val numBuckets: Int, maxKicks: Int = 500) extends Serializable {
  require((numBuckets & (numBuckets - 1)) == 0, "numBuckets must be a power of two")

  private val SlotsPerBucket = 4
  private val table = new Array[Short](numBuckets * SlotsPerBucket)
  private var count = 0L
  private val rnd = new java.util.Random(42)

  def size: Long = count

  private def fingerprint(key: Long): Short = {
    val f = (Hashing.xxh64(longBytes(key), 7L) & 0xffffL).toShort
    if (f == 0) 1.toShort else f // 0 marks an empty slot
  }

  private def bucketOf(key: Long): Int =
    (Hashing.xxh64(longBytes(key), 13L) & (numBuckets - 1)).toInt

  private def altBucket(bucket: Int, fp: Short): Int =
    (bucket ^ (Hashing.xxh64(longBytes(fp.toLong), 13L) & (numBuckets - 1)).toInt) & (numBuckets - 1)

  private def longBytes(l: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    var i = 0
    var v = l
    while (i < 8) { b(i) = (v & 0xff).toByte; v >>>= 8; i += 1 }
    b
  }

  private def tryInsertAt(bucket: Int, fp: Short): Boolean = {
    var s = 0
    while (s < SlotsPerBucket) {
      val idx = bucket * SlotsPerBucket + s
      if (table(idx) == 0) { table(idx) = fp; return true }
      s += 1
    }
    false
  }

  /** Insert; false when the filter is too full (eviction chain exhausted).
    * A failed insert rolls the whole eviction chain back, so every
    * PREVIOUSLY-stored fingerprint stays queryable — dropping the last
    * displaced fingerprint (the naive cuckoo failure mode) would silently
    * re-admit an already-seen URL. A false return is the caller's signal to
    * rebuild at larger capacity.
    */
  def add(key: Long): Boolean = {
    val fp = fingerprint(key)
    val b1 = bucketOf(key)
    val b2 = altBucket(b1, fp)
    if (tryInsertAt(b1, fp) || tryInsertAt(b2, fp)) { count += 1; return true }
    // evict, recording the chain (slot index, displaced fp) for rollback
    var bucket = if (rnd.nextBoolean()) b1 else b2
    var f = fp
    var kicks = 0
    val chainIdx = new Array[Int](maxKicks)
    val chainFp = new Array[Short](maxKicks)
    while (kicks < maxKicks) {
      val slot = rnd.nextInt(SlotsPerBucket)
      val idx = bucket * SlotsPerBucket + slot
      val evicted = table(idx)
      table(idx) = f
      chainIdx(kicks) = idx
      chainFp(kicks) = evicted
      f = evicted
      bucket = altBucket(bucket, f)
      if (tryInsertAt(bucket, f)) { count += 1; return true }
      kicks += 1
    }
    // rollback: undo displacements newest-first, restoring the original table
    var i = kicks - 1
    while (i >= 0) {
      table(chainIdx(i)) = chainFp(i)
      i -= 1
    }
    false
  }

  def mightContain(key: Long): Boolean = {
    val fp = fingerprint(key)
    val b1 = bucketOf(key)
    if (containsAt(b1, fp)) return true
    containsAt(altBucket(b1, fp), fp)
  }

  private def containsAt(bucket: Int, fp: Short): Boolean = {
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(bucket * SlotsPerBucket + s) == fp) return true
      s += 1
    }
    false
  }

  /** Delete one copy of the key's fingerprint; false if absent. */
  def remove(key: Long): Boolean = {
    val fp = fingerprint(key)
    val b1 = bucketOf(key)
    if (removeAt(b1, fp) || removeAt(altBucket(b1, fp), fp)) { count -= 1; true }
    else false
  }

  private def removeAt(bucket: Int, fp: Short): Boolean = {
    var s = 0
    while (s < SlotsPerBucket) {
      val idx = bucket * SlotsPerBucket + s
      if (table(idx) == fp) { table(idx) = 0; return true }
      s += 1
    }
    false
  }

  def serialize(): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeInt(numBuckets)
    dos.writeLong(count)
    table.foreach(dos.writeShort(_))
    dos.flush()
    out.toByteArray
  }
}

object CuckooFilter {

  /** Capacity-sized constructor: ~95% load factor at 4 slots/bucket. */
  def forCapacity(n: Long): CuckooFilter = {
    var buckets = 1
    while (buckets.toLong * 4 * 95 / 100 < n) buckets <<= 1
    new CuckooFilter(buckets)
  }

  def deserialize(bytes: Array[Byte]): CuckooFilter = {
    val dis = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val numBuckets = dis.readInt()
    val count = dis.readLong()
    val f = new CuckooFilter(numBuckets)
    var i = 0
    while (i < f.table.length) { f.table(i) = dis.readShort(); i += 1 }
    f.count = count
    f
  }
}
