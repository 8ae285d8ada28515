package graft.canon

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Hash utilities, Spark-free.
  *
  * `shortHash` mirrors the reference `compute_short_hash`
  * (/root/reference/src/crawlee/_utils/crypto.py:7-18): sha256 hexdigest
  * prefix, default length 8.
  *
  * `xxh64` is the public XXH64 algorithm (Yann Collet, BSD), implemented
  * from the published spec with seed 42 so it agrees bit-for-bit with
  * Spark's built-in `xxhash64` on string inputs — letting driver-side pure
  * Scala (bloom sizing, bucket routing) and executor-side Catalyst code
  * share one key space (north rule: xxHash64 URL keys).
  */
object Hashing {

  def sha256Hex(data: Array[Byte]): String = {
    val md = MessageDigest.getInstance("SHA-256")
    md.digest(data).map("%02x".format(_)).mkString
  }

  def shortHash(data: Array[Byte], length: Int = 8): String =
    sha256Hex(data).substring(0, length)

  def shortHash(s: String): String = shortHash(s.getBytes(StandardCharsets.UTF_8))

  // ---- XXH64 ------------------------------------------------------------

  private val P1 = 0x9e3779b185ebca87L
  private val P2 = 0xc2b2ae3d27d4eb4fL
  private val P3 = 0x165667b19e3779f9L
  private val P4 = 0x85ebca77c2b2ae63L
  private val P5 = 0x27d4eb2f165667c5L

  /** Seed Spark uses for xxhash64 (org.apache.spark.sql.functions.xxhash64). */
  val SparkSeed = 42L

  def xxh64(s: String): Long = xxh64(s.getBytes(StandardCharsets.UTF_8), SparkSeed)

  def xxh64(input: Array[Byte], seed: Long): Long = {
    val len = input.length
    var hash: Long = 0L
    var i = 0
    if (len >= 32) {
      var v1 = seed + P1 + P2
      var v2 = seed + P2
      var v3 = seed
      var v4 = seed - P1
      while (i + 32 <= len) {
        v1 = round(v1, getLong(input, i))
        v2 = round(v2, getLong(input, i + 8))
        v3 = round(v3, getLong(input, i + 16))
        v4 = round(v4, getLong(input, i + 24))
        i += 32
      }
      hash = java.lang.Long.rotateLeft(v1, 1) + java.lang.Long.rotateLeft(v2, 7) +
        java.lang.Long.rotateLeft(v3, 12) + java.lang.Long.rotateLeft(v4, 18)
      hash = mergeRound(hash, v1)
      hash = mergeRound(hash, v2)
      hash = mergeRound(hash, v3)
      hash = mergeRound(hash, v4)
    } else {
      hash = seed + P5
    }
    hash += len
    while (i + 8 <= len) {
      hash ^= round(0L, getLong(input, i))
      hash = java.lang.Long.rotateLeft(hash, 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= len) {
      hash ^= (getInt(input, i) & 0xffffffffL) * P1
      hash = java.lang.Long.rotateLeft(hash, 23) * P2 + P3
      i += 4
    }
    while (i < len) {
      hash ^= (input(i) & 0xffL) * P5
      hash = java.lang.Long.rotateLeft(hash, 11) * P1
      i += 1
    }
    fmix(hash)
  }

  @inline private def round(acc: Long, v: Long): Long =
    java.lang.Long.rotateLeft(acc + v * P2, 31) * P1

  @inline private def mergeRound(acc: Long, v: Long): Long =
    (acc ^ round(0L, v)) * P1 + P4

  @inline private def fmix(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  @inline private def getLong(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) | ((b(i + 5) & 0xffL) << 40) |
      ((b(i + 6) & 0xffL) << 48) | ((b(i + 7) & 0xffL) << 56)

  @inline private def getInt(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
}
