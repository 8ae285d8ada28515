package graft.canon

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Proves driver-side pure-Scala hashes agree with Spark's codegen'd
  * builtins, so bloom sizing / bucket routing computed on the driver land in
  * the same key space as executor-side Catalyst expressions.
  */
class SparkParitySpec extends SparkSpec {

  test("pure-Scala xxh64 == Spark xxhash64 on strings") {
    import spark.implicits._
    val samples = Seq(
      "", "a", "abc", "https://example.com", "https://example.com/?a=1&b=2",
      "POST|e3b0c442|9724c1e2|https://crawlee.dev",
      "x" * 7, "y" * 8, "z" * 31, "w" * 32, "v" * 100,
      "héllo wörld ünïcode ✓"
    )
    val sparkHashes = samples.toDF("s").select(xxhash64(col("s"))).as[Long].collect()
    val ours = samples.map(Hashing.xxh64)
    assert(sparkHashes.toSeq == ours)
  }

  test("pure-Scala sha256 short hash == Spark sha2 prefix") {
    import spark.implicits._
    val samples = Seq("", "abc", """{"key": "value"}""")
    val sparkHashes =
      samples.toDF("s").select(substring(sha2(col("s").cast("binary"), 256), 1, 8)).as[String].collect()
    assert(sparkHashes.toSeq == samples.map(s => Hashing.shortHash(s.getBytes("UTF-8"))))
  }
}
