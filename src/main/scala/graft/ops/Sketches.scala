package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-memory frequency sketching (Cormode & Muthukrishnan 2005,
  * count-min sketch): the sketch is a depth×width counter table — a few KB
  * regardless of input size — built with one map-combinable aggregation.
  * Estimates overcount (never undercount) by at most εN with probability
  * 1−δ for width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉.
  *
  * Hashing is Kirsch-Mitzenmacher double hashing off ONE md5 per key
  * (same trick as the MinHash signatures): row j's bucket is
  * (h1 + j*(2*(h2 % 1000003)+1)) % width, with h1/h2 the two 60-bit md5
  * halves — every term bounded so the arithmetic never overflows a long
  * and DuckDB can replay it bit-for-bit.
  *
  * Scale shape: the sketch build is explode(depth) + groupBy(j, bucket) —
  * map-side partial aggregation collapses each partition to ≤ depth×width
  * rows before the shuffle, so the exchange moves sketches, not data.
  * Estimation joins candidates against the tiny sketch (broadcast).
  */
object Sketches {

  private def h1(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  private def h2(key: Column): Column =
    conv(substring(md5(key.cast("string")), 17, 15), 16, 10).cast("long")

  /** (j, bucket) pairs for a key — depth rows. */
  def cmsBuckets(key: Column, depth: Int, width: Int): Column = {
    val a = h1(key)
    val step = pmod(h2(key), lit(1000003L)) * 2 + 1
    transform(sequence(lit(0), lit(depth - 1)),
      j => struct(j.cast("int").as("j"), pmod(a + j * step, lit(width.toLong)).as("bucket")))
  }

  /** Build the sketch: one (j, bucket, cnt) row per non-empty counter. */
  def countMinSketch(df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame =
    df.select(explode(cmsBuckets(col(keyCol), depth, width)).as("__b"))
      .groupBy(col("__b.j").as("j"), col("__b.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** CMS point estimates for `keys` (any DataFrame with `keyCol`):
    * min over the depth counters. The sketch side is tiny — broadcast.
    */
  def cmsEstimate(
      keys: DataFrame, sketch: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame =
    keys.select(col(keyCol), explode(cmsBuckets(col(keyCol), depth, width)).as("__b"))
      .join(broadcast(sketch),
        col("__b.j") === sketch("j") && col("__b.bucket") === sketch("bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** Top-k keys by CMS estimate (ties: key ascending). Candidates here are
    * the distinct keys of `df`; at true scale feed a sampled / pre-filtered
    * candidate set instead — the sketch answers any candidate in O(depth).
    */
  def cmsHeavyHitters(
      df: DataFrame, keyCol: String, depth: Int, width: Int, k: Int): DataFrame = {
    val sketch = countMinSketch(df, keyCol, depth, width)
    cmsEstimate(df.select(keyCol).distinct(), sketch, keyCol, depth, width)
      .orderBy(col("est").desc, col(keyCol).asc)
      .limit(k)
  }
}
