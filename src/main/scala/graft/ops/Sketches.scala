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

  /** (key?, j, bucket) rows — depth per input row. The md5-derived hash
    * halves are PROJECTED BEFORE the explode and carried through the
    * generator as pass-through attributes, so each md5 runs once per input
    * row; computing the bucket inside a `transform` lambda would re-run
    * them per array element (the HOF-lambda rule, SCALE.md).
    */
  private def bucketRows(
      df: DataFrame, keyCol: String, depth: Int, width: Int, keepKey: Boolean): DataFrame = {
    val base = df.select(
      (if (keepKey) Seq(col(keyCol)) else Seq.empty[Column]) ++ Seq(
        h1(col(keyCol)).as("__a"),
        (pmod(h2(col(keyCol)), lit(1000003L)) * 2 + 1).as("__step")): _*)
    val exploded = base.select(
      (if (keepKey) Seq(col(keyCol)) else Seq.empty[Column]) ++ Seq(
        col("__a"), col("__step"),
        explode(sequence(lit(0), lit(depth - 1))).as("j")): _*)
    exploded.select(
      (if (keepKey) Seq(col(keyCol)) else Seq.empty[Column]) ++ Seq(
        col("j").cast("int").as("j"),
        pmod(col("__a") + col("j") * col("__step"), lit(width.toLong)).as("bucket")): _*)
  }

  /** Build the sketch: one (j, bucket, cnt) row per non-empty counter. */
  def countMinSketch(df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame =
    bucketRows(df, keyCol, depth, width, keepKey = false)
      .groupBy(col("j"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** CMS point estimates for `keys` (any DataFrame with `keyCol`):
    * min over the depth counters. The sketch side is tiny — broadcast.
    */
  def cmsEstimate(
      keys: DataFrame, sketch: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    val probes = bucketRows(keys, keyCol, depth, width, keepKey = true)
    probes
      .join(broadcast(sketch),
        probes("j") === sketch("j") && probes("bucket") === sketch("bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

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
