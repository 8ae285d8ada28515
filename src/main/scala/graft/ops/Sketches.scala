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

  // ==== HyperLogLog distinct-count sketch (Flajolet et al. 2007) ===========
  //
  // The 10^10-frontier "how many distinct URLs have we seen" question that
  // an exact count(distinct) answers with a full shuffle of every key: the
  // HLL register table is m = 2^b integers, built with ONE map-combinable
  // max-aggregation (each partition collapses to ≤ m rows before the
  // exchange), and sketches of disjoint inputs merge by element-wise max —
  // the shape that survives any scale.
  //
  // Determinism: the hash is the same 60-bit md5 half the CMS uses; the
  // register index is the low b bits, the rank is the leading-zero count of
  // the remaining 60-b bits + 1, computed EXACTLY as (60-b+1) - len(bin(w))
  // (bin() prints without leading zeros in both Spark and DuckDB, so an
  // independent engine replays every register bit-for-bit — no
  // floating-point until the final estimate, whose one division is
  // correctly rounded).

  /** Number of register bits `b` must satisfy 0 < b < 32; m = 2^b. */
  def hllRegisters(df: DataFrame, keyCol: String, b: Int): DataFrame = {
    require(b > 0 && b < 32, s"b out of range: $b")
    val m = 1L << b
    val h = h1(col(keyCol))
    // h is 60 bits (15 hex chars), non-negative: arithmetic shift == logical
    val w = shiftright(h, b)
    val rank = when(w === 0, lit(60 - b + 1))
      .otherwise(lit(60 - b + 1) - length(bin(w)))
    df.select(h.bitwiseAND(lit(m - 1)).cast("int").as("bucket"), rank.cast("int").as("r"))
      .groupBy(col("bucket"))
      .agg(max(col("r")).as("r"))
  }

  /** Merge two register tables (sketches of disjoint or overlapping inputs):
    * element-wise max. Associative/commutative/idempotent, so shards built
    * independently per partition/day/table union into one corpus sketch.
    */
  def hllMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("bucket")).agg(max(col("r")).as("r"))

  /** The standard alpha_m bias constant. */
  def hllAlpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  // ==== Dyadic histogram quantile sketch ====================================
  //
  // Latency / payload-size percentiles over 10^10 rows without a global
  // sort: bucket every positive value into its dyadic level (level L holds
  // [2^(L-1), 2^L − 1]) and keep one count per level — ≤ 64 rows total, one
  // map-combinable aggregation, mergeable by addition. Quantiles read off
  // the cumulative counts with ≤ 2× value error (one dyadic level), which
  // is the right fidelity for p95/p99 dashboards and throttling decisions.
  // The level is len(bin(x)) = ⌊log2 x⌋ + 1 — integer/string ops only, no
  // libm, so an independent engine replays every bucket exactly.

  /** (level, cnt) rows; level 0 collects non-positive values. */
  def dyadicHistogram(df: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("long")
    df.select(when(v <= 0, lit(0)).otherwise(length(bin(v))).cast("int").as("level"))
      .groupBy(col("level"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Quantile bounds from a dyadic histogram: for each q (an exact integer
    * percent — no double×count rounding ambiguity), the first level whose
    * cumulative count reaches ⌈q·N⌉, with its value range.
    *
    * ONE plan over ONE reference to `hist`: cumulative and total both ride
    * windows on the ≤64-row histogram, percents fan out by exploding a
    * literal array, and the per-quantile pick is a min-struct aggregate —
    * a per-percent filter-branch union would re-run the corpus scan behind
    * `hist` once per quantile.
    *
    * Output: (q_pct, level, lo, hi) per requested quantile.
    */
  def dyadicQuantiles(hist: DataFrame, percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p > 0 && p <= 100))
    import org.apache.spark.sql.expressions.Window
    val byLevel = Window.orderBy(col("level"))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(
        byLevel.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("cnt")).over(
        byLevel.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    cum
      .select(
        col("level"), col("cum"), col("n"),
        explode(lit(percents.toArray)).as("q_pct"))
      // threshold = ceil(q * N / 100), exact integer arithmetic
      .filter(col("cum") >= expr("cast((n * q_pct + 99) div 100 as bigint)"))
      .groupBy(col("q_pct"))
      .agg(min(col("level")).as("level"))
      .select(
        col("q_pct"), col("level"),
        when(col("level") === 0, lit(Long.MinValue))
          .otherwise(expr("cast(shiftleft(1L, level - 1) as bigint)")).as("lo"),
        when(col("level") === 0, lit(0L))
          .otherwise(expr("cast(shiftleft(1L, level) as bigint)") - 1).as("hi"))
  }

  /** Cardinality estimate from a register table: raw harmonic-mean estimate
    * with the standard small-range linear-counting correction. The harmonic
    * sum Z = Σ 2^-r is accumulated as an INTEGER in units of 2^-61
    * (2^(61-r) per register, decimal sum — exact and order-independent,
    * where a double sum would round differently per aggregation order), so
    * the only floating-point steps are one correctly-rounded division and,
    * on the small-range branch only, one ln.
    * Output: one row (nonzero, zeros, sum_r, est).
    */
  def hllEstimate(registers: DataFrame, b: Int): DataFrame = {
    require(b > 0 && b < 32, s"b out of range: $b")
    val m = 1 << b
    val numer = hllAlpha(m) * m * m * math.pow(2.0, 61) // exact: alpha * m^2 * 2^61
    registers
      .agg(
        count(lit(1)).cast("int").as("nonzero"),
        sum(col("r")).cast("long").as("sum_r"),
        sum(expr("cast(shiftleft(1L, cast(61 - r as int)) as decimal(38,0))")).as("__z_hit"))
      .select(
        col("nonzero"),
        (lit(m) - col("nonzero")).as("zeros"),
        col("sum_r"),
        (col("__z_hit") + (lit(m) - col("nonzero")).cast("decimal(38,0)") *
          lit(BigDecimal(2).pow(61))).cast("double").as("__z"))
      .select(
        col("nonzero"), col("zeros"), col("sum_r"),
        round(
          when(lit(numer) / col("__z") <= lit(2.5 * m) && col("zeros") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("zeros")))
            .otherwise(lit(numer) / col("__z")),
          4).as("est"))
  }
}
