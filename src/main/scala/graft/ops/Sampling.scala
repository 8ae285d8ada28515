package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixing: every draw is a pure
  * function of (id, salt) via the cross-engine md5 hash, so a sample is
  * reproducible run-to-run, survives resume, and can be recomputed by an
  * independent engine — none of which holds for `df.sample` (partition-RNG,
  * re-draws on retry).
  *
  * Scale shape: rate sampling is MAP-ONLY (a hash and a compare per row;
  * the per-stratum rate table rides a broadcast join). Quota sampling
  * shuffles by stratum for the per-stratum top-k — a hot stratum lands in
  * one AQE-splittable partition; at extreme skew, pre-filter with a rate
  * bound first (rate = k / est_count) and quota the survivors.
  */
object Sampling {

  /** Uniform draw in [0, 1e6) from (id, salt) — reproducible in DuckDB as
    * CAST(concat('0x', substr(md5(id || ':' || salt), 1, 15)) AS BIGINT) % 1000000.
    */
  def drawCol(idCol: Column, salt: String): Column =
    pmod(TextOps.md5Hash60(concat(idCol.cast("string"), lit(":" + salt))), lit(1000000L))

  /** Keep each row with probability `rate`, deterministically from the id. */
  def hashSample(df: DataFrame, idCol: String, rate: Double, salt: String = "s0"): DataFrame =
    df.filter(drawCol(col(idCol), salt) < (rate * 1e6).toLong)

  /** Per-stratum rate sampling: `rates` maps stratum value -> keep rate;
    * strata absent from the map use `defaultRate`. The rate table is tiny
    * and broadcast — the data side stays map-only.
    */
  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      rates: Map[String, Double],
      defaultRate: Double,
      salt: String = "s0"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rateDf = rates.toSeq.toDF(strataCol, "__rate")
    df.join(broadcast(rateDf), Seq(strataCol), "left")
      .withColumn("__rate", coalesce(col("__rate"), lit(defaultRate)))
      .filter(drawCol(col(idCol), salt) < (col("__rate") * 1e6).cast("long"))
      .drop("__rate")
  }

  /** Deterministic train/val/test split assignment: each row draws once
    * from (id, salt) and lands in the first split whose cumulative
    * parts-per-million bound exceeds the draw. A row's split is a pure
    * function of its id — stable under re-runs, resume, repartitioning,
    * and corpus growth (adding documents never moves an existing one
    * across the split boundary, unlike any count-based split).
    *
    * Scale shape: MAP-ONLY — one hash, one chained comparison per row;
    * the split table is a plan constant. `splits` ppm must total 1e6 so
    * every draw lands somewhere.
    */
  def splitAssign(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Long)],
      salt: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0L), "each split needs a positive ppm share")
    require(splits.map(_._2).sum == 1000000L, "split ppm shares must total 1e6")
    val draw = drawCol(col(idCol), salt)
    val bounds = splits.scanLeft(0L)(_ + _._2).tail
    val assign = splits.zip(bounds).dropRight(1).foldRight(lit(splits.last._1): Column) {
      case (((name, _), bound), acc) => when(draw < bound, lit(name)).otherwise(acc)
    }
    df.withColumn("split", assign)
  }

  /** Sequence packing for training (GPT-style concat-then-chunk): documents
    * concatenate in id order WITHIN EACH SHARD and cut every `seqLen`
    * tokens; each doc maps to its global token interval and the sequence
    * ids it spans. Output adds (start_token, end_token, first_seq,
    * last_seq) — `first_seq != last_seq` marks docs straddling a cut.
    *
    * Scale shape: one window cumsum PARTITIONED BY SHARD (never a global
    * window) — shards are the parallelism unit, exactly how a 100 TB corpus
    * is already laid out; packing is reproducible because (shard, id) order
    * is total.
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      seqLen: Int,
      shardCol: String): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
    df.withColumn("__end", sum(col(tokensCol)).over(w))
      .select(
        col(idCol), col(shardCol), col(tokensCol),
        (col("__end") - col(tokensCol)).as("start_token"),
        col("__end").as("end_token"),
        floor((col("__end") - col(tokensCol)) / seqLen).as("first_seq"),
        floor(greatest(col("__end") - 1, col("__end") - col(tokensCol)) / seqLen).as("last_seq"))
  }

  /** Per-stratum fixed quota: the `quota` rows of each stratum with the
    * smallest (draw, id) — a deterministic "random" top-k per stratum.
    */
  def stratifiedQuota(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      quota: Int,
      salt: String = "s0"): DataFrame = {
    // routed through the custom per-key top-k physical operator
    // (graft.plans.TopK): bounded heaps instead of sort+WindowExec, with
    // map-side pruning so at most strata×quota rows per partition reach the
    // shuffle — the window form ships every row. (draw, id) is a total
    // order, so the result is identical (the td_sample_quota oracle
    // compares against DuckDB's row_number form).
    val withDraw = df.withColumn("__draw", drawCol(col(idCol), salt))
    graft.plans.TopK.perKey(
        withDraw, Seq(strataCol), Seq("__draw" -> true, idCol -> true), quota, rankName = "__rank")
      .drop("__draw", "__rank")
  }

  /** Mixture re-balancing (the DoReMi / CCNet language-rebalance shape):
    * down-sample each stratum so the surviving corpus approaches a target
    * mixture under a total weight budget. `targetsPpm` gives each
    * stratum's target share in parts-per-million; a stratum's keep
    * threshold is `min(1e6, floor(ppm * budget / avail))` draws out of
    * 1e6 — an oversubscribed stratum (target share exceeds what exists)
    * caps at 1.0 and keeps everything, the standard "sample up to
    * availability" behavior. Strata absent from `targetsPpm` drop.
    *
    * All threshold arithmetic is INTEGER-EXACT and replayable by an
    * independent engine: `ppm * budget` runs in DECIMAL(38,0) (it exceeds
    * 64 bits at the 10^14-token design point) with the remainder
    * subtracted before the division, so the decimal divide is exact and
    * no rounding-mode or float semantics leak into the verdict. Output
    * rows carry (mix_draw, mix_thr) for auditability.
    *
    * Scale shape: one tiny per-stratum aggregate (rows = distinct
    * strata), a broadcast threshold join, and a map-only hash-draw filter
    * — the corpus is never shuffled.
    */
  def mixtureSample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      weightCol: String,
      targetsPpm: Map[String, Long],
      budget: Long,
      salt: String = "mix0"): DataFrame = {
    require(targetsPpm.values.forall(p => p >= 0L && p <= 1000000L),
      "targetsPpm values must be in [0, 1e6]")
    require(budget > 0L, "budget must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val targets = targetsPpm.toSeq.toDF(strataCol, "__ppm")
    val avail = df.groupBy(col(strataCol)).agg(sum(col(weightCol)).as("__avail"))
    val num = col("__ppm").cast("decimal(38,0)") * lit(budget).cast("decimal(38,0)")
    val den = col("__avail").cast("decimal(38,0)")
    val thrTable = avail.join(targets, Seq(strataCol))
      .withColumn("__thr", least(lit(1000000L), ((num - pmod(num, den)) / den).cast("long")))
      .select(col(strataCol), col("__thr"))
    df.join(broadcast(thrTable), Seq(strataCol))
      .withColumn("__draw", drawCol(col(idCol), salt))
      .filter(col("__draw") < col("__thr"))
      .withColumnRenamed("__draw", "mix_draw")
      .withColumnRenamed("__thr", "mix_thr")
  }
}
