package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) table layout — the north-star frontier layout:
  * the Iceberg frontier table is bucketed by host hash and Z-ORDERED on
  * (priority, discovery_time) so claim scans that bound BOTH dimensions
  * prune files on min/max statistics alone. No Iceberg in this sandbox, so
  * the operator materializes the layout DECISION — the z-value, the file
  * group each row lands in, and the per-group min/max statistics a reader
  * would prune with — as data an independent engine can replay exactly.
  *
  * The bit interleave is the classic mask-spread sequence (pure integer
  * shifts/ands — both engines compute it bit-for-bit); inputs are clamped
  * to 21 bits so two dimensions fit a 42-bit non-negative long.
  *
  * Scale shape: zValue is map-only column arithmetic; the production
  * write is `repartitionByRange(groups, zvalue)` + sortWithinPartitions —
  * one range exchange, files emerge z-clustered. The ntile here states
  * the same assignment deterministically for the oracle (a global window
  * — fixture/test scale only, the scaladoc'd range form is the cluster
  * path). Pruning stats are one groupBy over the laid-out rows.
  */
object Layout {

  val MaxZBits = 21

  /** Spread the low 21 bits of `c` so bit i lands at position 2i —
    * the standard 2-way Morton magic-mask sequence.
    */
  def spreadBits(c: Column): Column = {
    val x0 = c.bitwiseAND(lit((1L << MaxZBits) - 1))
    val x1 = (x0.bitwiseOR(shiftleft(x0, 16))).bitwiseAND(lit(0x0000ffff0000ffffL))
    val x2 = (x1.bitwiseOR(shiftleft(x1, 8))).bitwiseAND(lit(0x00ff00ff00ff00ffL))
    val x3 = (x2.bitwiseOR(shiftleft(x2, 4))).bitwiseAND(lit(0x0f0f0f0f0f0f0f0fL))
    val x4 = (x3.bitwiseOR(shiftleft(x3, 2))).bitwiseAND(lit(0x3333333333333333L))
    (x4.bitwiseOR(shiftleft(x4, 1))).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Morton interleave of two non-negative ≤21-bit dimensions. */
  def zValue(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  /** Assign each row its z-value and file group (1..groups, ntile over the
    * z order with (a, b) tiebreak so the assignment is total), and carry
    * the group's min/max statistics of both dimensions — what a reader's
    * file-pruning sees.
    * Output: rows of (…input cols…, zvalue, file_group) and a stats frame
    * via [[pruneStats]].
    */
  def zOrderLayout(df: DataFrame, aCol: String, bCol: String, groups: Int): DataFrame = {
    require(groups > 0)
    val z = zValue(col(aCol), col(bCol))
    val w = Window.orderBy(col("zvalue"), col(aCol), col(bCol))
    df.withColumn("zvalue", z)
      .withColumn("file_group", ntile(groups).over(w))
  }

  /** Per-file-group min/max statistics + whether a reader scanning the
    * query box [aLo, aHi] × [bLo, bHi] must read the group. The
    * z-locality claim IS this frame: tight boxes intersect few groups.
    * Output: (file_group, n_rows, min_a, max_a, min_b, max_b, scanned).
    */
  def pruneStats(
      layout: DataFrame, aCol: String, bCol: String,
      aLo: Long, aHi: Long, bLo: Long, bHi: Long): DataFrame =
    layout
      .groupBy(col("file_group"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col(aCol)).as("min_a"), max(col(aCol)).as("max_a"),
        min(col(bCol)).as("min_b"), max(col(bCol)).as("max_b"))
      .withColumn("scanned",
        col("max_a") >= aLo && col("min_a") <= aHi &&
          col("max_b") >= bLo && col("min_b") <= bHi)
}
