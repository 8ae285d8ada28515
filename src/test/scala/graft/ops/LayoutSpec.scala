package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout: Morton arithmetic, the quadrant-contiguity property
  * (the reason the north-star layout z-orders the frontier), and pruning
  * superiority over a row-major layout for two-dimension-bounded scans.
  */
class LayoutSpec extends SparkSpec {

  import spark.implicits._

  test("spreadBits / zValue match hand-computed Morton values") {
    val got = Seq(0L, 1L, 5L, 0x1fffffL).toDF("x")
      .select(Layout.spreadBits(col("x")).as("s"))
      .collect().map(_.getLong(0)).toSeq
    // 5 = 0b101 -> bits 0,2 -> positions 0,4 -> 17; 21 ones -> bit at every even position 0..40
    val all21 = (0 until 21).map(i => 1L << (2 * i)).sum
    assert(got == Seq(0L, 1L, 17L, all21))

    val z = Seq((1L, 1L), (2L, 1L), (3L, 0L), (0L, 3L)).toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // (1,1)->0b11=3; (2,1)->spread(2)=4 | spread(1)<<1=2 -> 6; (3,0)->5; (0,3)->10
    assert(z == Seq(3L, 6L, 5L, 10L))
  }

  test("power-of-two quadrant maps to a CONTIGUOUS z range: exactly 1/4 of file groups scanned") {
    // full 256x256 grid, 64 equal groups of 1024 rows
    val grid = spark.range(256L * 256)
      .select((col("id") / 256).cast("long").as("a"), pmod(col("id"), lit(256)).as("b"))
    val layout = Layout.zOrderLayout(grid, "a", "b", groups = 64)
    val stats = Layout.pruneStats(layout, "a", "b", 0, 127, 0, 127)
    val scanned = stats.filter(col("scanned")).count()
    assert(scanned == 16, s"quadrant must be exactly 16/64 groups, got $scanned")

    // row-major layout (order by a, then b): the same box touches HALF the
    // groups (every a-stripe in [0,127] spans all b) — z-order wins 2x here
    // and the gap widens with dimension count and selectivity
    val rowMajor = grid
      .withColumn("zvalue", col("a") * 256 + col("b"))
      .withColumn("file_group",
        ntile(64).over(org.apache.spark.sql.expressions.Window.orderBy(col("zvalue"))))
    val rmScanned = Layout.pruneStats(rowMajor, "a", "b", 0, 127, 0, 127)
      .filter(col("scanned")).count()
    assert(rmScanned == 32, s"row-major baseline should scan 32/64, got $rmScanned")
  }

  test("every row lands in exactly one group and groups are z-contiguous") {
    val grid = spark.range(4096)
      .select((col("id") / 64).cast("long").as("a"), pmod(col("id"), lit(64)).as("b"))
    val layout = Layout.zOrderLayout(grid, "a", "b", groups = 8).cache()
    assert(layout.count() == 4096)
    assert(layout.groupBy("file_group").count().count() == 8)
    // contiguity: max z of group g < min z of group g+1
    val ranges = layout.groupBy("file_group")
      .agg(min("zvalue").as("lo"), max("zvalue").as("hi"))
      .orderBy("file_group")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    ranges.sliding(2).foreach { case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2) }
    layout.unpersist()
  }
}
