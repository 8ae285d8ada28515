package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DriverConstSpec extends SparkSpec {

  test("driverLong evaluates to its value in select, filter and arithmetic") {
    import spark.implicits._
    val df = Seq(1L, 2L, 3L).toDF("x")
    val out = df
      .withColumn("c", DriverConst.driverLong(spark, 41L) + lit(1L))
      .withColumn("sum", col("x") + DriverConst.driverLong(spark, 100L))
      .filter(col("x") <= DriverConst.driverLong(spark, 2L))
      .orderBy("x")
      .collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(42L, 42L))
    assert(out.map(_.getLong(2)).toSeq == Seq(101L, 102L))
  }

  test("driverLong stays out of the plan as a literal (non-foldable, reference-injected)") {
    // range source (not a LocalRelation): ConvertToLocalRelation would
    // otherwise eagerly evaluate the whole projection in the optimizer,
    // which is fine semantically but hides the expression under test
    val df = spark.range(1).toDF("x").withColumn("c", DriverConst.driverLong(spark, 7L))
    // ConstantFolding must NOT inline it back into a Literal — that would
    // re-inline the value into the codegen source and defeat the
    // cross-batch cache stability the expression exists for.
    val optimized = df.queryExecution.optimizedPlan
    assert(optimized.expressions.exists(_.exists(_.isInstanceOf[DriverLong])), optimized.toString)
    assert(df.collect().map(_.getLong(1)).toSeq == Seq(7L))
  }

  test("two batches differing only in driver constants compute their own values") {
    import spark.implicits._
    // the frontier commit pattern: same plan shape, fresh counter bases
    def frame(base: Long) = Seq(1L, 2L).toDF("pos")
      .select((DriverConst.driverLong(spark, base) + col("pos")).as("seq"))
    assert(frame(1000L).collect().map(_.getLong(0)).sorted.toSeq == Seq(1001L, 1002L))
    assert(frame(5000L).collect().map(_.getLong(0)).sorted.toSeq == Seq(5001L, 5002L))
  }
}
