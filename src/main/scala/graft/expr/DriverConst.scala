package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, LeafExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.{Column, SparkSession}

/** driver_long(v) — a driver-side constant that reaches generated code
  * through the references array instead of an inlined literal.
  *
  * The frontier's per-batch plans are structurally identical but embed
  * fresh ordering-counter / batch-id / clock values; as plain literals
  * those are inlined into the whole-stage-codegen SOURCE, so every
  * micro-batch misses the codegen cache and re-compiles the same classes
  * (measured on the 44k-page crawl: 1074 janino compilations, 16.1 s of a
  * 74 s run). With the value as a reference object the generated source is
  * byte-identical across batches and the cache hits.
  *
  * Deliberately non-foldable — ConstantFolding would turn it straight back
  * into an inline literal. The trade: predicates on it don't constant-fold
  * or push into file-source scans, so it is only used where the input is
  * the cached state chain or a checkpointed batch frame, never against a
  * parquet scan that needs PushedFilters.
  */
case class DriverLong(value: Long) extends LeafExpression {
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def foldable: Boolean = false
  override def eval(input: InternalRow): Any = value
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("driverLong", java.lang.Long.valueOf(value), "java.lang.Long")
    ExprCode.forNonNullValue(JavaCode.expression(s"$ref.longValue()", dataType))
  }
}

object DriverConst {

  import org.apache.spark.sql.functions.{call_function, lit}

  private def longOf(e: Expression): Long = {
    require(e.foldable, "driver_long argument must be a literal")
    e.eval() match {
      case l: Long => l
      case i: Int => i.toLong
      case other => sys.error(s"driver_long: unsupported literal $other")
    }
  }

  /** Register SQL-callable names (idempotent, once per session; the
    * existence check keeps the hot path from re-registering — and from
    * emitting a "replaced a previously registered function" WARN — on
    * every call).
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("driver_long")
    if (reg.lookupFunctionBuilder(id).isEmpty)
      reg.createOrReplaceTempFunction(
        "driver_long", exprs => DriverLong(longOf(exprs(0))), "scala_udf")
  }

  /** A Long column whose value stays OUT of the codegen source. */
  def driverLong(spark: SparkSession, v: Long): Column = {
    register(spark)
    call_function("driver_long", lit(v))
  }
}
