package graft.expr

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.{Column, SparkSession}

/** Native vector arithmetic for the embedding operators (SURVEY §2.11 /
  * builder-prompt similarity search).
  *
  * `aggregate(zip_with(a, b, *), 0.0, +)` is semantically right but walks
  * two generic ArrayData per element through interpreted higher-order
  * lambdas — the near-dup pair stage spends most of its time there. A
  * BinaryExpression with `doGenCode` emitting one static call keeps the
  * whole pair pipeline inside whole-stage codegen with a primitive loop.
  * Iteration order matches the sequential fold, so results are
  * bit-identical to the HOF form (the DuckDB oracles stay green).
  */
object VectorExprs {

  /** Tight primitive loop; null on null/emptiness mismatch handled by caller. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

/** vec_dot(a, b) — dot product over ARRAY<DOUBLE> columns. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorExprs.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.VectorExprs.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorFunctions {

  import org.apache.spark.sql.functions.call_function

  def vecDot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** Register SQL-callable names (idempotent, once per session). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs(0), exprs(1)), "scala_udf")
  }
}
