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

  import org.apache.spark.sql.catalyst.util.GenericArrayData

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

  /** All `tables = planes/bpt` hyperplane-sign signatures of one vector in a
    * single pass (bit p of table p/bpt = sign(dot(v, plane_p))) — replaces
    * the boxed Seq[Double] UDF on the LSH signature stage (VERDICT r3
    * "wrong" #1). Bit-identical to the UDF it replaces.
    */
  def signs(v: ArrayData, planes: Array[Array[Double]], bpt: Int): ArrayData = {
    val nPlanes = planes.length
    val sigs = new Array[Long](nPlanes / bpt)
    var p = 0
    while (p < nPlanes) {
      val plane = planes(p)
      val n = math.min(v.numElements(), plane.length)
      var d = 0.0
      var i = 0
      while (i < n) { d += v.getDouble(i) * plane(i); i += 1 }
      if (d >= 0) sigs(p / bpt) |= 1L << (p % bpt)
      p += 1
    }
    new GenericArrayData(sigs)
  }

  /** argmax_c dot(v, cents[c]), ties to the LOWEST index — matches
    * `ORDER BY dot DESC, c ASC LIMIT 1` (the IVF assignment rule).
    */
  def argmaxDot(v: ArrayData, cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val n = math.min(v.numElements(), cent.length)
      var d = 0.0
      var i = 0
      while (i < n) { d += v.getDouble(i) * cent(i); i += 1 }
      if (d > bestDot) { bestDot = d; best = c }
      c += 1
    }
    best
  }

  /** Top-`nProbe` centroid indices by dot (desc), index asc on ties — the
    * IVF probe list. Selection sort over k centroids (k is tiny).
    */
  def topProbes(v: ArrayData, cents: Array[Array[Double]], nProbe: Int): ArrayData = {
    val k = cents.length
    val dots = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = cents(c)
      val n = math.min(v.numElements(), cent.length)
      var d = 0.0
      var i = 0
      while (i < n) { d += v.getDouble(i) * cent(i); i += 1 }
      dots(c) = d
      c += 1
    }
    val m = math.min(nProbe, k)
    val out = new Array[Int](m)
    val used = new Array[Boolean](k)
    var r = 0
    while (r < m) {
      var best = -1
      var bestDot = Double.NegativeInfinity
      var j = 0
      while (j < k) {
        if (!used(j) && dots(j) > bestDot) { best = j; bestDot = dots(j) }
        j += 1
      }
      used(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
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

/** vec_signs(vec) — all LSH table signatures in one codegen'd pass. The
  * plane matrix is a constructor reference (folded out of the per-row
  * path), injected into generated code via addReferenceObj.
  */
case class VecSigns(child: Expression, planes: Array[Array[Double]], bitsPerTable: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    VectorExprs.signs(v.asInstanceOf[ArrayData], planes, bitsPerTable)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.expr.VectorExprs.signs($c, $ref, $bitsPerTable)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** argmax_dot(vec) — nearest-centroid index (IVF assignment). */
case class ArgmaxDot(child: Expression, cents: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override protected def nullSafeEval(v: Any): Any =
    VectorExprs.argmaxDot(v.asInstanceOf[ArrayData], cents)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cents", cents, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.expr.VectorExprs.argmaxDot($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** top_probes(vec) — nProbe nearest centroid indices (IVF probe list). */
case class TopProbes(child: Expression, cents: Array[Array[Double]], nProbe: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    VectorExprs.topProbes(v.asInstanceOf[ArrayData], cents, nProbe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cents", cents, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.expr.VectorExprs.topProbes($c, $ref, $nProbe)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {

  import org.apache.spark.sql.functions.{call_function, lit, typedLit}

  def vecDot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** The matrix rides as a foldable array literal through the function
    * registry and is extracted ONCE at plan-build time into the
    * expression's constructor — per-row code sees only the double[][].
    */
  def vecSigns(vec: Column, planes: Array[Array[Double]], bitsPerTable: Int): Column =
    call_function("vec_signs", vec, matrixLit(planes), lit(bitsPerTable))

  def argmaxDot(vec: Column, cents: Array[Array[Double]]): Column =
    call_function("argmax_dot", vec, matrixLit(cents))

  def topProbes(vec: Column, cents: Array[Array[Double]], nProbe: Int): Column =
    call_function("top_probes", vec, matrixLit(cents), lit(nProbe))

  private def matrixLit(m: Array[Array[Double]]): Column =
    typedLit[Seq[Seq[Double]]](m.map(_.toSeq).toSeq)

  private def matrixOf(e: Expression): Array[Array[Double]] = {
    require(e.foldable, "matrix argument must be a literal")
    val arr = e.eval().asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements())(i => arr.getArray(i).toDoubleArray())
  }

  private def intOf(e: Expression): Int = {
    require(e.foldable, "scalar argument must be a literal")
    e.eval().asInstanceOf[Int]
  }

  /** Register SQL-callable names (idempotent, once per session). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_signs", exprs => VecSigns(exprs(0), matrixOf(exprs(1)), intOf(exprs(2))), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "argmax_dot", exprs => ArgmaxDot(exprs(0), matrixOf(exprs(1))), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "top_probes", exprs => TopProbes(exprs(0), matrixOf(exprs(1)), intOf(exprs(2))), "scala_udf")
  }
}
