package graft.expr

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.{Column, SparkSession}

/** html_to_text(html) as a native codegen'd expression: the extraction is a
  * pure string→string function (graft.text.HtmlToText), so it rides inside
  * whole-stage codegen as one static call per row — no Scala UDF
  * serialization, no Row boxing (same pattern as VecDot).
  * Reference semantics: crawlers/_parsel/_utils.py:16-76.
  */
case class HtmlToTextExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    graft.text.HtmlToText.convertUTF8(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.HtmlToText.convertUTF8($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HtmlFunctions {

  import org.apache.spark.sql.functions.call_function

  def htmlToText(html: Column): Column = call_function("html_to_text", html)

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "html_to_text", exprs => HtmlToTextExpr(exprs(0)), "scala_udf")
  }
}
