package graft.expr

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** nfc_normalize(text) as a native codegen'd expression (same pattern as
  * HtmlToTextExpr): Unicode NFC composition via java.text.Normalizer as one
  * static call per row inside whole-stage codegen — no Scala UDF. The fast
  * path skips the String round-trip entirely when the input is already in
  * NFC (Normalizer.isNormalized on the decoded chars), which is the
  * overwhelmingly common case for web text.
  */
object NfcNormalize {
  def normalizeUTF8(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalizeUTF8(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.NfcNormalize.normalizeUTF8($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextNormFunctions {

  import org.apache.spark.sql.functions.call_function

  def nfcNormalize(text: Column): Column = call_function("nfc_normalize", text)

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NfcNormalizeExpr(exprs(0)), "scala_udf")
  }
}
