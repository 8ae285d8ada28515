package graft.expr

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
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

/** html_blocks(html): block segmentation with per-block boilerplate
  * features (graft.text.HtmlBlocks) — array of (idx, text, chars,
  * link_chars, words, stop_words) structs, one static call per row, so the
  * whole jusText-style classifier downstream is explode + Catalyst
  * arithmetic with zero Scala UDFs.
  */
case class HtmlBlocksExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = HtmlBlocksExpr.Schema
  override def prettyName: String = "html_blocks"
  override protected def nullSafeEval(input: Any): Any =
    graft.text.HtmlBlocks.blocksArrayData(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.HtmlBlocks.blocksArrayData($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HtmlBlocksExpr {
  val Schema: ArrayType = ArrayType(StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("chars", IntegerType, nullable = false),
    StructField("link_chars", IntegerType, nullable = false),
    StructField("words", IntegerType, nullable = false),
    StructField("stop_words", IntegerType, nullable = false))), containsNull = false)
}

/** html_anchors(html): (idx, href, text) per `<a href>` in document order —
  * the anchor-text link-graph signal (graft.text.Anchors), one static call
  * per row.
  */
case class HtmlAnchorsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = HtmlAnchorsExpr.Schema
  override def prettyName: String = "html_anchors"
  override protected def nullSafeEval(input: Any): Any =
    graft.text.Anchors.anchorsArrayData(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.Anchors.anchorsArrayData($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HtmlAnchorsExpr {
  val Schema: ArrayType = ArrayType(StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("href", StringType, nullable = false),
    StructField("text", StringType, nullable = false))), containsNull = false)
}

/** html_meta(html): (idx, kind, key, value) per <meta>/<link rel>/<title> —
  * OpenGraph, canonical, robots directives (graft.text.PageMeta).
  */
case class HtmlMetaExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = HtmlMetaExpr.Schema
  override def prettyName: String = "html_meta"
  override protected def nullSafeEval(input: Any): Any =
    graft.text.PageMeta.metaArrayData(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.PageMeta.metaArrayData($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HtmlMetaExpr {
  val Schema: ArrayType = ArrayType(StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("value", StringType, nullable = false))), containsNull = false)
}

/** html_image_refs(html): (idx, img_idx, url, descriptor, alt) per <img>
  * src/srcset candidate and <picture><source srcset> (graft.text.ImageRefs)
  * — the image-frontier seed extraction of an image crawl.
  */
case class HtmlImageRefsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = HtmlImageRefsExpr.Schema
  override def prettyName: String = "html_image_refs"
  override protected def nullSafeEval(input: Any): Any =
    graft.text.ImageRefs.imageRefsArrayData(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.ImageRefs.imageRefsArrayData($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HtmlImageRefsExpr {
  val Schema: ArrayType = ArrayType(StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("img_idx", IntegerType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("descriptor", StringType, nullable = false),
    StructField("alt", StringType, nullable = false))), containsNull = false)
}

object HtmlFunctions {

  import org.apache.spark.sql.functions.call_function

  def htmlToText(html: Column): Column = call_function("html_to_text", html)

  def htmlBlocks(html: Column): Column = call_function("html_blocks", html)

  def htmlAnchors(html: Column): Column = call_function("html_anchors", html)

  def htmlMeta(html: Column): Column = call_function("html_meta", html)

  def htmlImageRefs(html: Column): Column = call_function("html_image_refs", html)

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "html_to_text", exprs => HtmlToTextExpr(exprs(0)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "html_blocks", exprs => HtmlBlocksExpr(exprs(0)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "html_anchors", exprs => HtmlAnchorsExpr(exprs(0)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "html_meta", exprs => HtmlMetaExpr(exprs(0)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "html_image_refs", exprs => HtmlImageRefsExpr(exprs(0)), "scala_udf")
  }
}
