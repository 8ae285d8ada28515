package graft.expr

import graft.canon.{EnqueueStrategy, UniqueKey, UrlCanon}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expressions for URL canonicalization (SURVEY.md §2.2/§2.11).
  *
  * Implemented as native expressions (with `doGenCode` emitting a static
  * call) rather than Scala UDFs so they stay inside whole-stage codegen —
  * no closure serialization, no Row boxing in the hot enqueue path.
  */
object UrlExprs {

  /** Static entry points the generated code calls. Must be public. */
  def normalize(url: UTF8String, keepFragment: Boolean): UTF8String =
    if (url == null) null
    else UTF8String.fromString(UrlCanon.normalizeUrl(url.toString, keepFragment))

  def resolveRel(base: UTF8String, rel: UTF8String): UTF8String = {
    if (base == null || rel == null) return null
    val r = UrlCanon.resolve(base.toString, rel.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  def strategyOk(target: UTF8String, strategy: UTF8String, origin: UTF8String): Boolean =
    target != null && origin != null &&
      UrlCanon.isSupportedScheme(target.toString) &&
      EnqueueStrategy.matches(target.toString, strategy.toString, origin.toString)

  def uniqueKey(url: UTF8String): UTF8String =
    if (url == null) null else UTF8String.fromString(UniqueKey.compute(url.toString))

  def hostOf(url: UTF8String): UTF8String =
    if (url == null) null
    else UTF8String.fromString(UrlCanon.normalizeHost(UrlCanon.parse(url.toString).host))

  def originOf(url: UTF8String): UTF8String =
    if (url == null) null else UTF8String.fromString(UrlCanon.parse(url.toString).origin)

  def registrableDomain(host: UTF8String): UTF8String =
    if (host == null) null
    else UTF8String.fromString(graft.canon.PublicSuffix.default.registrableDomain(host.toString))
}

/** normalize_url(url) — reference semantics of _utils/requests.py:16-47. */
case class NormalizeUrl(child: Expression, keepFragment: Boolean = false)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    UrlExprs.normalize(input.asInstanceOf[UTF8String], keepFragment)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.UrlExprs.normalize($c, $keepFragment)")
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** resolve(base, rel) — RFC 3986 reference resolution; null when not absolutizable. */
case class ResolveUrl(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val b = left.eval(input)
    val r = right.eval(input)
    if (b == null || r == null) null
    else UrlExprs.resolveRel(b.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val code =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.isNull} = true;
        UTF8String ${ev.value} = null;
        if (!${leftGen.isNull} && !${rightGen.isNull}) {
          ${ev.value} = graft.expr.UrlExprs.resolveRel(${leftGen.value}, ${rightGen.value});
          ${ev.isNull} = (${ev.value} == null);
        }
      """
    ev.copy(code = code)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** strategy_allows(target, strategy, origin) — scheme gate + enqueue strategy. */
case class StrategyAllows(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val t = first.eval(input)
    val s = second.eval(input)
    val o = third.eval(input)
    if (t == null || s == null || o == null) false
    else
      UrlExprs.strategyOk(
        t.asInstanceOf[UTF8String],
        s.asInstanceOf[UTF8String],
        o.asInstanceOf[UTF8String]
      )
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tg = first.genCode(ctx)
    val sg = second.genCode(ctx)
    val og = third.genCode(ctx)
    val code =
      code"""
        ${tg.code}
        ${sg.code}
        ${og.code}
        boolean ${ev.isNull} = false;
        boolean ${ev.value} = false;
        if (!${tg.isNull} && !${sg.isNull} && !${og.isNull}) {
          ${ev.value} = graft.expr.UrlExprs.strategyOk(${tg.value}, ${sg.value}, ${og.value});
        }
      """
    ev.copy(code = code)
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** host_of(url) — normalized host of a URL (null-safe). */
case class HostOf(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    UrlExprs.hostOf(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.UrlExprs.hostOf($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** registrable_domain_of(host) — PSL eTLD+1 (null-safe). */
case class RegistrableDomainOf(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    UrlExprs.registrableDomain(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.UrlExprs.registrableDomain($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** Column-level API + SQL registration.
  *
  * Spark 4 keeps `Column(expression)` private, so the public path is the
  * FunctionRegistry + `call_function`: `register(spark)` installs the
  * expressions once per session and the Column helpers below reference them
  * by name (resolved at analysis time, still native expressions — no UDF).
  */
object UrlFunctions {

  import org.apache.spark.sql.functions.call_function

  def normalizeUrl(url: Column): Column = call_function("normalize_url", url)
  def normalizeUrlKeepFragment(url: Column): Column = call_function("normalize_url_keep_fragment", url)
  def resolveUrl(base: Column, rel: Column): Column = call_function("resolve_url", base, rel)
  def strategyAllows(target: Column, strategy: Column, origin: Column): Column =
    call_function("strategy_allows", target, strategy, origin)

  def uniqueKeyCol(url: Column): Column = normalizeUrl(url) // default unique key = normalized URL

  // native expressions (codegen'd — hostOf runs in the enqueue hot path)
  def hostOf(url: Column): Column = call_function("host_of", url)
  def registrableDomainOf(host: Column): Column = call_function("registrable_domain_of", host)

  /** Register SQL-callable names (idempotent). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "normalize_url", exprs => NormalizeUrl(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction(
      "normalize_url_keep_fragment", exprs => NormalizeUrl(exprs.head, keepFragment = true), "scala_udf")
    registry.createOrReplaceTempFunction(
      "resolve_url", exprs => ResolveUrl(exprs(0), exprs(1)), "scala_udf")
    registry.createOrReplaceTempFunction(
      "strategy_allows", exprs => StrategyAllows(exprs(0), exprs(1), exprs(2)), "scala_udf")
    registry.createOrReplaceTempFunction(
      "host_of", exprs => HostOf(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction(
      "registrable_domain_of", exprs => RegistrableDomainOf(exprs.head), "scala_udf")
  }
}
