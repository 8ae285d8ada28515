package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, AttributeSet, Descending, Expression,
  GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Per-key top-k as a first-class Catalyst operator (the builder-prompt
  * option (c) path: custom LogicalPlan + SparkStrategy + SparkPlan,
  * registered through SparkSessionExtensions).
  *
  * The declarative form — `row_number() OVER (PARTITION BY key ORDER BY o)
  * <= k` — shuffles EVERY row to its key's reducer and sorts whole
  * partitions there (Spark ≥3.5's WindowGroupLimit prunes some rows but
  * keeps the sort-based WindowExec pipeline). This operator executes the
  * semantics directly with bounded heaps:
  *
  *   partial:  each input partition keeps at most k rows per key it sees
  *             (hash map of size-k heaps) — the shuffle then moves at most
  *             distinctKeys(partition)·k rows instead of everything;
  *   exchange: EnsureRequirements inserts the hash partitioning on the key
  *             (declared via requiredChildDistribution, like any
  *             aggregate);
  *   final:    the same bounded pass per key, then rows emit in rank order
  *             with a 1-based `rank` column appended.
  *
  * At the 10^10-frontier shape (per-host claim ranking, per-query ANN
  * re-rank, per-stratum quotas) the win is the shuffle: out-degree-heavy
  * hosts contribute k rows per map partition, not their whole fan-out.
  *
  * Memory contract: a partition's working set is distinctKeys·k retained
  * rows (same regime as hash aggregation before spill); ties at the heap
  * boundary resolve arbitrarily unless the ordering is total — callers
  * wanting deterministic output include a tiebreaker column, exactly as
  * they must with row_number.
  */
case class TopKPerKeyNode(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: LogicalPlan)
  extends UnaryNode {
  require(groupExprs.nonEmpty, "per-key top-k needs at least one key (use orderBy().limit() for global)")
  require(k > 0, s"k must be positive: $k")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Shared bounded-heap pass: consume `iter`, keep ≤ k rows per key. */
private[plans] object TopKHeaps {
  def prune(
      iter: Iterator[InternalRow],
      keyProj: UnsafeProjection,
      rowProj: UnsafeProjection,
      ord: Ordering[InternalRow],
      k: Int): scala.collection.mutable.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]] = {
    val heaps = scala.collection.mutable.HashMap.empty[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]
    // max-heap: head is the WORST retained row, evicted when a better shows up
    val cmp = ord.reverse
    while (iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row)
      heaps.get(key) match {
        case Some(q) =>
          if (q.size < k) q.offer(rowProj(row).copy())
          else if (ord.compare(row, q.peek()) < 0) { q.poll(); q.offer(rowProj(row).copy()) }
        case None =>
          // initial capacity stays small: k can legitimately be huge
          // ("no limit"), and the heap only ever holds what it sees
          val q = new java.util.PriorityQueue[UnsafeRow](
            math.min(k, 16), cmp.asInstanceOf[java.util.Comparator[UnsafeRow]])
          q.offer(rowProj(row).copy())
          heaps.put(key.copy(), q)
      }
    }
    heaps
  }
}

/** Map-side phase: no distribution requirement, emits the retained rows. */
case class TopKPerKeyPartialExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan)
  extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] = UnspecifiedDistribution :: Nil
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyPartialExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val (g, o, out, kk) = (groupExprs, order, child.output, k)
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(g, out)
      val rowProj = UnsafeProjection.create(out, out)
      val ord = GenerateOrdering.generate(o, out)
      TopKHeaps.prune(iter, keyProj, rowProj, ord, kk)
        .valuesIterator.flatMap(q => q.iterator().asInstanceOf[java.util.Iterator[InternalRow]].asScala)
    }, preservesPartitioning = true)
  }

  private implicit class JIter[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext; def next(): A = it.next()
    }
  }
}

/** Reduce-side phase: clustered on the key, emits rank order + rank col. */
case class TopKPerKeyFinalExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: SparkPlan)
  extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyFinalExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val (g, o, childOut, allOut, kk) = (groupExprs, order, child.output, output, k)
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(g, childOut)
      val rowProj = UnsafeProjection.create(childOut, childOut)
      val ord = GenerateOrdering.generate(o, childOut)
      val outProj = UnsafeProjection.create(allOut.map(_.dataType).toArray)
      val rankRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      TopKHeaps.prune(iter, keyProj, rowProj, ord, kk).valuesIterator.flatMap { q =>
        val arr = new Array[UnsafeRow](q.size())
        var i = arr.length - 1
        while (i >= 0) { arr(i) = q.poll(); i -= 1 } // heap pops worst-first
        arr.iterator.zipWithIndex.map { case (row, idx) =>
          rankRow.setInt(0, idx + 1)
          outProj(joined(row, rankRow))
        }
      }
    }, preservesPartitioning = true)
  }
}

/** OPT-IN optimizer rule: rewrite the declarative rank-filter pattern
  *
  *   Filter(rank <= k, Window(row_number() over (partition by p order by o)))
  *
  * into [[TopKPerKeyNode]], so existing window-form queries (and plain
  * SQL) get the heap execution without being rewritten by hand. The
  * original rank attribute is reused (same exprId), so downstream
  * references bind unchanged; Spark's own InsertWindowGroupLimit artifact
  * is stripped when it fired first. Conservative by construction: only a
  * single row_number window expression, a non-empty partition spec, and a
  * top-level `rank <= lit` / `rank < lit` (possibly AND-ed with other
  * predicates, which stay as a residual Filter). Ties at the heap
  * boundary resolve arbitrarily — exactly as the window form's outcome
  * depends on partition order for non-total orderings.
  *
  * Not installed by default: activate per session with
  * [[TopK.installRewrite]] or cluster-wide via GraftSparkExtensions.
  */
object RewriteRankFilterToTopK
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {

  import org.apache.spark.sql.catalyst.expressions.{
    Alias, And, IntegerLiteral, LessThan, LessThanOrEqual, WindowExpression, RowNumber}
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Window, WindowGroupLimit}

  /** (k, residual predicate) when `cond` bounds `rank` by a literal. */
  private def extractLimit(
      cond: Expression, rank: Attribute): Option[(Int, Option[Expression])] = cond match {
    case LessThanOrEqual(r: Attribute, IntegerLiteral(k)) if r.semanticEquals(rank) =>
      Some((k, None))
    case LessThan(r: Attribute, IntegerLiteral(k)) if r.semanticEquals(rank) =>
      Some((k - 1, None))
    case And(l, r) =>
      extractLimit(l, rank).map { case (k, rest) =>
        (k, Some(rest.map(And(_, r)).getOrElse(r)))
      }.orElse(extractLimit(r, rank).map { case (k, rest) =>
        (k, Some(rest.map(And(l, _)).getOrElse(l)))
      })
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
          partitionSpec, orderSpec, child0, _))
        if partitionSpec.nonEmpty && orderSpec.nonEmpty =>
      val child = child0 match {
        // Spark >=3.5 may have inserted its own partial group-limit below
        // the window; the heap operator subsumes it
        case WindowGroupLimit(_, _, _, _, inner) => inner
        case other => other
      }
      val rankAttr = alias.toAttribute.asInstanceOf[AttributeReference]
      extractLimit(cond, rankAttr) match {
        case Some((k, residual)) if k > 0 =>
          val topk = TopKPerKeyNode(partitionSpec, orderSpec, k, rankAttr, child)
          residual.map(Filter(_, topk)).getOrElse(topk)
        case _ => f
      }
  }
}

/** The planner strategy mapping the logical node to the two-phase plan. */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: TopKPerKeyNode =>
      TopKPerKeyFinalExec(n.groupExprs, n.order, n.k, n.rankAttr,
        TopKPerKeyPartialExec(n.groupExprs, n.order, n.k, planLater(n.child))) :: Nil
    case _ => Nil
  }
}

/** Cluster-config injection point: `--conf
  * spark.sql.extensions=graft.plans.GraftSparkExtensions`.
  */
class GraftSparkExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => GraftStrategy)
    ext.injectOptimizerRule(_ => RewriteRankFilterToTopK)
  }
}

object TopK {

  /** Idempotent runtime registration for sessions built without the
    * extensions config (the driver's Verify/Bench sessions).
    */
  def install(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(GraftStrategy))
      exp.extraStrategies = exp.extraStrategies :+ GraftStrategy
  }

  /** Opt-in window-form rewrite ([[RewriteRankFilterToTopK]]) for an
    * existing session. Separate from [[install]] on purpose: the strategy
    * only plans graft's own node, while the rewrite changes the plan of
    * EVERY matching row_number query on the session.
    */
  def installRewrite(spark: SparkSession): Unit = {
    install(spark)
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraOptimizations.contains(RewriteRankFilterToTopK))
      exp.extraOptimizations = exp.extraOptimizations :+ RewriteRankFilterToTopK
  }

  /** Remove the rewrite (tests; session hygiene). */
  def uninstallRewrite(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    exp.extraOptimizations = exp.extraOptimizations.filterNot(_ == RewriteRankFilterToTopK)
  }

  /** Top `k` rows per distinct value of `keys`, ordered by `orderBy`
    * (ascending or descending), with a 1-based `rank` column appended —
    * the hash-heap replacement for `row_number().over(Window.partitionBy
    * (keys).orderBy(...)) <= k`.
    */
  def perKey(
      df: DataFrame,
      keys: Seq[String],
      orderBy: Seq[(String, Boolean)], // (column, ascending)
      k: Int,
      rankName: String = "rank"): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute = analyzed.output
      .find(a => spark.sessionState.conf.resolver(a.name, name))
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val node = TopKPerKeyNode(
      keys.map(attr),
      orderBy.map { case (c, asc) => SortOrder(attr(c), if (asc) Ascending else Descending) },
      k,
      AttributeReference(rankName, IntegerType, nullable = false)(),
      analyzed)
    GraftSqlShim.ofRows(spark, node)
  }
}
