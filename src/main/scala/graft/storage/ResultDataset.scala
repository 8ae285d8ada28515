package graft.storage

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Append-only result Dataset with the full get_data relational surface
  * (SURVEY.md §2.7, D1-D11) — the reference's local clients implement only
  * a subset and warn on the rest (_memory/_dataset_client.py:152-169);
  * Spark gives the whole surface natively, so we implement it all:
  *
  *   D1 push (append-only, immutable after append), D2 offset/limit,
  *   D3 desc, D4 skip_empty, D5 fields projection, D6 omit, D7 unwind,
  *   D8 flatten, D9 skip_hidden/clean, D10 CSV export (first-item columns
  *   or union-of-all-keys), D11 JSON export.
  *
  * Rows carry a monotone `__seq` (insertion order — the reference's
  * item_id ordering, _sql/_dataset_client.py:276-285).
  */
final class ResultDataset(spark: SparkSession, root: String) {

  /** C6 storage id — deterministic from identity (see `Ids`). */
  val id: String = graft.canon.Ids.deterministicObjectId(s"ds|$root")

  private val dir = s"$root/data"
  java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
  private var appendCount: Long = currentDf().count()
  // resume: next push id = max existing + 1
  private var pushCount: Long = {
    val df = currentDf()
    if (df.columns.contains("__push"))
      df.agg(max(col("__push"))).head() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0) + 1
      }
    else 0L
  }

  /** Schema evolves across pushes (reference datasets are schemaless JSON
    * lines — a later push may introduce or omit fields). Without
    * `mergeSchema` the parquet reader takes ONE file footer's schema and
    * silently drops columns absent from it; merging unions all footers.
    * Footer-merge cost is per-FILE metadata, not data — fine even at
    * 10^6 files — and only paid on read, never on the append-only push.
    */
  private def currentDf(): DataFrame =
    try spark.read.option("mergeSchema", "true").parquet(dir)
    catch { case _: Exception => spark.emptyDataFrame }

  /** D1: append; items are immutable once pushed. Insertion order is the
    * pair (__push, __seq): __push is the push call's running index and
    * __seq orders rows WITHIN one push (monotonically_increasing_id encodes
    * the partition id in its upper bits, so it is monotone within a push
    * but NOT across pushes — sorting on the pair is what preserves the
    * documented D2/D3 cross-push pagination order without a global
    * row_number shuffle at write time).
    */
  def push(items: DataFrame): Unit = synchronized {
    val stamped = items
      .withColumn("__push", lit(pushCount))
      .withColumn("__seq", monotonically_increasing_id())
    stamped.write.mode(SaveMode.Append).parquet(dir)
    pushCount += 1
    appendCount += items.count()
  }

  def itemCount: Long = appendCount

  final case class GetDataOptions(
      offset: Long = 0,
      limit: Long = Long.MaxValue,
      desc: Boolean = false,
      fields: Seq[String] = Seq.empty,
      omit: Seq[String] = Seq.empty,
      unwind: Option[String] = None,
      flatten: Option[String] = None,
      skipEmpty: Boolean = false,
      skipHidden: Boolean = false,
      clean: Boolean = false // = skipHidden + skipEmpty (reference semantics)
  )

  /** The D2-D9 surface in reference parameter order. */
  def getData(opts: GetDataOptions = GetDataOptions()): DataFrame = {
    var df = currentDf()
    if (df.columns.isEmpty) return df
    val skipHidden = opts.skipHidden || opts.clean
    val skipEmpty = opts.skipEmpty || opts.clean

    // D9: drop '#'-prefixed columns
    if (skipHidden) {
      val hidden = df.columns.filter(c => c.startsWith("#"))
      if (hidden.nonEmpty) df = df.drop(hidden: _*)
    }
    // D4: drop rows where every (non-internal) column is null
    if (skipEmpty) {
      val dataCols = df.columns.filterNot(c => c == "__seq" || c == "__push")
      df = df.filter(dataCols.map(c => col(c).isNotNull).reduce(_ || _))
    }
    // D7: explode an array field into one item per element. posexplode keeps
    // the element index as a pagination tiebreaker: exploded rows share the
    // parent's (__push, __seq), so without it desc/offset/limit order AMONG
    // one item's elements would be nondeterministic.
    opts.unwind.foreach { f =>
      df = df
        .select(col("*"), posexplode(col(f)).as(Seq("__pos", "__unwound")))
        .withColumn(f, col("__unwound"))
        .drop("__unwound")
    }
    val hasPos = opts.unwind.isDefined
    // D8: flatten a struct field into top-level columns
    opts.flatten.foreach { f =>
      val nested = df.select(s"$f.*").columns
      nested.foreach(n => df = df.withColumn(n, col(s"$f.$n")))
      df = df.drop(f)
    }
    // D3 + D2: insertion-order pagination on the (__push, __seq[, __pos]) key
    val baseOrder =
      if (opts.desc) Seq(col("__push").desc, col("__seq").desc)
      else Seq(col("__push").asc, col("__seq").asc)
    val orderCols =
      if (hasPos) baseOrder :+ (if (opts.desc) col("__pos").desc else col("__pos").asc)
      else baseOrder
    df = df.orderBy(orderCols: _*)
    if (opts.offset > 0) df = df.offset(opts.offset.toInt)
    if (opts.limit != Long.MaxValue) df = df.limit(opts.limit.toInt)
    if (hasPos) df = df.drop("__pos")
    // D5/D6: projection / anti-projection (fields keeps given order)
    if (opts.fields.nonEmpty) df = df.select(opts.fields.map(col): _*)
    else {
      if (opts.omit.nonEmpty) df = df.drop(opts.omit: _*)
      df = df.drop("__seq", "__push")
    }
    df
  }

  /** D10: CSV export. Default column set = first item's non-null fields
    * (later-introduced keys dropped, matching _utils/file.py:197-250);
    * `collectAllKeys` exports the union of all keys instead.
    */
  def exportCsv(path: String, collectAllKeys: Boolean = false): Seq[String] = {
    val df = getData()
    val columns =
      if (collectAllKeys) df.columns.toSeq
      else {
        val first = df.head()
        df.columns.toSeq.filter(c => first.getAs[Any](c) != null)
      }
    // CSV can't carry nested types: structs/arrays/maps are JSON-stringified
    // (matching the reference's row-as-JSON serialization of nested values)
    val projected = df.select(columns.map(col): _*)
    val flatCols = projected.schema.fields.map { f =>
      f.dataType match {
        case _: org.apache.spark.sql.types.StructType |
            _: org.apache.spark.sql.types.ArrayType |
            _: org.apache.spark.sql.types.MapType =>
          to_json(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }
    projected.select(flatCols.toSeq: _*)
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
    columns
  }

  /** D11: JSON export (array-of-objects stream → JSONL, the columnar form). */
  def exportJson(path: String): Unit =
    getData().coalesce(1).write.mode(SaveMode.Overwrite).json(path)

  /** Remove all items, keep the dataset usable (reference `Dataset.purge`). */
  def purge(): Unit = synchronized {
    deleteRecursively(java.nio.file.Paths.get(dir))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    appendCount = 0
    pushCount = 0
  }

  /** Delete the dataset entirely; the instance resets to an empty usable
    * store (recreate-on-open, like the queue's drop).
    */
  def drop(): Unit = synchronized {
    purge()
    deleteRecursively(java.nio.file.Paths.get(root))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.exists(p)) {
      val stream = java.nio.file.Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        stream.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      } finally stream.close()
    }
  }
}
