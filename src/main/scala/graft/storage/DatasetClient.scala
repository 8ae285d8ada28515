package graft.storage

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.collection.mutable

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.Serialization

/** S11 — the reference's pluggable dataset (result-storage) client contract
  * (`storage_clients/_base/_dataset_client.py`): push/get/iterate over
  * append-only JSON items, one API across backends.
  *
  *   - [[MemoryDatasetClient]] — `_memory/_dataset_client.py`
  *   - [[FileSystemDatasetClient]] — `_file_system/_dataset_client.py`
  *     (one `%09d.json` file per item, metadata json, restart-recoverable)
  *   - [[SqlDatasetClient]] — `_sql/_dataset_client.py` over embedded Derby
  *   - [[SparkDatasetClient]] — adapter over the parquet-backed
  *     [[ResultDataset]], the distributed scale backend.
  *
  * The reference's LOCAL clients support only offset/limit/desc/skip_empty
  * and warn on the rest (`_memory/_dataset_client.py:152-169`); this module
  * implements the FULL D2–D9 surface on every backend by sharing one
  * option pipeline ([[DatasetItemsQuery]]) whose semantics mirror the
  * oracled [[ResultDataset.getData]] stage order exactly: skip_hidden →
  * skip_empty → unwind → flatten → order/offset/limit → fields/omit.
  */
trait DatasetClient {
  def id: String
  def metadata: DatasetClientMetadata
  /** D1: append JSON items (immutable once pushed). */
  def pushData(itemsJson: Seq[String]): Unit
  /** D2–D9 page read; items returned as JSON strings. */
  def getData(opts: DatasetReadOptions = DatasetReadOptions()): DatasetPage
  def iterateItems(opts: DatasetReadOptions = DatasetReadOptions()): Iterator[String] =
    getData(opts).items.iterator
  def purge(): Unit
  def drop(): Unit

  /** Reference `Dataset.export_to` (`storages/_dataset.py:325-373`):
    * consolidate the whole dataset into ONE record of a key-value store —
    * `text/csv` or `application/json`. CSV columns follow the D10 rule:
    * the first non-empty item's keys (later-introduced keys dropped), or
    * the first-seen union with `collectAllKeys`; nested values are
    * JSON-stringified (the module's D10 semantic); empty items skipped
    * (`_utils/file.py:197-245`).
    */
  final def exportToKvs(
      kvs: KeyValueStoreClient,
      key: String,
      contentType: String = "json",
      collectAllKeys: Boolean = false
  ): Unit = {
    val parsed = getData().items.map(JsonMethods.parse(_))
    contentType match {
      case "json" =>
        kvs.setValue(key, JsonMethods.compact(JArray(parsed.toList))
          .getBytes(StandardCharsets.UTF_8), "application/json")
      case "csv" =>
        val objs = parsed.collect { case JObject(fs) if fs.nonEmpty => fs }
        val columns: Seq[String] =
          if (collectAllKeys) objs.flatMap(_.map(_._1)).distinct
          else objs.headOption.map(_.map(_._1)).getOrElse(Nil)
        def cell(v: JValue): String = {
          val raw = v match {
            case JNull | JNothing => ""
            case JString(s) => s
            case o: JObject => JsonMethods.compact(o)
            case a: JArray => JsonMethods.compact(a)
            case other => other.values.toString
          }
          if (raw.contains(",") || raw.contains("\"") || raw.contains("\n"))
            "\"" + raw.replace("\"", "\"\"") + "\""
          else raw
        }
        val sb = new StringBuilder
        if (columns.nonEmpty) {
          sb.append(columns.map(c => cell(JString(c))).mkString(",")).append('\n')
          objs.foreach { fs =>
            sb.append(columns.map(c =>
              cell(fs.find(_._1 == c).map(_._2).getOrElse(JNothing))).mkString(",")).append('\n')
          }
        }
        kvs.setValue(key, sb.toString.getBytes(StandardCharsets.UTF_8), "text/csv")
      case other =>
        throw new IllegalArgumentException(s"Unsupported content type, expecting CSV or JSON: $other")
    }
  }
}

final case class DatasetReadOptions(
    offset: Long = 0,
    limit: Long = Long.MaxValue,
    desc: Boolean = false,
    fields: Seq[String] = Seq.empty,
    omit: Seq[String] = Seq.empty,
    unwind: Option[String] = None,
    flatten: Option[String] = None,
    skipEmpty: Boolean = false,
    skipHidden: Boolean = false,
    clean: Boolean = false
)

/** Reference `DatasetItemsListPage`: the page plus its request echo. */
final case class DatasetPage(
    items: Seq[String],
    count: Long,
    total: Long,
    offset: Long,
    limit: Long,
    desc: Boolean
)

final case class DatasetClientMetadata(
    id: String,
    name: Option[String],
    itemCount: Long,
    createdAtMs: Long,
    accessedAtMs: Long,
    modifiedAtMs: Long
)

/** The shared D2–D9 option pipeline over parsed JSON items, stage-for-stage
  * equivalent to [[ResultDataset.getData]] (which is the DuckDB-oracled
  * semantic: d2/d4–d9 CORRECTNESS entries).
  */
object DatasetItemsQuery {

  def apply(itemsInOrder: Seq[JValue], opts: DatasetReadOptions): (Seq[JValue], Long) = {
    val skipHidden = opts.skipHidden || opts.clean
    val skipEmpty = opts.skipEmpty || opts.clean
    var items = itemsInOrder

    // D9: drop '#'-prefixed fields
    if (skipHidden) items = items.map {
      case JObject(fs) => JObject(fs.filterNot(_._1.startsWith("#")))
      case other => other
    }
    // D4: drop items whose every remaining field is null
    if (skipEmpty) items = items.filter {
      case JObject(fs) => fs.exists(_._2 != JNull)
      case _ => true
    }
    // D7: one item per array element (items without a non-empty array drop,
    // matching Spark explode)
    opts.unwind.foreach { f =>
      items = items.flatMap {
        case JObject(fs) =>
          fs.collectFirst { case (`f`, JArray(els)) if els.nonEmpty => els } match {
            case Some(els) =>
              els.map(el => JObject(fs.map { case (k, v) => if (k == f) (k, el) else (k, v) }))
            case None => Nil
          }
        case _ => Nil
      }
    }
    // D8: lift a struct field's members to the top level (collisions: the
    // lifted member wins, matching withColumn overwrite), drop the struct
    opts.flatten.foreach { f =>
      items = items.map {
        case JObject(fs) =>
          fs.collectFirst { case (`f`, JObject(nested)) => nested } match {
            case Some(nested) =>
              val keep = fs.filterNot { case (k, _) => k == f || nested.exists(_._1 == k) }
              JObject(keep ++ nested)
            case None => JObject(fs.filterNot(_._1 == f))
          }
        case other => other
      }
    }
    val total = items.length.toLong
    // D3 + D2: insertion-order pagination
    if (opts.desc) items = items.reverse
    if (opts.offset > 0) items = items.drop(opts.offset.toInt)
    if (opts.limit != Long.MaxValue) items = items.take(opts.limit.toInt)
    // D5/D6: projection / anti-projection (fields keeps the given order)
    if (opts.fields.nonEmpty) items = items.map {
      case JObject(fs) =>
        JObject(opts.fields.flatMap(k => fs.find(_._1 == k)).toList)
      case other => other
    }
    else if (opts.omit.nonEmpty) items = items.map {
      case JObject(fs) => JObject(fs.filterNot(kv => opts.omit.contains(kv._1)))
      case other => other
    }
    (items, total)
  }
}

/** S11 backend 1 — in-memory dataset (reference `_memory/_dataset_client.py`). */
final class MemoryDatasetClient(
    val name: Option[String] = None,
    clock: () => Long = () => System.currentTimeMillis()
) extends DatasetClient {

  val id: String = graft.canon.Ids.randomObjectId()

  private val items = mutable.ArrayBuffer.empty[JValue]
  private val createdAt = clock()
  private var accessedAt = createdAt
  private var modifiedAt = createdAt

  private def touch(modified: Boolean): Unit = {
    accessedAt = clock()
    if (modified) modifiedAt = accessedAt
  }

  override def metadata: DatasetClientMetadata =
    DatasetClientMetadata(id, name, items.length.toLong, createdAt, accessedAt, modifiedAt)

  override def pushData(itemsJson: Seq[String]): Unit = {
    items ++= itemsJson.map(JsonMethods.parse(_))
    touch(modified = true)
  }

  override def getData(opts: DatasetReadOptions): DatasetPage = {
    touch(modified = false)
    val (page, total) = DatasetItemsQuery(items.toSeq, opts)
    DatasetPage(page.map(JsonMethods.compact), page.length.toLong, total, opts.offset, opts.limit, opts.desc)
  }

  override def purge(): Unit = { items.clear(); touch(modified = true) }
  override def drop(): Unit = purge()
}

/** S11 backend 2 — file-system dataset (reference
  * `_file_system/_dataset_client.py`): one `%09d.json` file per item
  * (`_ITEM_FILENAME_DIGITS = 9`, numbering continues from the persisted
  * `item_count`), a `__metadata__.json`, atomic writes — a restart resumes
  * exactly where the files left off.
  */
final class FileSystemDatasetClient(
    rootDir: String,
    val name: Option[String] = None,
    clock: () => Long = () => System.currentTimeMillis()
) extends DatasetClient {

  private implicit val fmts: Formats = DefaultFormats

  private val MetadataFilename = "__metadata__.json"
  private val root: Path = Paths.get(rootDir)
  Files.createDirectories(root)

  val id: String = graft.canon.Ids.deterministicObjectId(s"fsds|$rootDir|${name.getOrElse("")}")

  private var itemCount: Long = 0L
  private var createdAt = clock()
  private var accessedAt = createdAt
  private var modifiedAt = createdAt
  loadMetadata()

  private def loadMetadata(): Unit = {
    val p = root.resolve(MetadataFilename)
    if (Files.exists(p)) {
      val j = JsonMethods.parse(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
      itemCount = (j \ "item_count").extract[Long]
      createdAt = (j \ "created_at").extract[Long]
      accessedAt = (j \ "accessed_at").extract[Long]
      modifiedAt = (j \ "modified_at").extract[Long]
    }
  }

  private def atomicWrite(path: Path, content: String): Unit = {
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  private def persistMetadata(): Unit =
    atomicWrite(root.resolve(MetadataFilename), Serialization.write(Map(
      "id" -> id, "name" -> name.getOrElse(""), "item_count" -> itemCount,
      "created_at" -> createdAt, "accessed_at" -> accessedAt, "modified_at" -> modifiedAt)))

  private def touch(modified: Boolean): Unit = {
    accessedAt = clock()
    if (modified) modifiedAt = accessedAt
    persistMetadata()
  }

  override def metadata: DatasetClientMetadata =
    DatasetClientMetadata(id, name, itemCount, createdAt, accessedAt, modifiedAt)

  override def pushData(itemsJson: Seq[String]): Unit = {
    itemsJson.foreach { item =>
      itemCount += 1
      atomicWrite(root.resolve(f"$itemCount%09d.json"), item)
    }
    touch(modified = true)
  }

  private def sortedItemFiles(): Seq[Path] = {
    val stream = Files.list(root)
    try {
      import scala.jdk.CollectionConverters._
      stream.iterator().asScala
        .filter { p =>
          val n = p.getFileName.toString
          n.endsWith(".json") && n != MetadataFilename && n.length == 14 // %09d + ".json"
        }
        .toSeq.sortBy(_.getFileName.toString)
    } finally stream.close()
  }

  override def getData(opts: DatasetReadOptions): DatasetPage = {
    val parsed = sortedItemFiles().map(p =>
      JsonMethods.parse(new String(Files.readAllBytes(p), StandardCharsets.UTF_8)))
    val (page, total) = DatasetItemsQuery(parsed, opts)
    touch(modified = false)
    DatasetPage(page.map(JsonMethods.compact), page.length.toLong, total, opts.offset, opts.limit, opts.desc)
  }

  override def purge(): Unit = {
    sortedItemFiles().foreach(Files.deleteIfExists(_))
    itemCount = 0
    touch(modified = true)
  }

  override def drop(): Unit = {
    sortedItemFiles().foreach(Files.deleteIfExists(_))
    Files.deleteIfExists(root.resolve(MetadataFilename))
    Files.deleteIfExists(root)
  }
}

/** S11 backend 3 — dataset over embedded Derby (reference
  * `_sql/_dataset_client.py`: items as JSON rows ordered by an
  * auto-incrementing `item_id`, `order_by(item_id)` pagination). Synchronous
  * JDBC replaces the asyncio layer, like the other SQL clients.
  */
final class SqlDatasetClient(
    dbDir: String,
    val name: Option[String] = None,
    clock: () => Long = () => System.currentTimeMillis()
) extends DatasetClient {

  val id: String = graft.canon.Ids.deterministicObjectId(s"sqlds|$dbDir|${name.getOrElse("")}")

  private val conn = java.sql.DriverManager.getConnection(s"jdbc:derby:$dbDir;create=true")
  conn.setAutoCommit(false)

  createTables()
  ensureMetadataRow()

  private def tableExists(table: String): Boolean = {
    val rs = conn.getMetaData.getTables(null, null, table.toUpperCase, null)
    try rs.next() finally rs.close()
  }

  private def createTables(): Unit = synchronized {
    if (!tableExists("dataset_items")) {
      val s = conn.createStatement()
      s.execute(
        """CREATE TABLE dataset_items (
          |  dataset_id VARCHAR(20) NOT NULL,
          |  item_id BIGINT NOT NULL,
          |  data CLOB NOT NULL,
          |  PRIMARY KEY (dataset_id, item_id)
          |)""".stripMargin)
      s.close()
    }
    if (!tableExists("dataset_metadata")) {
      val s = conn.createStatement()
      s.execute(
        """CREATE TABLE dataset_metadata (
          |  dataset_id VARCHAR(20) NOT NULL PRIMARY KEY,
          |  name VARCHAR(255),
          |  item_count BIGINT NOT NULL,
          |  created_at BIGINT NOT NULL,
          |  accessed_at BIGINT NOT NULL,
          |  modified_at BIGINT NOT NULL
          |)""".stripMargin)
      s.close()
    }
    conn.commit()
  }

  private def ensureMetadataRow(): Unit = synchronized {
    val check = conn.prepareStatement("SELECT 1 FROM dataset_metadata WHERE dataset_id = ?")
    check.setString(1, id)
    val rs = check.executeQuery()
    val exists = rs.next(); rs.close(); check.close()
    if (!exists) {
      val now = clock()
      val ins = conn.prepareStatement("INSERT INTO dataset_metadata VALUES (?, ?, 0, ?, ?, ?)")
      ins.setString(1, id); ins.setString(2, name.orNull)
      ins.setLong(3, now); ins.setLong(4, now); ins.setLong(5, now)
      ins.executeUpdate(); ins.close()
    }
    conn.commit()
  }

  private def touch(modified: Boolean, deltaItems: Long = 0): Unit = {
    val now = clock()
    val st = conn.prepareStatement(
      s"""UPDATE dataset_metadata SET accessed_at = ?${if (modified) ", modified_at = ?" else ""},
         |item_count = item_count + ? WHERE dataset_id = ?""".stripMargin)
    var i = 1
    st.setLong(i, now); i += 1
    if (modified) { st.setLong(i, now); i += 1 }
    st.setLong(i, deltaItems); i += 1
    st.setString(i, id)
    st.executeUpdate(); st.close()
  }

  override def metadata: DatasetClientMetadata = synchronized {
    val st = conn.prepareStatement(
      "SELECT name, item_count, created_at, accessed_at, modified_at FROM dataset_metadata WHERE dataset_id = ?")
    st.setString(1, id)
    val rs = st.executeQuery(); rs.next()
    val m = DatasetClientMetadata(id, Option(rs.getString(1)).filter(_.nonEmpty),
      rs.getLong(2), rs.getLong(3), rs.getLong(4), rs.getLong(5))
    rs.close(); st.close(); conn.commit()
    m
  }

  override def pushData(itemsJson: Seq[String]): Unit = synchronized {
    val sel = conn.prepareStatement(
      "SELECT COALESCE(MAX(item_id), 0) FROM dataset_items WHERE dataset_id = ?")
    sel.setString(1, id)
    val rs = sel.executeQuery(); rs.next()
    var nextId = rs.getLong(1) + 1
    rs.close(); sel.close()
    val ins = conn.prepareStatement("INSERT INTO dataset_items VALUES (?, ?, ?)")
    itemsJson.foreach { item =>
      ins.setString(1, id); ins.setLong(2, nextId); ins.setString(3, item)
      ins.addBatch()
      nextId += 1
    }
    ins.executeBatch(); ins.close()
    touch(modified = true, deltaItems = itemsJson.length.toLong)
    conn.commit()
  }

  override def getData(opts: DatasetReadOptions): DatasetPage = synchronized {
    val st = conn.prepareStatement(
      "SELECT data FROM dataset_items WHERE dataset_id = ? ORDER BY item_id ASC")
    st.setString(1, id)
    val rs = st.executeQuery()
    val parsed = mutable.ListBuffer.empty[JValue]
    while (rs.next()) parsed += JsonMethods.parse(rs.getString(1))
    rs.close(); st.close()
    touch(modified = false); conn.commit()
    val (page, total) = DatasetItemsQuery(parsed.toSeq, opts)
    DatasetPage(page.map(JsonMethods.compact), page.length.toLong, total, opts.offset, opts.limit, opts.desc)
  }

  override def purge(): Unit = synchronized {
    val st = conn.prepareStatement("DELETE FROM dataset_items WHERE dataset_id = ?")
    st.setString(1, id); st.executeUpdate(); st.close()
    val upd = conn.prepareStatement(
      "UPDATE dataset_metadata SET item_count = 0, accessed_at = ?, modified_at = ? WHERE dataset_id = ?")
    val now = clock()
    upd.setLong(1, now); upd.setLong(2, now); upd.setString(3, id)
    upd.executeUpdate(); upd.close()
    conn.commit()
  }

  override def drop(): Unit = synchronized {
    purge()
    val st = conn.prepareStatement("DELETE FROM dataset_metadata WHERE dataset_id = ?")
    st.setString(1, id); st.executeUpdate(); st.close()
    conn.commit()
  }

  def close(): Unit = synchronized {
    try conn.close() catch { case _: java.sql.SQLException => () }
  }
}

/** S11 backend 4 — adapter over the parquet-backed [[ResultDataset]]: the
  * distributed backend (items live in partitioned parquet; the D2–D9
  * pipeline runs as Catalyst plans — this is the 100 TB slot). JSON in,
  * JSON out at the contract boundary; the engine pushes DataFrames to the
  * underlying store directly.
  */
final class SparkDatasetClient(
    spark: org.apache.spark.sql.SparkSession,
    store: ResultDataset,
    val name: Option[String] = None,
    clock: () => Long = () => System.currentTimeMillis()
) extends DatasetClient {

  def id: String = store.id

  private val createdAt = clock()
  private var accessedAt = createdAt
  private var modifiedAt = createdAt

  private def touch(modified: Boolean): Unit = {
    accessedAt = clock()
    if (modified) modifiedAt = accessedAt
  }

  override def metadata: DatasetClientMetadata =
    DatasetClientMetadata(id, name, store.itemCount, createdAt, accessedAt, modifiedAt)

  override def pushData(itemsJson: Seq[String]): Unit = {
    import spark.implicits._
    store.push(spark.read.json(spark.createDataset(itemsJson)))
    touch(modified = true)
  }

  /** Row → JSON with EXPLICIT nulls (DataFrame.toJSON omits null fields;
    * the contract keeps them, like the local backends and the reference's
    * dict items — an all-None item must stay a non-empty item).
    */
  private def valueToJson(v: Any): JValue = v match {
    case null => JNull
    case r: org.apache.spark.sql.Row =>
      JObject(r.schema.fields.toList.zipWithIndex.map { case (f, i) => f.name -> valueToJson(r.get(i)) })
    case s: collection.Seq[_] => JArray(s.toList.map(valueToJson))
    case m: collection.Map[_, _] => JObject(m.toList.map { case (k, x) => k.toString -> valueToJson(x) })
    case s: String => JString(s)
    case b: Boolean => JBool(b)
    case i: Int => JInt(BigInt(i))
    case l: Long => JInt(BigInt(l))
    case d: Double => JDouble(d)
    case f: Float => JDouble(f.toDouble)
    case d: java.math.BigDecimal => JDecimal(BigDecimal(d))
    case b: Array[Byte] => JString(java.util.Base64.getEncoder.encodeToString(b))
    case other => JString(other.toString)
  }

  override def getData(opts: DatasetReadOptions): DatasetPage = {
    val o = store.GetDataOptions(
      offset = opts.offset, limit = opts.limit, desc = opts.desc,
      fields = opts.fields, omit = opts.omit, unwind = opts.unwind,
      flatten = opts.flatten, skipEmpty = opts.skipEmpty,
      skipHidden = opts.skipHidden, clean = opts.clean)
    val items = store.getData(o).collect().toSeq.map(r => JsonMethods.compact(valueToJson(r)))
    val total = store.getData(store.GetDataOptions(
      desc = opts.desc, fields = opts.fields, omit = opts.omit, unwind = opts.unwind,
      flatten = opts.flatten, skipEmpty = opts.skipEmpty,
      skipHidden = opts.skipHidden, clean = opts.clean)).count()
    touch(modified = false)
    DatasetPage(items, items.length.toLong, total, opts.offset, opts.limit, opts.desc)
  }

  override def purge(): Unit = { store.purge(); touch(modified = true) }
  override def drop(): Unit = { store.drop(); touch(modified = true) }
}
