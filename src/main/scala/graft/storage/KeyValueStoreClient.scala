package graft.storage

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.collection.mutable

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.Serialization

/** S11 — the reference's pluggable key-value-store client contract
  * (`storage_clients/_base/_key_value_store_client.py`): get/set/delete/
  * iterate/exists over content-typed records, one API across backends.
  *
  *   - [[MemoryKeyValueStoreClient]] — `_memory/_key_value_store_client.py`
  *   - [[FileSystemKeyValueStoreClient]] — `_file_system/_key_value_store_client.py`
  *     (percent-encoded key files + per-record metadata sidecars)
  *   - [[SqlKeyValueStoreClient]] — `_sql/_key_value_store_client.py` over
  *     embedded Derby
  *   - [[SnapshotKeyValueStoreClient]] — adapter over the Spark-persisted
  *     [[KeyValueStore]] (snapshot-per-commit parquet + atomic manifest),
  *     the crash-resumable backend the engine itself uses.
  *
  * Iteration order is ascending by key with `exclusiveStartKey` paging
  * (`_memory/_key_value_store_client.py:135-152`).
  */
trait KeyValueStoreClient {
  def id: String
  def metadata: KvsMetadata
  def getValue(key: String): Option[KvsRecord]
  def setValue(key: String, value: Array[Byte], contentType: String = "application/octet-stream"): Unit
  def deleteValue(key: String): Unit
  def iterateKeys(exclusiveStartKey: Option[String] = None, limit: Option[Int] = None): Seq[KvsRecordMetadata]
  def recordExists(key: String): Boolean
  /** file:// (or storage-native) URL for the record
    * (`_file_system/_key_value_store_client.py:428-439`).
    */
  def publicUrl(key: String): String
  def purge(): Unit
  def drop(): Unit

  final def setJson(key: String, json: String): Unit =
    setValue(key, json.getBytes(StandardCharsets.UTF_8), "application/json; charset=utf-8")
}

final case class KvsRecord(key: String, contentType: String, value: Array[Byte]) {
  def asString: String = new String(value, StandardCharsets.UTF_8)
}

/** Reference `KeyValueStoreRecordMetadata`: key + content type + size. */
final case class KvsRecordMetadata(key: String, contentType: String, size: Long)

final case class KvsMetadata(
    id: String,
    name: Option[String],
    createdAtMs: Long,
    accessedAtMs: Long,
    modifiedAtMs: Long
)

/** S11 backend 1 — in-memory KVS (reference `_memory/_key_value_store_client.py`). */
final class MemoryKeyValueStoreClient(
    val name: Option[String] = None,
    clock: () => Long = () => System.currentTimeMillis()
) extends KeyValueStoreClient {

  val id: String = graft.canon.Ids.randomObjectId()

  private val records = mutable.HashMap.empty[String, KvsRecord]
  private val createdAt = clock()
  private var accessedAt = createdAt
  private var modifiedAt = createdAt

  private def touch(modified: Boolean): Unit = {
    accessedAt = clock()
    if (modified) modifiedAt = accessedAt
  }

  override def metadata: KvsMetadata = KvsMetadata(id, name, createdAt, accessedAt, modifiedAt)

  override def getValue(key: String): Option[KvsRecord] = { touch(modified = false); records.get(key) }

  override def setValue(key: String, value: Array[Byte], contentType: String): Unit = {
    records(key) = KvsRecord(key, contentType, value)
    touch(modified = true)
  }

  override def deleteValue(key: String): Unit = {
    if (records.remove(key).isDefined) touch(modified = true)
  }

  override def iterateKeys(exclusiveStartKey: Option[String], limit: Option[Int]): Seq[KvsRecordMetadata] = {
    touch(modified = false)
    // ascending key order + exclusive-start paging (:143-152)
    var keys = records.keys.toSeq.sorted
    exclusiveStartKey.foreach(s => keys = keys.filter(_ > s))
    limit.foreach(n => keys = keys.take(n))
    keys.map { k => val r = records(k); KvsRecordMetadata(k, r.contentType, r.value.length.toLong) }
  }

  override def recordExists(key: String): Boolean = { touch(modified = false); records.contains(key) }

  override def publicUrl(key: String): String = s"memory://$id/$key"

  override def purge(): Unit = { records.clear(); touch(modified = true) }

  override def drop(): Unit = purge()
}

/** S11 backend 2 — file-system KVS (reference
  * `_file_system/_key_value_store_client.py`): value file named by the
  * percent-encoded key (`_encode_key`, `:486-492`), a
  * `{key}.__metadata__.json` sidecar per record, and a store-level
  * `__metadata__.json`. All writes are atomic (temp + rename); a restart
  * resumes from what is on disk.
  */
final class FileSystemKeyValueStoreClient(
    rootDir: String,
    val name: Option[String] = None,
    clock: () => Long = () => System.currentTimeMillis()
) extends KeyValueStoreClient {

  private implicit val fmts: Formats = DefaultFormats

  private val MetadataFilename = "__metadata__.json"
  private val root: Path = Paths.get(rootDir)
  Files.createDirectories(root)

  val id: String = graft.canon.Ids.deterministicObjectId(s"fskvs|$rootDir|${name.getOrElse("")}")

  private var createdAt = clock()
  private var accessedAt = createdAt
  private var modifiedAt = createdAt
  loadMetadata()

  private def encodeKey(key: String): String =
    java.net.URLEncoder.encode(key, "UTF-8").replace("+", "%20")
  private def decodeKey(enc: String): String = java.net.URLDecoder.decode(enc, "UTF-8")

  private def valuePath(key: String): Path = root.resolve(encodeKey(key))
  private def sidecarPath(key: String): Path = root.resolve(s"${encodeKey(key)}.$MetadataFilename")

  private def atomicWrite(path: Path, content: Array[Byte]): Unit = {
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.write(tmp, content)
    Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  private def loadMetadata(): Unit = {
    val p = root.resolve(MetadataFilename)
    if (Files.exists(p)) {
      val j = JsonMethods.parse(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
      createdAt = (j \ "created_at").extract[Long]
      accessedAt = (j \ "accessed_at").extract[Long]
      modifiedAt = (j \ "modified_at").extract[Long]
    }
  }

  private def persistMetadata(): Unit =
    atomicWrite(root.resolve(MetadataFilename), Serialization.write(Map(
      "id" -> id, "name" -> name.getOrElse(""),
      "created_at" -> createdAt, "accessed_at" -> accessedAt, "modified_at" -> modifiedAt
    )).getBytes(StandardCharsets.UTF_8))

  private def touch(modified: Boolean): Unit = {
    accessedAt = clock()
    if (modified) modifiedAt = accessedAt
    persistMetadata()
  }

  override def metadata: KvsMetadata = KvsMetadata(id, name, createdAt, accessedAt, modifiedAt)

  override def getValue(key: String): Option[KvsRecord] = {
    val vp = valuePath(key)
    if (!Files.exists(vp)) None
    else {
      val value = Files.readAllBytes(vp)
      val ct =
        if (Files.exists(sidecarPath(key)))
          (JsonMethods.parse(new String(Files.readAllBytes(sidecarPath(key)), StandardCharsets.UTF_8))
            \ "content_type").extract[String]
        else "application/octet-stream"
      touch(modified = false)
      Some(KvsRecord(key, ct, value))
    }
  }

  override def setValue(key: String, value: Array[Byte], contentType: String): Unit = {
    atomicWrite(valuePath(key), value)
    atomicWrite(sidecarPath(key), Serialization.write(Map(
      "key" -> key, "content_type" -> contentType, "size" -> value.length
    )).getBytes(StandardCharsets.UTF_8))
    touch(modified = true)
  }

  override def deleteValue(key: String): Unit = {
    val deleted = Files.deleteIfExists(valuePath(key))
    Files.deleteIfExists(sidecarPath(key))
    if (deleted) touch(modified = true)
  }

  override def iterateKeys(exclusiveStartKey: Option[String], limit: Option[Int]): Seq[KvsRecordMetadata] = {
    // records are discovered from their metadata SIDECARS, sorted by file
    // name (:376-421)
    val stream = Files.list(root)
    val metas =
      try {
        import scala.jdk.CollectionConverters._
        stream.iterator().asScala.map(_.getFileName.toString).toSeq
          .filter(n => n != MetadataFilename && n.endsWith(s".$MetadataFilename"))
          .map(n => decodeKey(n.dropRight(MetadataFilename.length + 1))) // strip ".__metadata__.json"
      } finally stream.close()
    var keys = metas.sorted
    exclusiveStartKey.foreach(s => keys = keys.filter(_ > s))
    limit.foreach(n => keys = keys.take(n))
    val out = keys.flatMap { k =>
      val sp = sidecarPath(k)
      if (!Files.exists(sp)) None
      else {
        val j = JsonMethods.parse(new String(Files.readAllBytes(sp), StandardCharsets.UTF_8))
        Some(KvsRecordMetadata(
          (j \ "key").extract[String], (j \ "content_type").extract[String], (j \ "size").extract[Long]))
      }
    }
    touch(modified = false)
    out
  }

  override def recordExists(key: String): Boolean = {
    touch(modified = false)
    Files.exists(valuePath(key))
  }

  override def publicUrl(key: String): String = valuePath(key).toAbsolutePath.toUri.toString

  override def purge(): Unit = {
    val stream = Files.list(root)
    try {
      import scala.jdk.CollectionConverters._
      stream.iterator().asScala
        .filter(_.getFileName.toString != MetadataFilename)
        .foreach(Files.deleteIfExists(_))
    } finally stream.close()
    touch(modified = true)
  }

  override def drop(): Unit = {
    purge()
    Files.deleteIfExists(root.resolve(MetadataFilename))
    Files.deleteIfExists(root)
  }
}

/** S11 backend 3 — KVS over embedded Derby (reference
  * `_sql/_key_value_store_client.py`: one `key_value_store_records` table
  * keyed by (kvs_id, key) holding content-typed BLOBs). Synchronous JDBC
  * replaces the asyncio session layer (same substitution as
  * [[graft.queue.SqlRequestQueueClient]]).
  */
final class SqlKeyValueStoreClient(
    dbDir: String,
    val name: Option[String] = None,
    clock: () => Long = () => System.currentTimeMillis()
) extends KeyValueStoreClient {

  val id: String = graft.canon.Ids.deterministicObjectId(s"sqlkvs|$dbDir|${name.getOrElse("")}")

  private val conn = java.sql.DriverManager.getConnection(s"jdbc:derby:$dbDir;create=true")
  conn.setAutoCommit(false)

  createTables()
  ensureMetadataRow()

  private def tableExists(table: String): Boolean = {
    val rs = conn.getMetaData.getTables(null, null, table.toUpperCase, null)
    try rs.next() finally rs.close()
  }

  private def createTables(): Unit = synchronized {
    if (!tableExists("kvs_records")) {
      val s = conn.createStatement()
      s.execute(
        """CREATE TABLE kvs_records (
          |  kvs_id VARCHAR(20) NOT NULL,
          |  record_key VARCHAR(1024) NOT NULL,
          |  content_type VARCHAR(255) NOT NULL,
          |  value BLOB NOT NULL,
          |  PRIMARY KEY (kvs_id, record_key)
          |)""".stripMargin)
      s.close()
    }
    if (!tableExists("kvs_metadata")) {
      val s = conn.createStatement()
      s.execute(
        """CREATE TABLE kvs_metadata (
          |  kvs_id VARCHAR(20) NOT NULL PRIMARY KEY,
          |  name VARCHAR(255),
          |  created_at BIGINT NOT NULL,
          |  accessed_at BIGINT NOT NULL,
          |  modified_at BIGINT NOT NULL
          |)""".stripMargin)
      s.close()
    }
    conn.commit()
  }

  private def ensureMetadataRow(): Unit = synchronized {
    val check = conn.prepareStatement("SELECT 1 FROM kvs_metadata WHERE kvs_id = ?")
    check.setString(1, id)
    val rs = check.executeQuery()
    val exists = rs.next(); rs.close(); check.close()
    if (!exists) {
      val now = clock()
      val ins = conn.prepareStatement("INSERT INTO kvs_metadata VALUES (?, ?, ?, ?, ?)")
      ins.setString(1, id); ins.setString(2, name.orNull)
      ins.setLong(3, now); ins.setLong(4, now); ins.setLong(5, now)
      ins.executeUpdate(); ins.close()
    }
    conn.commit()
  }

  private def touch(modified: Boolean): Unit = {
    val now = clock()
    val st = conn.prepareStatement(
      s"UPDATE kvs_metadata SET accessed_at = ?${if (modified) ", modified_at = ?" else ""} WHERE kvs_id = ?")
    var i = 1
    st.setLong(i, now); i += 1
    if (modified) { st.setLong(i, now); i += 1 }
    st.setString(i, id)
    st.executeUpdate(); st.close()
  }

  override def metadata: KvsMetadata = synchronized {
    val st = conn.prepareStatement(
      "SELECT name, created_at, accessed_at, modified_at FROM kvs_metadata WHERE kvs_id = ?")
    st.setString(1, id)
    val rs = st.executeQuery(); rs.next()
    val m = KvsMetadata(id, Option(rs.getString(1)).filter(_.nonEmpty),
      rs.getLong(2), rs.getLong(3), rs.getLong(4))
    rs.close(); st.close(); conn.commit()
    m
  }

  override def getValue(key: String): Option[KvsRecord] = synchronized {
    val st = conn.prepareStatement(
      "SELECT content_type, value FROM kvs_records WHERE kvs_id = ? AND record_key = ?")
    st.setString(1, id); st.setString(2, key)
    val rs = st.executeQuery()
    val out = if (rs.next()) Some(KvsRecord(key, rs.getString(1), rs.getBytes(2))) else None
    rs.close(); st.close()
    touch(modified = false); conn.commit()
    out
  }

  override def setValue(key: String, value: Array[Byte], contentType: String): Unit = synchronized {
    val upd = conn.prepareStatement(
      "UPDATE kvs_records SET content_type = ?, value = ? WHERE kvs_id = ? AND record_key = ?")
    upd.setString(1, contentType); upd.setBytes(2, value)
    upd.setString(3, id); upd.setString(4, key)
    val n = upd.executeUpdate(); upd.close()
    if (n == 0) {
      val ins = conn.prepareStatement("INSERT INTO kvs_records VALUES (?, ?, ?, ?)")
      ins.setString(1, id); ins.setString(2, key)
      ins.setString(3, contentType); ins.setBytes(4, value)
      ins.executeUpdate(); ins.close()
    }
    touch(modified = true); conn.commit()
  }

  override def deleteValue(key: String): Unit = synchronized {
    val st = conn.prepareStatement("DELETE FROM kvs_records WHERE kvs_id = ? AND record_key = ?")
    st.setString(1, id); st.setString(2, key)
    val n = st.executeUpdate(); st.close()
    if (n > 0) touch(modified = true)
    conn.commit()
  }

  override def iterateKeys(exclusiveStartKey: Option[String], limit: Option[Int]): Seq[KvsRecordMetadata] =
    synchronized {
      val sql = new StringBuilder(
        "SELECT record_key, content_type, length(value) FROM kvs_records WHERE kvs_id = ?")
      exclusiveStartKey.foreach(_ => sql.append(" AND record_key > ?"))
      sql.append(" ORDER BY record_key ASC")
      limit.foreach(n => sql.append(s" FETCH FIRST $n ROWS ONLY"))
      val st = conn.prepareStatement(sql.toString)
      st.setString(1, id)
      exclusiveStartKey.foreach(st.setString(2, _))
      val rs = st.executeQuery()
      val out = mutable.ListBuffer.empty[KvsRecordMetadata]
      while (rs.next()) out += KvsRecordMetadata(rs.getString(1), rs.getString(2), rs.getLong(3))
      rs.close(); st.close()
      touch(modified = false); conn.commit()
      out.toSeq
    }

  override def recordExists(key: String): Boolean = synchronized {
    val st = conn.prepareStatement(
      "SELECT 1 FROM kvs_records WHERE kvs_id = ? AND record_key = ?")
    st.setString(1, id); st.setString(2, key)
    val rs = st.executeQuery()
    val any = rs.next()
    rs.close(); st.close()
    touch(modified = false); conn.commit()
    any
  }

  override def publicUrl(key: String): String = s"derby://$dbDir/$id/$key"

  override def purge(): Unit = synchronized {
    val st = conn.prepareStatement("DELETE FROM kvs_records WHERE kvs_id = ?")
    st.setString(1, id); st.executeUpdate(); st.close()
    touch(modified = true); conn.commit()
  }

  override def drop(): Unit = synchronized {
    purge()
    val st = conn.prepareStatement("DELETE FROM kvs_metadata WHERE kvs_id = ?")
    st.setString(1, id); st.executeUpdate(); st.close()
    conn.commit()
  }

  def close(): Unit = synchronized {
    try conn.close() catch { case _: java.sql.SQLException => () }
  }
}

/** S11 backend 4 — adapter over the Spark-persisted snapshot
  * [[KeyValueStore]] (parquet snapshot per commit + atomic manifest): the
  * crash-resumable backend the crawl engine itself persists state through.
  * Mutations act on the driver-held map; `persist()` commits a snapshot
  * (the PERSIST_STATE cadence decides when, as in the engine).
  */
final class SnapshotKeyValueStoreClient(
    store: KeyValueStore,
    val name: Option[String] = None,
    clock: () => Long = () => System.currentTimeMillis()
) extends KeyValueStoreClient {

  def id: String = store.id

  private val createdAt = clock()
  private var accessedAt = createdAt
  private var modifiedAt = createdAt

  private def touch(modified: Boolean): Unit = {
    accessedAt = clock()
    if (modified) modifiedAt = accessedAt
  }

  private def ct(key: String): String =
    store.getContentType(key).getOrElse("application/octet-stream")

  override def metadata: KvsMetadata = KvsMetadata(id, name, createdAt, accessedAt, modifiedAt)

  override def getValue(key: String): Option[KvsRecord] = {
    touch(modified = false)
    store.getValue(key).map(v => KvsRecord(key, ct(key), v))
  }

  override def setValue(key: String, value: Array[Byte], contentType: String): Unit = {
    store.setValue(key, value, contentType)
    touch(modified = true)
  }

  override def deleteValue(key: String): Unit = {
    store.delete(key); touch(modified = true)
  }

  override def iterateKeys(exclusiveStartKey: Option[String], limit: Option[Int]): Seq[KvsRecordMetadata] = {
    touch(modified = false)
    var keys = store.iterateKeys().sorted
    exclusiveStartKey.foreach(s => keys = keys.filter(_ > s))
    limit.foreach(n => keys = keys.take(n))
    keys.flatMap(k => store.getValue(k).map(v => KvsRecordMetadata(k, ct(k), v.length.toLong)))
  }

  override def recordExists(key: String): Boolean = { touch(modified = false); store.recordExists(key) }

  override def publicUrl(key: String): String = s"snapshot://$id/$key"

  override def purge(): Unit = {
    store.iterateKeys().foreach(store.delete)
    touch(modified = true)
  }

  override def drop(): Unit = purge()

  def persist(): Long = store.persist()
}
