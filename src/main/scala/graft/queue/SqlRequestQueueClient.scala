package graft.queue

import java.sql.{Connection, DriverManager, ResultSet}

import scala.collection.mutable

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.Serialization

/** S11 backend 3 — SQL request queue client over embedded Derby (reference
  * `storage_clients/_sql/_request_queue_client.py`). Faithful schema and
  * semantics:
  *
  *   - `request_queue_records(request_id BIGINT, queue_id, data, sequence_number,
  *     is_handled, time_blocked_until, client_key)` with the reference's
  *     `idx_fetch_available (queue_id, is_handled, sequence_number)` index
  *     (`_db_models.py:202-242`);
  *   - `request_id` is the C10 integer id `int(sha256(unique_key)[:15], 16)`
  *     (`_request_queue_client.py:766-780`) — 60 bits, fits a BIGINT;
  *   - forefront requests take NEGATIVE, decrementing sequence numbers and
  *     regular requests positive, incrementing ones, so one
  *     `ORDER BY sequence_number ASC` yields forefront-LIFO-then-FIFO
  *     (`:266-273`);
  *   - fetch takes up to [[fetchBatchSize]] unblocked rows (reference
  *     `_MAX_BATCH_FETCH_SIZE = 10`), stamps `time_blocked_until = now +
  *     300 s` + `client_key` (the lease, `:421-494`), returns the first and
  *     caches the rest; a reclaim-to-forefront re-enters the cache at the
  *     front (`:585-590`);
  *   - `mark_request_as_handled` / `reclaim_request` act only on leased
  *     rows (`time_blocked_until IS NOT NULL`) — the module-wide Q6/Q7
  *     contract; the reference SQL client is lenient and updates any
  *     existing row (`:506-536`), a disclosed unification on the memory
  *     client's semantics.
  *
  * Documented substitutions: the reference's asyncio session/retry and the
  * metadata-buffer table (a write-coalescing perf layer, `:786-855`) are
  * replaced by synchronous JDBC statements updating metadata in the same
  * transaction — single-client semantics are identical and `is_finished`
  * needs no buffer-lock dance. In-batch duplicate adds report like the
  * memory client (first wins, one report per input; the reference SQL
  * client silently drops later in-batch duplicates, `:224-231`) — the
  * module-wide Q1 rule.
  *
  * Derby is an embedded JVM database: the scale story for this backend is
  * the same as the reference's SQLite default (single-node convenience);
  * the distributed path is [[FrontierQueueClient]].
  */
final class SqlRequestQueueClient(
    dbDir: String,
    val name: Option[String] = None,
    clock: () => Long = () => System.currentTimeMillis(),
    blockMs: Long = 300000L,
    fetchBatchSize: Int = 10
) extends RequestQueueClient {

  private implicit val fmts: Formats = DefaultFormats

  val id: String = graft.canon.Ids.deterministicObjectId(s"sqlrq|$dbDir|${name.getOrElse("")}")

  /** Reference client_key: 32-char crypto-random instance id (`:119-120`). */
  val clientKey: String = graft.canon.Ids.randomObjectId(32)

  private val conn: Connection = {
    // Derby embedded; in-JVM, no server. One DB per client root.
    DriverManager.getConnection(s"jdbc:derby:$dbDir;create=true")
  }
  conn.setAutoCommit(false)

  private val pendingFetchCache = mutable.ArrayDeque.empty[QueueRequest]

  createTables()
  ensureMetadataRow()

  // ---- DDL -------------------------------------------------------------------

  private def tableExists(table: String): Boolean = {
    val rs = conn.getMetaData.getTables(null, null, table.toUpperCase, null)
    try rs.next() finally rs.close()
  }

  private def createTables(): Unit = synchronized {
    val stmts = Seq(
      "request_queue_records" ->
        """CREATE TABLE request_queue_records (
          |  request_id BIGINT NOT NULL,
          |  queue_id VARCHAR(20) NOT NULL,
          |  data CLOB NOT NULL,
          |  sequence_number BIGINT NOT NULL,
          |  is_handled BOOLEAN NOT NULL,
          |  time_blocked_until BIGINT,
          |  client_key VARCHAR(32),
          |  PRIMARY KEY (request_id, queue_id)
          |)""".stripMargin,
      "request_queue_state" ->
        """CREATE TABLE request_queue_state (
          |  queue_id VARCHAR(20) NOT NULL PRIMARY KEY,
          |  sequence_counter BIGINT NOT NULL,
          |  forefront_sequence_counter BIGINT NOT NULL
          |)""".stripMargin,
      "request_queues" ->
        """CREATE TABLE request_queues (
          |  queue_id VARCHAR(20) NOT NULL PRIMARY KEY,
          |  name VARCHAR(255),
          |  created_at BIGINT NOT NULL,
          |  accessed_at BIGINT NOT NULL,
          |  modified_at BIGINT NOT NULL,
          |  handled_request_count BIGINT NOT NULL,
          |  pending_request_count BIGINT NOT NULL,
          |  total_request_count BIGINT NOT NULL
          |)""".stripMargin
    )
    stmts.foreach { case (table, ddl) =>
      if (!tableExists(table)) { val s = conn.createStatement(); s.execute(ddl); s.close() }
    }
    if (!tableExists("request_queue_records_idx_done")) {
      val s = conn.createStatement()
      // reference idx_fetch_available; Derby has no partial indexes, the
      // full composite serves the same fetch plan
      s.execute(
        "CREATE INDEX idx_fetch_available ON request_queue_records (queue_id, is_handled, sequence_number)")
      s.execute("CREATE TABLE request_queue_records_idx_done (x INT)") // idempotence marker
      s.close()
    }
    conn.commit()
  }

  private def ensureMetadataRow(): Unit = synchronized {
    val now = clock()
    val check = conn.prepareStatement("SELECT 1 FROM request_queues WHERE queue_id = ?")
    check.setString(1, id)
    val rs = check.executeQuery()
    val exists = rs.next(); rs.close(); check.close()
    if (!exists) {
      val ins = conn.prepareStatement(
        "INSERT INTO request_queues VALUES (?, ?, ?, ?, ?, 0, 0, 0)")
      ins.setString(1, id); ins.setString(2, name.orNull)
      ins.setLong(3, now); ins.setLong(4, now); ins.setLong(5, now)
      ins.executeUpdate(); ins.close()
      val st = conn.prepareStatement("INSERT INTO request_queue_state VALUES (?, 0, -1)")
      st.setString(1, id); st.executeUpdate(); st.close()
    }
    conn.commit()
  }

  // ---- helpers ---------------------------------------------------------------

  /** C10 integer form: int(sha256(unique_key)[:15], 16). */
  private def intId(uniqueKey: String): Long =
    java.lang.Long.parseLong(QueueRequest.requestId(uniqueKey), 16)

  private def touch(modified: Boolean, deltaHandled: Long = 0, deltaPending: Long = 0,
      deltaTotal: Long = 0): Unit = {
    val now = clock()
    val st = conn.prepareStatement(
      s"""UPDATE request_queues SET accessed_at = ?${if (modified) ", modified_at = ?" else ""},
         |handled_request_count = handled_request_count + ?,
         |pending_request_count = pending_request_count + ?,
         |total_request_count = total_request_count + ?
         |WHERE queue_id = ?""".stripMargin)
    var i = 1
    st.setLong(i, now); i += 1
    if (modified) { st.setLong(i, now); i += 1 }
    st.setLong(i, deltaHandled); i += 1
    st.setLong(i, deltaPending); i += 1
    st.setLong(i, deltaTotal); i += 1
    st.setString(i, id)
    st.executeUpdate(); st.close()
  }

  /** Fetch-then-bump a state counter. `forefront` decrements from -1,
    * regular increments from 0 (reference RequestQueueStateDb defaults).
    */
  private def nextSeq(forefront: Boolean): Long = {
    val col = if (forefront) "forefront_sequence_counter" else "sequence_counter"
    val sel = conn.prepareStatement(s"SELECT $col FROM request_queue_state WHERE queue_id = ?")
    sel.setString(1, id)
    val rs = sel.executeQuery(); rs.next()
    val v = rs.getLong(1)
    rs.close(); sel.close()
    val upd = conn.prepareStatement(
      s"UPDATE request_queue_state SET $col = ? WHERE queue_id = ?")
    upd.setLong(1, if (forefront) v - 1 else v + 1); upd.setString(2, id)
    upd.executeUpdate(); upd.close()
    v
  }

  private def readRequest(rs: ResultSet, dataCol: String = "data"): QueueRequest =
    JsonMethods.parse(rs.getString(dataCol)).extract[QueueRequest]

  private def rowFor(uniqueKey: String): Option[(Boolean, Option[Long])] = {
    val st = conn.prepareStatement(
      "SELECT is_handled, time_blocked_until FROM request_queue_records WHERE queue_id = ? AND request_id = ?")
    st.setString(1, id); st.setLong(2, intId(uniqueKey))
    val rs = st.executeQuery()
    val out =
      if (rs.next()) {
        val handled = rs.getBoolean(1)
        val blocked = rs.getLong(2)
        // wasNull reports on the IMMEDIATELY preceding get — read it here
        val blockedOpt = if (rs.wasNull()) None else Some(blocked)
        Some((handled, blockedOpt))
      } else None
    rs.close(); st.close()
    out
  }

  // ---- contract --------------------------------------------------------------

  override def metadata: QueueMetadata = synchronized {
    val st = conn.prepareStatement(
      """SELECT name, created_at, accessed_at, modified_at, handled_request_count,
        |pending_request_count, total_request_count FROM request_queues WHERE queue_id = ?""".stripMargin)
    st.setString(1, id)
    val rs = st.executeQuery(); rs.next()
    val m = QueueMetadata(
      id = id, name = Option(rs.getString(1)).filter(_.nonEmpty),
      handledRequestCount = rs.getLong(5),
      pendingRequestCount = rs.getLong(6),
      totalRequestCount = rs.getLong(7),
      createdAtMs = rs.getLong(2), accessedAtMs = rs.getLong(3), modifiedAtMs = rs.getLong(4))
    rs.close(); st.close()
    conn.commit()
    m
  }

  override def addBatch(requests: Seq[QueueRequest], forefront: Boolean): AddRequestsResponse =
    synchronized {
      // module-wide Q1 in-batch rule: first occurrence wins, one report per
      // input IN INPUT ORDER (the reference SQL client silently drops later
      // in-batch duplicates, :224-231; unified on the memory semantics)
      val firstReport = mutable.HashMap.empty[String, ProcessedRequest]
      val toProcess = mutable.LinkedHashMap.empty[String, QueueRequest]
      requests.foreach(r => if (!toProcess.contains(r.uniqueKey)) toProcess(r.uniqueKey) = r)
      var newCount = 0L
      toProcess.values.foreach { request =>
        val key = request.uniqueKey
        rowFor(key) match {
          case None =>
            val seq = nextSeq(forefront)
            val ins = conn.prepareStatement(
              "INSERT INTO request_queue_records VALUES (?, ?, ?, ?, false, NULL, NULL)")
            ins.setLong(1, intId(key)); ins.setString(2, id)
            ins.setString(3, Serialization.write(request)); ins.setLong(4, seq)
            ins.executeUpdate(); ins.close()
            newCount += 1
            firstReport(key) = ProcessedRequest(key, wasAlreadyPresent = false, wasAlreadyHandled = false)
          case Some((true, _)) =>
            firstReport(key) = ProcessedRequest(key, wasAlreadyPresent = true, wasAlreadyHandled = true)
          case Some((false, blockedUntil)) =>
            val inProgress = blockedUntil.isDefined
            // pending + forefront: shift left with a fresh forefront sequence
            // (reference upsert path, :302-323); blocked or regular re-adds
            // keep their position
            if (!inProgress && forefront) {
              val seq = nextSeq(forefront = true)
              val upd = conn.prepareStatement(
                "UPDATE request_queue_records SET sequence_number = ?, data = ? WHERE queue_id = ? AND request_id = ?")
              upd.setLong(1, seq); upd.setString(2, Serialization.write(request))
              upd.setString(3, id); upd.setLong(4, intId(key))
              upd.executeUpdate(); upd.close()
            }
            firstReport(key) = ProcessedRequest(key, wasAlreadyPresent = true, wasAlreadyHandled = false)
        }
      }
      touch(modified = true, deltaPending = newCount, deltaTotal = newCount)
      conn.commit()
      val seen = mutable.HashSet.empty[String]
      val processed = requests.map { r =>
        val fr = firstReport(r.uniqueKey)
        if (seen.add(r.uniqueKey)) fr
        else ProcessedRequest(r.uniqueKey, wasAlreadyPresent = true, wasAlreadyHandled = fr.wasAlreadyHandled)
      }
      AddRequestsResponse(processed, Nil)
    }

  override def fetchNext(): Option[QueueRequest] = synchronized {
    if (pendingFetchCache.nonEmpty) return Some(pendingFetchCache.removeHead())
    val now = clock()
    val blockUntil = now + blockMs
    val sel = conn.prepareStatement(
      s"""SELECT request_id, data FROM request_queue_records
         |WHERE queue_id = ? AND is_handled = false
         |AND (time_blocked_until IS NULL OR time_blocked_until < ?)
         |ORDER BY sequence_number ASC
         |FETCH FIRST $fetchBatchSize ROWS ONLY""".stripMargin)
    sel.setString(1, id); sel.setLong(2, now)
    val rs = sel.executeQuery()
    val batch = mutable.ListBuffer.empty[(Long, QueueRequest)]
    while (rs.next()) batch += ((rs.getLong(1), readRequest(rs)))
    rs.close(); sel.close()
    if (batch.isEmpty) { conn.commit(); return None }
    val upd = conn.prepareStatement(
      "UPDATE request_queue_records SET time_blocked_until = ?, client_key = ? WHERE queue_id = ? AND request_id = ?")
    batch.foreach { case (rid, _) =>
      upd.setLong(1, blockUntil); upd.setString(2, clientKey)
      upd.setString(3, id); upd.setLong(4, rid)
      upd.addBatch()
    }
    upd.executeBatch(); upd.close()
    touch(modified = false)
    conn.commit()
    pendingFetchCache ++= batch.iterator.map(_._2).drop(1)
    Some(batch.head._2)
  }

  override def getRequest(uniqueKey: String): Option[QueueRequest] = synchronized {
    val st = conn.prepareStatement(
      "SELECT data FROM request_queue_records WHERE queue_id = ? AND request_id = ?")
    st.setString(1, id); st.setLong(2, intId(uniqueKey))
    val rs = st.executeQuery()
    val out = if (rs.next()) Some(readRequest(rs)) else None
    rs.close(); st.close()
    touch(modified = false)
    conn.commit()
    out
  }

  override def markHandled(request: QueueRequest): Option[ProcessedRequest] = synchronized {
    val stamped =
      if (request.handledAtMs.isDefined) request else request.copy(handledAtMs = Some(clock()))
    // contract-strict: only an in-progress (leased) request can be handled —
    // the module-wide Q6 rule (the reference SQL client is lenient and
    // updates any existing row, :506-536; unified on the memory semantics)
    val st = conn.prepareStatement(
      """UPDATE request_queue_records SET is_handled = true, time_blocked_until = NULL,
        |client_key = NULL, data = ? WHERE queue_id = ? AND request_id = ?
        |AND is_handled = false AND time_blocked_until IS NOT NULL""".stripMargin)
    st.setString(1, Serialization.write(stamped))
    st.setString(2, id); st.setLong(3, intId(request.uniqueKey))
    val n = st.executeUpdate(); st.close()
    if (n == 0) { conn.commit(); return None }
    pendingFetchCache.filterInPlace(_.uniqueKey != request.uniqueKey)
    touch(modified = true, deltaHandled = 1, deltaPending = -1)
    conn.commit()
    Some(ProcessedRequest(request.uniqueKey, wasAlreadyPresent = true, wasAlreadyHandled = true))
  }

  override def reclaim(request: QueueRequest, forefront: Boolean): Option[ProcessedRequest] =
    synchronized {
      val seq = nextSeq(forefront)
      // contract-strict like markHandled: only a leased request reclaims
      val st =
        if (forefront) {
          // stays blocked by THIS client and re-enters the local cache front
          val s = conn.prepareStatement(
            """UPDATE request_queue_records SET sequence_number = ?, time_blocked_until = ?,
              |client_key = ?, data = ? WHERE queue_id = ? AND request_id = ?
              |AND is_handled = false AND time_blocked_until IS NOT NULL""".stripMargin)
          s.setLong(1, seq); s.setLong(2, clock() + blockMs); s.setString(3, clientKey)
          s.setString(4, Serialization.write(request)); s.setString(5, id)
          s.setLong(6, intId(request.uniqueKey))
          s
        } else {
          val s = conn.prepareStatement(
            """UPDATE request_queue_records SET sequence_number = ?, time_blocked_until = NULL,
              |client_key = NULL, data = ? WHERE queue_id = ? AND request_id = ?
              |AND is_handled = false AND time_blocked_until IS NOT NULL""".stripMargin)
          s.setLong(1, seq); s.setString(2, Serialization.write(request)); s.setString(3, id)
          s.setLong(4, intId(request.uniqueKey))
          s
        }
      val n = st.executeUpdate(); st.close()
      if (n == 0) { conn.commit(); return None }
      touch(modified = true)
      conn.commit()
      if (forefront) pendingFetchCache.prepend(request)
      Some(ProcessedRequest(request.uniqueKey, wasAlreadyPresent = true, wasAlreadyHandled = false))
    }

  override def isEmpty: Boolean = synchronized {
    if (pendingFetchCache.nonEmpty) return false
    val st = conn.prepareStatement(
      """SELECT 1 FROM request_queue_records WHERE queue_id = ? AND is_handled = false
        |AND (time_blocked_until IS NULL OR time_blocked_until < ?)
        |FETCH FIRST 1 ROWS ONLY""".stripMargin)
    st.setString(1, id); st.setLong(2, clock())
    val rs = st.executeQuery()
    val any = rs.next()
    rs.close(); st.close(); conn.commit()
    !any
  }

  override def isFinished: Boolean = synchronized {
    if (!isEmpty) return false
    // synchronous metadata (no buffer): pending == 0 is authoritative
    metadata.pendingRequestCount == 0
  }

  override def purge(): Unit = synchronized {
    val del = conn.prepareStatement("DELETE FROM request_queue_records WHERE queue_id = ?")
    del.setString(1, id); del.executeUpdate(); del.close()
    val now = clock()
    val st = conn.prepareStatement(
      """UPDATE request_queues SET accessed_at = ?, modified_at = ?,
        |handled_request_count = 0, pending_request_count = 0, total_request_count = 0
        |WHERE queue_id = ?""".stripMargin)
    st.setLong(1, now); st.setLong(2, now); st.setString(3, id)
    st.executeUpdate(); st.close()
    conn.commit()
    pendingFetchCache.clear()
  }

  override def drop(): Unit = synchronized {
    purge()
    val st = conn.prepareStatement("DELETE FROM request_queues WHERE queue_id = ?")
    st.setString(1, id); st.executeUpdate(); st.close()
    val st2 = conn.prepareStatement("DELETE FROM request_queue_state WHERE queue_id = ?")
    st2.setString(1, id); st2.executeUpdate(); st2.close()
    conn.commit()
  }

  /** Close the embedded connection (tests; Derby keeps the DB on disk). */
  def close(): Unit = synchronized {
    try conn.close() catch { case _: java.sql.SQLException => () }
  }
}
