package graft.queue

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.collection.mutable

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.Serialization

/** S11 backend 2 — file-system request queue client (reference
  * `storage_clients/_file_system/_request_queue_client.py`). Each request
  * is one JSON file under the queue directory,
  *
  *   {root}/{requestId}.json       with requestId = sha256(unique_key)[:15]
  *
  * — the C10 filename hash (`:832-846`) — plus a recoverable state file
  * (`state.json`: sequence counters, forefront/regular seq maps,
  * in-progress and handled key sets, `:39-59`) and `__metadata__.json`.
  * Every mutation persists state atomically (temp + rename), so a process
  * restart resumes with ordering, in-progress and handled status intact —
  * the reference's `RecoverableState` semantics.
  *
  * Fetch order: forefront requests newest-first (seq DESC), then regular
  * oldest-first (seq ASC) (`_refresh_cache`, `:712-747`). The reference
  * additionally keeps a 100k-request read cache in front of this order; a
  * cache is a perf layer with identical semantics (reclaims and forefront
  * adds re-enter it in seq order), so this implementation recomputes the
  * head from state directly.
  */
final class FileSystemRequestQueueClient(
    rootDir: String,
    val name: Option[String] = None,
    clock: () => Long = () => System.currentTimeMillis()
) extends RequestQueueClient {

  private implicit val fmts: Formats = DefaultFormats

  private val root: Path = Paths.get(rootDir)
  Files.createDirectories(root)

  private val statePath = root.resolve("state.json")
  private val metadataPath = root.resolve("__metadata__.json")

  val id: String = graft.canon.Ids.deterministicObjectId(s"fsrq|$rootDir|${name.getOrElse("")}")

  // ---- recoverable state (RequestQueueState, reference :39-59) -------------
  private var sequenceCounter = 0L
  private var forefrontSequenceCounter = 0L
  private val forefrontRequests = mutable.HashMap.empty[String, Long]
  private val regularRequests = mutable.HashMap.empty[String, Long]
  private val inProgressRequests = mutable.HashSet.empty[String]
  private val handledRequests = mutable.HashSet.empty[String]

  private var createdAt = clock()
  private var accessedAt = createdAt
  private var modifiedAt = createdAt
  private var handledCount = 0L
  private var pendingCount = 0L
  private var totalCount = 0L

  recoverState()

  // ---- file plumbing --------------------------------------------------------
  private def requestPath(uniqueKey: String): Path =
    root.resolve(s"${QueueRequest.requestId(uniqueKey)}.json")

  private def atomicWrite(path: Path, content: String): Unit = {
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  private def writeRequestFile(request: QueueRequest): Unit =
    atomicWrite(requestPath(request.uniqueKey), Serialization.write(request))

  private def parseRequestFile(uniqueKey: String): Option[QueueRequest] = {
    val p = requestPath(uniqueKey)
    if (!Files.exists(p)) None
    else JsonMethods.parse(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
      .extractOpt[QueueRequest]
  }

  private def persistState(): Unit = {
    val state = Map(
      "sequence_counter" -> sequenceCounter,
      "forefront_sequence_counter" -> forefrontSequenceCounter,
      "forefront_requests" -> forefrontRequests.toMap,
      "regular_requests" -> regularRequests.toMap,
      "in_progress_requests" -> inProgressRequests.toSeq.sorted,
      "handled_requests" -> handledRequests.toSeq.sorted
    )
    atomicWrite(statePath, Serialization.write(state))
    val meta = Map(
      "id" -> id, "name" -> name.getOrElse(""),
      "created_at" -> createdAt, "accessed_at" -> accessedAt, "modified_at" -> modifiedAt,
      "handled_request_count" -> handledCount,
      "pending_request_count" -> pendingCount,
      "total_request_count" -> totalCount
    )
    atomicWrite(metadataPath, Serialization.write(meta))
  }

  private def recoverState(): Unit = {
    if (!Files.exists(statePath)) return
    val j = JsonMethods.parse(new String(Files.readAllBytes(statePath), StandardCharsets.UTF_8))
    sequenceCounter = (j \ "sequence_counter").extract[Long]
    forefrontSequenceCounter = (j \ "forefront_sequence_counter").extract[Long]
    forefrontRequests ++= (j \ "forefront_requests").extract[Map[String, Long]]
    regularRequests ++= (j \ "regular_requests").extract[Map[String, Long]]
    inProgressRequests ++= (j \ "in_progress_requests").extract[Seq[String]]
    handledRequests ++= (j \ "handled_requests").extract[Seq[String]]
    if (Files.exists(metadataPath)) {
      val m = JsonMethods.parse(new String(Files.readAllBytes(metadataPath), StandardCharsets.UTF_8))
      createdAt = (m \ "created_at").extract[Long]
      accessedAt = (m \ "accessed_at").extract[Long]
      modifiedAt = (m \ "modified_at").extract[Long]
      handledCount = (m \ "handled_request_count").extract[Long]
      pendingCount = (m \ "pending_request_count").extract[Long]
      totalCount = (m \ "total_request_count").extract[Long]
    }
  }

  private def touch(modified: Boolean): Unit = {
    accessedAt = clock()
    if (modified) modifiedAt = accessedAt
  }

  private def isInQueue(key: String): Boolean =
    forefrontRequests.contains(key) || regularRequests.contains(key)

  private def isPending(key: String): Boolean =
    !handledRequests.contains(key) && !inProgressRequests.contains(key)

  // ---- contract --------------------------------------------------------------
  override def metadata: QueueMetadata = QueueMetadata(
    id, name, handledCount, pendingCount, totalCount, createdAt, accessedAt, modifiedAt)

  override def addBatch(requests: Seq[QueueRequest], forefront: Boolean): AddRequestsResponse = {
    // In-batch duplicates: the reference FS client keys `requests_to_enqueue`
    // by unique key with dict-overwrite (last occurrence wins, no report row
    // for the earlier one, :338-366) while its memory client keeps the FIRST
    // and reports every input in input order (:150-200). This module unifies
    // on the memory semantics across all backends — the same rule
    // FrontierStore's Q1 add-report follows.
    val firstReport = mutable.HashMap.empty[String, ProcessedRequest]
    val toEnqueue = mutable.LinkedHashMap.empty[String, QueueRequest]
    requests.foreach { request =>
      val key = request.uniqueKey
      if (!firstReport.contains(key) && !toEnqueue.contains(key)) {
        if (handledRequests.contains(key))
          firstReport(key) = ProcessedRequest(key, wasAlreadyPresent = true, wasAlreadyHandled = true)
        else if (inProgressRequests.contains(key) || (!forefront && isInQueue(key)))
          firstReport(key) = ProcessedRequest(key, wasAlreadyPresent = true, wasAlreadyHandled = false)
        else toEnqueue(key) = request
      }
    }
    toEnqueue.values.foreach { request =>
      val key = request.uniqueKey
      if (!isInQueue(key)) {
        if (forefront) {
          forefrontRequests(key) = forefrontSequenceCounter
          forefrontSequenceCounter += 1
        } else {
          regularRequests(key) = sequenceCounter
          sequenceCounter += 1
        }
        writeRequestFile(request)
        totalCount += 1
        pendingCount += 1
        firstReport(key) = ProcessedRequest(key, wasAlreadyPresent = false, wasAlreadyHandled = false)
      } else {
        // already pending + forefront=true: reposition to the very front
        regularRequests.remove(key)
        forefrontRequests(key) = forefrontSequenceCounter
        forefrontSequenceCounter += 1
        firstReport(key) = ProcessedRequest(key, wasAlreadyPresent = true, wasAlreadyHandled = false)
      }
    }
    touch(modified = true)
    persistState()
    val seen = mutable.HashSet.empty[String]
    val processed = requests.map { r =>
      val fr = firstReport(r.uniqueKey)
      if (seen.add(r.uniqueKey)) fr
      else ProcessedRequest(r.uniqueKey, wasAlreadyPresent = true, wasAlreadyHandled = fr.wasAlreadyHandled)
    }
    AddRequestsResponse(processed, Nil)
  }

  override def fetchNext(): Option[QueueRequest] = {
    // forefront newest-first, then regular oldest-first (:724-734)
    val head = forefrontRequests.iterator.filter(kv => isPending(kv._1)).maxByOption(_._2)
      .orElse(regularRequests.iterator.filter(kv => isPending(kv._1)).minByOption(_._2))
    head.flatMap { case (key, _) =>
      parseRequestFile(key).map { request =>
        inProgressRequests += key
        persistState()
        request
      }
    }
  }

  override def getRequest(uniqueKey: String): Option[QueueRequest] = {
    touch(modified = false)
    parseRequestFile(uniqueKey)
  }

  override def markHandled(request: QueueRequest): Option[ProcessedRequest] = {
    val key = request.uniqueKey
    if (!inProgressRequests.contains(key)) return None
    if (!Files.exists(requestPath(key))) return None
    val stamped =
      if (request.handledAtMs.isDefined) request else request.copy(handledAtMs = Some(clock()))
    writeRequestFile(stamped)
    // drop from the pending maps: state stays sized by the BACKLOG, not by
    // every request ever processed (reference :519-524)
    inProgressRequests -= key
    forefrontRequests.remove(key)
    regularRequests.remove(key)
    handledRequests += key
    handledCount += 1
    pendingCount -= 1
    touch(modified = true)
    persistState()
    Some(ProcessedRequest(key, wasAlreadyPresent = true, wasAlreadyHandled = true))
  }

  override def reclaim(request: QueueRequest, forefront: Boolean): Option[ProcessedRequest] = {
    val key = request.uniqueKey
    if (!inProgressRequests.contains(key)) return None
    if (!Files.exists(requestPath(key))) return None
    if (forefront) {
      regularRequests.remove(key)
      forefrontRequests(key) = forefrontSequenceCounter
      forefrontSequenceCounter += 1
    } else {
      forefrontRequests.remove(key)
      regularRequests(key) = sequenceCounter
      sequenceCounter += 1
    }
    writeRequestFile(request) // the reclaimed object supersedes
    inProgressRequests -= key
    touch(modified = true)
    persistState()
    Some(ProcessedRequest(key, wasAlreadyPresent = true, wasAlreadyHandled = false))
  }

  override def isEmpty: Boolean =
    !(forefrontRequests.keysIterator ++ regularRequests.keysIterator).exists(isPending)

  override def isFinished: Boolean = isEmpty && inProgressRequests.isEmpty

  override def purge(): Unit = {
    listRequestFiles().foreach(Files.deleteIfExists)
    forefrontRequests.clear(); regularRequests.clear()
    inProgressRequests.clear(); handledRequests.clear()
    sequenceCounter = 0; forefrontSequenceCounter = 0
    handledCount = 0; pendingCount = 0; totalCount = 0
    touch(modified = true)
    persistState()
  }

  override def drop(): Unit = {
    listRequestFiles().foreach(Files.deleteIfExists)
    Files.deleteIfExists(statePath)
    Files.deleteIfExists(metadataPath)
    Files.deleteIfExists(root)
  }

  private def listRequestFiles(): Seq[Path] = {
    val stream = Files.list(root)
    try {
      import scala.jdk.CollectionConverters._
      stream.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".json") &&
          p.getFileName.toString != "state.json" &&
          p.getFileName.toString != "__metadata__.json")
        .toSeq
    } finally stream.close()
  }
}
