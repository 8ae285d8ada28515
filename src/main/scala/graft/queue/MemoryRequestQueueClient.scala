package graft.queue

import scala.collection.mutable

/** S11 backend 1 — in-memory request queue client (reference
  * `storage_clients/_memory/_request_queue_client.py`). Nothing is
  * persisted; useful for tests and short-lived runs.
  *
  * The reference keeps pending requests in an `OrderedDict` and moves a
  * key to the FRONT for forefront adds/reclaims. An insertion-ordered map
  * with O(1) prepend is modeled here as a deque of (key, stamp) position
  * tokens plus a per-key current stamp: (re)positioning bumps the stamp
  * and pushes a fresh token, and fetch skips tokens whose stamp is stale —
  * same ordering semantics, O(1) per operation amortized.
  */
final class MemoryRequestQueueClient(
    val name: Option[String] = None,
    clock: () => Long = () => System.currentTimeMillis()
) extends RequestQueueClient {

  val id: String = graft.canon.Ids.randomObjectId()

  // key -> request, disjoint across the three states (memory client
  // invariant: a known request lives in exactly one store)
  private val pending = mutable.HashMap.empty[String, QueueRequest]
  private val handled = mutable.HashMap.empty[String, QueueRequest]
  private val inProgress = mutable.HashMap.empty[String, QueueRequest]

  // pending order: front of deque = front of queue
  private val order = mutable.ArrayDeque.empty[(String, Long)]
  private val posStamp = mutable.HashMap.empty[String, Long]
  private var stampCounter = 0L

  private val createdAt = clock()
  private var accessedAt = createdAt
  private var modifiedAt = createdAt
  private var totalCount = 0L

  private def nextStamp(key: String): Long = {
    stampCounter += 1
    posStamp(key) = stampCounter
    stampCounter
  }

  private def touch(modified: Boolean): Unit = {
    accessedAt = clock()
    if (modified) modifiedAt = accessedAt
  }

  override def metadata: QueueMetadata = QueueMetadata(
    id = id, name = name,
    handledRequestCount = handled.size.toLong,
    pendingRequestCount = pending.size + inProgress.size.toLong,
    totalRequestCount = totalCount,
    createdAtMs = createdAt, accessedAtMs = accessedAt, modifiedAtMs = modifiedAt)

  override def addBatch(requests: Seq[QueueRequest], forefront: Boolean): AddRequestsResponse = {
    val processed = requests.map { request =>
      val key = request.uniqueKey
      val wasHandled = handled.contains(key)
      val isInProgress = inProgress.contains(key)
      val wasPresent = wasHandled || isInProgress || pending.contains(key)

      if (wasHandled) {
        ProcessedRequest(key, wasAlreadyPresent = true, wasAlreadyHandled = true)
      } else if (isInProgress) {
        ProcessedRequest(key, wasAlreadyPresent = true, wasAlreadyHandled = false)
      } else {
        // a new request joins the queue; a re-add of a still-pending key
        // keeps the ORIGINAL object (the duplicate is a freshly built one
        // that lost accumulated state, e.g. retry_count)
        if (!wasPresent) {
          pending(key) = request
          totalCount += 1
          if (!forefront) order.append((key, nextStamp(key)))
        }
        // the only effect a re-add may have is repositioning to the front
        if (forefront) order.prepend((key, nextStamp(key)))
        ProcessedRequest(key, wasAlreadyPresent = wasPresent, wasAlreadyHandled = false)
      }
    }
    touch(modified = true)
    AddRequestsResponse(processed, Nil)
  }

  override def fetchNext(): Option[QueueRequest] = {
    while (order.nonEmpty) {
      val (key, stamp) = order.removeHead()
      if (posStamp.get(key).contains(stamp) && pending.contains(key)) {
        val request = pending.remove(key).get
        posStamp.remove(key)
        inProgress(key) = request
        return Some(request)
      }
      // stale token (repositioned, fetched, handled, or purged) — skip
    }
    None
  }

  override def getRequest(uniqueKey: String): Option[QueueRequest] = {
    touch(modified = false)
    pending.get(uniqueKey).orElse(inProgress.get(uniqueKey)).orElse(handled.get(uniqueKey))
  }

  override def markHandled(request: QueueRequest): Option[ProcessedRequest] = {
    if (!inProgress.contains(request.uniqueKey)) return None
    val stamped =
      if (request.handledAtMs.isDefined) request else request.copy(handledAtMs = Some(clock()))
    handled(request.uniqueKey) = stamped
    inProgress.remove(request.uniqueKey)
    touch(modified = true)
    Some(ProcessedRequest(request.uniqueKey, wasAlreadyPresent = true, wasAlreadyHandled = true))
  }

  override def reclaim(request: QueueRequest, forefront: Boolean): Option[ProcessedRequest] = {
    if (!inProgress.contains(request.uniqueKey)) return None
    inProgress.remove(request.uniqueKey)
    // unlike a re-add, a reclaim SUPERSEDES: the passed object carries
    // state accumulated while in progress
    pending(request.uniqueKey) = request
    val token = (request.uniqueKey, nextStamp(request.uniqueKey))
    if (forefront) order.prepend(token) else order.append(token)
    touch(modified = true)
    Some(ProcessedRequest(request.uniqueKey, wasAlreadyPresent = true, wasAlreadyHandled = false))
  }

  override def isEmpty: Boolean = pending.isEmpty

  override def isFinished: Boolean = isEmpty && inProgress.isEmpty

  override def purge(): Unit = {
    pending.clear(); handled.clear(); inProgress.clear()
    order.clear(); posStamp.clear()
    totalCount = 0
    touch(modified = true)
  }

  override def drop(): Unit = purge()
}
