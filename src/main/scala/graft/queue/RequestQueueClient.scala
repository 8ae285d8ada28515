package graft.queue

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** S11 — the reference's pluggable storage-client contract for request
  * queues (`storage_clients/_base/_request_queue_client.py`): one API,
  * several interchangeable backends. The reference ships four (memory,
  * file-system, SQL, Redis); this module provides
  *
  *   - [[MemoryRequestQueueClient]]  — `_memory/_request_queue_client.py`
  *   - [[FileSystemRequestQueueClient]] — `_file_system/_request_queue_client.py`
  *     (per-request JSON files named by the C10 request-id hash)
  *   - [[SqlRequestQueueClient]] — `_sql/_request_queue_client.py` over
  *     embedded Derby (negative-sequence forefront, lease via
  *     `time_blocked_until`)
  *   - [[FrontierQueueClient]] — adapter over the event-log
  *     [[FrontierStore]], the distributed scale backend that stands in for
  *     the reference's server-backed (Redis) client in this sandbox.
  *
  * The contract is synchronous (the reference is asyncio single-loop; a
  * JVM method call is the equivalent execution model). All four backends
  * are driven by one shared contract spec and by the `s11_backend_parity`
  * oracle entry, which asserts identical dispositions across backends.
  */
trait RequestQueueClient {

  /** Storage id (C6). */
  def id: String

  /** Metadata counters (`RequestQueueMetadata`). */
  def metadata: QueueMetadata

  /** Add a batch; first occurrence of a unique key wins; returns the
    * per-request report. `forefront` prepends (LIFO among forefront adds).
    * Re-adding a pending request with `forefront=true` repositions it to
    * the very front; without it the position is unchanged.
    */
  def addBatch(requests: Seq[QueueRequest], forefront: Boolean = false): AddRequestsResponse

  /** Fetch the next request (forefront LIFO first, then FIFO) and mark it
    * in-progress. None when no pending request is available.
    */
  def fetchNext(): Option[QueueRequest]

  /** Point lookup by unique key (pending, in-progress or handled). */
  def getRequest(uniqueKey: String): Option[QueueRequest]

  /** Mark an in-progress request handled. None if it was not in progress. */
  def markHandled(request: QueueRequest): Option[ProcessedRequest]

  /** Return an in-progress request to the queue (back, or front with
    * `forefront`). The reclaimed object supersedes the fetched one (it
    * carries state accumulated in flight, e.g. `retryCount`). None if the
    * request was not in progress.
    */
  def reclaim(request: QueueRequest, forefront: Boolean = false): Option[ProcessedRequest]

  /** No pending request available to fetch. */
  def isEmpty: Boolean

  /** Empty AND nothing in progress. */
  def isFinished: Boolean

  /** Remove all requests, keep the storage usable. */
  def purge(): Unit

  /** Remove the storage entirely. */
  def drop(): Unit
}

/** The request model carried by the client contract — the subset of the
  * reference's `Request` the queue semantics act on (reference
  * `_request.py`; the full crawl row model lives in [[FrontierStore]]).
  */
final case class QueueRequest(
    uniqueKey: String,
    url: String,
    method: String = "GET",
    label: Option[String] = None,
    retryCount: Int = 0,
    handledAtMs: Option[Long] = None
) {
  /** C10 — deterministic per-request storage id: first 15 hex chars of
    * sha256(unique_key) (`_file_system/_request_queue_client.py:832-846`).
    */
  def requestId: String = QueueRequest.requestId(uniqueKey)
}

object QueueRequest {
  def requestId(uniqueKey: String): String =
    graft.canon.Hashing.sha256Hex(uniqueKey.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .substring(0, 15)

  /** Column form of the C10 request-id — pure built-ins, codegen-friendly. */
  def requestIdCol(uniqueKey: Column): Column =
    substring(sha2(uniqueKey.cast("binary"), 256), 1, 15)
}

/** Per-request add/handle report (reference `ProcessedRequest`). */
final case class ProcessedRequest(
    uniqueKey: String,
    wasAlreadyPresent: Boolean,
    wasAlreadyHandled: Boolean
)

/** Requests the backend could not process (reference `UnprocessedRequest`);
  * empty for all local backends (kept for add-report parity, Q10).
  */
final case class UnprocessedRequest(uniqueKey: String, url: String, method: String)

final case class AddRequestsResponse(
    processed: Seq[ProcessedRequest],
    unprocessed: Seq[UnprocessedRequest]
)

/** Reference `RequestQueueMetadata` counters. */
final case class QueueMetadata(
    id: String,
    name: Option[String],
    handledRequestCount: Long,
    pendingRequestCount: Long,
    totalRequestCount: Long,
    createdAtMs: Long,
    accessedAtMs: Long,
    modifiedAtMs: Long
)
