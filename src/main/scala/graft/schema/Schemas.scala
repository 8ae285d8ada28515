package graft.schema

/** Core row types (SURVEY.md §1).
  *
  * `FrontierEvent` is one row of the append-only frontier event log — the
  * Spark-native form of the reference's three disjoint request dicts
  * (/root/reference/src/crawlee/storage_clients/_memory/_request_queue_client.py:44-58).
  * Current queue state = latest event per unique_key (status-as-log,
  * SURVEY.md §7.4.5), which keeps every commit append-only (atomic via the
  * manifest) and makes resume = "read the manifest".
  */
object Status {
  val Pending = 0
  val InProgress = 1
  val Handled = 2
}

/** Lifecycle marker mirroring the reference RequestState IntEnum
  * (/root/reference/src/crawlee/_request.py:21-31).
  */
object RequestState {
  val Unprocessed = 0
  val BeforeNav = 1
  val AfterNav = 4
  val Done = 6
  val Error = 5
  val Skipped = 7
}

final case class FrontierEvent(
    unique_key: String,
    key64: Long, // xxhash64(unique_key) — north-rule key space
    url: String,
    host: String,
    host_hash: Long, // xxhash64(host) — bucket routing
    label: String,
    method: String,
    depth: Int,
    retry_count: Int,
    no_retry: Boolean,
    forefront: Boolean,
    seq: Long, // FIFO position (regular adds)
    forefront_seq: Long, // LIFO position (forefront adds); -1 when regular
    status: Int, // Status.*
    state: Int, // RequestState.*
    handled_ok: Boolean, // terminal disposition (success vs failed/skipped)
    lock_expires_at: Long, // epoch millis; 0 = no lease
    event_seq: Long, // commit-ordered event counter (latest wins)
    batch_id: Long // micro-batch that wrote the event
)

/** One page of the deterministic synthetic web (FIXTURES.md §2). */
final case class PageRow(
    url: String, // normalized canonical URL (fetch key)
    host: String,
    status: Int, // 200 / 404 / 500 / 429 / 301
    redirect_to: String, // non-null when status == 301
    base_href: String, // optional <base href> override
    body: String, // HTML with <a href> links (drives the L1 extractor)
    links: Array[String], // the same links, pre-extracted (bench path)
    image_ids: Array[String]
)

/** robots.txt fixture row (FIXTURES.md §3). */
final case class RobotsRow(host: String, status: Int, body: String)

/** The BASELINE.json input_hint payload row (FIXTURES.md §1). */
final case class ImageRow(
    image_id: String,
    bytes: Array[Byte],
    w: Int,
    h: Int,
    fmt: String,
    caption: String,
    phash: Long
)

/** Per-request crawl result record (drives SURVEY §2.8 statistics). */
final case class RequestLogRow(
    unique_key: String,
    url: String,
    host: String,
    batch_id: Long,
    status_code: Int,
    outcome: String, // handled | retry | fail | throttle | skipped_robots | skipped_strategy
    retry_count: Int,
    duration_ms: Long,
    n_links_extracted: Int,
    n_images_emitted: Int
)
