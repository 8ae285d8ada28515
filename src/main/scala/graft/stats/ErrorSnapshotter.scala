package graft.stats

import graft.storage.KeyValueStore

/** Error snapshots (reference statistics/_error_snapshotter.py:1-77): when
  * a request fails, the fetched page body is persisted to a key-value
  * store under a DEDUPED name derived from the error location hash and the
  * first characters of the error message — identical errors collapse onto
  * one snapshot key (the reference's test: one error retried three times
  * leaves exactly one ERROR_SNAPSHOT_*.html record).
  *
  * Name construction mirrors the reference exactly:
  *   ERROR_SNAPSHOT_{sha1(file_and_line)[:30]}_{error_message[:30]}
  * sanitized to [A-Za-z0-9!-_.] and truncated to 250 chars, + ".html".
  */
final class ErrorSnapshotter(kvs: KeyValueStore) {

  import ErrorSnapshotter._

  /** Persist one snapshot; returns the KVS key. Also records a sidecar
    * ".json" with the wildcarded error GROUP (the A6 link: error groups →
    * snapshot evidence).
    */
  def capture(errorMessage: String, fileAndLine: String, html: String,
      url: String = "", status: Int = 0): String = {
    val base = baseName(errorMessage, fileAndLine)
    val key = base + ".html"
    kvs.setValue(key, (if (html == null) "" else html).getBytes("UTF-8"), "text/html")
    val meta =
      s"""{"message":${graft.util.Json.quote(errorMessage)},""" +
        s""""group":${graft.util.Json.quote(wildcardGroup(errorMessage))},""" +
        s""""url":${graft.util.Json.quote(url)},"status":$status}"""
    kvs.setJson(base + ".json", meta)
    key
  }

  def persist(): Unit = kvs.persist()

  def snapshotKeys: Seq[String] = kvs.iterateKeys().filter(_.startsWith(SnapshotPrefix))
}

object ErrorSnapshotter {

  val MaxErrorCharacters = 30
  val MaxHashLength = 30
  val MaxFilenameLength = 250
  val BaseMessage = "An error occurred"
  val SnapshotPrefix = "ERROR_SNAPSHOT"

  private def allowed(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') ||
      c == '!' || c == '-' || c == '_' || c == '.'

  def sanitizeFilename(s: String): String =
    s.take(MaxFilenameLength).filter(allowed)

  def sha1Hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
  }

  def baseName(errorMessage: String, fileAndLine: String): String = {
    val hashed = sha1Hex(fileAndLine).take(MaxHashLength)
    val msg = Option(errorMessage).filter(_.nonEmpty).getOrElse(BaseMessage).take(MaxErrorCharacters)
    sanitizeFilename(s"${SnapshotPrefix}_${hashed}_$msg")
  }

  /** The A6 wildcard generalization (statistics/_error_tracker.py, mirrored
    * from graft.stats.Statistics.errorGroups' regexp chain): quoted spans,
    * long hex runs, then digit runs become `***`.
    */
  def wildcardGroup(message: String): String =
    message
      .replaceAll("'[^']*'", "'***'")
      .replaceAll("\\b[0-9a-fA-F]{8,}\\b", "***")
      .replaceAll("\\b\\d+\\b", "***")
}
