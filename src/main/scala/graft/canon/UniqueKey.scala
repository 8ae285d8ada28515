package graft.canon

import java.nio.charset.StandardCharsets

/** `compute_unique_key` — the dedup identity of a request.
  *
  * Mirrors /root/reference/src/crawlee/_utils/requests.py:50-128 exactly:
  * default form is the normalized URL; extended form is
  * `METHOD|headersHash|payloadHash[|session]|normalizedUrl` where the hashes
  * are 8-hex-char sha256 prefixes and only the whitelisted headers
  * {accept, accept-language, authorization, content-type} participate.
  * Golden values pinned by
  * /root/reference/tests/unit/_utils/test_requests.py:41-125.
  */
object UniqueKey {

  val WhitelistedHeaders: Set[String] =
    Set("accept", "accept-language", "authorization", "content-type")

  def payloadHash(payload: Array[Byte]): String =
    Hashing.shortHash(if (payload == null) Array.emptyByteArray else payload)

  /** `headers` must already be normalized the way the reference's HttpHeaders
    * does at construction (/root/reference/src/crawlee/_types.py:52-98):
    * lowercased keys, trimmed values, key-sorted iteration.
    */
  def headersHash(headers: Seq[(String, String)]): String = {
    val normalized =
      if (headers == null) Array.emptyByteArray
      else {
        val filtered = headers
          .map { case (k, v) => (k.trim.toLowerCase, v.trim) }
          .filter { case (k, _) => WhitelistedHeaders.contains(k) }
          .sortBy(_._1)
        filtered.map { case (k, v) => s"$k:$v" }.mkString("|").getBytes(StandardCharsets.UTF_8)
      }
    Hashing.shortHash(normalized)
  }

  def compute(
      url: String,
      method: String = "GET",
      headers: Seq[(String, String)] = null,
      payload: Array[Byte] = null,
      sessionId: String = null,
      keepUrlFragment: Boolean = false,
      useExtendedUniqueKey: Boolean = false
  ): String = {
    val normalizedUrl =
      try UrlCanon.normalizeUrl(url, keepUrlFragment)
      catch { case _: Exception => url }
    val normalizedMethod = method.toUpperCase
    if (useExtendedUniqueKey) {
      val pHash = payloadHash(payload)
      val hHash = headersHash(headers)
      val session = if (sessionId == null) "" else sessionId.toLowerCase
      val extended =
        if (session.nonEmpty) s"$normalizedMethod|$hHash|$pHash|$session"
        else s"$normalizedMethod|$hHash|$pHash"
      s"$extended|$normalizedUrl"
    } else normalizedUrl
  }

  /** North-rule 64-bit key space: xxhash64 of the unique key (matches
    * Spark's `xxhash64` builtin, seed 42).
    */
  def key64(uniqueKey: String): Long = Hashing.xxh64(uniqueKey)
}
