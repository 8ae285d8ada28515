package graft.media

import org.apache.spark.unsafe.types.UTF8String

/** Charset detection for raw fetched payloads — the decision every HTML
  * ingest makes before any text op. Deterministic three-tier rule, spec'd
  * so the oracle can replay it:
  *
  *   1. byte-order mark: UTF-32LE/BE, UTF-16LE/BE, UTF-8 BOMs win outright;
  *   2. declared: the first `charset=` in the leading `ScanWindow` bytes,
  *      ASCII-case-insensitive (covers `<meta charset="x">`,
  *      `http-equiv` content values, and XML prologs), value up to the
  *      first quote/space/semicolon/`>`;
  *   3. sniffed: a full UTF-8 validation pass over the window — pure ASCII
  *      ⇒ us-ascii, valid multi-byte ⇒ utf-8, invalid ⇒ windows-1252 (the
  *      WHATWG web-default fallback).
  *
  * `source` names which tier fired ("bom" / "declared" / "ascii" / "utf8"
  * / "fallback") so curation can weight trust accordingly.
  */
object CharsetSniff {

  val ScanWindow = 2048

  def detect(b: Array[Byte]): String = detectWithSource(b)._1

  def source(b: Array[Byte]): String = detectWithSource(b)._2

  def detectWithSource(b: Array[Byte]): (String, String) = {
    if (b == null || b.length == 0) return ("us-ascii", "ascii")
    val bom = bomCharset(b)
    if (bom != null) return (bom, "bom")
    val declared = declaredCharset(b)
    if (declared != null) return (declared, "declared")
    sniff(b)
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  private def bomCharset(b: Array[Byte]): String = {
    val n = b.length
    if (n >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xfe && u8(b, 2) == 0 && u8(b, 3) == 0)
      "utf-32le"
    else if (n >= 4 && u8(b, 0) == 0 && u8(b, 1) == 0 && u8(b, 2) == 0xfe && u8(b, 3) == 0xff)
      "utf-32be"
    else if (n >= 2 && u8(b, 0) == 0xff && u8(b, 1) == 0xfe) "utf-16le"
    else if (n >= 2 && u8(b, 0) == 0xfe && u8(b, 1) == 0xff) "utf-16be"
    else if (n >= 3 && u8(b, 0) == 0xef && u8(b, 1) == 0xbb && u8(b, 2) == 0xbf) "utf-8"
    else null
  }

  private def lower(c: Int): Int = if (c >= 'A' && c <= 'Z') c + 32 else c

  private def declaredCharset(b: Array[Byte]): String = {
    val n = math.min(b.length, ScanWindow)
    val pat = "charset="
    var i = 0
    while (i + pat.length <= n) {
      var j = 0
      while (j < pat.length && lower(u8(b, i + j)) == pat.charAt(j)) j += 1
      if (j == pat.length) {
        var k = i + pat.length
        // optional quote
        if (k < n && (u8(b, k) == '"' || u8(b, k) == '\'')) k += 1
        val start = k
        while (k < n && {
          val c = u8(b, k)
          c != '"' && c != '\'' && c != ' ' && c != ';' && c != '>' &&
            c != '/' && c != '\r' && c != '\n' && c != '\t'
        }) k += 1
        if (k > start) {
          val sb = new StringBuilder(k - start)
          var m = start
          while (m < k) { sb.append(lower(u8(b, m)).toChar); m += 1 }
          return sb.toString
        }
      }
      i += 1
    }
    null
  }

  /** (charset, source) from UTF-8 validation over the scan window. */
  private def sniff(b: Array[Byte]): (String, String) = {
    val n = math.min(b.length, ScanWindow)
    var i = 0
    var sawMulti = false
    while (i < n) {
      val c = u8(b, i)
      if (c < 0x80) i += 1
      else {
        val len =
          if ((c & 0xe0) == 0xc0 && c >= 0xc2) 2
          else if ((c & 0xf0) == 0xe0) 3
          else if ((c & 0xf8) == 0xf0 && c <= 0xf4) 4
          else return ("windows-1252", "fallback")
        // a sequence may straddle the window boundary (validated from the
        // payload); one cut off by the END OF PAYLOAD is invalid UTF-8
        if (i + len > b.length) return ("windows-1252", "fallback")
        var k = 1
        while (k < len) {
          if ((u8(b, i + k) & 0xc0) != 0x80) return ("windows-1252", "fallback")
          k += 1
        }
        sawMulti = true
        i += len
      }
    }
    if (sawMulti) ("utf-8", "utf8") else ("us-ascii", "ascii")
  }

  def detectUTF8(b: Array[Byte]): UTF8String = UTF8String.fromString(detect(b))

  def sourceUTF8(b: Array[Byte]): UTF8String = UTF8String.fromString(source(b))
}
