package graft.canon

import java.net.IDN
import java.nio.charset.StandardCharsets

/** URL parsing + RFC 3986 normalization, Spark-free.
  *
  * Semantics mirror the reference `normalize_url`
  * (/root/reference/src/crawlee/_utils/requests.py:16-47): trim whitespace,
  * drop `utm_*` query params, sort remaining params by (key, value), strip a
  * single trailing `/` from the path, drop the fragment unless
  * `keepFragment`, then lowercase the whole string. On top of that we apply
  * the RFC 3986 normalizations the reference inherits from yarl's parser:
  * percent-encoding normalization (decode unreserved, encode what must be
  * encoded) and punycode (IDNA) hosts.
  *
  * Golden values pinned by the reference's own tests
  * (/root/reference/tests/unit/_utils/test_requests.py:9-38).
  */
object UrlCanon {

  /** A minimally parsed URL. `authority` is host[:port] with userinfo dropped
    * only if absent in input (we keep userinfo verbatim — the reference's
    * test corpus never exercises it).
    */
  final case class ParsedUrl(
      scheme: String,
      userinfo: String,
      host: String,
      port: Int, // -1 = absent
      path: String,
      query: String, // raw, without '?'; "" = absent (we do not distinguish '?')
      fragment: String, // raw, without '#'; null = absent
      opaque: Boolean // true when there is no authority (e.g. mailto:)
  ) {
    def hasAuthority: Boolean = !opaque && host.nonEmpty
    def portOrDefault: Int =
      if (port != -1) port
      else
        scheme match {
          case "http" => 80
          case "https" => 443
          case _ => -1
        }
    def origin: String = {
      val p = if (port == -1 || port == portOrDefaultForScheme) "" else s":$port"
      s"$scheme://$host$p"
    }
    private def portOrDefaultForScheme: Int = scheme match {
      case "http" => 80; case "https" => 443; case _ => -1
    }
  }

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*):(.*)$".r

  /** Parse a URL string without normalizing (lossless enough for our ops). */
  def parse(raw: String): ParsedUrl = {
    val s = raw.trim
    var scheme = ""
    var rest = s
    s match {
      case SchemeRe(sc, r) => scheme = sc.toLowerCase; rest = r
      case _ =>
    }
    if (!rest.startsWith("//")) {
      // No authority: opaque (mailto:, or relative path)
      val (beforeFrag, frag) = splitOnce(rest, '#')
      val (path, query) = splitOnce2(beforeFrag, '?')
      return ParsedUrl(scheme, "", "", -1, path, query, frag, opaque = true)
    }
    rest = rest.substring(2)
    val endAuth = rest.indexWhere(c => c == '/' || c == '?' || c == '#')
    val (auth, tail) = if (endAuth == -1) (rest, "") else (rest.substring(0, endAuth), rest.substring(endAuth))
    var userinfo = ""
    var hostport = auth
    val at = auth.lastIndexOf('@')
    if (at != -1) { userinfo = auth.substring(0, at); hostport = auth.substring(at + 1) }
    var host = hostport
    var port = -1
    // IPv6 literal
    if (hostport.startsWith("[")) {
      val close = hostport.indexOf(']')
      if (close != -1) {
        host = hostport.substring(0, close + 1)
        val after = hostport.substring(close + 1)
        if (after.startsWith(":") && after.length > 1) port = safePort(after.substring(1))
      }
    } else {
      val colon = hostport.lastIndexOf(':')
      if (colon != -1) {
        val p = safePort(hostport.substring(colon + 1))
        if (p != -2) { host = hostport.substring(0, colon); port = p }
      }
    }
    val (beforeFrag, frag) = splitOnce(tail, '#')
    val (path, query) = splitOnce2(beforeFrag, '?')
    ParsedUrl(scheme, userinfo, host, port, path, query, frag, opaque = false)
  }

  private def safePort(s: String): Int =
    if (s.nonEmpty && s.forall(_.isDigit) && s.length <= 5) s.toInt else -2

  /** Split at first occurrence of c; second element null if c absent. */
  private def splitOnce(s: String, c: Char): (String, String) = {
    val i = s.indexOf(c)
    if (i == -1) (s, null) else (s.substring(0, i), s.substring(i + 1))
  }
  private def splitOnce2(s: String, c: Char): (String, String) = {
    val i = s.indexOf(c)
    if (i == -1) (s, "") else (s.substring(0, i), s.substring(i + 1))
  }

  // ---- RFC 3986 percent-encoding normalization -------------------------

  private def isUnreserved(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
      c == '-' || c == '.' || c == '_' || c == '~'

  // Characters allowed raw in a path segment (pchar + '/')
  private val PathSafe = "!$&'()*+,;=:@/".toSet
  // Characters allowed raw in query values (pchar + '/' + '?') minus separators we manage
  private val QuerySafe = "!$'()*,;:@/?".toSet
  private val FragSafe = "!$&'()*+,;=:@/?".toSet

  private def hex(b: Int): String = f"%%${b & 0xff}%02X"

  /** Re-encode a component: decode unreserved %XX, uppercase kept %XX,
    * percent-encode anything not in `safe`.
    */
  def requote(s: String, safe: Set[Char]): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%') {
        if (isHex(s, i + 1)) {
          val v = Integer.parseInt(s.substring(i + 1, i + 3), 16)
          val ch = v.toChar
          if (v < 128 && isUnreserved(ch)) out.append(ch)
          else out.append(hex(v))
          i += 3
        } else { out.append("%25"); i += 1 }
      } else if (isUnreserved(c) || safe.contains(c)) {
        out.append(c); i += 1
      } else if (c < 128) {
        out.append(hex(c.toInt)); i += 1
      } else {
        // UTF-8 encode
        val cp = if (Character.isHighSurrogate(c) && i + 1 < s.length) {
          val v = s.codePointAt(i); i += Character.charCount(v) - 1; v
        } else c.toInt
        new String(Character.toChars(cp)).getBytes(StandardCharsets.UTF_8).foreach(b => out.append(hex(b.toInt)))
        i += 1
      }
    }
    out.toString
  }

  private def isHex(s: String, i: Int): Boolean =
    i + 1 < s.length && isHexDigit(s.charAt(i)) && isHexDigit(s.charAt(i + 1))
  private def isHexDigit(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** Percent-decode (for query param comparison/sorting). */
  def pctDecode(s: String): String = {
    if (s.indexOf('%') == -1 && s.indexOf('+') == -1) return s
    val bytes = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && isHex(s, i + 1)) {
        bytes.write(Integer.parseInt(s.substring(i + 1, i + 3), 16)); i += 3
      } else if (c == '+') { bytes.write(' '); i += 1 }
      else { bytes.write(c.toString.getBytes(StandardCharsets.UTF_8)); i += 1 }
    }
    new String(bytes.toByteArray, StandardCharsets.UTF_8)
  }

  /** Normalize a host: lowercase + IDNA/punycode for non-ASCII. */
  def normalizeHost(host: String): String = {
    val lower = host.toLowerCase
    if (lower.forall(_ < 128)) lower
    else
      try IDN.toASCII(lower).toLowerCase
      catch { case _: Exception => lower }
  }

  /** Parse a raw query string into decoded (k, v) pairs, preserving order. */
  def parseQuery(query: String): Seq[(String, String)] =
    if (query == null || query.isEmpty) Seq.empty
    else
      query.split("&", -1).toSeq.filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('=')
        if (i == -1) (pctDecode(kv), "") else (pctDecode(kv.substring(0, i)), pctDecode(kv.substring(i + 1)))
      }

  private def encodeQueryComponent(s: String): String =
    requote(s, QuerySafe - '&' - '=' - '+')

  /** The reference's normalize_url. See object Scaladoc. */
  def normalizeUrl(url: String, keepFragment: Boolean = false): String = {
    val s = url.trim
    if (s.isEmpty) return ""
    val p = parse(s)
    if (p.opaque || !p.hasAuthority) {
      // No authority: the reference (yarl) still round-trips; we lowercase.
      val q = renderSortedQuery(p.query)
      val path0 = requote(stripOneTrailingSlash(p.path), PathSafe)
      val frag = if (keepFragment && p.fragment != null && p.fragment.nonEmpty) "#" + requote(p.fragment, FragSafe) else ""
      val qs = if (q.nonEmpty) "?" + q else ""
      val schemePart = if (p.scheme.nonEmpty) p.scheme + ":" else ""
      return (schemePart + path0 + qs + frag).toLowerCase
    }
    val host = normalizeHost(p.host)
    val port = if (p.port == -1 || p.port == defaultPort(p.scheme)) "" else s":${p.port}"
    val user = if (p.userinfo.nonEmpty) p.userinfo + "@" else ""
    val q = renderSortedQuery(p.query)
    var path = requote(stripOneTrailingSlash(p.path), PathSafe)
    val hasFrag = keepFragment && p.fragment != null
    // yarl renders an empty path as "/" when something follows the authority
    if (path.isEmpty && (q.nonEmpty || (hasFrag && p.fragment.nonEmpty))) path = "/"
    val qs = if (q.nonEmpty) "?" + q else ""
    val frag = if (hasFrag && p.fragment.nonEmpty) "#" + requote(p.fragment, FragSafe) else ""
    (s"${p.scheme}://$user$host$port$path$qs$frag").toLowerCase
  }

  private def defaultPort(scheme: String): Int = scheme match {
    case "http" => 80; case "https" => 443; case _ => -1
  }

  private def stripOneTrailingSlash(path: String): String =
    if (path.endsWith("/")) path.substring(0, path.length - 1) else path

  /** Drop utm_* params (case-sensitive startswith, matching the reference),
    * sort the rest by (key, value), re-encode.
    */
  private def renderSortedQuery(query: String): String = {
    val pairs = parseQuery(query).filterNot(_._1.startsWith("utm_"))
    val sorted = pairs.sortBy(identity)
    sorted
      .map { case (k, v) =>
        val ek = encodeQueryComponent(k)
        if (v.isEmpty) ek else ek + "=" + encodeQueryComponent(v)
      }
      .mkString("&")
  }

  // ---- absolutization (reference _utils/urls.py:29-54) ------------------

  /** Is the URL absolute (scheme + authority)? */
  def isAbsolute(url: String): Boolean = {
    val p = parse(url)
    p.scheme.nonEmpty && p.hasAuthority
  }

  /** RFC 3986 §5 reference resolution (subset: no opaque bases). Returns
    * null when the result is not absolutizable (e.g. mailto: relative).
    */
  def resolve(baseUrl: String, ref: String): String = {
    val r = ref.trim
    if (isAbsolute(r)) return r
    val b = parse(baseUrl)
    if (!b.hasAuthority) return null
    val rp = parse(r)
    if (rp.scheme.nonEmpty && rp.opaque) return null // mailto:, javascript:, tel:
    val authority = {
      val user = if (b.userinfo.nonEmpty) b.userinfo + "@" else ""
      val port = if (b.port == -1) "" else s":${b.port}"
      user + b.host + port
    }
    if (r.startsWith("//")) return s"${b.scheme}:$r"
    val (path, query, frag) = {
      if (r.isEmpty) (b.path, b.query, null)
      else if (rp.path.isEmpty && rp.query.nonEmpty) (b.path, rp.query, rp.fragment)
      else if (rp.path.isEmpty && rp.query.isEmpty && rp.fragment != null) (b.path, b.query, rp.fragment)
      else if (rp.path.startsWith("/")) (removeDotSegments(rp.path), rp.query, rp.fragment)
      else {
        val basePath = if (b.path.isEmpty) "/" else b.path
        val merged = basePath.substring(0, basePath.lastIndexOf('/') + 1) + rp.path
        (removeDotSegments(merged), rp.query, rp.fragment)
      }
    }
    val qs = if (query.nonEmpty) "?" + query else ""
    val fr = if (frag != null && frag.nonEmpty) "#" + frag else ""
    s"${b.scheme}://$authority$path$qs$fr"
  }

  /** RFC 3986 §5.2.4. */
  def removeDotSegments(path: String): String = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.substring(4); if (out.nonEmpty) out.remove(out.length - 1) }
      else if (in == "/..") { in = "/"; if (out.nonEmpty) out.remove(out.length - 1) }
      else if (in == "." || in == "..") in = ""
      else {
        val start = if (in.startsWith("/")) 1 else 0
        val next = in.indexOf('/', start)
        if (next == -1) { out += in; in = "" }
        else { out += in.substring(0, next); in = in.substring(next) }
      }
    }
    out.mkString
  }

  /** Allowed fetch/enqueue schemes (reference _utils/urls.py:19-20). */
  val AllowedSchemes: Set[String] = Set("http", "https")

  def isSupportedScheme(url: String): Boolean = AllowedSchemes.contains(parse(url).scheme)
}
