package graft.sessions

import scala.collection.mutable

/** One cookie record — the reference's `CookieParam`
  * (sessions/_cookies.py:17-42).
  */
final case class CookieParam(
    name: String,
    value: String,
    domain: String = "",
    path: String = "/",
    secure: Boolean = false,
    httpOnly: Boolean = false,
    expires: Option[Long] = None,
    sameSite: Option[String] = None // Lax | None | Strict
) extends Serializable {
  def toJson: String = {
    val sb = new StringBuilder("{")
    sb.append("\"name\":").append(SessionCookies.q(name))
    sb.append(",\"value\":").append(SessionCookies.q(value))
    sb.append(",\"domain\":").append(SessionCookies.q(domain))
    sb.append(",\"path\":").append(SessionCookies.q(path))
    sb.append(",\"secure\":").append(secure)
    sb.append(",\"http_only\":").append(httpOnly)
    expires.foreach(e => sb.append(",\"expires\":").append(e))
    sameSite.foreach(s => sb.append(",\"same_site\":").append(SessionCookies.q(s)))
    sb.append("}").toString
  }
}

/** Per-session cookie jar — reference `SessionCookies`
  * (sessions/_cookies.py:60-277): cookies are keyed by (name, domain,
  * path) — setting an existing key overwrites; `same_site` accepts only
  * Lax/None/Strict (":279-283"); equality is by the cookie SET, order-free
  * (":262-277"). `cookiesFor(url)` applies browser matching rules:
  * domain exact or dot-suffix match, path prefix match, and secure-only
  * over https.
  */
final class SessionCookies extends Serializable {

  private val jar = mutable.LinkedHashMap.empty[(String, String, String), CookieParam]

  def set(
      name: String,
      value: String,
      domain: String = "",
      path: String = "/",
      secure: Boolean = false,
      httpOnly: Boolean = false,
      expires: Option[Long] = None,
      sameSite: Option[String] = None
  ): Unit = {
    require(sameSite.forall(Set("Lax", "None", "Strict")),
      s"Invalid `same_site` value: ${sameSite.orNull}. Must be one of Lax, None, Strict")
    jar((name, domain, path)) = CookieParam(name, value, domain, path, secure, httpOnly, expires, sameSite)
  }

  def setCookies(cookies: Seq[CookieParam]): Unit =
    cookies.foreach(c => set(c.name, c.value, c.domain, c.path, c.secure, c.httpOnly, c.expires, c.sameSite))

  /** First cookie with this name regardless of domain/path (the reference's
    * `__getitem__`, ":242-247").
    */
  def get(name: String): Option[String] =
    jar.valuesIterator.find(_.name == name).map(_.value)

  /** All cookies, deterministic (name, domain, path) order (the reference's
    * get_cookies_as_dicts sorted view).
    */
  def getCookiesAsDicts: Seq[CookieParam] =
    jar.values.toSeq.sortBy(c => (c.name, c.domain, c.path))

  /** Cookies applicable to a request URL: domain exact or `.suffix` match,
    * path prefix match, secure flag honored.
    */
  def cookiesFor(url: String): Seq[CookieParam] = {
    val u = new java.net.URI(url)
    val host = Option(u.getHost).getOrElse("").toLowerCase
    val path = if (u.getPath == null || u.getPath.isEmpty) "/" else u.getPath
    val isHttps = u.getScheme == "https"
    getCookiesAsDicts.filter { c =>
      // host-only (no leading dot): exact host match; dot-prefixed:
      // the host itself or any subdomain
      val d = c.domain.toLowerCase
      val domainOk =
        d.isEmpty || d == host ||
          (d.startsWith(".") && (host == d.drop(1) || host.endsWith(d)))
      val pathOk = path == c.path || path.startsWith(if (c.path.endsWith("/")) c.path else c.path + "/")
      domainOk && pathOk && (!c.secure || isHttps)
    }
  }

  def size: Int = jar.size
  def isEmpty: Boolean = jar.isEmpty

  /** Deep copy (the reference's __deepcopy__, ":231-234"). */
  def copy(): SessionCookies = {
    val c = new SessionCookies
    c.setCookies(getCookiesAsDicts)
    c
  }

  override def equals(other: Any): Boolean = other match {
    case o: SessionCookies => o.getCookiesAsDicts.toSet == getCookiesAsDicts.toSet
    case _ => false
  }
  override def hashCode(): Int = getCookiesAsDicts.toSet.hashCode()

  def toJson: String = getCookiesAsDicts.map(_.toJson).mkString("[", ",", "]")
}

object SessionCookies {
  private[sessions] def q(s: String): String = graft.util.Json.quote(s)

  import graft.util.Json

  /** Parsed JSON object -> cookie (escape-aware: values containing `"`,
    * `]`, `}` or control chars round-trip exactly — ADVICE r3 #5).
    */
  private[sessions] def cookieFromValue(v: Any): CookieParam = {
    val o = Json.obj(v)
    def s(k: String, dflt: String): String = o.get(k).map(Json.str).getOrElse(dflt)
    CookieParam(
      name = s("name", ""),
      value = s("value", ""),
      domain = s("domain", ""),
      path = s("path", "/"),
      secure = o.get("secure").exists(Json.bool),
      httpOnly = o.get("http_only").exists(Json.bool),
      expires = o.get("expires").map(Json.long),
      sameSite = o.get("same_site").map(Json.str)
    )
  }

  def cookieFromJson(json: String): CookieParam = cookieFromValue(Json.parse(json))

  def fromJson(json: String): SessionCookies = {
    val c = new SessionCookies
    c.setCookies(Json.arr(Json.parse(json)).map(cookieFromValue))
    c
  }
}
