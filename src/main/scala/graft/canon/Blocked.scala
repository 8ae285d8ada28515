package graft.canon

/** Blocked-content detection (F11) — reference _utils/blocked.py:1-29 and
  * the HTTP crawler's blocked check
  * (_abstract_http_crawler.py:316-332: a 200 response whose DOM matches a
  * retry selector raises SessionError → the request is retried on a fresh
  * session).
  *
  * Text analogue of the CSS-selector probe: each selector's distinctive
  * URL/id marker is checked with a `contains` over the body — the operator
  * shape (fetch-side classification hook feeding the retry path) is the
  * point; a DOM engine would slot into `selectorMarkers` unchanged.
  */
object Blocked {

  /** (selector, distinctive marker searched in the body). */
  val RetryCssSelectors: Seq[(String, String)] = Seq(
    ("#turnstile-wrapper iframe[src^=\"https://challenges.cloudflare.com\"]",
      "challenges.cloudflare.com"),
    ("div#infoDiv0 a[href*=\"//www.google.com/policies/terms/\"]",
      "//www.google.com/policies/terms/"),
    ("iframe[src*=\"_Incapsula_Resource\"]", "_Incapsula_Resource")
  )

  /** Proxy-level errors that should rotate (reference ROTATE_PROXY_ERRORS). */
  val RotateProxyErrors: Seq[String] = Seq(
    "ECONNRESET", "ECONNREFUSED", "ERR_PROXY_CONNECTION_FAILED",
    "ERR_TUNNEL_CONNECTION_FAILED", "Proxy responded with",
    "unsuccessful tunnel", "TunnelUnsuccessful"
  )

  /** Status codes treated as session-blocked (reference session handling:
    * 401/403 blocked identity; 429 is the throttle path and is NOT a
    * session block).
    */
  val BlockedStatusCodes: Set[Int] = Set(401, 403)

  def isBlockedStatus(status: Int): Boolean = BlockedStatusCodes.contains(status)

  /** None = not blocked; Some(reason) mirrors SessionError's message. */
  def blockedReason(status: Int, body: String): Option[String] =
    if (isBlockedStatus(status)) Some(s"blocked status $status")
    else if (body == null) None
    else RetryCssSelectors.collectFirst {
      case (sel, marker) if body.contains(marker) => s"blocked selector $sel"
    }
}
