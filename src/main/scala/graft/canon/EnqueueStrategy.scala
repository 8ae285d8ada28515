package graft.canon

/** Enqueue strategy predicate — which discovered URLs are eligible relative
  * to the page they came from.
  *
  * Mirrors /root/reference/src/crawlee/_utils/urls.py:72-140:
  *   - scheme must be http/https (reason = unsupported-scheme message)
  *   - 'all': any host
  *   - 'same-hostname': exact host equality
  *   - 'same-domain': equal registrable domain (public-suffix aware)
  *   - 'same-origin': host + scheme + port equality
  * Host-less targets fail every strategy except 'all'.
  */
object EnqueueStrategy {

  val All = "all"
  val SameHostname = "same-hostname"
  val SameDomain = "same-domain"
  val SameOrigin = "same-origin"

  val UnsupportedSchemeMessage = "unsupported URL scheme (only http and https are allowed)."

  /** (ok, reason). reason is null when ok. */
  def filterUrl(target: String, strategy: String, origin: String, psl: PublicSuffix = PublicSuffix.default): (Boolean, String) = {
    val t = UrlCanon.parse(target)
    if (!UrlCanon.AllowedSchemes.contains(t.scheme)) return (false, UnsupportedSchemeMessage)
    if (!matchesStrategy(strategy, t, UrlCanon.parse(origin), psl))
      return (false, s"does not match enqueue strategy '$strategy'")
    (true, null)
  }

  def matches(target: String, strategy: String, origin: String, psl: PublicSuffix = PublicSuffix.default): Boolean =
    matchesStrategy(strategy, UrlCanon.parse(target), UrlCanon.parse(origin), psl)

  private def matchesStrategy(
      strategy: String,
      t: UrlCanon.ParsedUrl,
      o: UrlCanon.ParsedUrl,
      psl: PublicSuffix
  ): Boolean = strategy match {
    case All => true
    case _ if t.host.isEmpty || o.host.isEmpty => false
    case SameHostname => hostOf(t) == hostOf(o)
    case SameDomain =>
      val td = psl.registrableDomain(hostOf(t))
      val od = psl.registrableDomain(hostOf(o))
      td == od && (td.nonEmpty || hostOf(t) == hostOf(o))
    case SameOrigin =>
      hostOf(t) == hostOf(o) && t.scheme == o.scheme && t.portOrDefault == o.portOrDefault
    case other => throw new IllegalArgumentException(s"unknown enqueue strategy: $other")
  }

  private def hostOf(p: UrlCanon.ParsedUrl): String = UrlCanon.normalizeHost(p.host)
}
