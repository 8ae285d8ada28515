package graft.fingerprint

/** Browser-like HTTP header generation (reference
  * fingerprint_suite/_header_generator.py + _consts.py).
  *
  * The reference delegates to browserforge's statistical header network; no
  * such dataset ships in this sandbox, so generation draws DETERMINISTIC
  * picks from a small pool of realistic values per browser type (documented
  * substitution, like C6/session ids): the anti-fingerprinting property —
  * consistent, plausible header sets that vary across identities — is
  * preserved, only the sampling is seeded.
  *
  * Reference semantics pinned by HeaderGeneratorSpec (mirroring
  * tests/unit/fingerprint_suite/test_header_generator.py):
  *   - common headers = Accept + Accept-Language
  *   - get_user_agent_header: UA contains the browser's keyword token
  *     (BROWSER_TYPE_HEADER_KEYWORD) and rejects unknown types
  *   - sec-ch-ua headers only exist for chromium-family browsers; firefox/
  *     safari yield an EMPTY map; unknown types reject
  */
object HeaderGenerator {

  val SupportedBrowserTypes: Set[String] = Set("chrome", "firefox", "safari", "edge")

  val CommonAcceptLanguage = "en-US,en;q=0.9"

  private val AcceptHtml =
    "text/html,application/xhtml+xml,application/xml;q=0.9,image/avif,image/webp,*/*;q=0.8"

  /** UA pool per browser type; every value contains the reference's keyword
    * token for its type (_consts.py BROWSER_TYPE_HEADER_KEYWORD).
    */
  private val UserAgents: Map[String, Vector[String]] = Map(
    "chrome" -> Vector(
      "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/124.0.0.0 Safari/537.36",
      "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/123.0.0.0 Safari/537.36",
      "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/122.0.0.0 Safari/537.36"),
    "firefox" -> Vector(
      "Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:125.0) Gecko/20100101 Firefox/125.0",
      "Mozilla/5.0 (Macintosh; Intel Mac OS X 10.15; rv:124.0) Gecko/20100101 Firefox/124.0",
      "Mozilla/5.0 (X11; Linux x86_64; rv:123.0) Gecko/20100101 Firefox/123.0"),
    "safari" -> Vector(
      "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.4 Safari/605.1.15",
      "Mozilla/5.0 (iPhone; CPU iPhone OS 17_4 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.4 Mobile/15E148 Safari/604.1"),
    "edge" -> Vector(
      "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/124.0.0.0 Safari/537.36 Edg/124.0.0.0",
      "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/123.0.0.0 Safari/537.36 Edg/123.0.0.0"))

  private val SecChUaPlatforms = Vector("\"Windows\"", "\"macOS\"", "\"Linux\"")

  private def requireSupported(browserType: String): Unit =
    if (!SupportedBrowserTypes.contains(browserType))
      throw new IllegalArgumentException(s"Unsupported browser type: $browserType")

  private def pick[T](xs: Vector[T], seed: Long, salt: String): T =
    xs(((graft.canon.Hashing.xxh64(s"$salt:$seed") & Long.MaxValue) % xs.length).toInt)

  /** Common headers — Accept + Accept-Language (":48-55"). */
  def getCommonHeaders: Map[String, String] =
    Map("Accept" -> AcceptHtml, "Accept-Language" -> CommonAcceptLanguage)

  /** Seed-picked UA across all browser types (":57-60"). */
  def getRandomUserAgentHeader(seed: Long): Map[String, String] = {
    val all = UserAgents.values.flatten.toVector.sorted
    Map("User-Agent" -> pick(all, seed, "ua-any"))
  }

  /** UA for a browser type; rejects unknown types (":62-72"). */
  def getUserAgentHeader(browserType: String = "chrome", seed: Long = 0L): Map[String, String] = {
    requireSupported(browserType)
    Map("User-Agent" -> pick(UserAgents(browserType), seed, s"ua-$browserType"))
  }

  /** sec-ch-ua client-hint headers; chromium-family only (":74-87"). */
  def getSecChUaHeaders(browserType: String = "chrome", seed: Long = 0L): Map[String, String] = {
    requireSupported(browserType)
    browserType match {
      case "chrome" | "edge" =>
        val ua = pick(UserAgents(browserType), seed, s"ua-$browserType")
        val major = "Chrome/(\\d+)".r.findFirstMatchIn(ua).map(_.group(1)).getOrElse("124")
        val brand = if (browserType == "edge") "Microsoft Edge" else "Google Chrome"
        Map(
          "sec-ch-ua" -> s""""Chromium";v="$major", "$brand";v="$major", "Not-A.Brand";v="99"""",
          "sec-ch-ua-mobile" -> "?0",
          "sec-ch-ua-platform" -> pick(SecChUaPlatforms, seed, "platform"))
      case _ => Map.empty
    }
  }

  /** Full session identity: common + UA + client hints, deterministic in
    * the session id — same session, same headers across every dispatch
    * (the per-session identity piece of the fingerprint suite).
    */
  def forSession(sessionId: String, browserType: String = "chrome"): Map[String, String] = {
    requireSupported(browserType)
    val seed = graft.canon.Hashing.xxh64(sessionId)
    getCommonHeaders ++ getUserAgentHeader(browserType, seed) ++ getSecChUaHeaders(browserType, seed)
  }
}
