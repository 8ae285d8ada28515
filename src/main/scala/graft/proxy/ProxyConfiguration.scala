package graft.proxy

import scala.collection.mutable

/** Proxy connection info for one request (reference
  * proxy_configuration.py:24-52 ProxyInfo).
  */
final case class ProxyInfo(
    url: String,
    scheme: String,
    hostname: String,
    port: Int,
    username: String = "",
    password: String = "",
    sessionId: Option[String] = None,
    proxyTier: Option[Int] = None
) extends Serializable

/** Per-domain proxy-tier state: error histogram with decay and
  * hill-climbing tier selection — a semantic port of the reference's
  * `_ProxyTierTracker` (proxy_configuration.py:228-261): an error adds 10
  * to the active tier's bucket, every OTHER nonzero bucket decays by 1 per
  * prediction, and the active tier moves toward the neighbor with fewer
  * errors (preferring to climb DOWN when equal).
  */
final class ProxyTierTracker(nTiers: Int) extends Serializable {
  private val histogramByDomain = mutable.HashMap.empty[String, Array[Int]]
  private val currentTierByDomain = mutable.HashMap.empty[String, Int]

  private def histogram(domain: String): Array[Int] =
    histogramByDomain.getOrElseUpdate(domain, Array.fill(nTiers)(0))

  def addError(domain: String, tier: Int): Unit =
    histogram(domain)(tier) += 10

  // ---- persistence (tier histories survive a kill+resume; the reference
  // keeps last_proxy_tier on the persisted Request row, _request.py:52-53 —
  // here the whole tracker state rides the run-state KVS) ----
  def toJson: String = {
    import graft.util.Json.quote
    val h = histogramByDomain.toSeq.sortBy(_._1)
      .map { case (d, arr) => s"${quote(d)}:[${arr.mkString(",")}]" }.mkString("{", ",", "}")
    val c = currentTierByDomain.toSeq.sortBy(_._1)
      .map { case (d, t) => s"${quote(d)}:$t" }.mkString("{", ",", "}")
    s"""{"histograms":$h,"current":$c}"""
  }

  def restoreFromJson(json: String): Unit =
    restoreFromParsed(graft.util.Json.parse(json))

  def restoreFromParsed(parsed: Any): Unit = {
    import graft.util.Json
    val root = Json.obj(parsed)
    histogramByDomain.clear()
    currentTierByDomain.clear()
    root.get("histograms").map(Json.obj).getOrElse(Map.empty).foreach { case (d, arr) =>
      val a = Json.arr(arr).map(Json.long(_).toInt).toArray
      histogramByDomain(d) = a.padTo(nTiers, 0).take(nTiers)
    }
    root.get("current").map(Json.obj).getOrElse(Map.empty).foreach { case (d, t) =>
      currentTierByDomain(d) = Json.long(t).toInt
    }
  }

  def currentTier(domain: String): Int = currentTierByDomain.getOrElse(domain, 0)

  def numTiers: Int = nTiers

  /** Executor-side fold surface (history-as-data tiered assignment): seed
    * one domain's state so the engine can run the SAME arithmetic per host
    * partition and persist the result as a table row.
    */
  def restore(domain: String, hist: Array[Int], cur: Int): Unit = {
    histogramByDomain(domain) = hist.padTo(nTiers, 0).take(nTiers)
    currentTierByDomain(domain) = cur
  }

  def snapshot(domain: String): (Array[Int], Int) =
    (histogram(domain).clone(), currentTierByDomain.getOrElse(domain, 0))

  def predictTier(domain: String): Int = {
    val hist = histogram(domain)
    val current = currentTierByDomain.getOrElse(domain, 0)
    var i = 0
    while (i < hist.length) {
      if (i != current && hist(i) > 0) hist(i) -= 1
      i += 1
    }
    val left = if (current > 0) hist(current - 1).toDouble else Double.PositiveInfinity
    val right = if (current < hist.length - 1) hist(current + 1).toDouble else Double.PositiveInfinity
    var next = current
    if (hist(current) > math.min(left, right)) next = if (left <= right) current - 1 else current + 1
    else if (hist(current) == left) next = current - 1
    currentTierByDomain(domain) = next
    next
  }
}

/** Proxy rotation configuration — reference proxy_configuration.py:55-225.
  *
  * Exactly one of `proxyUrls`, `tieredProxyUrls`, `newUrlFunction` must be
  * non-empty (":93-98"). A `None` entry means "intentionally no proxy for
  * this slot". Rotation is a GLOBAL round-robin index across calls
  * (":213-221"); a `sessionId` pins its first assigned URL for all later
  * calls with the same id (":216-221"). For tiered configs, each request's
  * domain hill-climbs the tier list via [[ProxyTierTracker]]; a request
  * re-dispatched with its previous tier recorded counts that tier as
  * errored (":190-202").
  *
  * Documented substitution (like C6): the reference auto-generates a
  * crypto-random session id for tiered configs; here ids are a
  * deterministic counter so crawls replay bit-identically.
  */
final class ProxyConfiguration(
    proxyUrls: Seq[Option[String]] = Seq.empty,
    tieredProxyUrls: Seq[Seq[Option[String]]] = Seq.empty,
    newUrlFunction: Option[(Option[String], Option[String]) => Option[String]] = None
) extends Serializable {

  private val sourcesConfigured =
    Seq(proxyUrls.nonEmpty, tieredProxyUrls.flatten.nonEmpty, newUrlFunction.isDefined).count(identity)
  require(
    sourcesConfigured == 1,
    "Exactly one of `proxyUrls`, `tieredProxyUrls` and `newUrlFunction` must be specified (and non-empty).")

  proxyUrls.flatten.foreach(validate)
  tieredProxyUrls.flatten.flatten.foreach(validate)

  val tierTracker: Option[ProxyTierTracker] =
    if (tieredProxyUrls.nonEmpty) Some(new ProxyTierTracker(tieredProxyUrls.size)) else None

  private var nextUrlIndex = 0
  private var nextAutoSessionId = 0L
  private val usedBySession = mutable.HashMap.empty[String, Option[String]]

  private def validate(url: String): Unit = {
    val u = new java.net.URI(url)
    require(u.getScheme != null && u.getHost != null, s"Invalid proxy URL: $url")
  }

  /** Pick the next URL from `urls` honoring session affinity (":213-221"). */
  private def rotate(urls: Seq[Option[String]], sessionId: Option[String]): Option[String] =
    sessionId match {
      case None =>
        val u = urls(nextUrlIndex % urls.size)
        nextUrlIndex += 1
        u
      case Some(sid) =>
        usedBySession.getOrElseUpdate(sid, {
          val u = urls(nextUrlIndex % urls.size)
          nextUrlIndex += 1
          u
        })
    }

  /** New proxy info for a dispatch (reference new_proxy_info, ":113-157").
    *
    * @param requestHost   the request's hostname (tier selection key)
    * @param lastProxyTier the tier recorded on the request's previous
    *                      dispatch, if any — counted as an error against
    *                      that tier (":196-198")
    * @param proxyTier     explicit tier override
    */
  def newProxyInfo(
      sessionId: Option[String] = None,
      requestHost: Option[String] = None,
      lastProxyTier: Option[Int] = None,
      proxyTier: Option[Int] = None
  ): Option[ProxyInfo] = {
    // tiered configs get an auto session id (deterministic counter here)
    val sid = sessionId.orElse(tierTracker.map { _ =>
      val id = f"proxy_session_$nextAutoSessionId%06d"
      nextAutoSessionId += 1
      id
    })

    val (urlOpt, tierOpt): (Option[String], Option[Int]) = newUrlFunction match {
      case Some(fn) => (fn(sid, requestHost), None)
      case None =>
        tierTracker match {
          case Some(tracker) =>
            val tier = proxyTier.orElse(requestHost.map { host =>
              lastProxyTier.foreach(t => tracker.addError(host, t))
              tracker.predictTier(host)
            })
            val urls = tier match {
              case Some(t) => tieredProxyUrls(t)
              case None => tieredProxyUrls.flatten
            }
            (rotate(urls, sid), tier)
          case None => (rotate(proxyUrls, sid), None)
        }
    }

    urlOpt.map { url =>
      val u = new java.net.URI(url)
      // port inferred from the scheme when absent (reference test_sets_port)
      val port = u.getPort match {
        case p if p >= 0 => p
        case _ =>
          u.getScheme match {
            case "http" => 80
            case "https" => 443
            case s => throw new IllegalArgumentException(s"Port is None for URL: $url (scheme $s)")
          }
      }
      val userInfo = Option(u.getUserInfo).getOrElse("")
      val (user, pass) = userInfo.split(":", 2) match {
        case Array(us, pw) => (us, pw)
        case Array(us) => (us, "")
        case _ => ("", "")
      }
      ProxyInfo(url, u.getScheme, u.getHost, port, user, pass, sid, tierOpt)
    }
  }

  /** Full rotation + tier state as JSON (persist/resume surface): the
    * round-robin index, the auto-session counter, the per-session pinned
    * URLs, and the tier tracker — everything a resumed crawl needs so its
    * tier climb continues instead of restarting (VERDICT r3 next-round #4).
    */
  def stateToJson: String = {
    import graft.util.Json.quote
    val used = usedBySession.toSeq.sortBy(_._1)
      .map { case (sid, u) => s"${quote(sid)}:${u.map(quote).getOrElse("null")}" }
      .mkString("{", ",", "}")
    s"""{"next_url_index":$nextUrlIndex,"next_auto_session":$nextAutoSessionId,""" +
      s""""used_by_session":$used,"tiers":${tierTracker.map(_.toJson).getOrElse("null")}}"""
  }

  def restoreStateFromJson(json: String): Unit = {
    import graft.util.Json
    val root = Json.obj(Json.parse(json))
    nextUrlIndex = root.get("next_url_index").map(Json.long(_).toInt).getOrElse(0)
    nextAutoSessionId = root.get("next_auto_session").map(Json.long).getOrElse(0L)
    usedBySession.clear()
    root.get("used_by_session").map(Json.obj).getOrElse(Map.empty).foreach { case (sid, u) =>
      usedBySession(sid) = Option(u).map(Json.str)
    }
    root.get("tiers").filter(_ != null).foreach(t => tierTracker.foreach(_.restoreFromParsed(t)))
  }

  /** Proxy URL string for a dispatch (reference new_url, ":159-175"). */
  def newUrl(
      sessionId: Option[String] = None,
      requestHost: Option[String] = None,
      lastProxyTier: Option[Int] = None,
      proxyTier: Option[Int] = None
  ): Option[String] =
    newProxyInfo(sessionId, requestHost, lastProxyTier, proxyTier).map(_.url)
}
