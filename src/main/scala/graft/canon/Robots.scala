package graft.canon

/** robots.txt model + RFC 9309-subset parser, Spark-free.
  *
  * Matches the reference's behavior
  * (/root/reference/src/crawlee/_utils/robots.py:49-130, which delegates
  * parsing to Protego):
  *   - groups of `User-agent` lines followed by Allow/Disallow rules
  *   - longest-match wins; on equal length Allow wins
  *   - `*` wildcard and `$` end anchor inside rule paths
  *   - `Crawl-delay` and `Sitemap` directives
  *   - status-code semantics (RFC 9309 §2.3.1.3/4): 4xx ⇒ allow all,
  *     5xx ⇒ disallow all, fetch error ⇒ allow all
  *   - `isAllowed` is origin-scoped: URLs on another origin are always
  *     allowed (robots.py:96-99)
  */
final case class RobotsRules(
    originUrl: String, // origin (scheme://host[:port]) this file governs
    groups: Map[String, RobotsGroup], // key = lowercased user-agent token
    sitemaps: Seq[String]
) extends Serializable {

  private def groupFor(userAgent: String): Option[RobotsGroup] = {
    val ua = userAgent.toLowerCase
    // Longest user-agent token that is a prefix of the UA string, else '*'
    val candidates = groups.keys.filter(k => k != "*" && ua.contains(k))
    if (candidates.nonEmpty) Some(groups(candidates.maxBy(_.length)))
    else groups.get("*")
  }

  def isAllowed(url: String, userAgent: String = "*"): Boolean = {
    val p = UrlCanon.parse(url)
    if (p.hasAuthority && p.origin.toLowerCase != originUrl.toLowerCase) return true
    val pathAndQuery = {
      val path = if (p.path.isEmpty) "/" else p.path
      if (p.query.nonEmpty) path + "?" + p.query else path
    }
    groupFor(userAgent) match {
      case None => true
      case Some(g) => g.isAllowed(pathAndQuery)
    }
  }

  def crawlDelay(userAgent: String = "*"): Option[Int] =
    groupFor(userAgent).flatMap(_.crawlDelay).map(_.toInt)
}

final case class RobotsGroup(
    rules: Seq[(Boolean, String)], // (isAllow, pattern)
    crawlDelay: Option[Double]
) extends Serializable {

  /** Longest-match-wins; Allow beats Disallow on ties; no match ⇒ allowed. */
  def isAllowed(path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    rules.foreach { case (isAllow, pattern) =>
      if (pattern.nonEmpty && RobotsGroup.ruleMatches(pattern, path)) {
        val len = pattern.length
        if (len > bestLen || (len == bestLen && isAllow && !bestAllow)) {
          bestLen = len; bestAllow = isAllow
        }
      }
    }
    if (bestLen == -1) true else bestAllow
  }
}

object RobotsGroup {

  /** Match a robots rule pattern (with `*` and trailing `$`) against a path. */
  def ruleMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    val parts = pat.split("\\*", -1)
    var pos = 0
    var i = 0
    while (i < parts.length) {
      val part = parts(i)
      if (i == 0) {
        if (!path.startsWith(part)) return false
        pos = part.length
      } else {
        val found = path.indexOf(part, pos)
        if (found == -1) return false
        pos = found + part.length
      }
      i += 1
    }
    if (anchored) {
      // last part must end exactly at path end (if pattern ends with '*$',
      // parts end with "" which matches anywhere — then anything matches to end)
      if (parts.last.isEmpty) true else pos == path.length
    } else true
  }
}

object Robots {

  val AllowAllBody = "User-agent: *\nAllow: /"
  val DisallowAllBody = "User-agent: *\nDisallow: /"

  /** Apply the reference's status-code rules then parse.
    * statusCode < 0 means fetch error (⇒ allow all). */
  def fromFetch(originUrl: String, statusCode: Int, body: String): RobotsRules = {
    val effective =
      if (statusCode >= 400 && statusCode < 500) AllowAllBody
      else if (statusCode >= 500 && statusCode < 600) DisallowAllBody
      else if (statusCode < 0 || body == null) AllowAllBody
      else body
    parse(originUrl, effective)
  }

  /** Per-JVM parse cache for the robots-TABLE join path (SCALE.md §Crawl
    * loop): when rules ride a join instead of a whole-map broadcast, each
    * executor parses a host's robots body at most once per DISTINCT
    * (status, body) — the key includes the response status and a body hash
    * (ADVICE r3 #2), so a refreshed robots table or a second crawl run in
    * the same JVM never serves stale rules. Bounded by a crude clear at
    * 100k entries (a real deployment would LRU); losing entries to a
    * concurrent clear only costs a re-parse.
    */
  private val rulesCache = new java.util.concurrent.ConcurrentHashMap[String, RobotsRules]()
  def cachedFromFetch(host: String, statusCode: Int, body: String): RobotsRules = {
    if (rulesCache.size > 100000) rulesCache.clear()
    val bodyHash =
      if (body == null) "null"
      else scala.util.hashing.MurmurHash3.stringHash(body).toString + ":" + body.length
    val key = s"$host|$statusCode|$bodyHash"
    rulesCache.computeIfAbsent(key, _ => fromFetch(s"https://$host", statusCode, body))
  }

  def robotsUrl(anyUrlOnHost: String): String = {
    val p = UrlCanon.parse(anyUrlOnHost)
    p.origin + "/robots.txt"
  }

  def parse(originUrl: String, content: String): RobotsRules = {
    val origin = UrlCanon.parse(originUrl).origin
    var currentAgents = List.empty[String]
    var afterAgentLine = false // UA lines are cumulative until a rule appears
    val groupRules = scala.collection.mutable.LinkedHashMap.empty[String, scala.collection.mutable.ArrayBuffer[(Boolean, String)]]
    val groupDelays = scala.collection.mutable.HashMap.empty[String, Double]
    val sitemaps = scala.collection.mutable.ArrayBuffer.empty[String]

    def ensure(agent: String): scala.collection.mutable.ArrayBuffer[(Boolean, String)] =
      groupRules.getOrElseUpdate(agent, scala.collection.mutable.ArrayBuffer.empty)

    content.linesIterator.foreach { rawLine =>
      val line = rawLine.takeWhile(_ != '#').trim
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val field = line.substring(0, colon).trim.toLowerCase
          val value = line.substring(colon + 1).trim
          field match {
            case "user-agent" =>
              val agent = value.toLowerCase
              if (afterAgentLine) currentAgents = agent :: currentAgents
              else { currentAgents = List(agent); afterAgentLine = true }
              ensure(agent)
            case "allow" | "disallow" =>
              afterAgentLine = false
              val isAllow = field == "allow"
              if (currentAgents.nonEmpty && value.nonEmpty)
                currentAgents.foreach(a => ensure(a) += ((isAllow, value)))
              else if (currentAgents.nonEmpty && value.isEmpty) {
                // empty Disallow ⇒ allow everything (no rule); record nothing
              }
            case "crawl-delay" =>
              afterAgentLine = false
              try {
                val d = value.toDouble
                currentAgents.foreach(a => if (!groupDelays.contains(a)) groupDelays(a) = d)
              } catch { case _: NumberFormatException => }
            case "sitemap" =>
              if (value.nonEmpty) sitemaps += value
            case _ =>
              afterAgentLine = false
          }
        }
      }
    }
    val groups = groupRules.map { case (agent, rules) =>
      agent -> RobotsGroup(rules.toSeq, groupDelays.get(agent))
    }.toMap
    RobotsRules(origin, groups, sitemaps.toSeq)
  }
}
