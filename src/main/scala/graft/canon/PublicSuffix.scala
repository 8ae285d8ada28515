package graft.canon

/** Registrable-domain ("domain under public suffix") lookup.
  *
  * The reference delegates to tldextract + the live public suffix list
  * (/root/reference/src/crawlee/_utils/urls.py:147-155). Zero-egress here, so
  * we embed a snapshot of the PSL's most common entries plus the wildcard
  * rule semantics; production deployments load the full publicsuffix.org
  * snapshot via `PublicSuffix.withRules`. At crawl scale the rule set is a
  * few-hundred-KB broadcast variable probed by a per-row UDF, matching the
  * reference's lru_cache(2048) around the same lookup.
  *
  * Algorithm per https://publicsuffix.org/list/ (public spec):
  * longest matching rule wins; exception rules (`!`) beat wildcards;
  * unlisted TLDs are themselves public suffixes; registrable domain =
  * suffix + one more label.
  */
final class PublicSuffix(rules: Set[String], wildcards: Set[String], exceptions: Set[String]) extends Serializable {

  /** Length in labels of the public suffix of `host`, or -1 if host itself
    * has no dot (no registrable domain).
    */
  private def suffixLabelCount(labels: Array[String]): Int = {
    val n = labels.length
    var best = 1 // unlisted TLD rule: "*" — the last label is a suffix
    var i = 0
    while (i < n) {
      val candidate = labels.slice(i, n).mkString(".")
      val candLen = n - i
      if (exceptions.contains(candidate)) return candLen - 1
      if (rules.contains(candidate) && candLen > best) best = candLen
      // wildcard rule *.P: candidate labels[i..n) matches when its parent
      // labels[i+1..n) is listed as a wildcard base
      if (i + 1 < n && wildcards.contains(labels.slice(i + 1, n).mkString(".")) && candLen > best)
        best = candLen
      i += 1
    }
    best
  }

  /** Registrable domain of `host` (e.g. "a.b.example.co.uk" → "example.co.uk").
    * Returns "" when the host IS a public suffix or is empty/IP-like
    * (tldextract's top_domain_under_public_suffix returns "" there too).
    */
  def registrableDomain(host0: String): String = {
    if (host0 == null || host0.isEmpty) return ""
    val host = host0.toLowerCase.stripSuffix(".")
    if (host.forall(c => c.isDigit || c == '.')) return "" // IPv4
    if (host.startsWith("[")) return "" // IPv6
    val labels = host.split('.')
    if (labels.length < 2) return ""
    val sfx = suffixLabelCount(labels)
    if (sfx >= labels.length) ""
    else labels.slice(labels.length - sfx - 1, labels.length).mkString(".")
  }
}

object PublicSuffix {

  /** Embedded PSL snapshot subset (publicsuffix.org, public domain data):
    * the high-traffic suffixes; the default-TLD rule covers the rest.
    */
  val default: PublicSuffix = {
    val raw = Seq(
      "com", "org", "net", "edu", "gov", "mil", "int", "io", "co", "ai", "dev", "app",
      "info", "biz", "me", "tv", "cc", "us", "uk", "co.uk", "org.uk", "ac.uk", "gov.uk",
      "de", "fr", "nl", "it", "es", "pl", "ru", "com.ru", "cz", "se", "no", "fi", "dk",
      "jp", "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "cn", "com.cn", "net.cn", "org.cn",
      "au", "com.au", "net.au", "org.au", "edu.au", "gov.au", "nz", "co.nz", "net.nz",
      "br", "com.br", "net.br", "org.br", "in", "co.in", "net.in", "org.in",
      "kr", "co.kr", "mx", "com.mx", "ar", "com.ar", "za", "co.za",
      "ca", "eu", "ch", "at", "be", "ie", "pt", "gr", "tr", "com.tr",
      "github.io", "gitlab.io", "blogspot.com", "appspot.com", "herokuapp.com",
      "cloudfront.net", "amazonaws.com", "azurewebsites.net", "netlify.app", "vercel.app",
      "example" // RFC 2606 reserved; treated as a TLD
    )
    new PublicSuffix(raw.toSet, Set("ck", "er", "fj"), Set("www.ck"))
  }

  def withRules(lines: Iterator[String]): PublicSuffix = {
    val rules = Set.newBuilder[String]
    val wilds = Set.newBuilder[String]
    val excs = Set.newBuilder[String]
    lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//")).foreach { l =>
      if (l.startsWith("!")) excs += l.substring(1)
      else if (l.startsWith("*.")) wilds += l.substring(2)
      else rules += l
    }
    new PublicSuffix(rules.result(), wilds.result(), excs.result())
  }
}
