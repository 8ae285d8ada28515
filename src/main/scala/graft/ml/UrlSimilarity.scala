package graft.ml

/** URL-component similarity for the rendering-type predictor (reference
  * crawlers/_adaptive_playwright/_rendering_type_predictor.py:249-282).
  *
  * Jaro-Winkler here matches DuckDB's `jaro_winkler_similarity` exactly
  * (standard Jaro, Winkler prefix bonus p=0.1 over max 4 chars, boost
  * threshold 0.7, empty-string rule first) — validated pairwise to 1e-9 on
  * 20k random pairs — so the SQL oracle can recompute features
  * independently. The reference's `jaro` package differs in minor edge
  * conventions; the 0.8 similarity cutoff absorbs those.
  */
object UrlSimilarity {

  def jaro(s1: String, s2: String): Double = {
    if (s1.isEmpty || s2.isEmpty) return 0.0
    if (s1 == s2) return 1.0
    val n1 = s1.length
    val n2 = s2.length
    val matchDist = math.max(n1, n2) / 2 - 1
    val m1 = new Array[Boolean](n1)
    val m2 = new Array[Boolean](n2)
    var matches = 0
    var i = 0
    while (i < n1) {
      val lo = math.max(0, i - matchDist)
      val hi = math.min(n2, i + matchDist + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < n1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val tr = t / 2
    (matches.toDouble / n1 + matches.toDouble / n2 + (matches - tr).toDouble / matches) / 3.0
  }

  def jaroWinkler(s1: String, s2: String): Double = {
    val j = jaro(s1, s2)
    if (j <= 0.7) return j
    var pref = 0
    val n = math.min(math.min(s1.length, s2.length), 4)
    while (pref < n && s1.charAt(pref) == s2.charAt(pref)) pref += 1
    j + pref * 0.1 * (1 - j)
  }

  /** URL components: [netloc, path segments...] (reference
    * get_url_components — note a bare "/" path yields one empty segment,
    * mirroring Python's `'/'.strip('/').split('/')`).
    */
  def urlComponents(url: String): Seq[String] = {
    val u = try new java.net.URI(url) catch { case _: Exception => null }
    if (u == null) return Seq(if (url == null) "" else url)
    val netloc = Option(u.getRawAuthority).getOrElse("")
    val path = Option(u.getRawPath).getOrElse("")
    if (path.nonEmpty) netloc +: path.stripPrefix("/").stripSuffix("/").split("/", -1).toSeq
    else Seq(netloc)
  }

  /** Similarity cutoff: a component pair under it counts 0, over it 1. */
  val SimilarityCutoff = 0.8

  /** Reference calculate_url_similarity: 0 across hosts, 1 for identical
    * component lists, else the mean of thresholded per-segment
    * Jaro-Winkler over zip_longest(tails, fill="").
    */
  def urlSimilarity(c1: Seq[String], c2: Seq[String]): Double = {
    if (c1.isEmpty || c2.isEmpty || c1.head != c2.head) return 0.0
    if (c1 == c2) return 1.0
    val t1 = c1.tail
    val t2 = c2.tail
    val n = math.max(t1.length, t2.length)
    if (n == 0) return 1.0 // equal hosts, both bare (caught above, defensive)
    var hits = 0
    var i = 0
    while (i < n) {
      val a = if (i < t1.length) t1(i) else ""
      val b = if (i < t2.length) t2(i) else ""
      if (jaroWinkler(a, b) > SimilarityCutoff) hits += 1
      i += 1
    }
    hits.toDouble / n
  }
}
