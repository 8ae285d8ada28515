package graft.canon

import java.util.regex.Pattern

/** Glob → regex translation for URL include/exclude patterns.
  *
  * Mirrors the reference's `Glob` (/root/reference/src/crawlee/_utils/globs.py:11-16,
  * a copy of CPython 3.13 `glob.translate` with recursive=True, separator `/`):
  * `*` matches within a path segment (and not a leading dot), `**` matches any
  * number of segments, `?` one non-separator char, `[...]` char classes.
  */
object Globs {

  def compile(glob: String): Pattern = Pattern.compile(translate(glob))

  def matches(glob: String, s: String): Boolean = compile(glob).matcher(s).matches()

  def translate(pat: String): String = {
    val sep = "/"
    val escapedSep = Pattern.quote(sep) // "\\Q/\\E" — avoid; use literal
    val anySep = "/"
    val notSep = "[^/]"
    val oneLastSegment = s"[^/.]$notSep*"
    val oneSegment = s"$oneLastSegment$anySep"
    val anySegments = s"(?:$oneSegment)*"
    val anyLastSegments = s"$anySegments(?:$oneLastSegment)?"
    val _ = escapedSep

    val results = scala.collection.mutable.ArrayBuffer.empty[String]
    val parts = pat.split("/", -1)
    val lastIdx = parts.length - 1
    var idx = 0
    while (idx < parts.length) {
      val part = parts(idx)
      if (part == "*") results += (if (idx < lastIdx) oneSegment else oneLastSegment)
      else if (part == "**") {
        if (idx < lastIdx) { if (parts(idx + 1) != "**") results += anySegments }
        else results += anyLastSegments
      } else {
        if (part.nonEmpty) {
          if (part.charAt(0) == '*' || part.charAt(0) == '?') results += "(?!\\.)"
          results += fnmatchTranslate(part, s"$notSep*", notSep)
        }
        if (idx < lastIdx) results += anySep
      }
      idx += 1
    }
    s"(?s:${results.mkString})\\z"
  }

  /** fnmatch-style translation of one segment (no separators inside). */
  private def fnmatchTranslate(pat: String, star: String, questionMark: String): String = {
    val res = new StringBuilder
    var i = 0
    val n = pat.length
    var lastWasStar = false
    while (i < n) {
      val c = pat.charAt(i)
      i += 1
      c match {
        case '*' =>
          if (!lastWasStar) { res.append(star); lastWasStar = true }
        case '?' =>
          res.append(questionMark); lastWasStar = false
        case '[' =>
          lastWasStar = false
          var j = i
          if (j < n && pat.charAt(j) == '!') j += 1
          if (j < n && pat.charAt(j) == ']') j += 1
          while (j < n && pat.charAt(j) != ']') j += 1
          if (j >= n) res.append("\\[")
          else {
            var stuff = pat.substring(i, j).replace("\\", "\\\\")
            i = j + 1
            if (stuff.isEmpty) res.append("(?!)")
            else if (stuff == "!") res.append(".")
            else {
              if (stuff.charAt(0) == '!') stuff = "^" + stuff.substring(1)
              else if (stuff.charAt(0) == '^' || stuff.charAt(0) == '[') stuff = "\\" + stuff
              res.append('[').append(stuff).append(']')
            }
          }
        case _ =>
          lastWasStar = false
          res.append(Pattern.quote(c.toString))
      }
    }
    res.toString
  }
}
