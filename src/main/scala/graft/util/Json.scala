package graft.util

/** Minimal recursive-descent JSON reader (ADVICE r3 #5): the session-pool /
  * cookie-jar persistence used regexes that silently corrupted values
  * containing `"`, `]` or `}`. This parser handles the full JSON grammar
  * (escapes, nesting, unicode) for the small driver-side state blobs the
  * engine persists — no external dependency, no Spark.
  *
  * Values map to: Map[String, Any] (object, insertion-ordered),
  * Vector[Any] (array), String, Long / Double (number), Boolean, null.
  */
object Json {

  def parse(s: String): Any = {
    val p = new Parser(s)
    val v = p.value()
    p.skipWs()
    require(p.eof, s"trailing content at ${p.pos}")
    v
  }

  /** Typed helpers over parsed values. */
  def obj(v: Any): scala.collection.Map[String, Any] = v.asInstanceOf[scala.collection.Map[String, Any]]
  def arr(v: Any): Vector[Any] = v.asInstanceOf[Vector[Any]]
  def str(v: Any): String = v.asInstanceOf[String]
  def long(v: Any): Long = v match {
    case l: Long => l
    case d: Double => d.toLong
    case other => throw new IllegalArgumentException(s"not a number: $other")
  }
  def double(v: Any): Double = v match {
    case l: Long => l.toDouble
    case d: Double => d
    case other => throw new IllegalArgumentException(s"not a number: $other")
  }
  def bool(v: Any): Boolean = v.asInstanceOf[Boolean]

  /** Serialize a parsed-shape value back to JSON (inverse of [[parse]]):
    * Map (insertion order preserved), Seq/Vector, String, Long/Int,
    * Double (finite), Boolean, null. Round-trips everything `parse`
    * produces — the RecoverableState autosave path depends on that.
    */
  def render(v: Any): String = v match {
    case null => "null"
    case m: scala.collection.Map[_, _] =>
      m.iterator
        .map { case (k, mv) => s"${quote(k.toString)}:${render(mv)}" }
        .mkString("{", ",", "}")
    case s: scala.collection.Seq[_] => s.iterator.map(render).mkString("[", ",", "]")
    case s: String => quote(s)
    case b: Boolean => b.toString
    case l: Long => l.toString
    case i: Int => i.toString
    case d: Double =>
      require(!d.isNaN && !d.isInfinite, s"non-finite number not representable in JSON: $d")
      // integral doubles render without the trailing ".0" only if they came
      // in as Long; a Double stays a Double so parse(render(x)) == x
      d.toString
    case other => throw new IllegalArgumentException(s"unrenderable JSON value: ${other.getClass}")
  }

  /** JSON string literal with full escaping (incl. control chars). */
  def quote(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
    sb.toString
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"JSON parse error at $pos: $msg")
    private def expect(c: Char): Unit = {
      if (eof || s.charAt(pos) != c) fail(s"expected '$c'")
      pos += 1
    }

    def value(): Any = {
      skipWs()
      if (eof) fail("unexpected end")
      s.charAt(pos) match {
        case '{' => objValue()
        case '[' => arrValue()
        case '"' => strValue()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case _ => numValue()
      }
    }

    private def lit(word: String, v: Any): Any = {
      if (!s.startsWith(word, pos)) fail(s"expected $word")
      pos += word.length
      v
    }

    private def objValue(): Any = {
      expect('{')
      val m = scala.collection.mutable.LinkedHashMap.empty[String, Any]
      skipWs()
      if (!eof && s.charAt(pos) == '}') { pos += 1; return m }
      var more = true
      while (more) {
        skipWs()
        val k = strValue()
        skipWs()
        expect(':')
        m(k) = value()
        skipWs()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect('}'); more = false }
      }
      m
    }

    private def arrValue(): Any = {
      expect('[')
      val b = Vector.newBuilder[Any]
      skipWs()
      if (!eof && s.charAt(pos) == ']') { pos += 1; return b.result() }
      var more = true
      while (more) {
        b += value()
        skipWs()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect(']'); more = false }
      }
      b.result()
    }

    private def strValue(): String = {
      expect('"')
      val sb = new StringBuilder
      while (true) {
        if (eof) fail("unterminated string")
        val c = s.charAt(pos)
        pos += 1
        c match {
          case '"' => return sb.toString
          case '\\' =>
            if (eof) fail("unterminated escape")
            val e = s.charAt(pos)
            pos += 1
            e match {
              case '"' => sb.append('"')
              case '\\' => sb.append('\\')
              case '/' => sb.append('/')
              case 'n' => sb.append('\n')
              case 'r' => sb.append('\r')
              case 't' => sb.append('\t')
              case 'b' => sb.append('\b')
              case 'f' => sb.append('\f')
              case 'u' =>
                if (pos + 4 > s.length) fail("short unicode escape")
                sb.append(Integer.parseInt(s.substring(pos, pos + 4), 16).toChar)
                pos += 4
              case other => fail(s"bad escape \\$other")
            }
          case other => sb.append(other)
        }
      }
      throw new IllegalStateException("unreachable")
    }

    private def numValue(): Any = {
      val start = pos
      if (!eof && (s.charAt(pos) == '-' || s.charAt(pos) == '+')) pos += 1
      var isDouble = false
      while (!eof && (s.charAt(pos).isDigit || "+-.eE".indexOf(s.charAt(pos)) >= 0)) {
        if (".eE".indexOf(s.charAt(pos)) >= 0) isDouble = true
        pos += 1
      }
      val tok = s.substring(start, pos)
      if (tok.isEmpty || tok == "-") fail("bad number")
      if (isDouble) tok.toDouble else tok.toLong
    }
  }
}
