package graft.store

import scala.collection.immutable.VectorMap

/** Minimal JSON tree + writer/parser for store metadata.
  *
  * The reference's `Meta` accepts ANY JSON-serializable value — nested
  * dicts, lists, numbers, null (pycolumns metafile.py:5-99, exercised with
  * nested dicts in tests/test_access.py) — so a flat string map narrows the
  * contract. Hand-rolled (offline sandbox: no JSON dependency resolvable);
  * numbers are BigDecimal so integers round-trip exactly.
  */
sealed trait JVal {
  def render: String = Json.render(this)

  /** Dict-style accessor for object trees. */
  def apply(key: String): JVal = this match {
    case JObj(fields) => fields.getOrElse(key,
      throw new NoSuchElementException(s"no meta key '$key'"))
    case other => throw new IllegalArgumentException(s"not an object: $other")
  }
}
case object JNull extends JVal
final case class JBool(b: Boolean) extends JVal
final case class JNum(v: BigDecimal) extends JVal
final case class JStr(s: String) extends JVal
final case class JArr(items: Vector[JVal]) extends JVal
final case class JObj(fields: VectorMap[String, JVal]) extends JVal {
  /** Top-level dict.update semantics (metafile.py:85-99). */
  def updated(other: JObj): JObj = JObj(fields ++ other.fields)
}

object JObj {
  def apply(kvs: (String, JVal)*): JObj = JObj(VectorMap(kvs: _*))
}

object Json {
  def num(l: Long): JNum = JNum(BigDecimal(l))
  def num(d: Double): JNum = JNum(BigDecimal(d))
  def arr(vs: JVal*): JArr = JArr(vs.toVector)

  /** Convenience: lift plain Scala values into the tree. */
  def lift(v: Any): JVal = v match {
    case null => JNull
    case j: JVal => j
    case s: String => JStr(s)
    case b: Boolean => JBool(b)
    case i: Int => num(i.toLong)
    case l: Long => num(l)
    case d: Double => num(d)
    case f: Float => num(f.toDouble)
    case bd: BigDecimal => JNum(bd)
    case m: scala.collection.Map[_, _] =>
      JObj(VectorMap(m.toSeq.map { case (k, x) => k.toString -> lift(x) }: _*))
    case s: scala.collection.Seq[_] => JArr(s.map(lift).toVector)
    case other => throw new IllegalArgumentException(
      s"not JSON-liftable: ${other.getClass}")
  }

  // ---------------------------------------------------------------- render

  def render(v: JVal): String = {
    val sb = new StringBuilder
    write(v, sb)
    sb.toString
  }

  private def write(v: JVal, sb: StringBuilder): Unit = v match {
    case JNull => sb.append("null")
    case JBool(b) => sb.append(if (b) "true" else "false")
    case JNum(n) => sb.append(n.bigDecimal.toString)
    case JStr(s) => writeString(s, sb)
    case JArr(items) =>
      sb.append('[')
      var first = true
      items.foreach { it =>
        if (!first) sb.append(',')
        first = false
        write(it, sb)
      }
      sb.append(']')
    case JObj(fields) =>
      sb.append('{')
      var first = true
      fields.foreach { case (k, x) =>
        if (!first) sb.append(',')
        first = false
        writeString(k, sb)
        sb.append(':')
        write(x, sb)
      }
      sb.append('}')
  }

  private def writeString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  // ----------------------------------------------------------------- parse

  def parse(s: String): JVal = {
    val p = new Parser(s)
    val v = p.value()
    p.skipWs()
    require(p.eof, s"trailing characters at ${p.pos}")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length

    def skipWs(): Unit =
      while (!eof && (s(pos) == ' ' || s(pos) == '\t' || s(pos) == '\n' || s(pos) == '\r'))
        pos += 1

    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"JSON parse error at $pos: $msg")

    private def expect(c: Char): Unit = {
      if (eof || s(pos) != c) fail(s"expected '$c'")
      pos += 1
    }

    def value(): JVal = {
      skipWs()
      if (eof) fail("unexpected end")
      s(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(string())
        case 't' => lit("true"); JBool(true)
        case 'f' => lit("false"); JBool(false)
        case 'n' => lit("null"); JNull
        case _ => number()
      }
    }

    private def lit(word: String): Unit = {
      if (!s.startsWith(word, pos)) fail(s"expected $word")
      pos += word.length
    }

    private def obj(): JObj = {
      expect('{')
      skipWs()
      var fields = VectorMap.empty[String, JVal]
      if (!eof && s(pos) == '}') { pos += 1; return JObj(fields) }
      var done = false
      while (!done) {
        skipWs()
        val k = string()
        skipWs()
        expect(':')
        fields = fields.updated(k, value())
        skipWs()
        if (!eof && s(pos) == ',') pos += 1
        else { expect('}'); done = true }
      }
      JObj(fields)
    }

    private def arr(): JArr = {
      expect('[')
      skipWs()
      var items = Vector.empty[JVal]
      if (!eof && s(pos) == ']') { pos += 1; return JArr(items) }
      var done = false
      while (!done) {
        items :+= value()
        skipWs()
        if (!eof && s(pos) == ',') pos += 1
        else { expect(']'); done = true }
      }
      JArr(items)
    }

    private def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (!eof && s(pos) != '"') {
        val c = s(pos)
        if (c == '\\') {
          pos += 1
          if (eof) fail("bad escape")
          s(pos) match {
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case '/' => sb.append('/')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case 'u' =>
              if (pos + 4 >= s.length) fail("bad \\u escape")
              sb.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar)
              pos += 4
            case other => fail(s"bad escape \\$other")
          }
        } else sb.append(c)
        pos += 1
      }
      expect('"')
      sb.toString
    }

    private def number(): JNum = {
      val start = pos
      if (!eof && (s(pos) == '-' || s(pos) == '+')) pos += 1
      while (!eof && (s(pos).isDigit || s(pos) == '.' || s(pos) == 'e' ||
        s(pos) == 'E' || s(pos) == '-' || s(pos) == '+')) pos += 1
      if (pos == start) fail("expected value")
      JNum(BigDecimal(s.substring(start, pos)))
    }
  }
}
