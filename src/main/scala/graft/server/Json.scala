package graft.server

import scala.collection.mutable

/** Minimal JSON parse/render (zero-dependency; server wire format).
  * Values map to: null, Boolean, Long, Double, String, Vector[Any],
  * Map[String, Any]. */
object Json {

  def render(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case l: Long => l.toString
    case i: Int => i.toString
    case d: Double =>
      if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString + ".0"
      else d.toString
    case s: String => quote(s)
    case m: Map[_, _] =>
      m.map { case (k, vv) => quote(k.toString) + ":" + render(vv) }.mkString("{", ",", "}")
    case xs: Iterable[_] => xs.map(render).mkString("[", ",", "]")
    case xs: Array[_] => xs.map(render).mkString("[", ",", "]")
    case other => quote(other.toString)
  }

  def quote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  def parse(s: String): Any = new P(s).parseValue()

  private final class P(s: String) {
    private var i = 0
    // container recursion cap: "[[[[..." drives stack depth linearly with
    // input length, and the resulting StackOverflowError is an Error the
    // request handlers' Exception recovery would not catch
    private var depth = 0
    private def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def fail(msg: String) =
      throw new IllegalArgumentException(s"json error at $i: $msg")

    def parseValue(): Any = {
      ws()
      if (i >= s.length) fail("eof")
      depth += 1
      if (depth > 128) fail("nesting deeper than 128")
      try parseValue0() finally depth -= 1
    }

    private def parseValue0(): Any = {
      s.charAt(i) match {
        case '{' =>
          i += 1; ws()
          val m = mutable.LinkedHashMap.empty[String, Any]
          if (i < s.length && s.charAt(i) == '}') { i += 1; return m.toMap }
          while (true) {
            ws()
            val k = parseString()
            ws(); if (s.charAt(i) != ':') fail("expected :"); i += 1
            m(k) = parseValue()
            ws()
            s.charAt(i) match {
              case ',' => i += 1
              case '}' => i += 1; return m.toMap
              case c => fail(s"expected , or } got $c")
            }
          }
          m.toMap
        case '[' =>
          i += 1; ws()
          val b = Vector.newBuilder[Any]
          if (i < s.length && s.charAt(i) == ']') { i += 1; return b.result() }
          while (true) {
            b += parseValue()
            ws()
            s.charAt(i) match {
              case ',' => i += 1
              case ']' => i += 1; return b.result()
              case c => fail(s"expected , or ] got $c")
            }
          }
          b.result()
        case '"' => parseString()
        case 't' => expect("true"); true
        case 'f' => expect("false"); false
        case 'n' => expect("null"); null
        case _ =>
          val start = i
          while (i < s.length && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
          val tok = s.substring(start, i)
          // integers beyond Long range degrade to Double instead of blowing
          // up the whole request; non-numeric garbage is a parse error
          try {
            if (tok.exists(c => c == '.' || c == 'e' || c == 'E')) tok.toDouble
            else tok.toLong
          } catch {
            case _: NumberFormatException =>
              try tok.toDouble
              catch { case _: NumberFormatException => fail(s"bad number '$tok'") }
          }
      }
    }

    private def expect(lit: String): Unit = {
      if (!s.startsWith(lit, i)) fail(s"expected $lit")
      i += lit.length
    }

    private def parseString(): String = {
      if (s.charAt(i) != '"') fail("expected string")
      i += 1
      val sb = new StringBuilder
      while (s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          s.charAt(i) match {
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case '/' => sb.append('/')
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'u' =>
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
              i += 4
            case c2 => fail(s"bad escape $c2")
          }
          i += 1
        } else { sb.append(c); i += 1 }
      }
      i += 1
      sb.toString
    }
  }
}
