package graft.drisl

/** Path-expression engine for `drisl_extract` / `drisl_exists`.
  *
  * Grammar (behavioral spec: /root/reference/leaf-stream/src/drisl_extract.rs:67-85):
  *   expr          := "." segment ("." segment)*
  *   segment       := "?discriminant" | <digits> | field
  *   field         := ident | '"' any-but-quote* '"'
  *   ident         := [$a-zA-Z] ([0-9a-zA-Z] | "\.")*
  * The leading "." is mandatory; a bare "." yields a single empty-field
  * segment is NOT allowed (empty expr "." parses to zero segments only when
  * the segment list is empty — the reference's `** "."` allows "." ⇒ [] ⇒
  * identity extraction).
  *
  * Extraction semantics (drisl_extract.rs:32-62):
  *   - field on Map      → value at key (None if absent)
  *   - index on Array    → element (None if out of range)
  *   - ?discriminant on Map  → its single key as Text iff map has exactly 1 key
  *   - ?discriminant on Text → the text itself (unit enum variants encode as text)
  *   - anything else     → None (absent)
  * `extract` collapses absent and DRISL-null to SQL NULL; `exists`
  * distinguishes them (basic.rs:325,343-345).
  */
object DrislPath {
  sealed trait Seg
  case class Field(name: String) extends Seg
  case class Index(i: Int) extends Seg
  case object Discriminant extends Seg

  /** Parse a path expression; throws IllegalArgumentException on bad syntax. */
  def parse(expr: String): List[Seg] = {
    if (expr.isEmpty || expr.charAt(0) != '.')
      throw new IllegalArgumentException(s"drisl path must start with '.': '$expr'")
    if (expr == ".") return Nil
    val segs = List.newBuilder[Seg]
    var pos = 1
    val n = expr.length
    def fail(msg: String) = throw new IllegalArgumentException(s"bad drisl path '$expr' at $pos: $msg")
    var expectSegment = true
    while (pos < n || expectSegment) {
      if (pos >= n) fail("trailing '.'")
      val c = expr.charAt(pos)
      if (c == '?') {
        if (!expr.startsWith("?discriminant", pos)) fail("expected ?discriminant")
        segs += Discriminant; pos += "?discriminant".length
      } else if (c.isDigit) {
        val start = pos
        while (pos < n && expr.charAt(pos).isDigit) pos += 1
        segs += Index(expr.substring(start, pos).toInt)
      } else if (c == '"') {
        pos += 1
        val start = pos
        while (pos < n && expr.charAt(pos) != '"') pos += 1
        if (pos >= n) fail("unterminated quote")
        segs += Field(expr.substring(start, pos)); pos += 1
      } else if (c == '$' || c.isLetter) {
        val sb = new StringBuilder
        sb.append(c); pos += 1
        var done = false
        while (!done && pos < n) {
          val ch = expr.charAt(pos)
          if (ch.isLetterOrDigit) { sb.append(ch); pos += 1 }
          else if (ch == '\\' && pos + 1 < n && expr.charAt(pos + 1) == '.') {
            sb.append('.'); pos += 2
          } else done = true
        }
        segs += Field(sb.toString)
      } else fail(s"unexpected char '$c'")
      expectSegment = false
      if (pos < n) {
        if (expr.charAt(pos) != '.') fail(s"expected '.' got '${expr.charAt(pos)}'")
        pos += 1; expectSegment = true
      }
    }
    segs.result()
  }

  /** Walk the path; None = absent (vs Some(DNull) = present-but-null). */
  def extract(value: DValue, segs: List[Seg]): Option[DValue] = segs match {
    case Nil => Some(value)
    case seg :: rest =>
      import DValue._
      val next: Option[DValue] = (seg, value) match {
        case (Field(f), DMap(m)) => m.get(f)
        case (Index(i), DArray(a)) => a.lift(i)
        case (Discriminant, DMap(m)) if m.size == 1 => Some(DText(m.keysIterator.next()))
        case (Discriminant, t @ DText(_)) => Some(t)
        case _ => None
      }
      next.flatMap(extract(_, rest))
  }

  def extract(value: DValue, expr: String): Option[DValue] =
    extract(value, parse(expr))
}
