package graft.stream

/** SQL text utilities for module SQL execution.
  *
  * The reference strips `--` comments with a regex and splits statements
  * naively on ';' (/root/reference/leaf-stream/src/module.rs:19-20,
  * module/basic.rs:181-187, marked TODO there). We keep the same observable
  * behavior but respect quoted strings, and rewrite SQLite's `$param`
  * binding syntax to Spark's `:param` named-parameter markers.
  */
object SqlText {

  /** Remove `--` line comments (outside single-quoted strings). */
  def stripComments(sql: String): String = {
    val sb = new StringBuilder
    var i = 0
    var inStr = false
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (inStr) {
        sb.append(c)
        if (c == '\'') inStr = false
        i += 1
      } else if (c == '\'') { inStr = true; sb.append(c); i += 1 }
      else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        while (i < n && sql.charAt(i) != '\n') i += 1
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Split on ';' outside quoted strings; drop blank statements. */
  def split(sql: String): Seq[String] = {
    val parts = Seq.newBuilder[String]
    val sb = new StringBuilder
    var inStr = false
    sql.foreach { c =>
      if (inStr) { sb.append(c); if (c == '\'') inStr = false }
      else if (c == '\'') { inStr = true; sb.append(c) }
      else if (c == ';') { parts += sb.toString; sb.clear() }
      else sb.append(c)
    }
    parts += sb.toString
    parts.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Rewrite `$name` parameter references to `:name` (Spark named markers),
    * outside quoted strings and only for identifier-shaped names. */
  def rewriteParams(sql: String): String = {
    val sb = new StringBuilder
    var i = 0
    var inStr = false
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (inStr) { sb.append(c); if (c == '\'') inStr = false; i += 1 }
      else if (c == '\'') { inStr = true; sb.append(c); i += 1 }
      else if (c == '$' && i + 1 < n &&
        (sql.charAt(i + 1).isLetter || sql.charAt(i + 1) == '_')) {
        sb.append(':'); i += 1
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Index of the ')' matching the '(' at `open`, skipping quoted strings;
    * -1 if unbalanced. */
  private def matchingClose(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    var inStr = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** Rewrite every call of `fn(...)` (case-insensitive, outside string
    * literals, nested calls included) via `render(argText)`. */
  private def rewriteCall(sql: String, fn: String)(render: String => String): String = {
    val lower = sql.toLowerCase
    val sb = new StringBuilder
    var i = 0
    var inStr = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inStr) { sb.append(c); if (c == '\'') inStr = false; i += 1 }
      else if (c == '\'') { inStr = true; sb.append(c); i += 1 }
      else if (lower.startsWith(fn, i) &&
        (i == 0 || { val p = sql.charAt(i - 1); !p.isLetterOrDigit && p != '_' && p != '.' })) {
        var j = i + fn.length
        while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
        if (j < sql.length && sql.charAt(j) == '(') {
          val close = matchingClose(sql, j)
          if (close > 0) {
            val inner = rewriteCall(sql.substring(j + 1, close), fn)(render)
            sb.append(render(inner))
            i = close + 1
          } else { sb.append(sql.charAt(i)); i += 1 }
        } else { sb.append(sql.charAt(i)); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Index of the first top-level comma, respecting parens and string
    * literals; -1 when the argument list has a single argument. */
  private def firstTopLevelComma(s: String): Int = {
    var depth = 0; var inStr = false; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** True iff the argument text contains a top-level comma (two or more
    * arguments), respecting parens and string literals. */
  private def hasTopLevelComma(s: String): Boolean = firstTopLevelComma(s) >= 0

  /** true for positions inside single-quoted literals. */
  private def literalMask(s: String): Array[Boolean] = {
    val a = new Array[Boolean](s.length)
    var inStr = false
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\'') { a(i) = true; inStr = !inStr }
      else a(i) = inStr
      i += 1
    }
    a
  }

  // SQLite JSON operators `->` / `->>` with an identifier lhs and a
  // literal rhs (the shapes module SQL uses); bare keys get the '$.'
  // prefix, integer rhs selects an array element
  private val jsonOp =
    "([A-Za-z_][A-Za-z0-9_$\\.]*)\\s*(->>|->)\\s*('(?:[^'])*'|\\d+)".r

  /** Rewrite `col ->> '$.x'` / `col -> 'x'` / `col -> 0` to
    * get_json_object (which unquotes scalars, SQLite's ->> semantics). */
  def rewriteJsonOps(sql: String): String = {
    val mask = literalMask(sql)
    val m = jsonOp.pattern.matcher(sql)
    val sb = new StringBuffer
    while (m.find()) {
      val repl =
        if (mask(m.start())) m.group(0)
        else {
          val lhs = m.group(1)
          val rhs = m.group(3)
          val path =
            if (rhs.startsWith("'")) {
              val inner = rhs.substring(1, rhs.length - 1)
              if (inner.startsWith("$")) s"'$inner'" else s"'$$.$inner'"
            } else s"'$$[$rhs]'"
          s"get_json_object($lhs, $path)"
        }
      m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(repl))
    }
    m.appendTail(sb)
    sb.toString
  }

  /** SQLite-dialect calls that cannot be SQL UDFs, rewritten at the text
    * layer (whitelist: /root/reference/leaf-stream/src/lib.rs:1104-1110):
    *  - total(x): SQLite's never-null float *aggregate* — a scalar UDF would
    *    coalesce per row instead of summing the group
    *  - iif(c,a,b): polymorphic — a typed SQL UDF would stringify numerics
    *  - group_concat: aggregate → listagg (default separator ',')
    *  - format → printf (same C-style formatting, different name)
    *  - json_object/json_array/json_group_array → to_json over
    *    named_struct/array/collect_list
    *  - `->` / `->>` operators → get_json_object
    */
  def dialectRewrite(sql: String): String = {
    var t = rewriteJsonOps(sql)
    t = rewriteCall(t, "total")(a => s"coalesce(sum(cast(($a) as double)), 0.0d)")
    // SQLite coerces a numeric condition (nonzero = true); Spark's `if`
    // demands BOOLEAN, so the condition gets an explicit cast — without it
    // `iif(count(*), a, b)` fails analysis instead of coercing
    t = rewriteCall(t, "iif") { a =>
      firstTopLevelComma(a) match {
        case -1 => s"if($a)"
        case cut =>
          s"if(cast((${a.substring(0, cut)}) as boolean),${a.substring(cut + 1)})"
      }
    }
    t = rewriteCall(t, "format")(a => s"printf($a)")
    t = rewriteCall(t, "group_concat")(a =>
      if (hasTopLevelComma(a)) s"listagg($a)" else s"listagg($a, ',')")
    t = rewriteCall(t, "json_group_array")(a => s"to_json(collect_list($a))")
    t = rewriteCall(t, "json_object")(a => s"to_json(named_struct($a))")
    t = rewriteCall(t, "json_array")(a => s"to_json(array($a))")
    t
  }

  /** Statement names referenced as plain relations (crude but sufficient for
    * the batch-safety classifier: unresolved relation idents in FROM/JOIN). */
  def prepare(sql: String): Seq[String] =
    split(stripComments(sql)).map(s => dialectRewrite(rewriteParams(s)))
}
