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

  /** Statement names referenced as plain relations (crude but sufficient for
    * the batch-safety classifier: unresolved relation idents in FROM/JOIN). */
  def prepare(sql: String): Seq[String] =
    split(stripComments(sql)).map(rewriteParams)
}
