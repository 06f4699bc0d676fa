package graft.functions

import graft.server.Json

/** SQLite json_set / json_patch semantics over the engine's JSON codec
  * (behavioral spec: the SQLite JSON1 functions the module-SQL whitelist
  * exposes, /root/reference/leaf-stream/src/lib.rs:1104-1110).
  *
  * JSON object key order is not semantic; rendered key order may differ
  * from SQLite's insertion order.
  */
object JsonShims {

  private def parse(doc: String): Any = Json.parse(doc)

  /** RFC 7386 merge-patch: objects merge recursively, null in the patch
    * removes the key, everything else replaces. */
  def jsonPatch(target: String, patch: String): String =
    if (target == null || patch == null) null
    else Json.render(merge(parse(target), parse(patch)))

  private def merge(target: Any, patch: Any): Any = patch match {
    case pm: Map[_, _] =>
      val p = pm.asInstanceOf[Map[String, Any]]
      val t = target match {
        case tm: Map[_, _] => tm.asInstanceOf[Map[String, Any]]
        case _ => Map.empty[String, Any]
      }
      p.foldLeft(t) { case (acc, (k, v)) =>
        if (v == null) acc - k
        else acc + (k -> merge(acc.getOrElse(k, null), v))
      }
    case v => v
  }

  /** json_set(doc, '$.a.b', value): sets an object path, creating
    * intermediate objects. SQL-value coercion follows SQLite: numeric and
    * boolean SQL values (which reach the string-typed UDF as their literal
    * forms) become JSON numbers/booleans, but a TEXT value is ALWAYS
    * inserted as a JSON string — even when it happens to look like a JSON
    * object or array (json_set('{}','$.c','{"e":5}') yields
    * {"c":"{\"e\":5}"} in SQLite; composite values only enter via the
    * json() function, which the whitelist does not expose). */
  def jsonSet(doc: String, path: String, value: String): String = {
    if (doc == null || path == null) return null
    require(path.startsWith("$"), s"json path must start with $$: $path")
    val segs = path.stripPrefix("$").split('.').toList.filter(_.nonEmpty)
    val v: Any =
      if (value == null) null
      else try {
        parse(value) match {
          case n: Long => n
          case d: Double => d
          case b: Boolean => b
          case _ => value // objects/arrays/strings: SQL TEXT stays TEXT
        }
      } catch { case _: Exception => value }
    Json.render(set(parse(doc), segs, v))
  }

  private def set(doc: Any, segs: List[String], v: Any): Any = segs match {
    case Nil => v
    case s :: rest =>
      val m = doc match {
        case mm: Map[_, _] => mm.asInstanceOf[Map[String, Any]]
        case _ => Map.empty[String, Any]
      }
      m + (s -> set(m.getOrElse(s, null), rest, v))
  }
}
