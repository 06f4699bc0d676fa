package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udf

import graft.types.LeafAuthException

/** Host function surface of the engine, registered on a SparkSession.
  *
  * The reference exposes exactly four host UDFs to module SQL —
  * drisl_extract, drisl_exists, throw, unauthorized
  * (/root/reference/leaf-stream/src/module/basic.rs:250-349) — plus a
  * whitelisted set of SQLite builtins (lib.rs:1104-1110). Spark covers the
  * builtin surface natively; the few names SQLite spells differently are
  * registered here as inlined SQL UDFs (they fold into Catalyst expressions,
  * so they stay inside whole-stage codegen).
  *
  * `drisl_extract` in the reference returns a dynamically-typed SQLite value
  * (drisl_extract.rs:17-30). Spark expressions are statically typed, so the
  * generic form returns STRING with SQLite text-affinity-style rendering
  * (Map/Array → JSON, matching the reference), and typed variants
  * (_long/_double/_bool/_blob) return native types for use in typed
  * comparisons. Absent paths and DRISL null both yield SQL NULL, exactly as
  * the reference collapses them (basic.rs:325); `drisl_exists` distinguishes
  * presence (basic.rs:343-345).
  */
object LeafFunctions {

  private def fmtArg(v: Any): String = v match {
    case null => "NULL"
    case b: Array[Byte] => b.map("%02X".format(_)).mkString // blobs hex-uppercase (basic.rs:271-276)
    case other => other.toString
  }

  /** Register all host functions; idempotent per session. */
  def register(spark: SparkSession): Unit = {
    val marker = "graft.functions.registered"
    if (spark.conf.getOption(marker).contains("true")) return

    // drisl_extract family: native Catalyst expressions (no UDF round-trip,
    // parsed-path caching for literal paths)
    DrislExpressions.register(spark)
    // array kernels for dedup/similarity module SQL
    VectorExpressions.register(spark)

    // Control-flow UDFs: always raise; SQL uses them inside CASE/IIF to veto
    // an event (authorizer) or hide rows (query). 1- and 2-arg arities cover
    // all in-reference usage; wrap more args with concat_ws.
    spark.udf.register("throw",
      udf((a: Any) => { throw new LeafAuthException(fmtArg(a)); 0L }: Long))
    spark.udf.register("throw2",
      udf((a: Any, b: Any) => { throw new LeafAuthException(fmtArg(a) + " " + fmtArg(b)); 0L }: Long))
    spark.udf.register("unauthorized",
      udf((a: Any) => { throw new LeafAuthException("unauthorized: " + fmtArg(a)); 0L }: Long))

    // SQLite-dialect shim: names the whitelist spells differently
    // (lib.rs:1104-1110). SQL UDFs inline into the plan at analysis time.
    // `iif` (polymorphic) and `total` (aggregate) cannot be SQL UDFs — they
    // are rewritten at the SQL-text layer instead (SqlText.dialectRewrite).
    val strftimeMap = Seq(
      "%Y" -> "yyyy", "%m" -> "MM", "%d" -> "dd",
      "%H" -> "HH", "%M" -> "mm", "%S" -> "ss", "%j" -> "DDD")
      .foldLeft("fmt") { case (e, (a, b)) => s"replace($e, '$a', '$b')" }
    val shims = Seq(
      "CREATE OR REPLACE TEMPORARY FUNCTION ifnull_long(a BIGINT, b BIGINT) RETURNS BIGINT RETURN COALESCE(a, b)",
      "CREATE OR REPLACE TEMPORARY FUNCTION unixepoch(t TIMESTAMP) RETURNS BIGINT RETURN unix_timestamp(t)",
      s"CREATE OR REPLACE TEMPORARY FUNCTION strftime(fmt STRING, t TIMESTAMP) RETURNS STRING RETURN date_format(t, $strftimeMap)",
      "CREATE OR REPLACE TEMPORARY FUNCTION group_concat_sorted(xs ARRAY<STRING>) RETURNS STRING RETURN array_join(sort_array(xs), ',')",
      // SQLite names Spark lacks; JSON docs are text, so STRING-typed SQL
      // UDFs preserve semantics exactly
      "CREATE OR REPLACE TEMPORARY FUNCTION json_extract(doc STRING, p STRING) RETURNS STRING RETURN get_json_object(doc, p)",
      "CREATE OR REPLACE TEMPORARY FUNCTION datetime(t TIMESTAMP) RETURNS STRING RETURN date_format(t, 'yyyy-MM-dd HH:mm:ss')")
    shims.foreach(spark.sql(_))

    // SQLite json_set / json_patch (RFC 7386 merge): no Spark equivalent —
    // implemented over the engine's JSON codec. Object-key paths ($.a.b);
    // the value argument is parsed as JSON when valid, else taken as text
    // (matching SQLite's SQL-value-to-JSON coercion for strings/numbers).
    spark.udf.register("json_set",
      udf((doc: String, path: String, value: String) => JsonShims.jsonSet(doc, path, value)))
    spark.udf.register("json_patch",
      udf((a: String, b: String) => JsonShims.jsonPatch(a, b)))

    spark.conf.set(marker, "true")
  }

  /** Unwrap Spark's UDF exception wrapping to find a LeafAuthException. */
  def authFailure(t: Throwable): Option[LeafAuthException] = {
    var cur: Throwable = t
    var depth = 0
    while (cur != null && depth < 20) {
      cur match {
        case l: LeafAuthException => return Some(l)
        case _ => cur = cur.getCause; depth += 1
      }
    }
    None
  }
}
