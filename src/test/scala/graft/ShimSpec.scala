package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.LeafFunctions
import graft.stream.SqlText
import graft.types.LeafAuthException

/** SQLite-dialect shim functions + control-flow UDFs through SQL. */
class ShimSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkFixture.spark
    LeafFunctions.register(s)
    s
  }

  // module SQL reaches the engine through SqlText.prepare, which applies
  // the dialect rewrite for calls that cannot be SQL UDFs (total, iif)
  private def sqlPrepared(q: String) = spark.sql(SqlText.dialectRewrite(q))

  test("dialect shims evaluate like their SQLite namesakes") {
    val r = sqlPrepared(
      """SELECT
        |  iif(1 < 2, 'yes', 'no') AS a,
        |  total(CAST(NULL AS DOUBLE)) AS b,
        |  total(2.5D) AS c,
        |  unixepoch(TIMESTAMP '1970-01-02 00:00:00') AS d,
        |  strftime('%Y-%m-%d', TIMESTAMP '1996-03-05 10:00:00') AS e,
        |  group_concat_sorted(array('b', 'a', 'c')) AS f""".stripMargin).head()
    assert(r.getString(0) == "yes")
    assert(r.getDouble(1) == 0.0) // total() never returns NULL
    assert(r.getDouble(2) == 2.5)
    assert(r.getLong(3) == 86400L)
    assert(r.getString(4) == "1996-03-05")
    assert(r.getString(5) == "a,b,c")
  }

  test("total() is an aggregate: sums the group, 0.0 when empty/all-NULL") {
    val r = sqlPrepared(
      """SELECT k, total(v) AS t FROM VALUES
        |  (1, 2.5D), (1, NULL), (1, 1.5D), (2, NULL) AS t(k, v)
        |GROUP BY k ORDER BY k""".stripMargin).collect()
    assert(r.map(x => (x.getInt(0), x.getDouble(1))).toSeq == Seq((1, 4.0), (2, 0.0)))
    // whole-table aggregate, no GROUP BY
    assert(sqlPrepared("SELECT total(x) AS t FROM VALUES (CAST(NULL AS DOUBLE)) AS t(x)")
      .head().getDouble(0) == 0.0)
  }

  test("iif is polymorphic: numeric and nested calls survive the rewrite") {
    val r = sqlPrepared(
      "SELECT iif(1 < 2, 1, 2) AS a, iif(1 > 2, 1.5D, iif(true, 2.5D, 3.5D)) AS b").head()
    assert(r.getInt(0) == 1)
    assert(r.getDouble(1) == 2.5)
    // calls inside string literals are left alone
    assert(sqlPrepared("SELECT 'total(x)' AS s").head().getString(0) == "total(x)")
  }

  test("iif coerces numeric conditions like SQLite (nonzero = true)") {
    // SQLite treats any nonzero numeric condition as true; Spark's `if`
    // demands BOOLEAN — the rewrite inserts the cast
    val r = sqlPrepared(
      """SELECT iif(count(*), 'y', 'n') AS a, iif(0, 'y', 'n') AS b,
        |       iif(sum(x) - 3, 'y', 'n') AS c
        |FROM VALUES (1), (2) AS t(x)""".stripMargin).head()
    assert(r.getString(0) == "y")
    assert(r.getString(1) == "n")
    assert(r.getString(2) == "n")
  }

  test("json operators and missing-name shims cover the whitelist") {
    // -> / ->> operators rewrite to get_json_object; bare keys get $.
    val r = sqlPrepared(
      """SELECT doc ->> '$.a' AS a, doc -> 'b' AS b
        |FROM (SELECT '{"a": 1, "b": "x"}' AS doc)""".stripMargin).head()
    assert(r.getString(0) == "1" && r.getString(1) == "x")
    // operators inside string literals are untouched
    assert(sqlPrepared("SELECT 'a ->> b' AS s").head().getString(0) == "a ->> b")
    // format -> printf; date_format must NOT be rewritten
    val f = sqlPrepared(
      """SELECT format('%d-%s', 7, 'x') AS a,
        |       date_format(TIMESTAMP '1996-03-05 00:00:00', 'yyyy') AS b""".stripMargin).head()
    assert(f.getString(0) == "7-x" && f.getString(1) == "1996")
    // group_concat -> listagg (default ',', explicit separator honored)
    val g = sqlPrepared(
      """SELECT group_concat(x) AS a, group_concat(x, '|') AS b
        |FROM (SELECT explode(array('p')) AS x)""".stripMargin).head()
    assert(g.getString(0) == "p" && g.getString(1) == "p")
    // json constructors
    val j = sqlPrepared(
      "SELECT json_object('k', 5) AS o, json_array(1, 2) AS a").head()
    assert(j.getString(0) == "{\"k\":5}" && j.getString(1) == "[1,2]")
    assert(sqlPrepared(
      "SELECT json_group_array(x) AS g FROM (SELECT explode(array(3)) AS x)")
      .head().getString(0) == "[3]")
    // json_extract / json_set / json_patch
    val je = sqlPrepared(
      """SELECT json_extract('{"a": {"b": 2}}', '$.a.b') AS e,
        |       json_set('{"a": 1}', '$.c', 5) AS s,
        |       json_patch('{"a": 1, "b": 2}', '{"b": null, "c": 3}') AS p""".stripMargin).head()
    assert(je.getString(0) == "2")
    assert(graft.server.Json.parse(je.getString(1)) ==
      Map("a" -> 1L, "c" -> 5L))
    // SQLite inserts TEXT values as JSON STRINGS even when they look like
    // JSON (json1 docs: json_set('{}','$.c','{"e":5}') → {"c":"{\"e\":5}"});
    // composite values only enter via json(), which the whitelist omits
    val js = sqlPrepared(
      """SELECT json_set('{}', '$.c', '{"e":5}') AS a,
        |       json_set('{}', '$.c', '[1,2]') AS b""".stripMargin).head()
    assert(graft.server.Json.parse(js.getString(0)) == Map("c" -> "{\"e\":5}"))
    assert(graft.server.Json.parse(js.getString(1)) == Map("c" -> "[1,2]"))
    assert(graft.server.Json.parse(je.getString(2)) ==
      Map("a" -> 1L, "c" -> 3L))
  }

  test("strftime covers %M/%S/%j (full SQLite format map)") {
    val r = sqlPrepared(
      """SELECT strftime('%Y-%m-%d %H:%M:%S', TIMESTAMP '1996-03-05 10:07:09') AS a,
        |       strftime('%j', TIMESTAMP '1996-02-01 00:00:00') AS b""".stripMargin).head()
    assert(r.getString(0) == "1996-03-05 10:07:09")
    assert(r.getString(1) == "032")
  }

  test("throw/unauthorized raise catchable auth failures from SQL") {
    val e1 = intercept[Exception](
      spark.sql("SELECT CASE WHEN 1 = 1 THEN unauthorized('nope') ELSE 0 END").collect())
    assert(LeafFunctions.authFailure(e1).exists(_.getMessage.contains("nope")))
    val e2 = intercept[Exception](
      spark.sql("SELECT throw2('bad', 'value')").collect())
    assert(LeafFunctions.authFailure(e2).exists(_.getMessage == "bad value"))
    // conditional non-taken branch must NOT raise
    assert(spark.sql("SELECT CASE WHEN 1 = 2 THEN unauthorized('x') ELSE 7 END")
      .head().getLong(0) == 7L)
  }

  test("authFailure unwraps deep cause chains only") {
    assert(LeafFunctions.authFailure(new RuntimeException("plain")).isEmpty)
    val nested = new RuntimeException("outer",
      new RuntimeException("mid", new LeafAuthException("inner")))
    assert(LeafFunctions.authFailure(nested).exists(_.getMessage == "inner"))
  }
}
