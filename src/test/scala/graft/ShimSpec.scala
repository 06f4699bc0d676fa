package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.LeafFunctions
import graft.types.LeafAuthException

/** SQLite-dialect shim functions + control-flow UDFs through SQL. */
class ShimSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkFixture.spark
    LeafFunctions.register(s)
    s
  }

  test("dialect shims evaluate like their SQLite namesakes") {
    val r = spark.sql(
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
