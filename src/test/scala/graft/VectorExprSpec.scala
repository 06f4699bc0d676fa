package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorExpressions

/** Native array-kernel expressions (codegen, no UDF boxing). */
class VectorExprSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkFixture.spark
    VectorExpressions.register(s)
    s
  }

  test("sorted_intersect_count merges sorted long arrays") {
    assert(spark.sql(
      "SELECT sorted_intersect_count(array(1L,3L,5L,7L), array(3L,4L,5L,9L))")
      .head().getLong(0) == 2L)
    assert(spark.sql(
      "SELECT sorted_intersect_count(array(1L,2L), array(3L,4L))")
      .head().getLong(0) == 0L)
    assert(spark.sql(
      "SELECT sorted_intersect_count(CAST(NULL AS ARRAY<BIGINT>), array(1L))")
      .head().isNullAt(0))
    // runs inside a whole-stage-codegen pipeline over many rows
    import spark.implicits._
    val n = (1 to 1000).map(i => (Seq(i.toLong, i + 1L), Seq(i.toLong)))
      .toDF("a", "b")
      .selectExpr("sorted_intersect_count(a, b) AS c")
      .agg(org.apache.spark.sql.functions.sum("c")).head().getLong(0)
    assert(n == 1000L)
  }

  test("cosine_sim computes double cosine over float arrays") {
    def f(s: String) = s"CAST($s AS FLOAT)"
    assert(spark.sql(
      s"SELECT cosine_sim(array(${f("1.0")}, ${f("2.0")}), array(${f("1.0")}, ${f("2.0")}))")
      .head().getDouble(0) == 1.0)
    assert(spark.sql(
      s"SELECT cosine_sim(array(${f("1.0")}, ${f("0.0")}), array(${f("0.0")}, ${f("1.0")}))")
      .head().getDouble(0) == 0.0)
    assert(spark.sql(
      s"SELECT cosine_sim(CAST(NULL AS ARRAY<FLOAT>), array(${f("1.0")}))")
      .head().isNullAt(0))
  }

  test("md5_60 equals the conv(substring(md5)) hex-prefix formula") {
    // mixed lengths incl. empty, unicode, and long strings — the kernel
    // must agree bit-for-bit with the expression it replaces (which is
    // also what the DuckDB oracle computes)
    import spark.implicits._
    val rows = (0 until 500).map(i => "s" * (i % 97) + s"payload$i") ++
      Seq("", "a", "日本語テキスト", "x" * 10000)
    val diff = rows.toDF("s").selectExpr(
      "md5_60(s) AS fast",
      "CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT) AS ref")
      .filter("fast != ref OR fast IS NULL OR fast < 0").count()
    assert(diff == 0L)
  }
}
