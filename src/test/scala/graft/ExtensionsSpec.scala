package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.drisl.DValue._
import graft.drisl.Drisl

/** The drisl_* functions load purely via the spark.sql.extensions config —
  * a brand-new session (fresh SessionState, no imperative registration
  * call) must resolve them from the injected builders alone. */
class ExtensionsSpec extends AnyFunSuite {

  test("functions inject via spark.sql.extensions config") {
    // newSession() builds a fresh function registry from the conf, so it
    // has NEVER seen LeafFunctions.register — only the extensions class
    val s2 = SparkFixture.spark.newSession()
    import s2.implicits._
    Seq(Tuple1(Drisl.encode(obj("x" -> int(5), "s" -> text("hi")))))
      .toDF("payload").createOrReplaceTempView("pext")
    val r = s2.sql(
      """SELECT drisl_extract_long(payload, '.x') AS x,
        |       drisl_extract(payload, '.s') AS s,
        |       drisl_exists(payload, '.nope') AS e
        |FROM pext""".stripMargin).head()
    assert(r.getLong(0) == 5L)
    assert(r.getString(1) == "hi")
    assert(r.getLong(2) == 0L)
    assert(s2.sql("SELECT sorted_intersect_count(array(1L,2L), array(2L,3L))")
      .head().getLong(0) == 1L)
    assert(s2.sql(
      """SELECT md5_60('abc') =
        |  CAST(conv(substring(md5('abc'), 1, 15), 16, 10) AS BIGINT)""".stripMargin)
      .head().getBoolean(0))
  }
}
