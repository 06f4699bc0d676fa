package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.drisl.DValue._
import graft.drisl.Drisl
import graft.functions.LeafFunctions

/** Native Catalyst drisl_* expressions through the SQL surface. */
class DrislExprSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkFixture.spark
    LeafFunctions.register(s)
    s
  }

  private def withPayload[T](v: Array[Byte])(f: => T): T = {
    import spark.implicits._
    Seq(Tuple1(v)).toDF("payload").createOrReplaceTempView("p")
    f
  }

  private val sample = Drisl.encode(obj(
    "name" -> text("ada"),
    "n" -> int(41),
    "score" -> DFloat(2.5),
    "flag" -> DBool(true),
    "absentSib" -> DNull,
    "tags" -> arr(text("x"), text("y")),
    "nested" -> obj("deep" -> int(7))))

  private def q1(sql: String): Any =
    withPayload(sample)(spark.sql(sql).head().get(0))

  test("drisl_extract renders text affinity values") {
    assert(q1("SELECT drisl_extract(payload, '.name') FROM p") == "ada")
    assert(q1("SELECT drisl_extract(payload, '.n') FROM p") == "41")
    assert(q1("SELECT drisl_extract(payload, '.score') FROM p") == "2.5")
    assert(q1("SELECT drisl_extract(payload, '.flag') FROM p") == "1")
    assert(q1("SELECT drisl_extract(payload, '.tags') FROM p") == "[\"x\",\"y\"]")
    assert(q1("SELECT drisl_extract(payload, '.nested.deep') FROM p") == "7")
    assert(q1("SELECT drisl_extract(payload, '.missing') FROM p") == null)
    assert(q1("SELECT drisl_extract(payload, '.absentSib') FROM p") == null)
  }

  test("typed variants return native types") {
    assert(q1("SELECT drisl_extract_long(payload, '.n') FROM p") == 41L)
    assert(q1("SELECT drisl_extract_long(payload, '.flag') FROM p") == 1L)
    assert(q1("SELECT drisl_extract_double(payload, '.score') FROM p") == 2.5)
    assert(q1("SELECT drisl_extract_double(payload, '.n') FROM p") == 41.0)
    assert(q1("SELECT drisl_extract_long(payload, '.name') FROM p") == null)
  }

  test("drisl_exists distinguishes present-null from absent") {
    assert(q1("SELECT drisl_exists(payload, '.absentSib') FROM p") == 1L)
    assert(q1("SELECT drisl_exists(payload, '.missing') FROM p") == 0L)
    assert(q1("SELECT drisl_exists(payload, '.nested.deep') FROM p") == 1L)
  }

  test("typed comparison works in a WHERE clause (materializer shape)") {
    val n = withPayload(sample)(
      spark.sql("SELECT 1 FROM p WHERE drisl_extract_long(payload, '.n') > 40").count())
    assert(n == 1L)
  }

  test("non-literal path still evaluates (no static cache)") {
    import spark.implicits._
    Seq((sample, ".name"), (sample, ".n")).toDF("payload", "pth")
      .createOrReplaceTempView("p2")
    val got = spark.sql("SELECT drisl_extract(payload, pth) FROM p2 ORDER BY pth")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("41", "ada"))
  }

  test("drisl_exists on NULL payload is 0, never NULL (nullable=false contract)") {
    import spark.implicits._
    Seq(Tuple1(null: Array[Byte]), Tuple1(sample)).toDF("payload")
      .createOrReplaceTempView("pmix")
    val got = spark.sql("SELECT drisl_exists(payload, '.name') AS e FROM pmix")
      .collect().map(_.get(0)).toSeq
    assert(!got.contains(null) && got.map(_.asInstanceOf[Long]).sorted == Seq(0L, 1L))
    // usable in a filter: the optimizer may fold on nullable=false
    assert(spark.sql(
      "SELECT count(*) FROM pmix WHERE drisl_exists(payload, '.name') = 0").head().getLong(0) == 1L)
  }

  test("null payload yields null, malformed path raises") {
    import spark.implicits._
    Seq(Tuple1(null: Array[Byte])).toDF("payload").createOrReplaceTempView("pnull")
    assert(spark.sql("SELECT drisl_extract(payload, '.x') FROM pnull").head().get(0) == null)
    assertThrows[Exception](
      withPayload(sample)(spark.sql("SELECT drisl_extract(payload, 'nodot') FROM p").collect()))
  }
}
