package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness must FAIL LOUDLY: a query that throws has to surface
  * in the returned failure list (and, in main, as a nonzero exit) rather
  * than be swallowed into a sentinel timing — otherwise a regression can
  * hide in BENCH numbers between correctness runs.
  */
class BenchSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("a deliberately broken query lands in the failed list") {
    val qs: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      Seq(
        "ok" -> ((s, _) => s.range(10).toDF("id")),
        "broken" -> ((s, _) => s.sql("SELECT * FROM table_that_does_not_exist")),
        "ok2" -> ((s, _) => s.range(3).toDF("id")))
    val (results, failed) = Bench.runAll(spark, dir, qs)
    assert(failed == Seq("broken"))
    // the harness still times and reports every query — the JSON line the
    // driver parses stays complete even when one entry failed
    assert(results.map(_._1) == Seq("ok", "broken", "ok2"))
    assert(results.forall(_._2 >= 0.0))
  }

  test("an all-green run returns no failures") {
    val (results, failed) = Bench.runAll(spark, dir,
      Seq("ok" -> ((s, _) => s.range(5).toDF("id"))))
    assert(failed.isEmpty && results.size == 1)
  }
}
