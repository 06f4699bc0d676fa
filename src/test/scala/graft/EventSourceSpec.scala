package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.EventSource
import graft.stream.StreamStore
import graft.types._

/** File → stream ingestion and export round-trips. */
class EventSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private lazy val store = new StreamStore(spark,
    graft.TempDirs.create("graft-src").toString)

  private val module = ModuleDef(
    initSql = """CREATE TABLE IF NOT EXISTS acts
                 |(idx BIGINT, user STRING, kind STRING, amount DOUBLE, n BIGINT)
                 |USING PARQUET""".stripMargin,
    materializer = """INSERT INTO acts SELECT idx, user,
                      |  drisl_extract(payload, '.kind'),
                      |  drisl_extract_double(payload, '.amount'),
                      |  drisl_extract_long(payload, '.n') FROM event""".stripMargin,
    queries = Map("all" -> QueryDef(
      "SELECT idx, user, kind, amount, n FROM acts ORDER BY idx")))

  test("dense idx assignment holds across many input partitions") {
    import spark.implicits._
    graft.functions.LeafFunctions.register(spark)
    val dir = graft.TempDirs.create("graft-ing-big").toString
    // 5000 rows over 16 partitions with a shuffled ordering key
    (1 to 5000).map(i => (s"u${i % 7}", 5000 - i)).toDF("who", "k")
      .repartition(16).write.parquet(s"$dir/big")
    val df = EventSource.fromFile(spark, s"$dir/big", "parquet", "who", Seq("k"), 100L)
    val idx = df.select("idx").collect().map(_.getLong(0)).sorted.toSeq
    assert(idx == (101L to 5100L), "idx must be dense and offset by startIdx")
    // the assignment respects the global orderBy(k): decoding k back in idx
    // order must be ascending
    df.createOrReplaceTempView("imp")
    val ks = spark.sql(
      "SELECT drisl_extract_long(payload, '.k') FROM imp ORDER BY idx")
      .collect().map(_.getLong(0)).toSeq
    assert(ks == ks.sorted, "idx order must follow the ordering key globally")
  }

  test("idx assignment plan has no single-reducer exchange") {
    import spark.implicits._
    val dir = graft.TempDirs.create("graft-ing-plan").toString
    (1 to 100).map(i => (s"u$i", i)).toDF("who", "k")
      .repartition(4).write.parquet(s"$dir/p")
    val plan = EventSource.sortedStagePlan(spark, s"$dir/p", "parquet", "who", Seq("k"))
    // a row_number window over an empty partition spec would funnel the
    // whole import through ONE reducer — the zipWithIndex design must never
    // regress to it (SCALE.md §ingest)
    assert(!plan.contains("Window [row_number"),
      s"single-reducer window in ingest plan:\n$plan")
    assert(plan.toLowerCase.contains("rangepartitioning"),
      s"ingest must range-partition on the ordering key:\n$plan")
  }

  test("json file -> bulk ingest -> materialized query; csv export round-trip") {
    import spark.implicits._
    val dir = graft.TempDirs.create("graft-ing").toString
    Seq(
      ("ann", "buy", 12.5, 1L), ("bob", "sell", 3.25, 2L), ("ann", "buy", 7.0, 3L))
      .toDF("who", "kind", "amount", "n")
      .write.json(s"$dir/in")

    val h = store.open("did:test:filesrc")
    h.setModule(module)
    val latest = EventSource.ingest(h, s"$dir/in", "json", "who", Seq("n"))
    assert(latest == 3L)

    val rows = h.queryTagged(None, LeafQuery("all"))
    assert(rows.map(_("user")) == Vector("ann", "bob", "ann").map(SqlValue.SqlText))
    assert(rows.map(_("amount")) == Vector(12.5, 3.25, 7.0).map(SqlValue.SqlReal))
    assert(rows.map(_("n")) == Vector(1L, 2L, 3L).map(SqlValue.SqlInteger))

    // appendable: a second file continues the idx sequence
    Seq(("cyd", "buy", 1.0, 4L)).toDF("who", "kind", "amount", "n")
      .write.json(s"$dir/in2")
    assert(EventSource.ingest(h, s"$dir/in2", "json", "who", Seq("n")) == 4L)
    assert(h.queryTagged(None, LeafQuery("all")).size == 4)

    // export the query result and read it back
    EventSource.export(h.query(None, LeafQuery("all")), s"$dir/out", "csv")
    val back = spark.read.option("header", "true").csv(s"$dir/out")
    assert(back.count() == 4L)
    assert(back.columns.toSeq == Seq("idx", "user", "kind", "amount", "n"))
  }
}
