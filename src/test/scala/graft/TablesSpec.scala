package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins `Tables.df`'s schema tolerance for the events table: the driver
  * has regenerated testdata with `ts` as TIMESTAMP(NANOS) (readable only
  * as long via nanosAsLong), then as TIMESTAMP(MICROS) NTZ — the round-8
  * regression. Every encoding must yield byte-identical downstream rows,
  * so the next regeneration is a no-op.
  */
class TablesSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark
  import spark.implicits._

  // Three instants with sub-millisecond micros to catch precision loss.
  private val micros = Seq(
    1700000000000001L, // 2023-11-14T22:13:20.000001Z
    1700000123456789L,
    1765432109876543L)

  private def writeVariants(): Path = {
    val root = TempDirs.create("tables-spec")
    val base = micros.zipWithIndex.map { case (us, i) =>
      (i.toLong, us, i.toLong % 2, s"ev$i", i * 1.5, s"""{"k":$i}""")
    }

    // Variant A: ts as raw INT64 epoch nanos — what the nanosAsLong read
    // path of a TIMESTAMP(NANOS) file produces.
    base.map { case (id, us, u, t, v, p) => (id, us * 1000L, u, t, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$root/nanos/events.parquet")

    // Variant B: ts as TIMESTAMP_NTZ micros (isAdjustedToUTC=false) — the
    // regenerated-testdata encoding that broke round 8.
    base.map { case (id, us, u, t, v, p) => (id, us, u, t, v, p) }
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros($"ts_us").cast(TimestampNTZType))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$root/ntz/events.parquet")

    // Variant C: ts as session-zone TIMESTAMP (UTC-adjusted micros).
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    base.map { case (id, us, u, t, v, p) => (id, us, u, t, v, p) }
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros($"ts_us"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$root/ltz/events.parquet")

    root
  }

  test("events ts normalizes identically across parquet encodings") {
    val root = writeVariants()
    val results = Seq("nanos", "ntz", "ltz").map { variant =>
      val df = Tables.df(spark, s"$root/$variant", "events")
      assert(df.schema("ts").dataType == TimestampType,
        s"$variant: expected TIMESTAMP after normalization")
      variant -> df
        .select($"event_id", unix_micros($"ts").as("us"), $"user_id")
        .orderBy("event_id").collect().toSeq
    }.toMap
    assert(results("nanos") == results("ntz"))
    assert(results("ntz") == results("ltz"))
    val got = results("ntz").map(r => r.getLong(1))
    assert(got == micros, "micros-exact instants must survive every path")
  }

  test("one unreadable table only fails queries that use it") {
    val root = TempDirs.create("tables-poison")
    val src = Paths.get("/root/testdata/sf0.001")
    Tables.names.foreach { n =>
      val from = src.resolve(s"$n.parquet")
      val to = Paths.get(s"$root/$n.parquet")
      Files.copy(from, to, StandardCopyOption.REPLACE_EXISTING)
    }
    // Poison one table with junk bytes.
    Files.write(Paths.get(s"$root/part.parquet"), "not a parquet".getBytes)

    val s = spark.newSession()
    s.conf.set("spark.sql.session.timeZone", "UTC")
    Tables.load(s, root.toString)
    // Unrelated queries still run against the other nine views…
    assert(s.sql("SELECT count(*) c FROM lineitem").head.getLong(0) > 0)
    assert(s.sql("SELECT count(*) c FROM events").head.getLong(0) > 0)
    // …and only the poisoned view is absent.
    val err = intercept[Exception](s.sql("SELECT count(*) FROM part").collect())
    assert(err.getMessage.contains("part"))

    // Repairing the file and re-loading recovers the view (failed tables
    // are re-attempted; healthy ones are not churned).
    Files.copy(src.resolve("part.parquet"), Paths.get(s"$root/part.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    Tables.load(s, root.toString)
    assert(s.sql("SELECT count(*) c FROM part").head.getLong(0) > 0)
  }
}
