package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.drisl.DValue._
import graft.drisl.Drisl
import graft.stream._
import graft.types._

/** Dev profiling harness for the bulk-ingest path (not part of the API).
  *
  * Usage: ProfileIngest [dir] [copies]. `copies` > 1 replicates the events
  * table with shifted ids to emulate a larger scale factor (10 × sf0.1 ≈
  * sf1) — profiling input only, never gate-query input. */
object ProfileIngest {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    time("warmup")(spark.range(100).count())
    val store = new StreamStore(spark,
      graft.TempDirs.create("graft-prof").toString)
    val h = time("open")(store.open("did:prof"))
    val m = ModuleDef(
      initSql = "CREATE TABLE IF NOT EXISTS acts (idx BIGINT, user STRING, etype STRING, k BIGINT, value DOUBLE) USING PARQUET",
      materializer = """INSERT INTO acts
                        |SELECT idx, user, drisl_extract(payload, '.type'),
                        |       drisl_extract_long(payload, '.k'),
                        |       drisl_extract_double(payload, '.value')
                        |FROM event""".stripMargin,
      queries = Map("n" -> QueryDef("SELECT count(*) AS n FROM acts")))
    time("setModule")(h.setModule(m))
    val enc = udf((etype: String, value: Double, k: Long) =>
      Drisl.encode(obj("type" -> text(etype), "value" -> DFloat(value), "k" -> int(k))))
    val base = Tables.df(spark, dir, "events")
    val baseN = base.count()
    val scaled =
      if (copies <= 1) base.withColumn("rep", lit(0L))
      else base.crossJoin(
        spark.range(copies).select(col("id").as("rep")))
    val ev = time("build ev df")(scaled
      .select((col("event_id") + col("rep") * baseN + 1).as("idx"),
        concat(lit("u"), col("user_id")).as("user"),
        enc(col("event_type"), col("value"),
          get_json_object(col("props"), "$.k").cast("long")).as("payload"),
        lit(Array.empty[Byte]).as("signature")))
    println(s"[profile] events to ingest: ${baseN * math.max(copies, 1)} (base $baseN x $copies)")
    time("bulkImport total")(h.bulkImport(ev))
    time("query")(h.query(None, LeafQuery("n")).collect())

    // EventSource file-ingest path: dense idx must come from range
    // partitioning + per-partition offsets, never a 1-reducer global window
    val h2 = store.open("did:prof:file")
    h2.setModule(m.copy(materializer = ""))
    // (documents.parquet — events.parquet carries TIMESTAMP(NANOS), which
    // only Tables.df handles; fromFile reads generic files)
    val imported = time("EventSource.ingest")(
      graft.sources.EventSource.ingest(h2, s"$dir/documents.parquet", "parquet",
        userCol = "doc_id", orderBy = Seq("doc_id")))
    println(s"[profile] imported latest_idx=$imported")
    val plan = graft.sources.EventSource.sortedStagePlan(spark,
      s"$dir/documents.parquet", "parquet", "doc_id", Seq("doc_id"))
    val globalWindow = "Window \\[row_number".r.findFirstIn(plan).isDefined
    println(s"[profile] single-reducer window in plan: $globalWindow (must be false)")
    println(s"[profile] range-partitioned: ${plan.toLowerCase.contains("rangepartitioning")} (must be true)")
    spark.stop()
  }
}
