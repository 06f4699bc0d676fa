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
  * Usage: ProfileIngest [dir] [copies] [appendTotal] [appendBatch].
  * `copies` > 1 replicates the events table with shifted ids to emulate a
  * larger scale factor (10 × sf0.1 ≈ sf1) — profiling input only, never
  * gate-query input. `appendTotal` > 0 additionally profiles the A2
  * append path: addEvents replay throughput (events/s) through the
  * set-based materializer, in `appendBatch`-event batches. */
object ProfileIngest {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(1)
    val appendTotal = args.lift(2).map(_.toLong).getOrElse(0L)
    val appendBatch = args.lift(3).map(_.toInt).getOrElse(100000)
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

    // A2 append-path throughput: live batches through addEvents — each
    // batch is authorized, appended to the log, and folded through the
    // SET-BASED materializer (perEventReplays must stay 0: a driver loop
    // here would dominate any real ingest)
    if (appendTotal > 0) {
      val ha = store.open("did:prof:append")
      ha.setModule(m)
      var done = 0L
      var b = 0
      val t0 = System.nanoTime()
      while (done < appendTotal) {
        val n = math.min(appendBatch.toLong, appendTotal - done).toInt
        val batch = (0 until n).map { i =>
          val k = done + i
          IncomingEvent(s"u${k % 997}", Drisl.encode(obj(
            "type" -> text(if (k % 3 == 0) "view" else "click"),
            "value" -> DFloat((k % 1000) / 10.0), "k" -> int(k))))
        }
        val tb = System.nanoTime()
        ha.addEvents(batch) match {
          case Left(err) => sys.error(s"append rejected: $err")
          case _ =>
        }
        b += 1
        done += n
        println(f"[profile] append batch $b%3d n=$n%7d " +
          f"${(System.nanoTime() - tb) / 1e9}%7.2f s " +
          f"(${n / ((System.nanoTime() - tb) / 1e9)}%9.0f ev/s)")
      }
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[profile] addEvents total: $done events in $secs%.1f s = " +
        f"${done / secs}%.0f events/s (batch=$appendBatch)")
      println(s"[profile] perEventReplays=${ha.perEventReplays} (must be 0)")
      require(ha.perEventReplays == 0L,
        "append profile fell back to the per-event loop")
      val cnt = ha.query(None, LeafQuery("n")).collect()(0).getLong(0)
      require(cnt == appendTotal && ha.latest == appendTotal,
        s"materialized $cnt of $appendTotal appended events")
      println(s"[profile] materialized rows=$cnt latest=${ha.latest} (exact)")
    }

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
