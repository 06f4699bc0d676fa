package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.drisl.DValue._
import graft.drisl.Drisl
import graft.stream._
import graft.streaming.EventStreamPipeline
import graft.types._

/** Structured Streaming over the event log: incremental delivery with a
  * durable checkpoint cursor, and event-time windowed aggregation with a
  * watermark. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private lazy val store = new StreamStore(spark,
    graft.TempDirs.create("graft-streaming").toString)

  private def payload(etype: String, value: Double): Array[Byte] =
    Drisl.encode(obj("type" -> text(etype), "value" -> DFloat(value)))

  private val module = ModuleDef(
    initSql = "CREATE TABLE IF NOT EXISTS noop (x BIGINT) USING PARQUET",
    queries = Map("all" -> QueryDef("SELECT idx FROM events ORDER BY idx")))

  test("incremental log tailing: second run delivers only new events") {
    val h = store.open("did:test:tail")
    h.setModule(module)
    h.addEvents((1 to 5).map(i => IncomingEvent("u", payload("click", i.toDouble))))

    val ckpt = graft.TempDirs.create("graft-ckpt").toString
    spark.sql("DROP TABLE IF EXISTS default.tail_sink")
    val n1 = EventStreamPipeline.deliverOnce(spark, store, "did:test:tail", ckpt, "default.tail_sink")
    assert(n1 == 5L)
    assert(spark.table("default.tail_sink").count() == 5L)

    h.addEvents((6 to 8).map(i => IncomingEvent("u", payload("view", i.toDouble))))
    val n2 = EventStreamPipeline.deliverOnce(spark, store, "did:test:tail", ckpt, "default.tail_sink")
    assert(n2 == 3L, s"second run must deliver only the 3 new events, got $n2")
    val sink = spark.table("default.tail_sink")
    assert(sink.count() == 8L)
    assert(sink.agg(max("idx")).head().getLong(0) == 8L)
    // values round-tripped through DRISL into the streaming pipeline
    assert(sink.agg(sum("value")).head().getDouble(0) == (1 to 8).sum.toDouble)
  }

  test("keyed state survives across checkpointed AvailableNow runs") {
    import spark.implicits._
    val h = store.open("did:test:counts")
    h.setModule(module)
    h.addEvents(Seq(
      IncomingEvent("u", payload("click", 1)), IncomingEvent("u", payload("view", 2)),
      IncomingEvent("v", payload("click", 3))))

    val ckpt = graft.TempDirs.create("graft-ckpt-st").toString
    def runOnce(): Map[String, Long] = {
      val out = new java.util.concurrent.ConcurrentHashMap[String, Long]()
      val src = EventStreamPipeline.readLog(spark, store, "did:test:counts")
        .select(col("user"),
          timestamp_seconds(col("idx")).as("ts"),
          expr("drisl_extract(payload, '.type')").as("etype"))
        .as[EventStreamPipeline.UserEvent]
      val q = EventStreamPipeline.userCounts(src)
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[EventStreamPipeline.UserCount], _: Long) =>
          batch.collect().foreach(c => out.merge(c.user, c.n, math.max(_, _)))
        }
        .start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      out.asScala.toMap
    }

    assert(runOnce() == Map("u" -> 2L, "v" -> 1L))
    h.addEvents(Seq(
      IncomingEvent("u", payload("click", 4)), IncomingEvent("w", payload("view", 5))))
    // second run resumes from checkpointed state: u continues at 2, not 0
    assert(runOnce() == Map("u" -> 3L, "w" -> 1L))
  }

  test("gap sessionization: data-proven sessions emit, open session carries over") {
    import spark.implicits._
    val h = store.open("did:test:sess")
    h.setModule(module)
    // user u: sessions [0,10s], [2000,2010s], open [5000s]; v: open [3s]
    val evs = Seq(("u", 0L), ("u", 10L), ("u", 2000L), ("u", 2010L), ("u", 5000L), ("v", 3L))
    h.addEvents(evs.map { case (who, sec) =>
      IncomingEvent(who, Drisl.encode(obj("type" -> text("click"), "sec" -> int(sec))))
    })
    val ckpt = graft.TempDirs.create("graft-ckpt-sess").toString
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long, Long)]()
    val src = EventStreamPipeline.readLog(spark, store, "did:test:sess")
      .select(col("user"),
        timestamp_seconds(expr("drisl_extract_long(payload, '.sec')")).as("ts"),
        expr("drisl_extract(payload, '.type')").as("etype"))
      .as[EventStreamPipeline.UserEvent]
    val q = EventStreamPipeline.sessionize(src, gapMs = 1000 * 1000) // 1000s gap
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[EventStreamPipeline.SessionOut], _: Long) =>
        batch.collect().foreach(s => out.add((s.user, s.start_ms, s.end_ms, s.n_events)))
      }
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    val sessions = out.asScala.toVector.sorted
    // only the two data-proven closed sessions of u emit; open tails stay in state
    assert(sessions == Vector(
      ("u", 0L, 10000L, 2L), ("u", 2000000L, 2010000L, 2L)))
  }

  test("stream-static enrichment joins live events against a dimension") {
    import spark.implicits._
    val h = store.open("did:test:enrich")
    h.setModule(module)
    h.addEvents(Seq(
      IncomingEvent("u1", payload("click", 1)), IncomingEvent("u2", payload("view", 2)),
      IncomingEvent("u3", payload("click", 3))))
    val dim = Seq(("u1", "pro"), ("u2", "free")).toDF("user", "tier")
    val ckpt = graft.TempDirs.create("graft-ckpt-enrich").toString
    spark.sql("DROP TABLE IF EXISTS default.enrich_sink")
    val q = EventStreamPipeline.enrich(
        EventStreamPipeline.readLog(spark, store, "did:test:enrich"), dim, "user")
      .select(col("idx"), col("user"), col("tier"))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .toTable("default.enrich_sink")
    q.awaitTermination()
    val got = spark.table("default.enrich_sink")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
    assert(got == Seq((1L, "u1", "pro"), (2L, "u2", "free"), (3L, "u3", null)),
      "left join must keep unmatched events with a null tier")
  }

  test("flushOnTimeout force-closes the quiet open session (continuous trigger)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(user: String, ms: Long) =
      EventStreamPipeline.UserEvent(user, new java.sql.Timestamp(ms), "click")
    val in = MemoryStream[EventStreamPipeline.UserEvent]
    val q = EventStreamPipeline.sessionize(in.toDS(), gapMs = 300, flushOnTimeout = true)
      .writeStream
      .queryName("sess_timeout")
      .outputMode("append")
      .format("memory")
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()
    try {
      // one open session; no later event ever proves the gap — only the
      // processing-time timeout can close it
      in.addData(ev("u", 1000L), ev("u", 1200L))
      val deadline = System.currentTimeMillis() + 60000
      var rows = Array.empty[org.apache.spark.sql.Row]
      while (rows.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
        rows = spark.table("sess_timeout").collect()
      }
      assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
        Seq(("u", 1000L, 1200L, 2L)),
        "timeout must flush the open session exactly once with its true bounds")
    } finally q.stop()
  }

  test("streaming exact dedup: duplicate payloads within the watermark drop") {
    val h = store.open("did:test:dedup")
    h.setModule(module)
    // payloads a,b,a,c,b,a — 3 distinct contents, duplicates seconds apart
    // (event time derives from idx so identical contents stay identical)
    val evs = Seq("a", "b", "a", "c", "b", "a")
    h.addEvents(evs.map(t =>
      IncomingEvent("u", Drisl.encode(obj("type" -> text(t))))))

    val q = EventStreamPipeline.dedupByPayload(
        EventStreamPipeline.readLog(spark, store, "did:test:dedup")
          .withColumn("ts", timestamp_seconds(col("idx"))),
        "ts", "10 minutes")
      .select(col("idx"), expr("drisl_extract(payload, '.type')").as("etype"))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .format("memory")
      .queryName("dedup_sink")
      .start()
    q.awaitTermination()

    val kept = spark.table("dedup_sink")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    // exactly one survivor per distinct payload (which copy survives within
    // a single micro-batch is processing-order-defined, not event-time)
    assert(kept.size == 3, kept.toString)
    assert(kept.map(_._2).toSet == Set("a", "b", "c"), kept.toString)
  }

  test("streaming near-dup: band-key collisions drop within the watermark") {
    val h = store.open("did:test:neardup")
    h.setModule(module)
    // three "documents": A, a superset of A (same min-shingles → collides
    // unless an added shingle hashes lower in some lane), and distinct B
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val a2 = a + "." // appended char: shingle set is a superset of A's
    val b = "completely different content with nothing shared at all here"
    h.addEvents(Seq(a, a2, b).map(t =>
      IncomingEvent("u", Drisl.encode(obj("type" -> text(t))))))
    // two events WITHOUT the text field: null text must bypass dedup
    // (each survives) instead of colliding into one universal bucket
    h.addEvents(Seq(1L, 2L).map(n =>
      IncomingEvent("u", Drisl.encode(obj("other" -> int(n))))))

    // ground truth from the SAME key expression, computed in batch
    val spark0 = spark
    import spark0.implicits._
    val expected = Seq(a, a2, b).toDF("t")
      .select(EventStreamPipeline.bandKey(col("t"), 8).as("k"))
      .distinct().count()

    val q = EventStreamPipeline.nearDedupByBand(
        EventStreamPipeline.readLog(spark, store, "did:test:neardup")
          .withColumn("t", expr("drisl_extract(payload, '.type')"))
          .withColumn("ts", timestamp_seconds(col("idx"))),
        "t", "ts", "10 minutes")
      .select(col("idx"))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .format("memory")
      .queryName("neardup_sink")
      .start()
    q.awaitTermination()

    val kept = spark.table("neardup_sink").count()
    // distinct-band texts survive once each; BOTH null-text events survive
    assert(kept == expected + 2, s"kept $kept of 5, expected ${expected + 2}")
    assert(kept >= 4, "null-text events must bypass dedup, not collapse")
  }

  test("windowed aggregation with watermark over the event stream") {
    val h = store.open("did:test:windowed")
    h.setModule(module)
    // events with embedded epoch-second timestamps, 2 windows of 1 minute
    val evs = Seq(
      (0L, "click"), (10L, "click"), (30L, "view"),
      (70L, "click"), (80L, "view"), (90L, "view"))
    h.addEvents(evs.map { case (sec, t) =>
      IncomingEvent("u", Drisl.encode(obj(
        "type" -> text(t), "value" -> DFloat(1.0), "sec" -> int(sec))))
    })

    val q = EventStreamPipeline.windowedCounts(
        EventStreamPipeline.readLog(spark, store, "did:test:windowed")
          .select(
            timestamp_seconds(expr("drisl_extract_long(payload, '.sec')")).as("ts"),
            expr("drisl_extract(payload, '.type')").as("etype"),
            expr("drisl_extract_double(payload, '.value')").as("value")),
        "ts", "1 minute", "10 seconds")
      .select(col("window.start").cast("long").as("w"), col("etype"), col("n"), col("total"))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("complete")
      .format("memory")
      .queryName("win_sink")
      .start()
    q.awaitTermination()

    val rows = spark.table("win_sink")
      .orderBy("w", "etype")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(rows == Seq(
      (0L, "click", 2L, 2.0), (0L, "view", 1L, 1.0),
      (60L, "click", 1L, 1.0), (60L, "view", 2L, 2.0)))
  }

  test("stream-stream interval join correlates within the horizon only") {
    val h = store.open("did:test:ssjoin")
    h.setModule(module)
    // views at t=0,100,300; clicks at t=30,130,1000 — with a 60s horizon
    // the first two correlate, the stray click (1000) matches nothing.
    // BASE shifts everything off epoch 0: the initial watermark is epoch
    // 0, and an event AT the watermark is already late
    val BASE = 1000000L
    val evs =
      Seq(("view", BASE + 0L), ("view", BASE + 100L), ("view", BASE + 300L),
        ("click", BASE + 30L), ("click", BASE + 130L), ("click", BASE + 1000L))
    h.addEvents(evs.map { case (t, sec) =>
      IncomingEvent("u", Drisl.encode(obj(
        "type" -> text(t), "value" -> DFloat(1.0), "sec" -> int(sec))))
    })

    def side(etype: String, tsName: String) =
      EventStreamPipeline.readLog(spark, store, "did:test:ssjoin")
        .select(
          expr("drisl_extract(payload, '.type')").as("etype"),
          col("user"),
          timestamp_seconds(expr("drisl_extract_long(payload, '.sec')")).as(tsName))
        .filter(col("etype") === etype)

    val joined = EventStreamPipeline.intervalJoin(
        side("view", "lts").select(col("user"), col("lts")),
        side("click", "rts").select(col("user").as("r_user"), col("rts")),
        "user", "60 SECONDS", "10 seconds")
      .select(col("lts").cast("long").as("v"), col("rts").cast("long").as("c"))

    val q = joined.writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .format("memory")
      .queryName("ssjoin_sink")
      .start()
    q.awaitTermination()
    val got = spark.table("ssjoin_sink").collect()
      .map(r => (r.getLong(0) - BASE, r.getLong(1) - BASE)).toSet
    assert(got == Set((0L, 30L), (100L, 130L)),
      s"interval join produced $got")
  }

  test("streaming distinct sketch equals the batch fold over the same rows") {
    val h = store.open("did:test:sketch")
    h.setModule(module)
    // 40 events, 25 distinct users overall, 20 per 1-minute window
    val evs = (0 until 40).map { i =>
      IncomingEvent(s"u${i % 25}", Drisl.encode(obj(
        "type" -> text("click"), "value" -> DFloat(1.0),
        "sec" -> int(if (i < 20) i else 60 + i))))
    }
    h.addEvents(evs)

    def shaped(df: org.apache.spark.sql.DataFrame) = df.select(
      timestamp_seconds(expr("drisl_extract_long(payload, '.sec')")).as("ts"),
      col("user"))

    val q = EventStreamPipeline.distinctSketch(
        shaped(EventStreamPipeline.readLog(spark, store, "did:test:sketch")),
        "user", "ts", "1 minute", "10 seconds")
      .select(col("win.start").cast("long").as("w"), col("bucket"), col("r"))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("complete")
      .format("memory")
      .queryName("sketch_sink")
      .start()
    q.awaitTermination()
    val streamed = spark.table("sketch_sink")

    // the batch-built sketch over the identical rows must be IDENTICAL
    // (same hash, same buckets, same max-rho) — mergeability means the
    // incremental path cannot drift from the one-shot path
    val batch = EventStreamPipeline.distinctSketch(
        shaped(h.eventsDF), "user", "ts", "1 minute", "10 seconds")
      .select(col("win.start").cast("long").as("w"), col("bucket"), col("r"))
    val sRows = streamed.orderBy("w", "bucket").collect().map(_.toString).toSeq
    val bRows = batch.orderBy("w", "bucket").collect().map(_.toString).toSeq
    assert(sRows.nonEmpty && sRows == bRows)

    // the folded estimate lands near the true 20 distinct users per
    // window (64-bucket HLL + linear counting: well within 2x here)
    val est = EventStreamPipeline.sketchEstimate(
        streamed.withColumnRenamed("w", "win_s"), "win_s")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(est.keySet == Set(0L, 60L))
    est.values.foreach(e => assert(e > 10.0 && e < 40.0, s"estimate $e vs true 20"))
  }

  test("streaming frequency sketch equals the batch grid; probe is one-sided") {
    val h = store.open("did:test:cms")
    h.setModule(module)
    // 60 events over 12 users with a skewed head (u0 appears 16x)
    val evs = (0 until 60).map { i =>
      val u = if (i % 4 == 0) "u0" else s"u${1 + i % 11}"
      IncomingEvent(u, Drisl.encode(obj(
        "type" -> text("click"), "value" -> DFloat(1.0),
        "sec" -> int(i))))
    }
    h.addEvents(evs)

    def shaped(df: org.apache.spark.sql.DataFrame) = df.select(
      timestamp_seconds(expr("drisl_extract_long(payload, '.sec')")).as("ts"),
      col("user"))

    val q = EventStreamPipeline.freqSketch(
        shaped(EventStreamPipeline.readLog(spark, store, "did:test:cms")),
        "user", "ts", "2 minutes", "10 seconds")
      .select(col("win.start").cast("long").as("w"), col("i"), col("b"), col("c"))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("complete")
      .format("memory")
      .queryName("cms_sink")
      .start()
    q.awaitTermination()
    val streamed = spark.table("cms_sink")

    // mergeability: the incrementally-built grid must be IDENTICAL to the
    // one-shot batch fold over the same rows (additive counters cannot
    // drift across micro-batches)
    val batch = EventStreamPipeline.freqSketch(
        shaped(h.eventsDF), "user", "ts", "2 minutes", "10 seconds")
      .select(col("win.start").cast("long").as("w"), col("i"), col("b"), col("c"))
    val sRows = streamed.orderBy("w", "i", "b").collect().map(_.toString).toSeq
    val bRows = batch.orderBy("w", "i", "b").collect().map(_.toString).toSeq
    assert(sRows.nonEmpty && sRows == bRows)

    // probe: every estimate is one-sided (est >= exact), and the skewed
    // head's estimate is at least its true 15 occurrences
    val exact = shaped(h.eventsDF).groupBy("user").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val grid = streamed.select(col("i"), col("b"), col("c"))
    val keys = shaped(h.eventsDF).select(col("user")).distinct()
    val est = EventStreamPipeline.freqEstimate(grid, keys, "user")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (u, n) =>
      assert(est(u) >= n, s"CMS undercounted $u: ${est(u)} < $n") }
    assert(est("u0") >= 15)
  }

  test("CMS probe sums counters across windows before taking min") {
    import spark.implicits._
    // u0 lands in TWO event-time windows (0-2min and 4-6min); the probe
    // must estimate its TOTAL frequency over the horizon. A min over the
    // unaggregated per-window grid would pick u0's smallest window
    // counter (1) and undercount — breaking the one-sided est >= exact
    // guarantee the batch twin pins.
    val ev = Seq(("u0", 0L), ("u0", 10L), ("u0", 300L), ("uX", 5L))
      .toDF("user", "sec")
      .select(col("user"), timestamp_seconds(col("sec")).as("ts"))
    val grid = EventStreamPipeline
      .freqSketch(ev, "user", "ts", "2 minutes", "10 seconds")
      .select(col("i"), col("b"), col("c")) // window column dropped, rows still per-window
    val keys = ev.select("user").distinct()
    val est = EventStreamPipeline.freqEstimate(grid, keys, "user")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("u0") >= 3, s"multi-window undercount: ${est("u0")}")
    assert(est("uX") >= 1)
  }

  test("streaming incremental dedup: later waves dedup against streamed docs") {
    import org.apache.spark.sql.types._
    val root = graft.TempDirs.create("graft-stream-incdedup")
    val (idxDir, verdictDir, ckpt, in) =
      (s"$root/idx", s"$root/verdicts", s"$root/ckpt", s"$root/in")
    Files.createDirectories(java.nio.file.Paths.get(in))
    def docs(n: Int, base: Long) = spark.range(n).select(
      (col("id") + base).as("doc_id"),
      concat_ws(" ", (0 until 12).map(i =>
        md5(concat(col("id") + base, lit(i)))): _*).as("text"))
    graft.queries.Dedup.buildDedupIndex(spark, docs(200, 0), idxDir)

    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    def stream() = {
      val q = EventStreamPipeline.incrementalDedupStream(
        spark.readStream.schema(schema).parquet(in), idxDir, verdictDir, ckpt)
      q.awaitTermination()
    }
    // wave A: 20 clones of the indexed corpus + 10 fresh docs
    docs(20, 0).select((col("doc_id") + 10000).as("doc_id"), col("text"))
      .unionAll(docs(10, 20000)).coalesce(1).write.mode("append").parquet(in)
    stream()
    // wave B: clones of wave A's FRESH docs — dups only exist because the
    // stream appended wave A to the index
    docs(10, 20000).select((col("doc_id") + 30000).as("doc_id"), col("text"))
      .coalesce(1).write.mode("append").parquet(in)
    stream()

    val v = spark.read.parquet(verdictDir)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(v.size == 40, s"40 verdicts expected, got ${v.size}")
    val (a, b) = v.partition(_._1 < 30000)
    // wave A: corpus clones exact against the BATCH-BUILT index rows
    assert(a.count(x => x._2 == "exact" && x._3 < 200) == 20, a.toString)
    assert(a.count(_._2 == "new") == 10)
    // wave B: every clone dedups against a doc that arrived ON THE STREAM
    assert(b.size == 10)
    assert(b.forall(x => x._2 == "exact" && x._3 >= 20000 && x._3 < 20010),
      s"wave-B dups must point at wave-A stream docs: $b")
    // and the index meta accumulated both stream appends
    val meta = graft.queries.Dedup.readIndexMeta(spark, idxDir)
    assert(meta.batches == 3 && meta.count == 240, meta.toString)
    graft.TempDirs.release(root)
  }

  test("streaming vector-index ingest grows the index, exactly once") {
    // the vector-side twin of the streaming dedup pipeline: embedding
    // files land, each micro-batch assigns to the EXISTING centroids and
    // appends into the cell-partitioned index; a checkpointed re-run over
    // the same landing dir appends nothing (exactly-once file source);
    // every streamed twin lands in its original's cell (assignment is
    // the same argmin whether batch or stream)
    val src = "/root/testdata/sf0.001"
    val idx = graft.TempDirs.create("graft-vecidx-str").toString
    graft.queries.Similarity.buildVectorIndex(spark, src, idx)
    def vectors(): Long =
      graft.queries.Similarity.vectorIndexInfo(spark, idx)("vectors")
    val n0 = vectors()
    assert(n0 > 0)

    val land = graft.TempDirs.create("graft-vecland").toString
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    for (i <- 1 to 3)
      emb.withColumn("vec_id", col("vec_id") + lit(i * 1000000L))
        .coalesce(1).write.mode("append").parquet(land)

    def landStream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1").parquet(land)
    val ckpt = graft.TempDirs.create("graft-vecstr-ckpt").toString
    val q = EventStreamPipeline.vectorIndexIngestStream(landStream, idx, ckpt)
    q.awaitTermination()
    assert(vectors() == 4 * n0,
      s"3 streamed increments of $n0 must grow the index to ${4 * n0}")

    // exactly-once: same checkpoint, no new files -> no growth
    val q2 = EventStreamPipeline.vectorIndexIngestStream(landStream, idx, ckpt)
    q2.awaitTermination()
    assert(vectors() == 4 * n0, "checkpointed re-run must append nothing")

    // assignment equivalence, sampled
    val cellOf = spark.read.parquet(graft.queries.Similarity.artifactPath(idx, "vectors"))
      .select(col("vec_id"), col("cell").cast("long").as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until math.min(n0, 30L)).foreach { v =>
      for (i <- 1 to 3)
        assert(cellOf.get(v + i * 1000000L) == cellOf.get(v),
          s"streamed twin of vec $v (wave $i) left its cell")
    }
  }

  test("streaming doremi: mixture weights from stream-maintained counts " +
    "equal the batch table, and the state carries across waves") {
    import org.apache.spark.sql.types._
    import graft.queries.Pipeline
    val root = graft.TempDirs.create("graft-stream-doremi")
    val (in, ckpt) = (s"$root/in", s"$root/ckpt")
    Files.createDirectories(java.nio.file.Paths.get(in))
    val schema = StructType(Seq(StructField("source", StringType),
      StructField("text", StringType)))
    // three domains with deliberately different token mixes so the
    // excess-loss spread (and therefore the weights) is non-trivial
    def wave(tag: Int) = spark.range(30).select(
      concat(lit("src"), (col("id") % 3).cast("string")).as("source"),
      concat_ws(" ",
        lit("alpha beta"),
        when(col("id") % 3 === 0, lit("gamma gamma gamma"))
          .when(col("id") % 3 === 1, lit("delta epsilon"))
          .otherwise(concat(lit("zeta"), ((col("id") + tag) % 7).cast("string"))))
        .as("text"))
    def stream(): Unit = {
      val q = Pipeline.domainTokenCounts(
          spark.readStream.schema(schema).parquet(in))
        .writeStream.trigger(Trigger.AvailableNow())
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .format("memory").queryName("doremi_counts").start()
      q.awaitTermination()
    }
    def weightsOf(counts: org.apache.spark.sql.DataFrame) = {
      // snapshot the (vocab × domains)-bounded state first: the memory
      // sink's view is not multi-instance, and doremiWeightsFromCounts
      // self-joins its input (stc ⋈ aggregate(stc))
      val snap = spark.createDataFrame(
        java.util.Arrays.asList(counts.collect(): _*), counts.schema)
      Pipeline.doremiWeightsFromCounts(snap)
        .orderBy("source").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
    }

    wave(1).coalesce(1).write.mode("append").parquet(in)
    stream()
    val streamedA = weightsOf(spark.table("doremi_counts"))
    val batchA = weightsOf(Pipeline.domainTokenCounts(spark.read.parquet(in)))
    assert(streamedA == batchA,
      "stream-maintained counts produced a different mixture table")
    assert(streamedA.map(_._4).sum > 1000000000L - 100)

    // wave B shifts the zeta-token tail: the maintained state must fold
    // it in (checkpoint restore), and the batch twin over ALL files must
    // still agree exactly
    wave(5).coalesce(1).write.mode("append").parquet(in)
    stream()
    val streamedAB = weightsOf(spark.table("doremi_counts"))
    val batchAB = weightsOf(Pipeline.domainTokenCounts(spark.read.parquet(in)))
    assert(streamedAB == batchAB,
      "post-wave-B stream counts drifted from the batch recompute")
    assert(streamedAB != streamedA,
      "wave B changed the corpus but not the weights — state did not fold")
    graft.TempDirs.release(root)
  }

  test("streaming lexical-index ingest: exactly-once END TO END — the " +
    "meta commit is the sink's transaction log") {
    // the third index family's streaming twin. Stronger delivery than
    // the dedup/vector twins: the lexical meta's atomic commit records
    // the stream batch id, so even a foreachBatch RE-delivery of an
    // already-committed batch (at-least-once's one hole) is a no-op —
    // df can never double-count.
    import graft.queries.Retrieval
    val src = "/root/testdata/sf0.001"
    val idx = graft.TempDirs.create("graft-lexidx-str").toString
    Retrieval.buildLexicalIndex(spark, src, idx)
    def docsCount(): Long = Retrieval.lexicalIndexInfo(spark, idx)("docs")
    val n0 = docsCount()
    assert(n0 > 0)

    val land = graft.TempDirs.create("graft-lexland").toString
    val d = spark.read.parquet(s"$src/documents.parquet")
      .select(col("doc_id"), col("text"))
    for (i <- 1 to 3)
      d.limit(50).withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
        .coalesce(1).write.mode("append").parquet(land)

    def landStream = spark.readStream
      .schema(d.limit(1).schema)
      .option("maxFilesPerTrigger", "1").parquet(land)
    val ckpt = graft.TempDirs.create("graft-lexstr-ckpt").toString
    val q = EventStreamPipeline.lexicalIndexIngestStream(landStream, idx, ckpt)
    q.awaitTermination()
    assert(docsCount() == n0 + 150,
      s"3 streamed waves of 50 docs must grow the index to ${n0 + 150}")

    // exactly-once across restart: same checkpoint, no new files
    val q2 = EventStreamPipeline.lexicalIndexIngestStream(landStream, idx, ckpt)
    q2.awaitTermination()
    assert(docsCount() == n0 + 150, "checkpointed re-run must append nothing")

    // exactly-once within the at-least-once window: re-delivering an
    // already-committed stream batch id is a NO-OP (df unchanged),
    // while the same rows WITHOUT the guard would append
    val dfBefore = spark.read
      .parquet(Retrieval.lexArtifactPath(spark, idx, "df"))
      .collect().map(_.toString).sorted.toSeq
    val redelivery = d.limit(50)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
    val out = Retrieval.appendLexicalIndex(spark, redelivery, idx,
      streamBatch = Some(0L))
    assert(out("appended") == 0L, s"re-delivered batch was re-applied: $out")
    assert(docsCount() == n0 + 150)
    val dfAfter = spark.read
      .parquet(Retrieval.lexArtifactPath(spark, idx, "df"))
      .collect().map(_.toString).sorted.toSeq
    assert(dfAfter == dfBefore, "re-delivery moved the df artifact")

    // and the grown index answers a $terms probe with the streamed docs
    // visible (their postings + df contributions committed)
    val probe = spark.sql(Retrieval.bm25ProbeSqlForProfiler(spark, idx,
      Seq("hash", "slow")))
      .collect().map(_.getLong(0))
    assert(probe.exists(_ >= 1000000L),
      "streamed docs invisible to the $terms probe")
  }

  test("streaming mixture-stats ingest: exactly-once, weights equal the " +
    "batch recompute over everything streamed") {
    import graft.queries.Pipeline
    val src = "/root/testdata/sf0.001"
    val idx = graft.TempDirs.create("graft-mixstr").toString
    Pipeline.buildMixtureStats(spark, src, idx)
    def docsCount(): Long = Pipeline.mixtureStatsInfo(spark, idx)("docs")
    val n0 = docsCount()

    val land = graft.TempDirs.create("graft-mixland").toString
    val d = spark.read.parquet(s"$src/documents.parquet")
      .select(col("source"), col("text"))
    for (i <- 1 to 3)
      d.limit(50).withColumn("text",
          concat(col("text"), lit(s" mixstream$i")))
        .coalesce(1).write.mode("append").parquet(land)

    def landStream = spark.readStream
      .schema(d.limit(1).schema)
      .option("maxFilesPerTrigger", "1").parquet(land)
    val ckpt = graft.TempDirs.create("graft-mixstr-ckpt").toString
    val q = EventStreamPipeline.mixtureStatsIngestStream(landStream, idx, ckpt)
    q.awaitTermination()
    assert(docsCount() == n0 + 150,
      s"3 streamed waves of 50 docs must grow the stats to ${n0 + 150}")

    // exactly-once across restart: same checkpoint, no new files
    val q2 = EventStreamPipeline.mixtureStatsIngestStream(landStream, idx, ckpt)
    q2.awaitTermination()
    assert(docsCount() == n0 + 150, "checkpointed re-run must append nothing")

    // exactly-once within the at-least-once window: re-delivering an
    // already-committed stream batch id is a NO-OP on the monoid
    val out = Pipeline.appendMixtureStats(spark, d.limit(50), idx,
      streamBatch = Some(0L))
    assert(out("appended_docs") == 0L,
      s"re-delivered batch was re-applied: $out")
    assert(docsCount() == n0 + 150)

    // the served weights equal a batch recompute over base + exactly
    // what streamed — the stream-built artifact IS the batch statistic
    val streamedCorpus = d.unionAll(spark.read.parquet(land))
    val want = Pipeline.doremiWeightsFromCounts(
        Pipeline.domainTokenCounts(streamedCorpus))
      .orderBy("source").collect().map(_.toString).toSeq
    val got = Pipeline.mixtureWeights(spark, idx)
      .collect().map(_.toString).toSeq
    assert(got == want,
      "stream-built mixture artifact drifted from the batch recompute")
  }
}
