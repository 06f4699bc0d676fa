package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.stream.StreamStore

/** Structured Streaming over stream event logs.
  *
  * The reference's streaming model is index-ordered at-least-once delivery
  * with per-subscription cursors (SURVEY.md §2.C) — `SubscriptionEngine`
  * ports that contract. This module is the Spark-native superset: the
  * parquet event log doubles as a streaming file source, so the SAME log
  * powers incremental micro-batch pipelines with watermarks, event-time
  * windows, and arbitrary keyed state — none of which the reference has.
  *
  * Scale notes: a file-source stream reads only NEW files per micro-batch
  * (the append path writes one parquet file per batch, so discovery is
  * O(new files)); windowed aggregation state is bounded by the watermark;
  * checkpointing gives exactly-once sinks. On a cluster the same code runs
  * continuous micro-batches; tests drive it with Trigger.AvailableNow.
  */
object EventStreamPipeline {

  /** Incremental reader over a stream's event log (the subscription path,
    * Spark-native): each run with the same checkpoint delivers only events
    * appended since the last run. */
  def readLog(spark: SparkSession, store: StreamStore, streamId: String): DataFrame = {
    val logDir = s"${store.root}/${store.dbNameFor(streamId)}/log"
    spark.readStream
      .schema(StreamStore.eventSchema)
      .option("maxFilesPerTrigger", "64")
      .parquet(logDir)
  }

  /** Tail the log into a sink table incrementally (exactly-once via
    * checkpoint): the Structured-Streaming equivalent of a subscription
    * with a durable cursor. Returns rows delivered in THIS run. */
  def deliverOnce(spark: SparkSession, store: StreamStore, streamId: String,
      checkpoint: String, sinkTable: String): Long = {
    val q = readLog(spark, store, streamId)
      .select(col("idx"), col("user"),
        expr("drisl_extract(payload, '.type')").as("etype"),
        expr("drisl_extract_double(payload, '.value')").as("value"))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .toTable(sinkTable)
    q.awaitTermination()
    q.lastProgress match {
      case null => 0L
      case p => p.numInputRows
    }
  }

  /** Stream-static enrichment: join the live event stream against a static
    * dimension on `key`. Spark plans this as a per-micro-batch join — the
    * static side is re-resolved each batch (so a refreshed dim parquet is
    * picked up) and broadcast when small; no state store is involved, so
    * it scales with the stream alone. */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(dim, Seq(key), "left_outer")

  /** Event-time windowed aggregation with a watermark: counts + sums per
    * (window, event type), late data beyond the watermark dropped. */
  def windowedCounts(events: DataFrame, tsCol: String, window_ : String,
      watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col("etype"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))

  /** Streaming exact dedup on a content fingerprint: the first event with
    * a given payload digest passes, later copies inside the watermark
    * horizon are dropped, and — the part that matters at scale — the
    * dedup state store holds only fingerprints YOUNGER than the
    * watermark, so state is bounded by the horizon instead of growing
    * with the log (a plain dropDuplicates would pin every fingerprint
    * ever seen). The batch analog is `q_dedup_exact`. */
  def dedupByPayload(events: DataFrame, tsCol: String, watermark: String): DataFrame =
    events
      .withColumn("__graft_fp", md5(col("payload")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__graft_fp")
      .drop("__graft_fp") // internal fingerprint, not part of the output

  /** Streaming NEAR-dup dedup: each document is 5-gram shingled and
    * min-hashed into one `lanes`-wide band key, entirely map-side
    * (transform/aggregate expressions — no UDF, no state), then the band
    * key dedups within the watermark like the exact variant. Two texts
    * with identical min-shingles per lane collide; the batch analog is
    * `q_dedup_minhash`/`q_dedup_lsh`. State = one band key per surviving
    * document inside the horizon. */
  def nearDedupByBand(events: DataFrame, textCol: String, tsCol: String,
      watermark: String, lanes: Int = 8): DataFrame = {
    // a NULL text must BYPASS dedup, not join a universal collision
    // bucket: xxhash64 ignores null args, so bandKey(null) is the same
    // constant for every null-text row — salt those with a unique key so
    // each one survives on its own
    val key = when(col(textCol).isNotNull, bandKey(col(textCol), lanes))
      .otherwise(concat(lit("__null__"), expr("uuid()")))
    events
      .withColumn("__graft_band", key)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__graft_band")
      .drop("__graft_band")
  }

  /** Stream-stream interval join: correlate two live event streams on a
    * key within a bounded event-time interval (right event lands within
    * [left.ts, left.ts + horizon]). BOTH sides carry watermarks, and the
    * time-bound join condition lets the state store retire rows once the
    * watermark passes their joinable horizon — the textbook
    * click-after-view correlation whose state is bounded by the horizon,
    * never the stream length. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      horizon: String, watermark: String): DataFrame = {
    val l = left.withWatermark("lts", watermark)
    val r = right.withWatermark("rts", watermark)
    l.join(r,
      col(key) === col(s"r_$key") &&
        col("rts") >= col("lts") &&
        col("rts") <= col("lts") + expr(s"INTERVAL $horizon"))
  }

  /** Streaming distinct-count sketch: per-(event-time window, bucket)
    * HLL max-rho state via plain incremental aggregation — the streaming
    * twin of the batch `q_sketch_merge` gate, same 60-bit md5 hash, same
    * 64-bucket/rho ladder, so a batch fold over identical rows produces
    * the identical sketch. State is O(windows-in-horizon × 64) rows no
    * matter how many events arrive (a streaming COUNT(DISTINCT) would
    * buffer every distinct key); the watermark retires window state. The
    * returned frame is the mergeable sketch itself — fold it with
    * `sketchEstimate`. */
  def distinctSketch(events: DataFrame, keyCol: String, tsCol: String,
      window_ : String, watermark: String): DataFrame = {
    val h = conv(substring(md5(col(keyCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val ev = events.withWatermark(tsCol, watermark).withColumn("__h", h)
    val w = shiftright(col("__h"), 6)
    val rho = (0 until 54).foldLeft[Column](lit(null)) { (acc, i) =>
      if (i == 0) when(w >= (1L << 53), 1)
      else acc.when(w >= (1L << (53 - i)), i + 1)
    }.otherwise(55)
    ev.groupBy(window(col(tsCol), window_).as("win"),
        (col("__h") % 64).as("bucket"))
      .agg(max(rho).cast("long").as("r"))
  }

  /** Streaming count-min sketch: per-(event-time window, hash-row,
    * bucket) additive counter state — the streaming twin of the batch
    * `q_sketch_cms` gate (same 60-bit md5 hash, same 4×256 byte-slice
    * buckets), so a batch fold over identical rows produces the
    * IDENTICAL counter grid. State is O(windows-in-horizon × 4·256)
    * rows however many events arrive; counters are plain sums, so
    * micro-batches merge by addition (the CMS mergeability property)
    * and the watermark retires window state. */
  def freqSketch(events: DataFrame, keyCol: String, tsCol: String,
      window_ : String, watermark: String): DataFrame = {
    val h = conv(substring(md5(col(keyCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    events.withWatermark(tsCol, watermark).withColumn("__h", h)
      .select(col(tsCol), posexplode(array(
        col("__h") % 256, shiftright(col("__h"), 8) % 256,
        shiftright(col("__h"), 16) % 256, shiftright(col("__h"), 24) % 256))
        .as(Seq("i", "b")))
      .groupBy(window(col(tsCol), window_).as("win"), col("i"), col("b"))
      .agg(count(lit(1)).as("c"))
  }

  /** Probe a counter grid (i, b, c) for each key's estimated TOTAL
    * frequency: min over the grid's hash rows — the same arithmetic as
    * the batch gate's probe, so stream- and batch-built grids estimate
    * identically. `freqSketch` emits a per-window grid, so the probe
    * first sums counters across windows per (i, b): taking min over an
    * unaggregated multi-window grid would pick each row's SMALLEST
    * window counter and undercount, breaking the CMS one-sided
    * (est >= exact) guarantee. Counter addition is exactly the CMS
    * merge property, so the collapsed grid is the horizon-total sketch. */
  def freqEstimate(grid: DataFrame, keys: DataFrame, keyCol: String): DataFrame = {
    val h = conv(substring(md5(col(keyCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val total = grid.groupBy(col("i"), col("b")).agg(sum(col("c")).as("c"))
    keys.withColumn("__h", h)
      .select(col(keyCol), posexplode(array(
        col("__h") % 256, shiftright(col("__h"), 8) % 256,
        shiftright(col("__h"), 16) % 256, shiftright(col("__h"), 24) % 256))
        .as(Seq("i", "b")))
      .join(total, Seq("i", "b"))
      .groupBy(col(keyCol)).agg(min(col("c")).as("est"))
  }

  /** Fold sketch rows (bucket, r) into the cardinality estimate — the
    * identical empty-bucket + linear-counting arithmetic as the batch
    * gate, so stream- and batch-built sketches estimate identically. */
  def sketchEstimate(sk: DataFrame, groupCols: String*): DataFrame = {
    val hllC = 0.709 * 4096.0 * math.pow(2.0, 55)
    sk.groupBy(groupCols.map(col): _*)
      .agg(
        (sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - r AS INT))")) +
          (lit(64L) - count(lit(1))) * (1L << 55)).as("z"),
        (lit(64L) - count(lit(1))).as("empty"))
      .select(groupCols.map(col) :+
        round(when((lit(hllC) / col("z").cast("double")) <= 160.0 && col("empty") > 0,
          lit(64.0) * log(lit(64.0) / col("empty").cast("double")))
          .otherwise(lit(hllC) / col("z").cast("double")), 6).as("est_distinct"): _*)
  }

  /** The band key expression: min(xxhash64(shingle, lane)) per lane,
    * lanes joined into one string key. Exposed so tests (and batch
    * callers) can compute the same key. */
  def bandKey(text: Column, lanes: Int): Column = {
    val t = lower(trim(text))
    val shingles = transform(
      sequence(lit(1), greatest(length(t) - 4, lit(1))),
      i => t.substr(i, lit(5)))
    concat_ws("|", (0 until lanes).map(l =>
      array_min(transform(shingles, s => xxhash64(s, lit(l))))): _*)
  }

  case class UserCount(user: String, n: Long)

  /** Keyed running state: per-user event counts via mapGroupsWithState.
    * State lives in the checkpoint, so successive Trigger.AvailableNow runs
    * resume exactly where the previous run left off — the engine-native
    * analog of the reference's durable per-subscription cursors. */
  def userCounts(events: Dataset[UserEvent]): Dataset[UserCount] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user)
      .mapGroupsWithState[Long, UserCount](GroupStateTimeout.NoTimeout()) {
        (user, it, state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + it.size
          state.update(n)
          UserCount(user, n)
      }
  }

  // ---- keyed state: sessionization via flatMapGroupsWithState ----

  case class UserEvent(user: String, ts: java.sql.Timestamp, etype: String)
  case class SessionState(start: Long, last: Long, n: Long)
  case class SessionOut(user: String, start_ms: Long, end_ms: Long, n_events: Long)

  /** Gap-based sessionization via flatMapGroupsWithState: a user's events
    * split into sessions wherever consecutive timestamps are more than
    * `gapMs` apart. Sessions closed BY THE DATA (a later event proves the
    * gap) emit immediately and deterministically; the trailing open
    * session stays in state, merged with the next batch's events.
    * `flushOnTimeout` arms a processing-time timeout that force-closes
    * quiet sessions — for continuously-running queries only (a pending
    * timeout keeps Trigger.AvailableNow scheduling batches forever). */
  def sessionize(events: Dataset[UserEvent], gapMs: Long,
      flushOnTimeout: Boolean = false): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (flushOnTimeout) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), timeoutConf) {
        (user, it, state: GroupState[SessionState]) =>
          if (flushOnTimeout && state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, s.start, s.last, s.n))
          } else {
            val incoming = it.map(_.ts.getTime).toVector
            if (incoming.isEmpty) Iterator.empty
            else {
              // extend the open session (if any) with the new events in
              // time order, splitting on gaps; every run except the
              // trailing one is proven closed and emits now
              val times = incoming.sorted
              var runs = Vector.empty[SessionState]
              var cur: SessionState = state.getOption.orNull
              times.foreach { t =>
                if (cur == null) cur = SessionState(t, t, 1)
                else if (t - cur.last > gapMs) { runs :+= cur; cur = SessionState(t, t, 1) }
                else cur = SessionState(math.min(cur.start, t), math.max(cur.last, t), cur.n + 1)
              }
              state.update(cur)
              if (flushOnTimeout) state.setTimeoutDuration(gapMs)
              runs.iterator.map(s => SessionOut(user, s.start, s.last, s.n))
            }
          }
      }
  }

  /** The production incremental-dedup loop as a stream: fresh documents
    * (doc_id, text) arrive on a stream, each micro-batch dedups against
    * the PERSISTED index (exact fingerprint → banded LSH → exact-Jaccard
    * verify — [[graft.queries.Dedup.incrementVsIndex]]), its verdicts
    * append to `verdictDir` tagged with the stream batch id, and the
    * batch's docs append to the index — so LATER batches dedup against
    * everything that streamed before them, exactly like the reference's
    * materializer folds each event batch into state the next batch sees
    * (leaf-stream/src/lib.rs:597-719, re-expressed over document
    * artifacts instead of SQLite tables).
    *
    * Delivery: the index append is torn-proof (batch-scoped artifact dirs
    * + meta-last commit — a crashed append is refused at every load), and
    * the verdict write is at-least-once: a foreachBatch retry after a
    * crash between the two writes re-appends the same verdicts, so an
    * exactly-once consumer dedups on (stream_batch, doc_id) at read time.
    * Scale: every batch costs O(batch) — the prior corpus is never
    * re-shingled (the increment plan scans only the index artifacts).
    *
    * Returns a started query; callers pick the trigger via `trigger`. */
  def incrementalDedupStream(docsStream: DataFrame, indexDir: String,
      verdictDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()) = {
    val spark = docsStream.sparkSession
    docsStream.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val docs = batch.select(col("doc_id"), col("text"))
        graft.queries.Dedup.incrementVsIndex(spark, docs, indexDir)
          .withColumn("stream_batch", lit(batchId))
          .write.mode("append").parquet(verdictDir)
        graft.queries.Dedup.appendDedupIndex(spark, docs, indexDir)
        ()
      }
      .start()
  }

  /** Streaming vector-index ingest — the vector-side twin of
    * [[incrementalDedupStream]]: each micro-batch of embeddings assigns
    * to the EXISTING centroids and appends into the cell-partitioned
    * index ([[graft.queries.Similarity.appendVectorIndexDf]], the
    * O(increment) path), so the persisted index a param-bound kNN named
    * query answers from grows continuously as embedding files land.
    * Centroids are never retrained in-stream — the `vector_index_info`
    * cell-skew signal is the operator's retrain trigger, exactly like
    * dedup's `stale` drives the re-band.
    *
    * Delivery: the checkpoint makes the FILE SOURCE exactly-once (a
    * re-run with the same checkpoint re-reads nothing), and the index
    * append within a batch is at-least-once: a foreachBatch retry after
    * a mid-batch crash re-appends the same vectors, so an exactly-once
    * consumer dedups on vec_id at read time (the verdict-write
    * discipline above). */
  def vectorIndexIngestStream(embStream: DataFrame, indexDir: String,
      checkpointDir: String, trigger: Trigger = Trigger.AvailableNow()) = {
    val spark = embStream.sparkSession
    embStream.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.queries.Similarity.appendVectorIndexDf(spark, batch, indexDir)
        ()
      }
      .start()
  }

  /** Streaming lexical-index ingest — the third index family's twin:
    * each micro-batch of (doc_id, text) appends as a postings batch
    * through [[graft.queries.Retrieval.appendLexicalIndex]] (the
    * O(increment) path — df re-derives from the vocab-sized artifact +
    * delta, the corpus is never re-read), so the index a `$terms` named
    * query answers from grows continuously as document files land.
    *
    * Delivery is EXACTLY-once end to end, one notch stronger than the
    * dedup/vector twins: the checkpoint makes the file source
    * exactly-once across restarts, and the lexical meta's atomic commit
    * carries the stream batch id — so a foreachBatch RE-delivery of an
    * already-committed batch (the at-least-once window the vector twin
    * heals at compaction) is a no-op here, never a double-counted df. */
  /** Streaming ingest for the persisted mixture stats — the fourth
    * family's twin. Same exactly-once shape as the lexical sink: the
    * atomic meta commit records the stream batch id, so a foreachBatch
    * re-delivery is a no-op instead of a double-counted monoid. */
  def mixtureStatsIngestStream(docsStream: DataFrame, indexDir: String,
      checkpointDir: String, trigger: Trigger = Trigger.AvailableNow()) = {
    val spark = docsStream.sparkSession
    docsStream.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        graft.queries.Pipeline.appendMixtureStats(spark,
          batch.select(col("source"), col("text")), indexDir,
          streamBatch = Some(id))
        ()
      }
      .start()
  }

  def lexicalIndexIngestStream(docsStream: DataFrame, indexDir: String,
      checkpointDir: String, trigger: Trigger = Trigger.AvailableNow()) = {
    val spark = docsStream.sparkSession
    docsStream.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        graft.queries.Retrieval.appendLexicalIndex(spark,
          batch.select(col("doc_id"), col("text")), indexDir,
          streamBatch = Some(id))
        ()
      }
      .start()
  }
}
