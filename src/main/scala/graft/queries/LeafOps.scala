package graft.queries

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.drisl.DValue._
import graft.drisl.Drisl
import graft.stream._
import graft.types._

/** Engine-level operators (SURVEY.md §2.A) surfaced through the driver's
  * correctness gate. Each entry drives the REAL lifecycle end-to-end: the
  * sf events table is encoded to DRISL payloads, bulk-imported into a
  * stream log, folded through a module's materializer (set-based), and read
  * back via named parameterized queries — while the DuckDB oracle computes
  * the same answer directly from the parquet + JSON props. A value mismatch
  * anywhere in codec → extraction → materialization → query binding would
  * fail the hash compare.
  */
object LeafOps {

  // keyed by (session, dir, tag): a cached StreamHandle is bound to the
  // session that built it — handing it to a later/different session is the
  // cross-session cache-contamination trap (see Similarity.centroids)
  private val streams = TrieMap.empty[(SparkSession, String, String), StreamHandle]

  private val demoModule = ModuleDef(
    initSql = """CREATE TABLE IF NOT EXISTS acts
                 |(idx BIGINT, user STRING, etype STRING, k BIGINT, value DOUBLE)
                 |USING PARQUET""".stripMargin,
    materializer = """INSERT INTO acts
                      |SELECT idx, user, drisl_extract(payload, '.type'),
                      |       drisl_extract_long(payload, '.k'),
                      |       drisl_extract_double(payload, '.value')
                      |FROM event""".stripMargin,
    queries = Map(
      "by_type" -> QueryDef(
        """SELECT etype, count(*) AS n,
          |  CAST(sum(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total
          |FROM acts GROUP BY etype ORDER BY etype""".stripMargin),
      "big_values" -> QueryDef(
        """SELECT idx, etype, value FROM acts
          |WHERE value > $min_value ORDER BY idx""".stripMargin,
        Seq(ParamDef("min_value", ParamKind.PReal))),
      "fields" -> QueryDef(
        "SELECT idx, user, k FROM acts ORDER BY idx"),
      "page" -> QueryDef(
        """SELECT idx, etype FROM acts
          |WHERE idx BETWEEN $start AND $start + $limit - 1
          |ORDER BY idx""".stripMargin),
      // SQLite total(): never-null float aggregate, rewritten by
      // SqlText.dialectRewrite to coalesce(sum(cast(.. as double)), 0.0).
      // k is integer-valued, so the double sum is order-independent (exact)
      "total_by_type" -> QueryDef(
        "SELECT etype, total(k) AS tk FROM acts GROUP BY etype ORDER BY etype")))

  // the redact gate's module: same materializer as the demo, plus a
  // grouped query that folds the NULL-extracted (redacted) rows into a
  // stable label so Spark/DuckDB null-ordering differences cannot bite
  private val redactModule = demoModule.copy(
    queries = demoModule.queries + ("by_type_redacted" -> QueryDef(
      """SELECT coalesce(etype, '<redacted>') AS etype, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total
        |FROM acts GROUP BY 1 ORDER BY etype""".stripMargin)))

  private val userTotalsModule = demoModule.copy(
    initSql = """CREATE TABLE IF NOT EXISTS user_totals
                 |(user STRING, value DOUBLE) USING PARQUET""".stripMargin,
    materializer = """INSERT INTO user_totals
                      |SELECT user, drisl_extract_double(payload, '.value') FROM event""".stripMargin,
    queries = Map("totals" -> QueryDef(
      """SELECT user, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total
        |FROM user_totals GROUP BY user ORDER BY user""".stripMargin)))

  /** Encode the sf events table into DRISL event payloads (one UDF pass)
    * and bulk-import into a fresh stream. idx = event_id + 1 (contiguous). */
  private def ingest(s: SparkSession, dir: String, streamId: String): StreamHandle = {
    val store = new StreamStore(s,
      graft.TempDirs.create("graft-leafops").toString)
    val h = store.open(streamId)
    h.setModule(demoModule)
    val enc = udf((etype: String, value: Double, k: Long) =>
      Drisl.encode(obj("type" -> text(etype), "value" -> DFloat(value), "k" -> int(k))))
    // range-partition the RAW rows BEFORE the CBOR-encode select (r18,
    // per ADVICE): the RangePartitioner's reservoir sampling re-evaluates
    // its input projection, so sampling the cheap raw columns instead of
    // the encode UDF stops the ingest's dominant kernel running an extra
    // time — and the range exchange now doubles as the parallelism
    // spread (one exchange where r17 had two: spread + post-encode
    // range). event_id order IS idx order (idx = event_id + 1), so the
    // imported log files stay idx-disjoint and min/max file pruning on
    // raw range scans keeps working exactly as before.
    val ev = Tables.df(s, dir, "events")
      .repartitionByRange(s.sparkContext.defaultParallelism, col("event_id"))
      .select(
        (col("event_id") + 1).as("idx"),
        concat(lit("u"), col("user_id")).as("user"),
        enc(col("event_type"), col("value"),
          get_json_object(col("props"), "$.k").cast("long")).as("payload"),
        lit(Array.empty[Byte]).as("signature"))
    h.bulkImport(ev)
    h
  }

  private def demo(s: SparkSession, dir: String): StreamHandle =
    streams.synchronized {
      streams.getOrElseUpdate((s, dir, "demo"), ingest(s, dir, s"did:graft:demo"))
    }

  val all: Map[String, Relational.Q] = Map(

    // ---- A2/A4/A6/A7: ingest → set-based materialize → grouped query ----
    "leaf_materialize_agg" -> Relational.Q(
      (s, dir) => demo(s, dir).query(None, LeafQuery("by_type")),
      Some("""SELECT event_type AS etype, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total
             |FROM events GROUP BY 1 ORDER BY etype""".stripMargin)),

    // ---- A14: drisl_extract round-trip of every field through CBOR ----
    "leaf_extract_fields" -> Relational.Q(
      (s, dir) => demo(s, dir).query(None, LeafQuery("fields", limit = Long.MaxValue)),
      Some("""SELECT event_id + 1 AS idx, 'u' || CAST(user_id AS VARCHAR) AS user,
             |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
             |FROM events ORDER BY idx""".stripMargin)),

    // ---- A7/A16: parameterized named query with validation + binding ----
    "leaf_query_param" -> Relational.Q(
      (s, dir) => demo(s, dir).query(None,
        LeafQuery("big_values", Map("min_value" -> SqlValue.SqlReal(180.0)))),
      Some("""SELECT event_id + 1 AS idx, event_type AS etype, value
             |FROM events WHERE value > 180.0 ORDER BY idx""".stripMargin)),

    // ---- A7: $start/$limit event-index windowing convention ----
    "leaf_query_window" -> Relational.Q(
      (s, dir) => demo(s, dir).query(None,
        LeafQuery("page", start = Some(101), limit = 50)),
      Some("""SELECT event_id + 1 AS idx, event_type AS etype FROM events
             |WHERE event_id + 1 BETWEEN 101 AND 150 ORDER BY idx""".stripMargin)),

    // ---- A13+A6: module swap triggers full replay through new module ----
    "leaf_module_swap" -> Relational.Q(
      (s, dir) => {
        val h = streams.synchronized {
          streams.getOrElseUpdate((s, dir, "swap"), {
            // reuse the demo stream's already-encoded log: the swap stream
            // imports the same events without re-running the CBOR encoding
            val src = demo(s, dir).eventsDF
            val store = new StreamStore(s,
              graft.TempDirs.create("graft-leafops").toString)
            val fresh = store.open("did:graft:swap")
            fresh.setModule(demoModule)
            fresh.bulkImport(src.filter(col("idx") > 0))
            fresh
          })
        }
        h.setModule(userTotalsModule)
        h.query(None, LeafQuery("totals"))
      },
      Some("""SELECT 'u' || CAST(user_id AS VARCHAR) AS user, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total
             |FROM events GROUP BY 1 ORDER BY user""".stripMargin)),

    // ---- A17: backup -> restore round-trip; the restored stream replays
    // the archived log through the module, so its query results must equal
    // the source's (oracle = the same aggregate over the source rows) ----
    "leaf_backup_restore" -> Relational.Q(
      (s, dir) => {
        val h = streams.synchronized {
          streams.getOrElseUpdate((s, dir, "bakres"), {
            val src = demo(s, dir)
            val bak = "file:" +
              graft.TempDirs.create("graft-leafops-bak")
            BackupService.backup(src, bak)
            val store = new StreamStore(s,
              graft.TempDirs.create("graft-leafops").toString)
            BackupService.restore(store, "did:graft:restored", bak)
          })
        }
        h.query(None, LeafQuery("by_type"))
      },
      Some("""SELECT event_type AS etype, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total
             |FROM events GROUP BY 1 ORDER BY etype""".stripMargin)),

    // ---- A17 interop: the REFERENCE bucket layout round-trips — export
    // the demo stream as {start}-{end}.events.drisl.zstd chains + wire
    // module blob + metadata, import into a FRESH store (module installs
    // from the bucket), and the restored stream's query must equal the
    // oracle aggregate over the source rows ----
    "leaf_backup_reference" -> Relational.Q(
      (s, dir) => {
        val h = streams.synchronized {
          streams.getOrElseUpdate((s, dir, "bakref"), {
            // phase split: the headline number conflates the CBOR+zstd
            // export, the parse+replay import, and the final query — the
            // bench phases attribute each (like q_dedup_incremental2)
            graft.PhaseTimings.reset("leaf_backup_reference")
            val src = demo(s, dir)
            val bak = "file:" +
              graft.TempDirs.create("graft-leafops-refbak")
            // default chunking: the gate measures the round-trip, not the
            // chunk loop (ClassifierBackupSpec pins multi-chunk chains)
            graft.PhaseTimings.timed("leaf_backup_reference", "export") {
              BackupService.exportReference(src, bak)
            }
            val store = new StreamStore(s,
              graft.TempDirs.create("graft-leafops").toString)
            graft.PhaseTimings.timed("leaf_backup_reference", "import_replay") {
              BackupService.importReference(
                store, "did:graft:ref-restored", bak, src.id)._1
            }
          })
        }
        graft.PhaseTimings.timed("leaf_backup_reference", "query") {
          h.query(None, LeafQuery("by_type"))
        }
      },
      Some("""SELECT event_type AS etype, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total
             |FROM events GROUP BY 1 ORDER BY etype""".stripMargin)),

    // ---- store-of-record REDACTION: the right-to-be-forgotten verb at
    // the event log itself (the round-14 delete verbs cover only the
    // derived index families). Redact every idx ≡ 0 (mod 97) through the
    // O(redacted) meta-committed tombstone set, replay the module over
    // the redacted log, and the grouped answer must match the oracle's
    // view of the same rows with their values forgotten — payload
    // nulling, replay determinism and the view seam all hash-gated ----
    "leaf_redact" -> Relational.Q(
      (s, dir) => {
        val h = streams.synchronized {
          streams.getOrElseUpdate((s, dir, "redact"), {
            graft.PhaseTimings.reset("leaf_redact")
            val src = demo(s, dir).eventsDF
            val store = new StreamStore(s,
              graft.TempDirs.create("graft-leafops").toString)
            val fresh = store.open("did:graft:redact")
            fresh.setModule(redactModule)
            graft.PhaseTimings.timed("leaf_redact", "ingest") {
              fresh.bulkImport(src.filter(col("idx") > 0))
            }
            graft.PhaseTimings.timed("leaf_redact", "redact_replay") {
              fresh.redactEventsDf(
                src.filter(col("idx") % 97 === 0).select(col("idx")),
                rematerialize = true)
            }
            fresh
          })
        }
        graft.PhaseTimings.timed("leaf_redact", "query") {
          h.query(None, LeafQuery("by_type_redacted"))
        }
      },
      Some("""SELECT CASE WHEN (event_id + 1) % 97 = 0 THEN '<redacted>'
             |            ELSE event_type END AS etype,
             |  count(*) AS n,
             |  CAST(sum(CASE WHEN (event_id + 1) % 97 = 0 THEN NULL
             |                ELSE CAST(value AS DECIMAL(10,2)) END)
             |       AS DOUBLE) AS total
             |FROM events GROUP BY 1 ORDER BY etype""".stripMargin)),

    // ---- (round 16) USER-keyed takedown at the store of record: one
    // redactEventsByUser call resolves every event the author wrote
    // (the shape a real right-to-be-forgotten request arrives in), the
    // module replays over the redacted log, and the grouped answer
    // matches the oracle's view of the same rows with that author's
    // values forgotten ----
    "leaf_forget_user" -> Relational.Q(
      (s, dir) => {
        val h = streams.synchronized {
          streams.getOrElseUpdate((s, dir, "forgetuser"), {
            graft.PhaseTimings.reset("leaf_forget_user")
            val src = demo(s, dir).eventsDF
            val store = new StreamStore(s,
              graft.TempDirs.create("graft-leafops").toString)
            val fresh = store.open("did:graft:forgetuser")
            fresh.setModule(redactModule)
            graft.PhaseTimings.timed("leaf_forget_user", "ingest") {
              fresh.bulkImport(src.filter(col("idx") > 0))
            }
            graft.PhaseTimings.timed("leaf_forget_user", "forget_replay") {
              fresh.redactEventsByUser(Seq("u7"), rematerialize = true)
            }
            fresh
          })
        }
        graft.PhaseTimings.timed("leaf_forget_user", "query") {
          h.query(None, LeafQuery("by_type_redacted"))
        }
      },
      Some("""SELECT CASE WHEN user_id = 7 THEN '<redacted>'
             |            ELSE event_type END AS etype,
             |  count(*) AS n,
             |  CAST(sum(CASE WHEN user_id = 7 THEN NULL
             |                ELSE CAST(value AS DECIMAL(10,2)) END)
             |       AS DOUBLE) AS total
             |FROM events GROUP BY 1 ORDER BY etype""".stripMargin)),

    // ---- A10: raw range scan, file-pruned by idx min/max stats ----
    "leaf_raw_scan" -> Relational.Q(
      (s, dir) => demo(s, dir).rawGetEvents(101, 150)
        .select(col("idx"), col("user")),
      Some("""SELECT event_id + 1 AS idx, 'u' || CAST(user_id AS VARCHAR) AS user
             |FROM events WHERE event_id + 1 BETWEEN 101 AND 150
             |ORDER BY idx""".stripMargin)),

    // ---- A5: state events fold into state_* tables without touching the
    // log; the oracle recomputes the same fold from the source rows ----
    "leaf_state_agg" -> Relational.Q(
      (s, dir) => {
        val h = streams.synchronized {
          streams.getOrElseUpdate((s, dir, "state"), {
            val store = new StreamStore(s,
              graft.TempDirs.create("graft-leafops").toString)
            val fresh = store.open("did:graft:state")
            fresh.setModule(demoModule.copy(
              stateInitSql = """CREATE TABLE IF NOT EXISTS state_user_vals
                                |(user STRING, value DOUBLE) USING PARQUET""".stripMargin,
              stateMaterializer = """INSERT INTO state_user_vals
                                     |SELECT user, drisl_extract_double(payload, '.value')
                                     |FROM event""".stripMargin,
              queries = Map("state_totals" -> QueryDef(
                """SELECT user, count(*) AS n,
                  |  CAST(sum(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total
                  |FROM state_user_vals GROUP BY user ORDER BY user""".stripMargin))))
            val evs = Tables.df(s, dir, "events")
              .filter(col("event_id") < 500)
              .select(concat(lit("u"), col("user_id")).as("user"),
                col("event_type"), col("value"),
                get_json_object(col("props"), "$.k").cast("long").as("k"))
              .collect()
            val batch = evs.map(r => IncomingEvent(r.getString(0),
              Drisl.encode(obj("type" -> text(r.getString(1)),
                "value" -> DFloat(r.getDouble(2)), "k" -> int(r.getLong(3))))))
            require(fresh.addStateEvents(batch.toSeq).isRight)
            require(fresh.latest == 0L, "state events must not append to the log")
            fresh
          })
        }
        h.query(None, LeafQuery("state_totals"))
      },
      Some("""SELECT 'u' || CAST(user_id AS VARCHAR) AS user, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total
             |FROM events WHERE event_id < 500
             |GROUP BY 1 ORDER BY user""".stripMargin)),

    // ---- dialect shim: SQLite total() aggregate through module SQL ----
    "leaf_total_agg" -> Relational.Q(
      (s, dir) => demo(s, dir).query(None, LeafQuery("total_by_type")),
      Some("""SELECT event_type AS etype,
             |  coalesce(sum(CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS DOUBLE)), 0.0) AS tk
             |FROM events GROUP BY 1 ORDER BY etype""".stripMargin)),

    // ---- A8: subscription backfill pages cover the log exactly once ----
    "leaf_subscribe_backfill" -> Relational.Q(
      (s, dir) => {
        val h = demo(s, dir)
        val engine = new SubscriptionEngine(h)
        var out = Vector.empty[(Long, String)]
        engine.subscribe(None, LeafQuery("page", start = Some(1), limit = 25000)) { d =>
          out ++= d.rows.map(r => (
            r("idx").asInstanceOf[SqlValue.SqlInteger].v,
            r("etype").asInstanceOf[SqlValue.SqlText].v))
        }
        engine.drain()
        val schema = StructType(Seq(
          StructField("idx", LongType), StructField("etype", StringType)))
        s.createDataFrame(
          java.util.Arrays.asList(out.map(t => Row(t._1, t._2)): _*), schema)
      },
      Some("""SELECT event_id + 1 AS idx, event_type AS etype
             |FROM events ORDER BY idx""".stripMargin))
  )
}
