package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Relational.Q

/** Training-data pipeline operators beyond per-document scoring: dedup
  * clustering, benchmark decontamination, stratified sampling, context
  * chunking, PII redaction. All over `documents`, all oracle-checked.
  *
  * Scale design:
  *  - cluster:       connected components over near-dup edges as BSP
  *                   min-label propagation — O(diameter) shuffle rounds,
  *                   each a plain equi-join; dup-cluster graphs have tiny
  *                   diameters, and the same loop upgrades to
  *                   large-star/small-star if they ever don't. Edges are
  *                   star-shaped per duplicate group (min-id hub), so a
  *                   group of n contributes n-1 edges, never O(n²).
  *  - decontaminate: the eval side of the n-gram join is DISTINCT over a
  *                   benchmark (tiny by construction), so Spark broadcasts
  *                   it and the 100-TB train side never shuffles — the
  *                   standard decontamination shape.
  *  - stratified:    pure map-side hash-threshold per stratum; no shuffle
  *                   at all beyond the final order for the gate.
  *  - chunks:        map-side explode; output is O(total chars / step).
  *  - redact:        map-side regexp_replace (codegen'd), no shuffle.
  *  - repetition:    per-doc signals are a doc_id-keyed groupBy over the
  *                   exploded bigrams — partial aggregation collapses each
  *                   doc inside its input partition, so the shuffle carries
  *                   ~one row per (doc, distinct bigram) cap, not the text.
  *  - vocab:         map-side explode + partial count + TakeOrdered: the
  *                   reducer sees one row per distinct token per partition.
  *  - pack:          greedy first-fit-in-order packing is sequential by
  *                   nature, so it runs per hash-group: repartition on grp,
  *                   sortWithinPartitions, one O(1)-state pass per
  *                   partition. Groups are independent — 100 TB packs as
  *                   wide as the group count with zero cross-group traffic.
  *  - dsir:          one text scan into per-(doc, hashed-bucket) counts;
  *                   the distribution/ratio tables are <= 256 rows
  *                   (broadcast), scoring is a map-side join + partial
  *                   agg, and the resample truncation is TakeOrdered.
  */
object Pipeline {

  // NOT spread wholesale (measured: the exchange taxes the light gates,
  // the mixture/doremi fixtures and the artifact-writing builds more
  // than it buys). The heavy one-shot kernels spread at their call
  // sites: dsirScores, nbClassifierScores, the funnel's stage-1 bigram
  // pass, q_decontaminate's gram passes.
  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.df(s, dir, "documents")

  // the component table is consumed by BOTH q_dedup_cluster and
  // q_split_leakage_safe; the BSP loop ends in an eager localCheckpoint,
  // so one (session, corpus) computes it once and both gates read the
  // checkpointed frame (a corpus dir is immutable for a session's life).
  // BOUNDED: each entry pins executor block storage for the life of the
  // process, so a long-lived session sweeping many corpus dirs must not
  // accumulate checkpoints without limit — the map is an access-ordered
  // LRU whose evictions release their checkpoint blocks, and
  // [[clearComponentCache]] releases everything for a session up front.
  private val maxCachedComponents = 4
  private val compCache = new java.util.LinkedHashMap[
    (SparkSession, String), (DataFrame, org.apache.spark.rdd.RDD[_])](
    8, 0.75f, true)

  /** The checkpointed RDD backing a localCheckpoint'd frame — the thing
    * whose blocks must be released when the cache lets the frame go. */
  private def checkpointRddOf(df: DataFrame): org.apache.spark.rdd.RDD[_] =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.getOrElse(df.rdd)

  /** Connected components over the dup-edge relations (the body of
    * `q_dedup_cluster`, shared with the leakage-safe split): returns
    * (doc_id, component) for every doc belonging to a dup cluster. */
  private def componentsDF(s: SparkSession, dir: String): DataFrame = {
    val key = (s, dir)
    val hit = compCache.synchronized(Option(compCache.get(key))).collect {
      // a released (or cleaner-reclaimed) checkpoint cannot be recomputed
      // — a stale hit would fail on first use, so rebuild instead
      case (df, rdd) if rdd.getStorageLevel.isValid => df
    }
    hit.getOrElse {
      val built = buildComponents(s, dir)
      val rdd = checkpointRddOf(built)
      compCache.synchronized {
        // a racing double-build may REPLACE an entry here; replaced and
        // LRU-evicted frames are released by dropping the reference and
        // letting the ContextCleaner reclaim their blocks on GC — an
        // explicit unpersist could yank a checkpoint out from under a
        // reader still mid-query on it (a checkpointed frame cannot be
        // recomputed), while the cleaner only fires once nothing
        // (including a running job) references the RDD
        compCache.put(key, (built, rdd))
        val it = compCache.entrySet().iterator()
        while (compCache.size > maxCachedComponents && it.hasNext) {
          it.next(); it.remove()
        }
      }
      built
    }
  }

  /** Release every cached component frame of `s` and drop its checkpoint
    * blocks eagerly. TEARDOWN-ONLY: unlike LRU eviction (which defers to
    * the ContextCleaner), this unpersists immediately — callers must not
    * have queries in flight over the released frames. The next
    * `q_dedup_cluster`/`q_split_leakage_safe` run simply rebuilds. */
  def clearComponentCache(s: SparkSession): Unit = {
    val dropped = compCache.synchronized {
      val it = compCache.entrySet().iterator()
      val out = List.newBuilder[(DataFrame, org.apache.spark.rdd.RDD[_])]
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey._1 eq s) { out += e.getValue; it.remove() }
      }
      out.result()
    }
    dropped.foreach(_._2.unpersist(false))
  }

  private def buildComponents(s: SparkSession, dir: String): DataFrame = {
        val c = Dedup.corpus(s, dir)
        // star edges via min-per-hash + an equi-join back, NOT a window
        // over the corpus (a window partitioned by md5(text) shuffles
        // FULL rows, text included) and NOT collect_set (a boilerplate
        // string duplicated millions of times in a web crawl would
        // buffer the whole mega-group's id array in ONE aggregation
        // buffer). BOTH relations (exact-text and 64-char-prefix) come
        // from ONE corpus scan — each doc emits its two (relation, hash)
        // keys in-row — so the build is one scan + one (rel, k) shuffle
        // + one join, all carrying fixed-width pairs: the min aggregate
        // collapses map-side, and the join back streams the pair side
        // against one min row per key — a mega-group costs throughput,
        // never per-task memory.
        val pairs = c.select(col("doc_id"),
            explode(array(
              struct(lit(0).as("rel"), md5(col("text")).as("k")),
              struct(lit(1).as("rel"),
                md5(substring(trim(col("text")), 1, 64)).as("k")))).as("rk"))
          .select(col("rk.rel").as("rel"), col("rk.k").as("k"), col("doc_id"))
        val minPerKey = pairs.groupBy(col("rel"), col("k"))
          .agg(min(col("doc_id")).as("m"))
        val edges = pairs.join(minPerKey, Seq("rel", "k"))
          .filter(col("doc_id") =!= col("m"))
          .select(col("m").as("a"), col("doc_id").as("b"))
          .distinct().persist()
        val und = edges.select(col("a").as("src"), col("b").as("dst"))
          .union(edges.select(col("b").as("src"), col("a").as("dst")))
        var labels = und.select(col("src").as("id")).distinct()
          .select(col("id"), col("id").as("label")).persist()
        // min-label only ever decreases, so an unchanged sum is a fixpoint
        // (coalesce: an edgeless corpus has an empty frontier, sum NULL)
        def labelSum(df: DataFrame): Long =
          df.agg(coalesce(org.apache.spark.sql.functions.sum("label"), lit(0L)))
            .head().getLong(0)
        var chk = labelSum(labels)
        var converged = false
        var iter = 0
        while (!converged && iter < 30) {
          val prop = labels.join(und, col("id") === col("src"))
            .select(col("dst").as("id"), col("label"))
          val next = labels.unionByName(prop)
            .groupBy("id").agg(min(col("label")).as("label")).persist()
          val nextChk = labelSum(next)
          labels.unpersist()
          labels = next
          converged = nextChk == chk
          chk = nextChk
          iter += 1
        }
        // a silent non-converged exit would return WRONG labels — fail loud
        if (!converged) throw new IllegalStateException(
          s"component propagation did not converge in $iter rounds " +
            "(component diameter exceeds the cap — raise it or switch " +
            "this loop to large-star/small-star)")
        // sever lineage so the loop's cached generations can be released
        // (the result no longer references them once checkpointed)
        val out = labels
          .select(col("id").as("doc_id"), col("label").as("component"))
          .localCheckpoint(true)
        labels.unpersist()
        edges.unpersist()
        out
  }

  /** The recursive-CTE oracle mirror of [[componentsDF]]: ends with a
    * `comp(doc_id, component)` CTE. Prefix with `WITH RECURSIVE `. */
  private val componentsSqlCtes =
    s"""${Dedup.corpusSql},
       |edges AS (
       |  SELECT m AS a, doc_id AS b FROM (
       |    SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS m FROM corpus)
       |  WHERE doc_id != m
       |  UNION
       |  SELECT m, doc_id FROM (
       |    SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(substr(trim(text), 1, 64))) AS m FROM corpus)
       |  WHERE doc_id != m),
       |und AS (SELECT a AS src, b AS dst FROM edges UNION SELECT b, a FROM edges),
       |reach(node, label) AS (
       |  SELECT DISTINCT src, src FROM und
       |  UNION
       |  SELECT u.dst, r.label FROM reach r JOIN und u ON u.src = r.node),
       |comp AS (
       |  SELECT node AS doc_id, min(label) AS component
       |  FROM reach GROUP BY node)""".stripMargin

  /** The DoReMi mixture table — (source, l_micro, excess_micro,
    * weight_nano), unordered — shared by the spec gate and the quota
    * resampler so the applied sample can never drift from the published
    * weights. See the q_mixture_doremi gate comment for the arithmetic
    * contract. */
  private[graft] def doremiWeights(s: SparkSession, dir: String): DataFrame =
    doremiWeightsFromCounts(domainTokenCounts(
      docs(s, dir).select(col("source"), col("text"))))

  /** Per-(domain, token) occurrence counts — the SUFFICIENT STATISTIC for
    * the DoReMi weights, and the exact state a streaming ingest maintains
    * (a monoid: counts add across micro-batches). Vocab × domains
    * bounded. Works on batch and streaming frames alike. */
  private[graft] def domainTokenCounts(df: DataFrame): DataFrame =
    df.select(col("source"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))

  /** The weight arithmetic over a maintained (source, tok, c) count
    * frame — the one implementation behind the batch gate and the
    * streaming twin (StreamingSpec proves stream-built counts produce
    * the IDENTICAL mixture table). */
  private[graft] def doremiWeightsFromCounts(stc: DataFrame): DataFrame = {
    val cnt = stc.groupBy("tok").agg(sum("c").as("c"))
    val tot = cnt.agg(sum("c").as("t"))
    val lp = cnt.crossJoin(broadcast(tot)).select(col("tok"),
      round(-log(col("c").cast("double") / col("t").cast("double")) * 1e6, 0)
        .cast("long").as("lm"))
    // Σ_tokens lm ≡ Σ_tok lm(tok)·c(source, tok) — the count-weighted
    // fold is the same integer as the per-instance sum
    val dom = stc.join(lp, "tok").groupBy("source")
      .agg(sum(col("lm") * col("c")).as("slm"), sum("c").as("n"))
      .select(col("source"), expr("slm DIV n").as("l_micro"))
    val lagg = dom.agg(min("l_micro").as("lmin"), max("l_micro").as("lmax"),
      count(lit(1)).as("nd"))
    // softmax shift: the exponent is η·(L_d − L_max) ≤ 0, so the
    // multiplier lives in (0, 1e6] for ANY loss spread — without the
    // shift exp(η·excess) overflows BIGINT past ~0.42 nats of spread
    // (the streaming twin's synthetic domains found this; normalized
    // weights are shift-invariant up to the 1e-6 rounding)
    val ex = dom.crossJoin(broadcast(lagg))
      .select(col("source"), col("l_micro"), col("nd"),
        (col("l_micro") - col("lmin")).as("excess_micro"),
        round(exp((col("l_micro") - col("lmax")).cast("double") / lit(10000.0)) * 1e6, 0)
          .cast("long").as("e"))
    val se = ex.agg(sum("e").as("se"))
    // the uniform term is c/|domains| of the budget — derived, never a
    // fixture-count literal (the streaming twin's 3-domain corpus
    // caught the hardcoded 20)
    ex.crossJoin(broadcast(se))
      .select(col("source"), col("l_micro"), col("excess_micro"),
        expr("(e * 1000000000 DIV se) * 9 DIV 10 + (100000000 DIV nd)")
          .cast("long").as("weight_nano"))
  }

  /** DuckDB twin of [[doremiWeights]], ending in the `wfinal` CTE. */
  private val doremiSqlCtes = doremiSqlCtesWhere("")

  /** `where` restricts the corpus the twin weighs — the delete gate's
    * survivor set. */
  private def doremiSqlCtesWhere(where: String): String =
    s"""toks AS (
      |  SELECT source,
      |    unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
      |  FROM documents $where),
      |cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
      |tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM cnt),
      |lp AS (
      |  SELECT tok,
      |    CAST(round(-ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) * 1e6, 0)
      |      AS BIGINT) AS lm
      |  FROM cnt, tot),
      |dom AS (
      |  SELECT source, CAST(sum(lm) AS BIGINT) // count(*) AS l_micro
      |  FROM toks JOIN lp USING (tok) GROUP BY source),
      |lagg AS (SELECT min(l_micro) AS lm0, max(l_micro) AS lm1,
      |  count(*) AS nd FROM dom),
      |ex AS (
      |  SELECT source, l_micro, nd, l_micro - lm0 AS excess_micro,
      |    CAST(round(exp(CAST(l_micro - lm1 AS DOUBLE) / 10000.0) * 1e6, 0)
      |      AS BIGINT) AS e
      |  FROM dom, lagg),
      |se AS (SELECT CAST(sum(e) AS BIGINT) AS se FROM ex),
      |wfinal AS (
      |  SELECT source, l_micro, excess_micro,
      |    (e * 1000000000 // se) * 9 // 10 + (100000000 // nd) AS weight_nano
      |  FROM ex, se)""".stripMargin

  // ---------------- persisted domain-mixture statistics ----------------
  // The DoReMi sufficient statistic as the FOURTH maintained artifact
  // family (after the dedup, vector, and lexical indexes): per-batch
  // (source, tok, c) count frames under `<counts>/batch=N`, committed by
  // ONE atomic meta.json rewrite — the shared batch discipline, so a
  // retried append Overwrites its own partial batch instead of doubling,
  // and a torn append (batch dir present, meta not bumped) REFUSES at
  // load. Counts are a monoid, so an append is just the increment's own
  // count frame as a fresh batch — the cleanest O(increment) of the four
  // families; compaction folds the batches into one inside a fresh
  // versioned counts dir (pointer flip, displaced generation retained one
  // cycle for in-flight readers). The weights reader folds committed
  // batches and runs [[doremiWeightsFromCounts]], so served weights can
  // never drift from the q_mixture_doremi gate.

  private[graft] case class MixMeta(batches: Int, docs: Long,
      countsDir: String = "counts", lastStreamBatch: Long = -1L)

  // normalized-path keying via the shared registry: a `file:`-prefixed or
  // relative alias of one index dir must resolve to the SAME lock
  private def mixLock(indexDir: String): Object =
    WriterLocks.lockFor(indexDir)

  private def mixMetaPath(s: SparkSession, indexDir: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(indexDir, "meta.json")
    (p.getFileSystem(s.sparkContext.hadoopConfiguration), p)
  }

  private def writeMixMeta(s: SparkSession, indexDir: String,
      m: MixMeta, kind: String = "commit",
      extra: Map[String, Any] = Map.empty): Unit = {
    val (fs, p) = mixMetaPath(s, indexDir)
    val body = graft.server.Json.render(Map("batches" -> m.batches.toLong,
      "docs" -> m.docs, "counts_dir" -> m.countsDir,
      "last_stream_batch" -> m.lastStreamBatch) ++ extra)
    graft.stream.PointerCommit.default.publish(fs, p,
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    appendMixHistory(indexDir, kind, body)
  }

  /** Has a delete carrying `token` already committed? The takedown
    * replay guard (r16 ADVICE): counts are a monoid with no per-doc
    * state, so a blind re-run of a crashed composed forget would append
    * the negated frame AGAIN and double-cancel the deleted docs'
    * counts. The token rides the delete's meta snapshot into
    * META_HISTORY (the durable commit log), so a repeat with the same
    * token provably no-ops. */
  private def mixTakedownCommitted(indexDir: String,
      token: String): Boolean = {
    val f = mixHistoryFile(indexDir)
    java.nio.file.Files.exists(f) && {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.readAllLines(f).asScala.exists { l =>
        l.split(" ", 3) match {
          case Array(_, "delete", json) =>
            try graft.server.Json.parse(json)
              .asInstanceOf[Map[String, Any]]
              .get("takedown").contains(token)
            catch { case _: Exception => false }
          case _ => false
        }
      }
    }
  }

  // ---------------- commit history + as-of reads ----------------
  // The mixture family's META_HISTORY (lexical/dedup discipline): counts
  // batches only GROW between commits and the monoid makes any PREFIX of
  // them an exact corpus state, so as-of = fold batches ≤ the logged
  // commit — integer-exact time travel at zero storage cost beyond the
  // batches the retention window already keeps.

  private def mixHistoryFile(indexDir: String): java.nio.file.Path =
    java.nio.file.Paths.get(indexDir.stripPrefix("file:"))
      .resolve("META_HISTORY")

  private def appendMixHistory(indexDir: String, kind: String,
      metaJson: String): Unit = {
    val seq = mixHistory(indexDir).size + 1
    // newline-prefixed: a torn tail isolates on its own line (drops at
    // parse) instead of merging with the next entry
    java.nio.file.Files.write(mixHistoryFile(indexDir),
      s"\n$seq $kind $metaJson"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
  }

  /** The commit log: (seq, kind, meta snapshot), oldest first. */
  private[graft] def mixHistory(
      indexDir: String): Seq[(Int, String, MixMeta)] = {
    val f = mixHistoryFile(indexDir)
    if (!java.nio.file.Files.exists(f)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      val parsed = java.nio.file.Files.readAllLines(f).asScala.toSeq
        .filter(_.nonEmpty).flatMap { l =>
          l.split(" ", 3) match {
            case Array(seq, kind, json) if seq.toIntOption.isDefined =>
              try {
                val m = graft.server.Json.parse(json)
                  .asInstanceOf[Map[String, Any]]
                Some((seq.toInt, kind, MixMeta(
                  m("batches").asInstanceOf[Long].toInt,
                  m("docs").asInstanceOf[Long],
                  m.get("counts_dir").collect { case d: String => d }
                    .getOrElse("counts"),
                  m.get("last_stream_batch").collect { case b: Long => b }
                    .getOrElse(-1L))))
              } catch { case _: Exception => None }
            case _ => None
          }
        }
      require(parsed.map(_._1) == parsed.indices.map(_ + 1),
        s"META_HISTORY at $indexDir is corrupted: seqs " +
          s"${parsed.map(_._1).mkString(",")} are not contiguous from 1 " +
          "— restore the file or delete it (history is observability " +
          "metadata; the live stats are unaffected)")
      parsed
    }
  }

  /** Is the snapshot's batch census still on disk? */
  private def mixSnapshotReadable(indexDir: String, m: MixMeta): Boolean = {
    val base = java.nio.file.Paths.get(indexDir.stripPrefix("file:"))
    (0 until m.batches).forall(b => java.nio.file.Files.isDirectory(
      base.resolve(m.countsDir).resolve(s"batch=$b")))
  }

  /** Operator-facing history rows, newest last, with the readability
    * flag marking the retention boundary. */
  def mixtureStatsHistory(s: SparkSession,
      indexDir: String): Seq[Map[String, Any]] =
    mixHistory(indexDir).map { case (seq, kind, m) =>
      Map("seq" -> seq.toLong, "kind" -> kind, "docs" -> m.docs,
        "batches" -> m.batches.toLong,
        "readable" -> mixSnapshotReadable(indexDir, m))
    }

  /** The served mixture table AS OF commit `seq`: fold exactly that
    * commit's batch prefix out of that commit's counts generation — the
    * monoid makes the historical state integer-exact (a pre-delete
    * snapshot has no negative batch to cancel with, so the deleted
    * docs' mass is VISIBLE again — that is the point). Loud refusal
    * past the retention boundary. */
  def mixtureWeightsAsOf(s: SparkSession, indexDir: String,
      seq: Int): DataFrame = mixLock(indexDir).synchronized {
    val h = mixHistory(indexDir)
    val (_, _, meta) = h.find(_._1 == seq).getOrElse(
      throw new IllegalArgumentException(
        s"no commit $seq in $indexDir history (${h.size} commits)"))
    require(mixSnapshotReadable(indexDir, meta),
      s"commit $seq of $indexDir is past the retention boundary — " +
        "its counts generation was retired by later commits")
    doremiWeightsFromCounts(
      readMixCounts(s, indexDir, meta)
        .groupBy("source", "tok").agg(sum("c").as("c"))
        .filter(col("c") > 0))
      .orderBy(col("source"))
  }

  // parse only — no batch-census validation (the lexical-index split:
  // append retries must be able to sweep their own crashed partial batch
  // before the strict census runs, or the refusal deadlocks the retry)
  private def parseMixMeta(s: SparkSession, indexDir: String): MixMeta = {
    val (fs, p) = mixMetaPath(s, indexDir)
    val raw = graft.stream.PointerCommit.default.readCurrent(fs, p)
    require(raw.nonEmpty,
      s"no mixture stats at $indexDir (missing meta.json)")
    val m = graft.server.Json.parse(new String(raw.get,
      java.nio.charset.StandardCharsets.UTF_8)).asInstanceOf[Map[String, Any]]
    MixMeta(
      m("batches").asInstanceOf[Long].toInt,
      m("docs").asInstanceOf[Long],
      m.get("counts_dir").collect { case d: String => d }.getOrElse("counts"),
      m.get("last_stream_batch").collect { case b: Long => b }.getOrElse(-1L))
  }

  // the torn-append detector (shared with the lexical/dedup indexes):
  // the counts dir must hold exactly the committed batches
  private def validateMixCensus(s: SparkSession, indexDir: String,
      meta: MixMeta): Unit = {
    val (fs, _) = mixMetaPath(s, indexDir)
    val committed = (0 until meta.batches).map(b => s"batch=$b").toSet
    val dir = new org.apache.hadoop.fs.Path(indexDir, meta.countsDir)
    val present = fs.listStatus(dir).iterator
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("batch=")).toSet
    require(present == committed,
      s"mixture stats at $indexDir are TORN: ${meta.countsDir}/ holds " +
        s"${present.toSeq.sorted.mkString(",")} but meta commits " +
        s"${meta.batches} batches — re-run the append that died " +
        "(it sweeps the partial batch at entry) or rebuild")
  }

  /** Strict read: every QUERY/read path refuses a torn layout. */
  private[graft] def readMixMeta(s: SparkSession,
      indexDir: String): MixMeta = {
    val meta = parseMixMeta(s, indexDir)
    validateMixCensus(s, indexDir, meta)
    meta
  }

  /** Append-entry recovery: delete exactly the UNCOMMITTED batch dirs
    * (number ≥ meta.batches — a crashed append's partial write), then the
    * strict census. Holds the writer lock at every call site, so only a
    * DEAD append's debris is ever swept, never a live one's. */
  private def readMixMetaForAppend(s: SparkSession,
      indexDir: String): MixMeta = {
    val meta = parseMixMeta(s, indexDir)
    val (fs, _) = mixMetaPath(s, indexDir)
    val dir = new org.apache.hadoop.fs.Path(indexDir, meta.countsDir)
    if (fs.exists(dir)) fs.listStatus(dir).iterator
      .filter(_.isDirectory).map(_.getPath)
      .filter { p =>
        val n = p.getName
        n.startsWith("batch=") &&
          n.stripPrefix("batch=").toIntOption.exists(_ >= meta.batches)
      }
      .foreach(p => fs.delete(p, true))
    validateMixCensus(s, indexDir, meta)
    meta
  }

  private def mixVersion(dirName: String): Int =
    if (dirName == "counts") 0
    else dirName.stripPrefix("counts.v").toInt

  // committed batch paths ONLY — base-dir partition discovery would
  // also pick up a concurrent append's already-written-but-uncommitted
  // batch dir, reading counts the meta has not admitted yet
  private def readMixCounts(s: SparkSession, indexDir: String,
      meta: MixMeta): DataFrame =
    s.read.parquet((0 until meta.batches)
        .map(b => s"$indexDir/${meta.countsDir}/batch=$b"): _*)
      .select(col("source"), col("tok"), col("c"))

  /** Rebuild from scratch: sweeps every prior generation. */
  def buildMixtureStats(s: SparkSession, srcDir: String,
      indexDir: String): Map[String, Long] = mixLock(indexDir).synchronized {
    buildMixtureStatsDf(s,
      docs(s, srcDir).select(col("source"), col("text")), indexDir)
  }

  def buildMixtureStatsDf(s: SparkSession, corpus: DataFrame,
      indexDir: String): Map[String, Long] = mixLock(indexDir).synchronized {
    import org.apache.spark.sql.SaveMode
    val (fs, mp) = mixMetaPath(s, indexDir)
    fs.listStatus(new org.apache.hadoop.fs.Path(indexDir)).iterator
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("counts"))
      .foreach(st => fs.delete(st.getPath, true))
    graft.stream.PointerCommit.default.delete(fs, mp)
    // rebuild resets batch numbering — clear the previous claims
    graft.stream.PointerCommit.clearClaims(fs,
      new org.apache.hadoop.fs.Path(indexDir))
    java.nio.file.Files.deleteIfExists(mixHistoryFile(indexDir))
    val nDocs = corpus.count()
    domainTokenCounts(corpus)
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/counts/batch=0")
    writeMixMeta(s, indexDir, MixMeta(1, nDocs), kind = "build")
    Map("docs" -> nDocs,
      "rows" -> s.read.parquet(s"$indexDir/counts/batch=0").count())
  }

  /** O(increment): the fresh docs' own count frame lands as a new batch
    * (counts are a monoid — no artifact re-derivation at all), and the
    * meta rewrite commits. */
  def appendMixtureStats(s: SparkSession, fresh: DataFrame,
      indexDir: String,
      streamBatch: Option[Long] = None): Map[String, Long] =
      mixLock(indexDir).synchronized {
    import org.apache.spark.sql.SaveMode
    val meta = readMixMetaForAppend(s, indexDir)
    // the streaming sink's exactly-once guard (the lexical discipline):
    // the atomic meta commit doubles as the transaction log, so a
    // foreachBatch RE-delivery of an already-committed micro-batch is a
    // no-op instead of double-counting the monoid
    if (streamBatch.exists(_ <= meta.lastStreamBatch))
      return Map("appended_docs" -> 0L, "docs" -> meta.docs,
        "batches" -> meta.batches.toLong)
    // cross-process writer lease: claim the batch number before staging
    // (PointerCommit.claimBatch — the racing append aborts loudly)
    locally {
      val (fs, _) = mixMetaPath(s, indexDir)
      val root = new org.apache.hadoop.fs.Path(indexDir)
      graft.stream.PointerCommit.sweepClaims(fs, root, meta.batches)
      // compaction crash-window debris (verdict r16 finding 3): see the
      // lexical append — stranded old-numbering claims sweep instead of
      // blocking this append until the lease expired
      if (mixHistory(indexDir).lastOption.exists(_._2 == "compact"))
        graft.stream.PointerCommit.sweepResetDebris(fs, root, meta.batches)
      graft.stream.PointerCommit.claimBatch(fs, root, meta.batches)
    }
    val nDocs = fresh.count()
    domainTokenCounts(fresh.select(col("source"), col("text")))
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$indexDir/${meta.countsDir}/batch=${meta.batches}")
    // fence, then publish, then release (see PointerCommit.verifyClaim)
    locally {
      val (fs, _) = mixMetaPath(s, indexDir)
      graft.stream.PointerCommit.verifyClaim(fs,
        new org.apache.hadoop.fs.Path(indexDir), meta.batches)
    }
    writeMixMeta(s, indexDir,
      MixMeta(meta.batches + 1, meta.docs + nDocs, meta.countsDir,
        streamBatch.getOrElse(meta.lastStreamBatch)), kind = "append")
    graft.stream.PointerCommit.releaseClaim(
      new org.apache.hadoop.fs.Path(indexDir), meta.batches)
    Map("appended_docs" -> nDocs, "docs" -> (meta.docs + nDocs),
      "batches" -> (meta.batches + 1).toLong)
  }

  /** Targeted deletion — the mixture family's right-to-be-forgotten
    * verb, and the cleanest of the four because counts are a MONOID:
    * deleting documents is appending their (source, tok) count frame
    * NEGATED as a fresh batch. O(deleted) work, the same atomic meta
    * commit as an append, no artifact re-derivation; every reader folds
    * batches by summation so the negative batch cancels the deleted
    * docs' contribution EXACTLY (integer arithmetic — the
    * q_mixture_delete gate hash-matches a from-scratch recompute over
    * the survivors), and the next compaction folds the negatives away
    * physically. `deleted` carries the docs' own (source, text) rows —
    * the stats keep no per-doc state, so the caller supplies what is
    * being forgotten (the takedown feed has it by definition).
    * Contract: delete only rows previously ingested — the monoid cannot
    * verify membership. `takedownToken` makes the delete REPLAY-SAFE
    * for orchestrated callers ([[graft.stream.Forget]]): a token that
    * already rode a committed delete into META_HISTORY no-ops instead
    * of double-negating the same docs' counts — without it, re-running
    * a crashed forget would corrupt the weights and compaction would
    * keep the nonzero negatives. */
  def deleteMixtureStats(s: SparkSession, deleted: DataFrame,
      indexDir: String,
      takedownToken: Option[String] = None): Map[String, Long] =
      mixLock(indexDir).synchronized {
    import org.apache.spark.sql.SaveMode
    val meta = readMixMetaForAppend(s, indexDir)
    if (takedownToken.exists(mixTakedownCommitted(indexDir, _)))
      return Map("deleted_docs" -> 0L, "docs" -> meta.docs,
        "batches" -> meta.batches.toLong, "replayed" -> 1L)
    // a delete is an append of the negated frame — it claims its batch
    // number through the same cross-process lease (and sweeps an
    // interrupted compaction's stranded claims the same way)
    locally {
      val (fs, _) = mixMetaPath(s, indexDir)
      val root = new org.apache.hadoop.fs.Path(indexDir)
      graft.stream.PointerCommit.sweepClaims(fs, root, meta.batches)
      if (mixHistory(indexDir).lastOption.exists(_._2 == "compact"))
        graft.stream.PointerCommit.sweepResetDebris(fs, root, meta.batches)
      graft.stream.PointerCommit.claimBatch(fs, root, meta.batches)
    }
    val nDocs = deleted.count()
    domainTokenCounts(deleted.select(col("source"), col("text")))
      .select(col("source"), col("tok"), (-col("c")).as("c"))
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$indexDir/${meta.countsDir}/batch=${meta.batches}")
    // fence, then publish, then release (see PointerCommit.verifyClaim)
    locally {
      val (fs, _) = mixMetaPath(s, indexDir)
      graft.stream.PointerCommit.verifyClaim(fs,
        new org.apache.hadoop.fs.Path(indexDir), meta.batches)
    }
    writeMixMeta(s, indexDir,
      MixMeta(meta.batches + 1, meta.docs - nDocs, meta.countsDir,
        meta.lastStreamBatch), kind = "delete",
      extra = takedownToken.map("takedown" -> _).toMap)
    graft.stream.PointerCommit.releaseClaim(
      new org.apache.hadoop.fs.Path(indexDir), meta.batches)
    Map("deleted_docs" -> nDocs, "docs" -> (meta.docs - nDocs),
      "batches" -> (meta.batches + 1).toLong)
  }

  /** Fold the batches into one inside a fresh versioned counts dir —
    * pointer flip, displaced generation retained one cycle. Purely
    * physical: the folded frame aggregates the same monoid. */
  def compactMixtureStats(s: SparkSession,
      indexDir: String): Map[String, Long] = mixLock(indexDir).synchronized {
    import org.apache.spark.sql.SaveMode
    val meta = readMixMeta(s, indexDir)
    val (fs, _) = mixMetaPath(s, indexDir)
    // sweep generations outside the retention window (history-aware:
    // the last `retainGenerations` snapshots stay readable for as-of)
    val keep = (mixHistory(indexDir)
      .takeRight(graft.stream.PointerCommit.retainGenerations)
      .map(_._3.countsDir) :+ meta.countsDir).toSet
    fs.listStatus(new org.apache.hadoop.fs.Path(indexDir)).iterator
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("counts"))
      .filterNot(st => keep.contains(st.getPath.getName))
      .foreach(st => fs.delete(st.getPath, true))
    val next = s"counts.v${mixVersion(meta.countsDir) + 1}"
    readMixCounts(s, indexDir, meta)
      .groupBy("source", "tok").agg(sum("c").as("c"))
      // the physical purge of delete batches: zeroed (source, tok) rows
      // fold away — a rebuilt artifact would not carry them either
      .filter(col("c") =!= 0)
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/$next/batch=0")
    // carry the stream cursor: a compaction between two streamed
    // micro-batches must not reopen the exactly-once window
    writeMixMeta(s, indexDir,
      MixMeta(1, meta.docs, next, meta.lastStreamBatch), kind = "compact")
    // compaction RESETS batch numbering (batches -> 1), so every claim
    // of the previous numbering is debris that would block the next
    // append until its lease expired — the rebuild discipline
    graft.stream.PointerCommit.clearClaims(fs,
      new org.apache.hadoop.fs.Path(indexDir))
    Map("batches" -> 1L, "docs" -> meta.docs)
  }

  // info/weights hold the writer lock too: readMixMeta's torn detector
  // must never fire on an IN-PROCESS append's commit window (the
  // detector exists for out-of-process writers and crashes)
  def mixtureStatsInfo(s: SparkSession,
      indexDir: String): Map[String, Long] = mixLock(indexDir).synchronized {
    val meta = readMixMeta(s, indexDir)
    val (fs, _) = mixMetaPath(s, indexDir)
    val it = fs.listFiles(
      new org.apache.hadoop.fs.Path(indexDir, meta.countsDir), true)
    var files = 0L
    while (it.hasNext) {
      if (it.next().getPath.getName.endsWith(".parquet")) files += 1
    }
    Map("batches" -> meta.batches.toLong, "docs" -> meta.docs,
      "files" -> files,
      "rows" -> readMixCounts(s, indexDir, meta).count())
  }

  /** The served mixture table: fold committed batches, then the ONE
    * weight implementation. */
  def mixtureWeights(s: SparkSession,
      indexDir: String): DataFrame = mixLock(indexDir).synchronized {
    val meta = readMixMeta(s, indexDir)
    doremiWeightsFromCounts(
      readMixCounts(s, indexDir, meta)
        .groupBy("source", "tok").agg(sum("c").as("c"))
        // a delete's negative batch can cancel a (source, tok) to zero —
        // drop it exactly as a rebuild over the survivors would
        .filter(col("c") > 0))
      .orderBy(col("source"))
  }

  // one mixture-stats artifact per (session, corpus): the build is the
  // one-off cost, the indexed gate measures the SERVE (the lexIndexDir
  // memo pattern)
  private val mixReady =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private def mixStatsDir(s: SparkSession, dir: String): String =
    mixReady.getOrElseUpdate((s, dir), {
      val p = graft.TempDirs.create("graft-mixstats").toString
      buildMixtureStats(s, dir, p)
      p
    })

  // the delete gate's fixture: ONE (build → delete doc_id % 6 = 1) stats
  // artifact per (session, corpus) — its own dir, never the shared
  // mixStatsDir (the negative batch would poison q_mixture_indexed)
  private val mixDelReady =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]
  private def mixDeletedStatsDir(s: SparkSession, dir: String): String =
    mixDelReady.getOrElseUpdate((s, dir), {
      val p = graft.TempDirs.create("graft-mixdel").toString
      buildMixtureStats(s, dir, p)
      deleteMixtureStats(s,
        docs(s, dir).filter(col("doc_id") % 6 === 1)
          .select(col("source"), col("text")), p)
      p
    })

  val all: Map[String, Q] = Map(

    // ---- near-dup clustering: connected components over dup edges ----
    // Edges: exact-text duplicates and 64-char-prefix duplicates, each as
    // a star to the group's min doc_id. Components emerge when the two
    // relations chain through different hubs (A≡B exactly, B~C by prefix).
    // Spark: BSP min-label propagation (monotone, so the per-round
    // sum(label) is a convergence witness); oracle: recursive CTE
    // computing min reachable id — both sides see the identical edge set.
    "q_dedup_cluster" -> Q(
      (s, dir) => componentsDF(s, dir).orderBy(col("doc_id")),
      Some(s"""WITH RECURSIVE $componentsSqlCtes
              |SELECT doc_id, component FROM comp ORDER BY doc_id""".stripMargin)),

    // ---- soft dedup: cluster-size downweighting ----
    // The keep-everything alternative to dropping near-dups: every doc
    // gets sampling weight 1/|its dup cluster| (1.0 when unclustered), so
    // a page boilerplated across ten thousand URLs contributes ~one doc's
    // worth of training mass instead of ten thousand. One group-by over
    // the shared component table + a left join back — the cluster table
    // is a persisted artifact of the clustering run, so at 100 TB this
    // costs two metadata-sized shuffles on top of the corpus scan. The
    // weight is a single double division of exact integers (bit-identical
    // cross-engine, the q_text_quality convention).
    "q_dedup_weighted" -> Q(
      (s, dir) => {
        val comp = componentsDF(s, dir)
        val sizes = comp.groupBy(col("component"))
          .agg(count(lit(1)).as("cluster_size"))
        Dedup.corpus(s, dir).select(col("doc_id"))
          .join(comp, Seq("doc_id"), "left")
          .join(sizes, Seq("component"), "left")
          .select(col("doc_id"),
            coalesce(col("cluster_size"), lit(1L)).as("cluster_size"),
            (lit(1.0) / coalesce(col("cluster_size"), lit(1L))).as("weight"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE $componentsSqlCtes,
              |sizes AS (
              |  SELECT component, count(*) AS cluster_size
              |  FROM comp GROUP BY component)
              |SELECT d.doc_id,
              |  COALESCE(s.cluster_size, 1) AS cluster_size,
              |  CAST(1 AS DOUBLE) / COALESCE(s.cluster_size, 1) AS weight
              |FROM corpus d
              |LEFT JOIN comp c ON d.doc_id = c.doc_id
              |LEFT JOIN sizes s ON c.component = s.component
              |ORDER BY d.doc_id""".stripMargin)),

    // ---- leakage-safe train/valid/test split ----
    // Hash-splitting DOCS leaks: two near-duplicates can land one in
    // train and one in eval, and the eval set silently scores memorized
    // content. The split unit must be the dup CLUSTER: every doc maps to
    // its component label (its own id when unclustered), and the split
    // decision hashes the UNIT — members of a cluster inherit one
    // decision by construction, so no dup pair can ever straddle splits.
    // At scale this adds one left join against the component table (a
    // persisted artifact of the clustering run) to the plain hash split;
    // the 80/10/10 bucketing stays pure md5 integer arithmetic both
    // engines replicate.
    "q_split_leakage_safe" -> Q(
      (s, dir) => {
        val unit = Dedup.corpus(s, dir).select(col("doc_id"))
          .join(componentsDF(s, dir), Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("component"), col("doc_id")).as("unit"))
        val h = conv(substring(md5(col("unit").cast("string")), 1, 15), 16, 10)
          .cast("long") % 100
        unit.select(col("doc_id"), col("unit"),
            when(h < 80, lit("train")).when(h < 90, lit("valid"))
              .otherwise(lit("test")).as("split"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE $componentsSqlCtes,
              |unit AS (
              |  SELECT c.doc_id, coalesce(p.component, c.doc_id) AS unit
              |  FROM corpus c LEFT JOIN comp p ON p.doc_id = c.doc_id)
              |SELECT doc_id, unit,
              |  CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'valid'
              |       ELSE 'test' END AS split
              |FROM (
              |  SELECT doc_id, unit,
              |    ('0x' || substr(md5(CAST(unit AS VARCHAR)), 1, 15))::BIGINT % 100 AS h
              |  FROM unit)
              |ORDER BY doc_id""".stripMargin)),

    // ---- benchmark decontamination: char-20-gram overlap vs an eval set ----
    // Eval set = every 97th doc (stand-in for a held-out benchmark). A
    // train doc is contaminated if it shares any 20-gram with any eval
    // doc; the gate reports the distinct shared-gram count per doc.
    "q_decontaminate" -> Q(
      (s, dir) => {
        val d = Tables.spread(docs(s, dir))
          .select(col("doc_id"), trim(col("text")).as("t"))
          .filter(length(col("t")) >= 20)
        def grams(df: DataFrame) = df
          .select(col("doc_id"),
            explode(sequence(lit(1), length(col("t")) - 19, lit(5))).as("i"),
            col("t"))
          .select(col("doc_id"),
            graft.functions.VectorExpressions
              .md5_60(s, col("t").substr(col("i"), lit(20))).as("h"))
        val evalG = grams(d.filter(col("doc_id") % 97 === 0)).select("h").distinct()
        val trainG = grams(d.filter(col("doc_id") % 97 =!= 0)).distinct()
        trainG.join(evalG, "h")
          .groupBy("doc_id").agg(count(lit(1)).as("shared_ngrams"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH g AS (
             |  SELECT doc_id, ('0x' || substr(md5(substr(trim(text), i, 20)), 1, 15))::BIGINT AS h
             |  FROM (SELECT doc_id, text, unnest(generate_series(1, length(trim(text)) - 19, 5)) AS i
             |        FROM documents WHERE length(trim(text)) >= 20)),
             |evalg AS (SELECT DISTINCT h FROM g WHERE doc_id % 97 = 0),
             |traing AS (SELECT DISTINCT doc_id, h FROM g WHERE doc_id % 97 != 0)
             |SELECT doc_id, count(*) AS shared_ngrams
             |FROM traing JOIN evalg USING (h)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- stratified sampling: per-language rates, hash-deterministic ----
    // The per-stratum keep decision is an integer compare on a doc_id
    // hash — no RNG, no shuffle; rerunning at any scale keeps the same
    // rows. Rates in basis points of 1000 (en 50%, zh 10%, rest 30%).
    "q_sample_stratified" -> Q(
      (s, dir) => {
        val h = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long") % 1000
        val rate = when(col("lang") === "en", 500)
          .when(col("lang") === "zh", 100).otherwise(300)
        docs(s, dir)
          .select(col("doc_id"), col("lang"), h.as("hb"), rate.as("rate"))
          .filter(col("hb") < col("rate"))
          .select(col("doc_id"), col("lang"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, lang FROM (
             |  SELECT doc_id, lang,
             |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000 AS hb,
             |    CASE WHEN lang = 'en' THEN 500 WHEN lang = 'zh' THEN 100 ELSE 300 END AS rate
             |  FROM documents)
             |WHERE hb < rate ORDER BY doc_id""".stripMargin)),

    // ---- per-domain quota sampling: deterministic cap per source ----
    // Domain balancing, the counterpart of stratified rates: every
    // source keeps at most 10 docs, chosen by hash order (no RNG, same
    // survivors on every rerun at any scale). The rank-filter shape
    // compiles to a map-side partial WindowGroupLimit, so the source
    // exchange carries ≤ 10 rows per source per partition — a 100-TB
    // domain with millions of pages ships 10 rows to the reducer, not
    // the domain. Emits (source, doc_id, rk) for the kept rows.
    "q_sample_domain_quota" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val h = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long")
        docs(s, dir)
          .select(col("source"), col("doc_id"), h.as("hk"))
          .withColumn("rk", row_number().over(Window.partitionBy(col("source"))
            .orderBy(col("hk"), col("doc_id"))))
          .filter(col("rk") <= 10)
          .select(col("source"), col("doc_id"), col("rk").cast("long").as("rk"))
          .orderBy(col("source"), col("rk"))
      },
      Some("""SELECT source, doc_id, rk FROM (
             |  SELECT source, doc_id,
             |    row_number() OVER (PARTITION BY source ORDER BY
             |      ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
             |      doc_id) AS rk
             |  FROM documents)
             |WHERE rk <= 10 ORDER BY source, rk""".stripMargin)),

    // ---- the composed curation pipeline, end to end ----
    // The operators above are gate-checked one at a time; a real corpus
    // run CHAINS them, and composition is where silent drift hides
    // (stage N's survivors are stage N+1's universe — every statistic
    // downstream of a filter must recompute over the filtered set).
    // This gate runs the canonical four-stage curation pass as ONE
    // dataflow and hash-matches the whole composition:
    //   1. quality gate  — the Gopher keep predicate (q_quality_gopher's
    //      exact bounds) filters the raw corpus;
    //   2. exact dedup   — canonical (min doc_id) per md5 fingerprint,
    //      computed over the QUALITY SURVIVORS only;
    //   3. decontamination — drop survivors sharing any 20-char/stride-5
    //      n-gram with the held-out eval split (doc_id % 97 = 0 of the
    //      RAW corpus — q_decontaminate's exact grams), eval ids
    //      excluded from train;
    //   4. domain quota  — ≤10 docs per source by the deterministic
    //      md5(doc_id) order (q_sample_domain_quota's exact rank).
    // Scale shape: stages 1-2 are one corpus pass + one fingerprint
    // shuffle; stage 3's gram join is bounded by the eval split's gram
    // set (broadcast at real eval sizes); stage 4's rank-filter compiles
    // to a map-side WindowGroupLimit, ≤10 rows per source per partition
    // cross the exchange. No stage re-reads the corpus of record.
    "q_pipeline_e2e" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val d = docs(s, dir).select(col("doc_id"), col("source"), col("text"))
        // 1. quality: the gopher bounds
        val t = split(trim(col("text")), "\\s+")
        val nWords = size(t).cast("long")
        val nAlpha = length(regexp_replace(col("text"), "\\s+", ""))
          .cast("long")
        val maxW = array_max(transform(t, w => length(w))).cast("long")
        val quality = d.filter(nWords >= 20 && nWords <= 80 &&
          nAlpha >= nWords * 3 && nAlpha <= nWords * 10 && maxW <= 15)
        // 2. exact dedup among survivors: keep the canonical per content
        val canon = quality.groupBy(md5(col("text")).as("fp"))
          .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
        val deduped = quality.join(canon, Seq("doc_id"), "left_semi")
        // 3. decontaminate vs the held-out split of the RAW corpus
        def grams(df: DataFrame): DataFrame = df
          .select(col("doc_id"), trim(col("text")).as("tt"))
          .filter(length(col("tt")) >= 20)
          .select(col("doc_id"),
            explode(sequence(lit(1), length(col("tt")) - 19, lit(5)))
              .as("i"), col("tt"))
          .select(col("doc_id"), graft.functions.VectorExpressions
            .md5_60(s, col("tt").substr(col("i"), lit(20))).as("h"))
        val evalG = grams(d.filter(col("doc_id") % 97 === 0))
          .select("h").distinct()
        val train = deduped.filter(col("doc_id") % 97 =!= 0)
        val bad = grams(train).distinct()
          .join(evalG, "h").select("doc_id").distinct()
        val clean = train.join(bad, Seq("doc_id"), "left_anti")
        // 4. per-source quota by deterministic hash order
        val h = conv(substring(md5(col("doc_id").cast("string")), 1, 15),
          16, 10).cast("long")
        clean.select(col("source"), col("doc_id"), h.as("hk"))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("source"))
              .orderBy(col("hk"), col("doc_id"))))
          .filter(col("rk") <= 10)
          .select(col("source"), col("doc_id"),
            col("rk").cast("long").as("rk"))
          .orderBy(col("source"), col("rk"))
      },
      Some("""WITH q AS (
             |  SELECT doc_id, source, text FROM (
             |    SELECT doc_id, source, text,
             |      CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_words,
             |      CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT) AS n_alpha,
             |      CAST(list_max(list_transform(regexp_split_to_array(trim(text), '\s+'),
             |           w -> length(w))) AS BIGINT) AS max_word_len
             |    FROM documents)
             |  WHERE n_words >= 20 AND n_words <= 80
             |    AND n_alpha >= n_words * 3 AND n_alpha <= n_words * 10
             |    AND max_word_len <= 15),
             |canon AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)),
             |dd AS (SELECT q.* FROM q JOIN canon USING (doc_id)),
             |eg AS (
             |  SELECT DISTINCT ('0x' || substr(md5(substr(trim(text), i, 20)), 1, 15))::BIGINT AS h
             |  FROM (SELECT text, unnest(generate_series(1, length(trim(text)) - 19, 5)) AS i
             |        FROM documents WHERE doc_id % 97 = 0 AND length(trim(text)) >= 20)),
             |tg AS (
             |  SELECT DISTINCT doc_id, ('0x' || substr(md5(substr(trim(text), i, 20)), 1, 15))::BIGINT AS h
             |  FROM (SELECT doc_id, text, unnest(generate_series(1, length(trim(text)) - 19, 5)) AS i
             |        FROM dd WHERE doc_id % 97 != 0 AND length(trim(text)) >= 20)),
             |bad AS (SELECT DISTINCT doc_id FROM tg JOIN eg USING (h)),
             |clean AS (
             |  SELECT * FROM dd
             |  WHERE doc_id % 97 != 0 AND doc_id NOT IN (SELECT doc_id FROM bad))
             |SELECT source, doc_id, rk FROM (
             |  SELECT source, doc_id,
             |    row_number() OVER (PARTITION BY source ORDER BY
             |      ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
             |      doc_id) AS rk
             |  FROM clean)
             |WHERE rk <= 10 ORDER BY source, rk""".stripMargin)),

    // ---- fixed-k uniform sample: the reservoir-sampling replacement ----
    // "Give me exactly 100 uniformly-chosen docs from the corpus" without
    // RNG state or a global sort: order by a content-independent hash of
    // the doc id and keep the k smallest. The hash order IS a uniform
    // permutation, so the k winners are a uniform k-subset, identical on
    // every rerun and on any cluster layout. Spark compiles the
    // orderBy+limit to TakeOrderedAndProject (PlanAuditSpec pins it):
    // each partition keeps its local top-k heap — O(k) state — and the
    // driver merges P·k candidate rows; a 100-TB corpus never sorts and
    // never shuffles more than P·k rows. The classic distributed
    // reservoir trick, minus the sequential-scan dependence that makes
    // true reservoir sampling unshardable.
    "q_sample_uniform_k" -> Q(
      (s, dir) => {
        val h = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long")
        docs(s, dir)
          .select(col("doc_id"), col("lang"), h.as("hk"))
          .orderBy(col("hk"), col("doc_id"))
          .limit(100)
      },
      Some("""SELECT doc_id, lang,
             |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hk
             |FROM documents
             |ORDER BY hk, doc_id LIMIT 100""".stripMargin)),

    // ---- quality-weighted (importance) sampling ----
    // The DCLM/FineWeb move: keep a doc with probability proportional to
    // a quality signal instead of uniformly — here type-token ratio
    // (distinct/total tokens), the cheapest diversity proxy, so
    // boilerplate-heavy docs downsample themselves. No RNG and no float
    // probabilities: keep iff (hash % 1000) · n_tok < 1000 · n_distinct
    // — an exact integer cross-multiplication both engines state
    // identically, rerun-stable at any scale. One doc_id-keyed aggregate
    // (partial-agg collapses tokens map-side), then a map filter.
    "q_sample_weighted" -> Q(
      (s, dir) => {
        val h = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long") % 1000
        docs(s, dir)
          .select(col("doc_id"),
            explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tok"),
            countDistinct(col("w")).as("n_distinct"))
          .withColumn("hb", h)
          .filter(col("hb") * col("n_tok") < col("n_distinct") * 1000)
          .select(col("doc_id"), col("n_tok"), col("n_distinct"), col("hb"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, n_tok, n_distinct, hb FROM (
             |  SELECT doc_id, count(*) AS n_tok, count(DISTINCT w) AS n_distinct,
             |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             |      % 1000 AS hb
             |  FROM (SELECT doc_id,
             |          unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
             |        FROM documents)
             |  GROUP BY doc_id)
             |WHERE hb * n_tok < n_distinct * 1000
             |ORDER BY doc_id""".stripMargin)),

    // ---- per-epoch training shuffle + loader sharding ----
    // Every epoch needs a DIFFERENT uniform permutation of the corpus,
    // and every data-loader worker needs its slice of it — with no RNG
    // state to checkpoint and no global sort to pay. Hashing
    // (epoch, doc_id) gives each epoch an independent permutation;
    // shard = hash % 8 routes each doc to one loader, and the within-
    // shard rank (one window per (epoch, shard) — 24 independent
    // partitions at any scale) is the read order. Reruns, resumes, and
    // stragglers all see the identical epoch order, which is what makes
    // training reproducible on a cluster. Emits epoch 0 vs 1 so the
    // permutation independence is visible data.
    "q_shuffle_epoch" -> Q(
      (s, dir) => {
        val h = conv(substring(md5(
          concat(col("epoch").cast("string"), lit(":"),
            col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long")
        docs(s, dir)
          .select(col("doc_id"))
          .crossJoin(s.range(2).select(col("id").as("epoch")))
          .withColumn("hk", h)
          .withColumn("shard", pmod(col("hk"), lit(8)))
          .withColumn("pos", row_number().over(Window
            .partitionBy(col("epoch"), col("shard"))
            .orderBy(col("hk"), col("doc_id"))).cast("long"))
          .orderBy(col("epoch"), col("shard"), col("pos"))
      },
      Some("""SELECT doc_id, CAST(epoch AS BIGINT) AS epoch, hk, shard,
             |  CAST(row_number() OVER (PARTITION BY epoch, shard
             |                          ORDER BY hk, doc_id) AS BIGINT) AS pos
             |FROM (
             |  SELECT doc_id, epoch,
             |    ('0x' || substr(md5(CAST(epoch AS VARCHAR) || ':' ||
             |       CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hk,
             |    ('0x' || substr(md5(CAST(epoch AS VARCHAR) || ':' ||
             |       CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8 AS shard
             |  FROM documents CROSS JOIN (SELECT unnest([0, 1]) AS epoch))
             |ORDER BY epoch, shard, pos""".stripMargin)),

    // ---- training-mix resampling: per-language integer upsampling ----
    // The data-mixing step of a training run: low-resource/high-value
    // slices repeat an integer number of times (en×3, de×2, rest ×1),
    // each copy with a STABLE derived id (doc_id·10 + copy) so reruns and
    // downstream shuffles see identical rows — no RNG, map-side explode,
    // output volume = Σ weights. The gate reports per-language doc/copy
    // counts plus the id range as evidence of stable assignment.
    "q_sample_mixture" -> Q(
      (s, dir) => {
        val rep = when(col("lang") === "en", 3)
          .when(col("lang") === "de", 2).otherwise(1)
        docs(s, dir)
          .select(col("doc_id"), col("lang"), rep.as("rep"))
          .select(col("doc_id"), col("lang"),
            explode(sequence(lit(1), col("rep"))).as("copy"))
          .select(col("lang"), col("doc_id"),
            (col("doc_id") * 10 + col("copy")).as("sample_id"))
          .groupBy("lang")
          .agg(countDistinct(col("doc_id")).as("n_docs"),
            count(lit(1)).as("n_copies"),
            min(col("sample_id")).as("min_sid"),
            max(col("sample_id")).as("max_sid"))
          .orderBy(col("lang"))
      },
      Some("""WITH m AS (
             |  SELECT lang, doc_id,
             |    doc_id * 10 + unnest(generate_series(1,
             |      CASE WHEN lang = 'en' THEN 3 WHEN lang = 'de' THEN 2
             |           ELSE 1 END)) AS sample_id
             |  FROM documents)
             |SELECT lang, count(DISTINCT doc_id) AS n_docs,
             |  count(*) AS n_copies,
             |  min(sample_id) AS min_sid, max(sample_id) AS max_sid
             |FROM m GROUP BY lang ORDER BY lang""".stripMargin)),

    // ---- context chunking: 200-char windows, 50-char overlap ----
    // The RAG/training prep shape: explode each document into fixed-size
    // overlapping chunks with stable ids. Output carries the chunk md5
    // (content proof) instead of the text to keep the gate thin.
    "q_text_chunks" -> Q(
      (s, dir) => docs(s, dir)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(1), greatest(length(col("text")), lit(1)), lit(150))).as("i"))
        .select(
          col("doc_id"),
          expr("CAST((i - 1) DIV 150 AS BIGINT)").as("chunk_id"),
          col("i").cast("long").as("start"),
          md5(col("text").substr(col("i"), lit(200))).as("chunk_md5"),
          length(col("text").substr(col("i"), lit(200))).cast("long").as("chunk_len"))
        .orderBy(col("doc_id"), col("chunk_id")),
      Some("""SELECT doc_id, (i - 1) // 150 AS chunk_id, CAST(i AS BIGINT) AS start,
             |  md5(substr(text, i, 200)) AS chunk_md5,
             |  length(substr(text, i, 200)) AS chunk_len
             |FROM (SELECT doc_id, text,
             |        unnest(generate_series(1, greatest(length(text), 1), 150)) AS i
             |      FROM documents)
             |ORDER BY doc_id, chunk_id""".stripMargin)),

    // ---- intra-document segment dedup (RefinedWeb line-dedup twin) ----
    // CCNet/RefinedWeb drop duplicated lines WITHIN a document before any
    // corpus-level dedup. The fixture's documents are flat token streams
    // (no newlines), so the deterministic twin segments each doc into
    // consecutive NON-OVERLAPPING 2-token windows and keeps only the
    // first occurrence of each distinct segment (order preserved). The
    // whole operator is a per-row higher-order expression — segment
    // build, first-occurrence filter and re-join all run inside one
    // codegen'd projection with ZERO shuffles at any corpus size; the
    // quadratic first-occurrence probe is bounded by tokens/2 per row.
    // The ~40-word fixture vocabulary makes natural repeats common
    // (~1600 distinct segments vs ~150 per doc), so the drop path is
    // exercised without planting.
    "q_text_segment_dedup" -> Q(
      (s, dir) => {
        val ts = split(trim(lower(col("text"))), "\\s+")
        val nseg = floor(size(ts) / lit(2)).cast("int")
        val segs = when(nseg >= 1,
          transform(sequence(lit(1), nseg), i =>
            concat(element_at(ts, i * 2 - 1), lit(" "), element_at(ts, i * 2))))
          .otherwise(array().cast("array<string>"))
        docs(s, dir)
          .select(col("doc_id"), segs.as("segs"))
          .select(col("doc_id"),
            size(col("segs")).cast("long").as("n_seg"),
            filter(col("segs"), (x, i) =>
              array_position(col("segs"), x) === (i + 1).cast("long")).as("kept"))
          .select(col("doc_id"), col("n_seg"),
            (col("n_seg") - size(col("kept"))).cast("long").as("n_drop"),
            md5(array_join(col("kept"), " ")).as("clean_md5"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ts
             |  FROM documents),
             |s AS (
             |  SELECT doc_id,
             |    list_transform(range(1, len(ts) // 2 + 1),
             |      i -> ts[2*i-1] || ' ' || ts[2*i]) AS segs
             |  FROM t),
             |k AS (
             |  SELECT doc_id, segs,
             |    list_filter(segs, (x, i) -> list_position(segs, x) = i) AS kept
             |  FROM s)
             |SELECT doc_id, CAST(len(segs) AS BIGINT) AS n_seg,
             |  CAST(len(segs) - len(kept) AS BIGINT) AS n_drop,
             |  md5(array_to_string(kept, ' ')) AS clean_md5
             |FROM k ORDER BY doc_id""".stripMargin)),

    // ---- BPE tokenizer training: 8 merge rounds, vocab-bounded ----
    // The tokenizer-training shape every production BPE trainer uses:
    // ONE corpus scan folds to the (word, count) table — vocab-bounded,
    // tiny after the map-side partial agg regardless of corpus bytes —
    // and all 8 merge rounds iterate over that cached frame. Each round
    // is: adjacent-pair counts weighted by word frequency (explode over
    // the ≤vocab-row frame), argmax with the (count DESC, left, right)
    // total order as a 1-row driver sync (the k-means centroid
    // discipline), then a leftmost-greedy merge applied as a codegen'd
    // aggregate() fold with the chosen pair as literals. Counts are
    // exact integers and the tie rule is total, so the merge table is
    // deterministic and cross-engine identical; the DuckDB twin unrolls
    // the same 8 rounds as chained CTEs with a list_reduce fold.
    "q_tokenizer_bpe" -> Q(
      (s, dir) => {
        import s.implicits._
        bpeTrain(s, dir)._1
          .toDF("merge_rank", "l", "r", "merged", "cnt")
          .orderBy(col("merge_rank"))
      },
      Some(bpeOracleSql)),

    // ---- BPE encoding: token counts under the trained tokenizer ----
    // The companion operator: the trained word table ALREADY carries each
    // word's final segmentation, so encoding a corpus is one equi-join of
    // the exploded tokens against the persisted (word → piece count)
    // parquet artifact — never a merge-loop over documents. This is how
    // a token-budget pass over 100 TB prices documents under the real
    // tokenizer instead of the whitespace proxy: the corpus is touched
    // once, the word table stays distributed (broadcast only under the
    // explicit bpeBroadcastCap — on real web text the distinct-word
    // table is corpus-scale and the join degrades to a shuffle join,
    // not a driver OOM).
    "q_tokenizer_encode" -> Q(
      (s, dir) => bpeEncodeCounts(s, dir),
      Some(bpeEncodeOracleSql)),

    // ---- BPE segmentation: the ACTUAL piece sequences, digested ----
    // The encode gate prices documents (counts); this one proves the
    // tokenizer emits the real segmentation a training pipeline would
    // feed a model: every document's tokens join the trained pieces
    // artifact IN ORDER and the full piece stream (RS between words, US
    // between pieces) digests to md5 — so a single transposed piece
    // anywhere in the corpus hash-mismatches. Same single-scan shape as
    // the encode gate plus one bounded in-row sort of the (pos, pieces)
    // pairs per doc; the corpus is still touched once.
    "q_tokenizer_segments" -> Q(
      (s, dir) => {
        val (_, piecesPath, vocab) = bpeTrain(s, dir)
        val pieces = s.read.parquet(piecesPath)
        val enc = if (vocab <= bpeBroadcastCap) broadcast(pieces) else pieces
        docs(s, dir)
          .select(col("doc_id"),
            posexplode(split(trim(lower(col("text"))), "\\s+"))
              .as(Seq("i", "word")))
          .filter(col("word") =!= "")
          .join(enc, Seq("word"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_words"),
            sum(col("k")).as("n_bpe_tokens"),
            md5(array_join(transform(
              sort_array(collect_list(struct(col("i"), col("ps")))),
              p => p.getField("ps")), "\u001e")).as("seg_md5"))
          .orderBy(col("doc_id"))
      },
      Some(bpeSegmentsOracleSql)),

    // ---- PII redaction: regex scrub of emails/phones ----
    // The corpus gets deterministic synthetic PII injected (every 7th
    // doc) so the scrub provably fires; patterns stay in the Java∩RE2
    // regex subset so both engines replace identically. Map-side only.
    "q_text_redact" -> Q(
      (s, dir) => {
        val injected = when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" contact: user"), col("doc_id"),
            lit("@example.com ph +1-555-0"), (col("doc_id") % 100).cast("string")))
          .otherwise(col("text"))
        val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val phoneRe = "\\+1-555-0[0-9]+"
        docs(s, dir)
          .select(col("doc_id"), injected.as("t"))
          .select(col("doc_id"),
            md5(regexp_replace(regexp_replace(col("t"), emailRe, "[EMAIL]"),
              phoneRe, "[PHONE]")).as("redacted_md5"),
            (length(col("t")) - length(regexp_replace(col("t"), emailRe, "")))
              .cast("long").as("email_chars"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  md5(regexp_replace(regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             |      '\+1-555-0[0-9]+', '[PHONE]', 'g')) AS redacted_md5,
             |  CAST(length(t) - length(regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '', 'g')) AS BIGINT) AS email_chars
             |FROM (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 7 = 0
             |         THEN text || ' contact: user' || CAST(doc_id AS VARCHAR)
             |              || '@example.com ph +1-555-0' || CAST(doc_id % 100 AS VARCHAR)
             |         ELSE text END AS t
             |  FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // ---- repetition quality signals (Gopher-style filters) ----
    // Per-document word count, distinct-word count, and the frequency of
    // the most repeated bigram — the standard "is this doc boilerplate /
    // a keyword-stuffing page" inputs. Integer outputs only, so the gate
    // is float-free.
    "q_quality_repetition" -> Q(
      (s, dir) => {
        val w = docs(s, dir).select(col("doc_id"),
          split(lower(trim(col("text"))), "\\s+").as("ws"))
        val base = w.select(col("doc_id"),
          size(col("ws")).cast("long").as("n_words"),
          size(array_distinct(col("ws"))).cast("long").as("n_distinct_words"))
        val bigrams = w.filter(size(col("ws")) >= 2)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(0, size(ws) - 2), i -> concat(ws[i], ' ', ws[i + 1]))"))
            .as("bg"))
        val top = bigrams.groupBy("doc_id", "bg").count()
          .groupBy("doc_id").agg(max(col("count")).as("top_bigram_n"))
        base.join(top, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_words"), col("n_distinct_words"),
            coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH w AS (
             |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
             |  FROM documents),
             |base AS (
             |  SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
             |         CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct_words
             |  FROM w),
             |bg AS (
             |  SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS bg
             |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
             |        FROM w WHERE len(ws) >= 2)),
             |bgc AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg),
             |top AS (SELECT doc_id, max(c) AS top_bigram_n FROM bgc GROUP BY doc_id)
             |SELECT b.doc_id, b.n_words, b.n_distinct_words,
             |       coalesce(t.top_bigram_n, 0) AS top_bigram_n
             |FROM base b LEFT JOIN top t ON b.doc_id = t.doc_id
             |ORDER BY b.doc_id""".stripMargin)),

    // ---- corpus vocabulary: global top-50 tokens ----
    // The tokenizer-training / corpus-stats shape: one map-side explode,
    // partial counts per partition, and a top-k that ships only the
    // per-partition survivors (TakeOrderedAndProject).
    "q_corpus_vocab" -> Q(
      (s, dir) => docs(s, dir)
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(50),
      Some("""SELECT token, count(*) AS n
             |FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
             |      FROM documents)
             |WHERE length(token) > 0
             |GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin)),

    // ---- vocabulary-coverage / OOV ladder ----
    // The tokenizer-sizing curve: for each candidate vocabulary size K
    // (top-K tokens by frequency, ties to the lexicographically lower
    // token — deterministic), what fraction of token OCCURRENCES falls
    // outside the vocabulary? oov_ppm is exact integer arithmetic
    // ((total − covered)·1e6 DIV total). One token scan folds to the
    // vocab-bounded count table; the ladder is four conditional sums
    // over it — at 100 TB the corpus-proportional term is the scan,
    // the ladder is metadata-sized.
    "q_corpus_oov" -> Q(
      (s, dir) => {
        val cnt = docs(s, dir)
          .select(explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
          .filter(length(col("token")) > 0)
          .groupBy("token").agg(count(lit(1)).as("c"))
        val ranked = cnt.withColumn("rk", row_number().over(
          Window.orderBy(col("c").desc, col("token"))))
        ranked
          .agg(
            sum(when(col("rk") <= 4, col("c"))).as("c4"),
            sum(when(col("rk") <= 8, col("c"))).as("c8"),
            sum(when(col("rk") <= 16, col("c"))).as("c16"),
            sum(when(col("rk") <= 32, col("c"))).as("c32"),
            sum(col("c")).as("t"))
          .selectExpr(
            "stack(4, CAST(4 AS BIGINT), c4, CAST(8 AS BIGINT), c8, " +
              "CAST(16 AS BIGINT), c16, CAST(32 AS BIGINT), c32) " +
              "AS (k, covered)",
            "t AS total")
          .select(col("k"), coalesce(col("covered"), lit(0L)).as("covered"),
            col("total"),
            expr("(total - coalesce(covered, 0)) * 1000000 DIV total")
              .as("oov_ppm"))
          .orderBy(col("k"))
      },
      Some("""WITH cnt AS (
             |  SELECT token, CAST(count(*) AS BIGINT) AS c
             |  FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
             |        FROM documents)
             |  WHERE length(token) > 0 GROUP BY token),
             |ranked AS (
             |  SELECT token, c,
             |    row_number() OVER (ORDER BY c DESC, token) AS rk FROM cnt),
             |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM cnt),
             |ks AS (SELECT CAST(unnest([4, 8, 16, 32]) AS BIGINT) AS k),
             |cov AS (
             |  SELECT k,
             |    CAST(COALESCE(sum(CASE WHEN rk <= k THEN c END), 0) AS BIGINT)
             |      AS covered
             |  FROM ranked, ks GROUP BY k)
             |SELECT k, covered, total,
             |  (total - covered) * 1000000 // total AS oov_ppm
             |FROM cov, tot ORDER BY k""".stripMargin)),

    // ---- sequence packing: greedy first-fit-in-order into 256-token bins ----
    // The pretraining batch-prep op: concatenate documents (in stable
    // doc_id order within a hash group) into fixed-capacity training
    // sequences. A doc that overflows the open bin starts the next one;
    // oversized docs get a bin of their own. The oracle replays the same
    // greedy recurrence as a recursive CTE — both sides see identical
    // (grp, order, n_tok) inputs, so bin assignment matches exactly.
    "q_pack_sequences" -> Q(
      (s, dir) => {
        import s.implicits._
        val cap = 256L
        val packed = docs(s, dir)
          .select(col("doc_id"), (col("doc_id") % 8).as("grp"),
            size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("n_tok"))
          .repartition(col("grp"))
          .sortWithinPartitions(col("grp"), col("doc_id"))
          .as[(Long, Long, Long)]
          .mapPartitions { it =>
            // several groups hash to one partition; rows arrive sorted by
            // (grp, doc_id), so a group switch resets the running bin
            var curGrp = Long.MinValue
            var bin = 0L
            var fill = Long.MaxValue // forces "new group" on the first row
            it.map { case (id, grp, tok) =>
              if (grp != curGrp || curGrp == Long.MinValue) {
                curGrp = grp; bin = 0L; fill = tok
              } else if (fill + tok <= cap) {
                fill += tok
              } else {
                bin += 1L; fill = tok
              }
              (id, grp, bin, tok)
            }
          }
          .toDF("doc_id", "grp", "seq_id", "n_tok")
        packed.orderBy(col("doc_id"))
      },
      Some("""WITH RECURSIVE d AS (
             |  SELECT doc_id, doc_id % 8 AS grp,
             |         CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n_tok,
             |         row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
             |  FROM documents),
             |pack(grp, rn, doc_id, n_tok, seq_id, fill) AS (
             |  SELECT grp, rn, doc_id, n_tok, CAST(0 AS BIGINT), n_tok
             |  FROM d WHERE rn = 1
             |  UNION ALL
             |  SELECT d.grp, d.rn, d.doc_id, d.n_tok,
             |         CASE WHEN p.fill + d.n_tok <= 256 THEN p.seq_id ELSE p.seq_id + 1 END,
             |         CASE WHEN p.fill + d.n_tok <= 256 THEN p.fill + d.n_tok ELSE d.n_tok END
             |  FROM pack p JOIN d ON d.grp = p.grp AND d.rn = p.rn + 1)
             |SELECT doc_id, grp, seq_id, n_tok FROM pack ORDER BY doc_id""".stripMargin)),

    // ---- canonical selection: keep the BEST copy of each near-dup group ----
    // Dedup that keeps an arbitrary survivor throws away the longest /
    // cleanest version; production pipelines rank within the group. Group
    // key = 64-char-prefix hash (same relation the clusterer uses); the
    // canonical doc is the longest text, doc_id as tie-break. One window
    // over the group key — a single shuffle, O(1) state per group.
    "q_dedup_canonical" -> Q(
      (s, dir) => {
        // the window needs only (group key, length, id) — computing both
        // at scan time keeps the text OUT of the group-key shuffle
        val c = Dedup.corpus(s, dir)
          .select(col("doc_id"),
            md5(substring(trim(col("text")), 1, 64)).as("gk"),
            length(col("text")).as("len"))
        val w = Window.partitionBy(col("gk"))
          .orderBy(col("len").desc, col("doc_id"))
        c.withColumn("canonical_id", first(col("doc_id")).over(w))
          .select(col("doc_id"), col("canonical_id"),
            (col("doc_id") === col("canonical_id")).as("keep"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH ${Dedup.corpusSql},
              |g AS (
              |  SELECT doc_id,
              |         first_value(doc_id) OVER (
              |           PARTITION BY md5(substr(trim(text), 1, 64))
              |           ORDER BY length(text) DESC, doc_id) AS canonical_id
              |  FROM corpus)
              |SELECT doc_id, canonical_id, doc_id = canonical_id AS keep
              |FROM g ORDER BY doc_id""".stripMargin)),

    // ---- the whole funnel, one declarative plan ----
    // quality gate → canonical dedup → decontamination → split assignment:
    // the stages a real corpus passes through before training, composed as
    // ONE DataFrame so Catalyst sees the whole thing (filters push into
    // the scan; the only shuffles are the dedup-group window and the
    // eval-gram anti-join whose right side stays broadcast-small). The
    // gate reports per-split survivor stats, proving the exact same rows
    // fell out of every stage on both engines.
    "q_pipeline_funnel" -> Q(
      (s, dir) => {
        val d = docs(s, dir).select(col("doc_id"), trim(col("text")).as("t"))
        // stage 1: quality — enough words, not bigram-stuffed (exploded
        // bigram counts collapse in partial aggregation: the shuffle is
        // one row per (doc, distinct bigram), linear in doc length).
        // The bigram kernel is the funnel's dominant compute — spread it.
        val withWords = Tables.spread(d)
          .withColumn("ws", split(lower(col("t")), "\\s+"))
          .filter(size(col("ws")) >= 20)
        val topBg = withWords
          .select(col("doc_id"), explode(expr(
            "transform(sequence(0, size(ws) - 2), i -> concat(ws[i], ' ', ws[i + 1]))"))
            .as("b"))
          .groupBy("doc_id", "b").count()
          .groupBy("doc_id").agg(max(col("count")).as("top_bg"))
        val quality = withWords.join(topBg, "doc_id")
          .filter(col("top_bg") <= 8)
          .select(col("doc_id"), col("t"))
        // stage 2: canonical dedup on the 64-char prefix (longest wins).
        // Persisted: both the decontamination gram stream and the final
        // survivor pipeline read it — unpinned, stages 1-2 (including
        // the bigram explode) run twice. Doc-level rows, so the cache is
        // O(docs), not O(tokens); previous run's pin swept on re-entry.
        val w = Window.partitionBy(md5(substring(col("t"), 1, 64)))
          .orderBy(length(col("t")).desc, col("doc_id"))
        funnelCaches.evict(s, dir) // pre-persist (shared-entry rule)
        val deduped = quality
          .withColumn("canon", first(col("doc_id")).over(w))
          .filter(col("doc_id") === col("canon"))
          .select(col("doc_id"), col("t"))
          .persist()
        funnelCaches.put(s, dir, deduped)
        // stage 3: decontamination — drop docs sharing a 20-gram with the
        // eval slice (doc_id % 97 == 0); eval grams are DISTINCT + tiny
        val evalG = d.filter(col("doc_id") % 97 === 0)
          .filter(length(col("t")) >= 20)
          .select(explode(sequence(lit(1), length(col("t")) - 19, lit(5))).as("i"),
            col("t"))
          .select(md5(col("t").substr(col("i"), lit(20))).as("g")).distinct()
        val trainG = deduped.filter(col("doc_id") % 97 =!= 0)
          .filter(length(col("t")) >= 20)
          .select(col("doc_id"), col("t"),
            explode(sequence(lit(1), length(col("t")) - 19, lit(5))).as("i"))
          .select(col("doc_id"), md5(col("t").substr(col("i"), lit(20))).as("g"))
        val clean = deduped.filter(col("doc_id") % 97 =!= 0)
          .join(trainG.join(evalG, "g").select(col("doc_id")).distinct(),
            Seq("doc_id"), "left_anti")
        // stage 4: deterministic split (the same hash + rule as
        // q_split_sample — shared helper, cannot desynchronize)
        clean
          .select(col("doc_id"), length(col("t")).cast("long").as("len"),
            TextAnalysis.docSplitHash.as("h"))
          .select(TextAnalysis.splitOf(col("h")).as("split"),
            col("doc_id"), col("len"))
          .groupBy("split")
          .agg(count(lit(1)).as("n"), sum(col("len")).as("total_chars"),
            min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
          .orderBy(col("split"))
      },
      Some("""WITH d AS (SELECT doc_id, trim(text) AS t FROM documents),
             |q AS (
             |  SELECT doc_id, t, string_split_regex(lower(t), '\s+') AS ws FROM d),
             |bg AS (
             |  SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS b
             |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
             |        FROM q WHERE len(ws) >= 20)),
             |quality AS (
             |  SELECT q.doc_id, q.t FROM q
             |  JOIN (SELECT doc_id, max(c) AS top_bg FROM (
             |          SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b)
             |        GROUP BY doc_id) m ON q.doc_id = m.doc_id
             |  WHERE len(q.ws) >= 20 AND m.top_bg <= 8),
             |deduped AS (
             |  SELECT doc_id, t FROM (
             |    SELECT doc_id, t, first_value(doc_id) OVER (
             |      PARTITION BY md5(substr(t, 1, 64))
             |      ORDER BY length(t) DESC, doc_id) AS canon
             |    FROM quality)
             |  WHERE doc_id = canon),
             |evalg AS (
             |  SELECT DISTINCT md5(substr(t, i, 20)) AS g
             |  FROM (SELECT t, unnest(generate_series(1, length(t) - 19, 5)) AS i
             |        FROM d WHERE doc_id % 97 = 0 AND length(t) >= 20)),
             |traing AS (
             |  SELECT doc_id, md5(substr(t, i, 20)) AS g
             |  FROM (SELECT doc_id, t, unnest(generate_series(1, length(t) - 19, 5)) AS i
             |        FROM deduped WHERE doc_id % 97 != 0 AND length(t) >= 20)),
             |contaminated AS (
             |  SELECT DISTINCT doc_id FROM traing JOIN evalg USING (g)),
             |clean AS (
             |  SELECT doc_id, t FROM deduped
             |  WHERE doc_id % 97 != 0
             |    AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
             |assigned AS (
             |  SELECT CASE WHEN h % 10 < 8 THEN 'train'
             |              WHEN h % 10 = 8 THEN 'val' ELSE 'test' END AS split,
             |         doc_id, length(t) AS len
             |  FROM (SELECT doc_id, t,
             |          ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
             |        FROM clean))
             |SELECT split, count(*) AS n, CAST(sum(len) AS BIGINT) AS total_chars,
             |       min(doc_id) AS min_id, max(doc_id) AS max_id
             |FROM assigned GROUP BY split ORDER BY split""".stripMargin)),

    // ---- deterministic shard assignment for training export ----
    // The last step of every corpus build: route each doc to one of S
    // shards by content-independent hash so re-runs (and late-arriving
    // fix-ups) land docs in the SAME shard, then write shard files. The
    // gate verifies the assignment + balance via per-shard stats; the
    // production write is `.repartition(S, shard).write.partitionBy` —
    // one all-to-all shuffle, which IS the export, there is nothing
    // cheaper. Hash balance keeps every shard within ~1/sqrt(n) of even,
    // so no executor hot-spots at 1000 workers.
    "q_shard_export" -> Q(
      (s, dir) => {
        val shard = (conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long") % 16).as("shard")
        docs(s, dir)
          .select(shard, col("n_chars"), col("doc_id"))
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"),
            min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
          .orderBy(col("shard"))
      },
      Some("""SELECT shard, count(*) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
             |  min(doc_id) AS min_id, max(doc_id) AS max_id
             |FROM (
             |  SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 16 AS shard,
             |         n_chars, doc_id
             |  FROM documents)
             |GROUP BY shard ORDER BY shard""".stripMargin)),

    // ---- temperature-scaled mixture allocation (n^0.7 reweighting) ----
    // The multilingual-mix primitive: raw source sizes get exponent
    // alpha=0.7 so big sources are downweighted and small ones boosted,
    // then a 200-doc budget allocates proportionally. Determinism: the
    // only float op is pow, rounded to integer MICRO-UNITS immediately
    // (u = round(n^0.7 · 1e6), exact BIGINT both engines — the tfidf
    // round-before-use guard); the allocation is integer
    // cross-multiplication (200·u) DIV U, never a float share. Scale:
    // one count-by-source agg (partial), a 1-row total broadcast, and a
    // per-source arithmetic row — output is O(sources).
    "q_sample_temperature" -> Q(
      (s, dir) => {
        val bySrc = docs(s, dir).groupBy(col("source"))
          .agg(count(lit(1)).as("n"))
          .withColumn("u", round(pow(col("n").cast("double"), 0.7) * 1e6, 0)
            .cast("long"))
        val total = bySrc.select(sum(col("u")).as("big_u"))
        bySrc.crossJoin(total)
          .select(col("source"), col("n"),
            expr("(200 * u) DIV big_u").as("quota"))
          .orderBy(col("source"))
      },
      Some("""WITH by_src AS (
             |  SELECT source, count(*) AS n,
             |    CAST(round(pow(CAST(count(*) AS DOUBLE), 0.7) * 1e6, 0) AS BIGINT) AS u
             |  FROM documents GROUP BY source),
             |total AS (SELECT sum(u) AS big_u FROM by_src)
             |SELECT source, n, CAST((200 * u) // big_u AS BIGINT) AS quota
             |FROM by_src CROSS JOIN total ORDER BY source""".stripMargin)),

    // ---- mixture sampling to a per-source token budget ----
    // Training mixes are specified in TOKENS, not docs: "take up to B
    // tokens from each source, chosen deterministically". Docs order by
    // a content-independent hash within their source, a running token
    // total is cut at the budget, and the first doc to cross the line is
    // kept (so a budget smaller than one doc still takes one — matching
    // how mixes avoid empty sources).
    //
    // Scale shape: a naive `Window.partitionBy(source).orderBy(h)`
    // running sum ships EVERY doc of a source to one reducer — with a
    // skewed mix (one crawl source = 60% of a 100 TB corpus) that is a
    // single-partition sort of most of the dataset, all to keep ~B chars.
    // Instead the hash's top bits split each source into RANGE buckets
    // (bucket order == hash order, so cross-bucket ordering is exactly
    // the global (h, doc_id) order):
    //   1. per-(source, bucket) char sums — a partial-aggregated,
    //      perfectly hash-balanced pass, O(sources·64) rows out;
    //   2. a prefix sum over that tiny table finds each bucket's
    //      starting offset, and buckets whose offset already exceeds the
    //      budget are dropped by the broadcast semi-join — i.e. the
    //      budget prefix, ~ceil(B/avg_doc) docs per source, survives;
    //   3. the running-sum window now partitions by (source, bucket) and
    //      only ever sees those few boundary buckets, each ~1/64th of a
    //      source by hash uniformity — never a whole skewed source.
    "q_sample_token_budget" -> Q(
      (s, dir) => {
        val B = 1500
        val h = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long").as("h")
        val d = docs(s, dir)
          .select(col("doc_id"), col("source"), col("n_chars"), h)
          // h is uniform in [0, 2^60): its top 6 bits are 64 range buckets
          .withColumn("b", shiftright(col("h"), 54))
        val starts = d.groupBy(col("source"), col("b"))
          .agg(sum(col("n_chars")).as("chars_b"))
          .withColumn("start_chars",
            coalesce(sum(col("chars_b")).over(Window.partitionBy(col("source"))
              .orderBy(col("b"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .filter(col("start_chars") < B)
          .select(col("source"), col("b"), col("start_chars"))
        val w = Window.partitionBy(col("source"), col("b"))
          .orderBy(col("h"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        d.join(broadcast(starts), Seq("source", "b"))
          .withColumn("cum_chars", col("start_chars") + sum(col("n_chars")).over(w))
          .filter(col("cum_chars") - col("n_chars") < B)
          .select(col("doc_id"), col("source"), col("cum_chars"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, source, cum_chars FROM (
             |  SELECT doc_id, source, n_chars,
             |    CAST(sum(n_chars) OVER (PARTITION BY source ORDER BY h, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_chars
             |  FROM (
             |    SELECT doc_id, source, n_chars,
             |      ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
             |    FROM documents))
             |WHERE cum_chars - n_chars < 1500 ORDER BY doc_id""".stripMargin)),

    // ---- DoReMi-style domain-mixture reweighting ----
    // Domain Reweighting with Minimax Optimization (Xie et al., 2023,
    // arXiv:2305.10429): upweight the domains where the proxy model's
    // excess loss is largest. This static analogue takes the unigram
    // cross-entropy of each `source` against the GLOBAL token
    // distribution as the proxy loss (the fixture's stand-in for the
    // proxy/reference loss gap), applies ONE exponentiated-gradient
    // step w_d ∝ exp(η · excess_d) with η = 100/nat (computed with the
    // overflow-proof softmax shift — see doremiWeightsFromCounts),
    // normalizes, and
    // smooths toward uniform with c = 0.1 — the published Group-DRO
    // update with a static loss table (iterating it with a frozen loss
    // collapses to the same closed form, so one step IS the fixpoint).
    // Every ln/exp rounds to an integer (micro-nats / 1e-6 multiplier)
    // BEFORE any aggregation, divisions are integral (DIV ≡ //), and
    // the normalize + smooth are pure BIGINT arithmetic — bit-identical
    // cross-engine. Scale shape: one token scan folds to the vocab-
    // bounded count table (auto-broadcast back into the scoring pass —
    // metadata-sized), one (source)-keyed aggregation; the 1-row
    // totals/min frames are explicit bounded broadcasts. The output is
    // domains-bounded (the mixture spec a trainer consumes).
    "q_mixture_doremi" -> Q(
      (s, dir) => doremiWeights(s, dir).orderBy(col("source")),
      Some(s"""WITH $doremiSqlCtes
              |SELECT source, l_micro, excess_micro, weight_nano
              |FROM wfinal ORDER BY source""".stripMargin)),

    // ---- DoReMi weights served from the PERSISTED artifact ----
    // The q_bm25_indexed pattern for the fourth family: the gate builds
    // the mixture-stats artifact once (memoized per session × corpus,
    // phase-split so the recorded probe cost is honest) and serves the
    // weights FROM it — the corpus text never appears in the probe plan;
    // the oracle recomputes from the raw documents, so a drift anywhere
    // in the build → batch-fold → weight arithmetic chain hash-fails.
    "q_mixture_indexed" -> Q(
      (s, dir) => {
        graft.PhaseTimings.reset("q_mixture_indexed")
        val idx = graft.PhaseTimings.timed("q_mixture_indexed", "index_build") {
          mixStatsDir(s, dir)
        }
        mixtureWeights(s, idx)
      },
      Some(s"""WITH $doremiSqlCtes
              |SELECT source, l_micro, excess_micro, weight_nano
              |FROM wfinal ORDER BY source""".stripMargin)),

    // ---- targeted deletion: the monoid's negative batch ----
    // Build the stats artifact over the FULL corpus, then DELETE
    // doc_id % 6 = 1 by appending those docs' count frame NEGATED (the
    // counts are a monoid — a delete IS an append of the inverse). The
    // served weights fold the batches by summation, so the oracle's
    // from-scratch recompute over the SURVIVORS hash-matching proves
    // exact cancellation: the deleted docs' token mass is gone from
    // every l_micro, the softmax, and the final mixture, bit for bit.
    "q_mixture_delete" -> Q(
      (s, dir) => {
        graft.PhaseTimings.reset("q_mixture_delete")
        val idx = graft.PhaseTimings.timed("q_mixture_delete", "index_build") {
          mixDeletedStatsDir(s, dir)
        }
        mixtureWeights(s, idx)
      },
      Some(s"""WITH ${doremiSqlCtesWhere("WHERE doc_id % 6 <> 1")}
              |SELECT source, l_micro, excess_micro, weight_nano
              |FROM wfinal ORDER BY source""".stripMargin)),

    // ---- commit history + as-of: the pre-delete mixture reproduced ----
    // The (delete, asof) pair pattern all four families now carry: over
    // the SHARED build→delete fixture, the weights AS OF commit 1 (the
    // build) must equal the FULL-corpus mixture bit for bit — the
    // monoid's batch prefix IS the historical state — while
    // q_mixture_delete hash-pins the live (post-cancellation) side.
    "q_mixture_asof" -> Q(
      (s, dir) => {
        graft.PhaseTimings.reset("q_mixture_asof")
        val idx = graft.PhaseTimings.timed("q_mixture_asof", "index_build") {
          mixDeletedStatsDir(s, dir)
        }
        mixtureWeightsAsOf(s, idx, seq = 1)
      },
      Some(s"""WITH $doremiSqlCtes
              |SELECT source, l_micro, excess_micro, weight_nano
              |FROM wfinal ORDER BY source""".stripMargin)),

    // ---- applying the DoReMi mixture: quota resampling per domain ----
    // The consumer of the mixture spec: turn each domain's weight into
    // an integral document quota out of a 200-doc epoch
    // (quota_d = ⌊weight_nano · 200 / 1e9⌋ — the smoothing floor
    // guarantees every domain at least one seat) and keep each domain's
    // quota-prefix under the deterministic md5_60 shuffle order (the
    // epoch-shuffle discipline — no RNG, both engines rank the same).
    // Shares doremiWeights with the spec gate, so the applied sample
    // can never drift from the published weights. Scale shape: the
    // weights are domains-bounded and broadcast into the one corpus
    // pass; the per-domain rank is a (source)-keyed window with the
    // literal quota cap keeping the group-limit map-side at real
    // per-domain cardinalities.
    "q_mixture_doremi_apply" -> Q(
      (s, dir) => {
        val w = doremiWeights(s, dir).select(col("source"),
          expr("weight_nano * 200 DIV 1000000000").as("quota"))
        val h = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long")
        docs(s, dir).select(col("doc_id"), col("source"), h.as("hk"))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("source"))
              .orderBy(col("hk"), col("doc_id"))).cast("long"))
          .join(broadcast(w), "source")
          .filter(col("rk") <= col("quota"))
          .select(col("doc_id"), col("source"), col("rk"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $doremiSqlCtes,
              |wq AS (
              |  SELECT source, weight_nano * 200 // 1000000000 AS quota
              |  FROM wfinal),
              |ranked AS (
              |  SELECT doc_id, source,
              |    row_number() OVER (PARTITION BY source ORDER BY
              |      ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
              |      doc_id) AS rk
              |  FROM documents)
              |SELECT doc_id, source, rk FROM ranked JOIN wq USING (source)
              |WHERE rk <= quota ORDER BY doc_id""".stripMargin)),

    // ---- importance resampling toward a target domain (DSIR-style) ----
    // Data Selection via Importance Resampling (Xie et al., 2023,
    // arXiv:2302.03169): featurize documents as hashed n-gram counts, fit
    // smoothed bag-of-features distributions over the TARGET domain
    // (here: sources src0/src1, the stand-in for "high-quality reference
    // corpus") and the RAW pool, then score every raw candidate by its
    // summed log-likelihood ratio and keep the top-K. Scores are exact
    // integer micro-nats: each bucket's two ln() terms round to 1e-6
    // BEFORE any summation (the cross-engine float rule — the per-doc
    // sum is then pure BIGINT arithmetic, order-independent).
    //
    // Scale shape: ONE pass over the text builds the per-(doc, bucket)
    // count frame — the explode aggregates map-side to <= B=256 rows per
    // doc before its only shuffle. Everything downstream is metadata-
    // sized: the bucket count table and the ratio table are <= B rows
    // (broadcast into the scoring join, so the candidate side never
    // shuffles for it), the totals are a 1-row cross join, and the
    // resample truncation is TakeOrdered, never a global sort. At 100 TB
    // the corpus-proportional work is exactly the token scan plus a
    // (doc_id, bucket)-keyed partial aggregation.
    "q_sample_dsir" -> Q(
      (s, dir) => dsirScores(s, dir)
        .filter(!col("is_target"))
        .select(col("doc_id"), col("source"), col("score_micro"))
        .orderBy(col("score_micro").desc, col("doc_id"))
        .limit(50),
      Some(dsirOracleSql(Seq("src0", "src1")))),

    // ---- DSIR re-targeted: the domain is a PARAMETER ----
    // The identical operator bound to a different reference domain
    // (src2/src3) — oracle-gating the parameterization itself, not just
    // the default binding: the ratio table refits, the top-K changes,
    // and the hash-match proves both engines re-derive the same refit.
    "q_sample_dsir_target" -> Q(
      (s, dir) => dsirScores(s, dir, Seq("src2", "src3"))
        .filter(!col("is_target"))
        .select(col("doc_id"), col("source"), col("score_micro"))
        .orderBy(col("score_micro").desc, col("doc_id"))
        .limit(50),
      Some(dsirOracleSql(Seq("src2", "src3")))),

    // ---- DSIR with Gumbel-top-k resampling (the paper's sampler) ----
    // Deterministic top-K (above) is the greedy variant; DSIR proper
    // RESAMPLES — k draws without replacement from softmax(log w), which
    // the Gumbel-max trick turns into top-k on log w + Gumbel noise.
    // The noise is hash-derived, g = -ln(-ln(u)) with
    // u = (md5_60("g|" || doc_id)>>8 + 0.5) / 2^52, so the "random"
    // sample is rerun-identical and cross-engine exact: every (h + 0.5)
    // value below 2^53 is exactly representable in double, so u is
    // EXACT and strictly inside (0, 1) — no rounding-to-1.0 edge where
    // g would hit +Inf and the engines' Inf→BIGINT casts diverge (a
    // 60-bit h has a ~2^-54 band that rounds up to u = 1.0).
    // Scale shape: identical to q_sample_dsir (the noise is an in-row
    // projection) — broadcast ratio join, TakeOrdered truncation.
    "q_sample_dsir_gumbel" -> Q(
      (s, dir) => {
        val h = shiftright(conv(substring(md5(concat(lit("g|"),
          col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long"), 8)
        dsirScores(s, dir)
          .filter(!col("is_target"))
          .withColumn("g_micro", round(-log(-log((h + lit(0.5)) /
              lit(4.503599627370496e15))) * 1e6, 0).cast("long"))
          .select(col("doc_id"), col("source"),
            (col("score_micro") + col("g_micro")).as("sampled_micro"))
          .orderBy(col("sampled_micro").desc, col("doc_id"))
          .limit(50)
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, source,
             |    regexp_split_to_array(trim(lower(text)), '\s+') AS ts
             |  FROM documents),
             |occ AS (
             |  SELECT doc_id, source,
             |    ('0x' || substr(md5(ts[i] || ' ' || ts[i+1]), 1, 15))::BIGINT % 256 AS bkt
             |  FROM (SELECT doc_id, source, ts,
             |          unnest(generate_series(1, len(ts)-1)) AS i FROM toks)),
             |by_doc AS (
             |  SELECT doc_id, source, bkt, count(*) AS c FROM occ GROUP BY 1, 2, 3),
             |cnt AS (
             |  SELECT bkt,
             |    CAST(sum(CASE WHEN source IN ('src0','src1') THEN c ELSE 0 END) AS BIGINT) AS cp,
             |    CAST(sum(CASE WHEN source NOT IN ('src0','src1') THEN c ELSE 0 END) AS BIGINT) AS cq
             |  FROM by_doc GROUP BY 1),
             |tot AS (
             |  SELECT
             |    CAST(sum(CASE WHEN source IN ('src0','src1') THEN c ELSE 0 END) AS BIGINT) AS np,
             |    CAST(sum(CASE WHEN source NOT IN ('src0','src1') THEN c ELSE 0 END) AS BIGINT) AS nq
             |  FROM by_doc),
             |r AS (
             |  SELECT bkt,
             |    CAST(round(ln(CAST(cp + 1 AS DOUBLE) / CAST(np + 256 AS DOUBLE)) * 1e6, 0) AS BIGINT)
             |      - CAST(round(ln(CAST(cq + 1 AS DOUBLE) / CAST(nq + 256 AS DOUBLE)) * 1e6, 0) AS BIGINT) AS r_micro
             |  FROM cnt CROSS JOIN tot),
             |sc AS (
             |  SELECT doc_id, source, CAST(sum(c * r_micro) AS BIGINT) AS score_micro
             |  FROM by_doc JOIN r USING (bkt)
             |  WHERE source NOT IN ('src0','src1')
             |  GROUP BY doc_id, source)
             |SELECT doc_id, source,
             |  score_micro + CAST(round(-ln(-ln(
             |    ((('0x' || substr(md5('g|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT // 256) + 0.5)
             |      / 4503599627370496.0)) * 1e6, 0) AS BIGINT) AS sampled_micro
             |FROM sc
             |ORDER BY sampled_micro DESC, doc_id LIMIT 50""".stripMargin)),

    // ---- curriculum sampling by quality quartile ----
    // Score every document with the (distinct-token ratio × length
    // factor) quality proxy, cut the corpus into quartiles at the EXACT
    // interpolated quantiles (a 1-row aggregate that cross-joins back —
    // never a global ntile sort: at 100 TB the cutpoint frame is the
    // only synchronization point, and value-bucketing is a per-row
    // comparison), then take a bucket-dependent quota (8·bucket — the
    // easy→hard ramp) in deterministic hash order within each bucket.
    // Cutpoint determinism: the quantile interpolation runs on integer
    // micro scores, so p·(n−1) blends are exact dyadic rationals —
    // bit-identical across engines despite the two engines' different
    // interpolation formulas.
    "q_sample_curriculum" -> Q(
      (s, dir) => {
        val t = split(trim(lower(col("text"))), "\\s+")
        val scored = docs(s, dir).select(col("doc_id"),
          round(((size(array_distinct(t)).cast("double") / size(t).cast("double")) *
            (least(size(t), lit(100)).cast("double") / lit(100.0))) * 1e6, 0)
            .cast("long").as("score_micro"))
        val cuts = scored.agg(
          expr("percentile(score_micro, 0.25)").as("q1"),
          expr("percentile(score_micro, 0.5)").as("q2"),
          expr("percentile(score_micro, 0.75)").as("q3"))
        val bucketed = scored.crossJoin(cuts)
          .select(col("doc_id"),
            (lit(1L) + when(col("score_micro") > col("q1"), 1L).otherwise(0L) +
              when(col("score_micro") > col("q2"), 1L).otherwise(0L) +
              when(col("score_micro") > col("q3"), 1L).otherwise(0L)).as("bucket"),
            conv(substring(md5(concat(lit("cur|"), col("doc_id").cast("string"))),
              1, 15), 16, 10).cast("long").as("h"))
        // the literal rk <= 32 conjunct (the max quota, 8·4) is what lets
        // InferWindowGroupLimit insert a map-side partial top-32 per
        // bucket BEFORE the exchange — without it the bucket-dependent
        // bound alone would ship the whole corpus into 4 window tasks
        val quota = 8L   // per-bucket ramp factor (matches the oracle's 8)
        val nBuckets = 4L // quartiles
        bucketed
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("bucket")).orderBy(col("h"), col("doc_id")))
            .cast("long"))
          .filter(col("rk") <= lit(quota * nBuckets) &&
            col("rk") <= lit(quota) * col("bucket"))
          .select(col("doc_id"), col("bucket"), col("rk"))
          .orderBy(col("bucket"), col("rk"))
      },
      Some("""WITH ts AS (
             |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
             |  FROM documents),
             |scored AS (
             |  SELECT doc_id,
             |    CAST(round(((CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE)) *
             |      (CAST(least(len(t), 100) AS DOUBLE) / 100.0)) * 1e6, 0) AS BIGINT)
             |      AS score_micro
             |  FROM ts),
             |cuts AS (
             |  SELECT quantile_cont(score_micro, 0.25) AS q1,
             |         quantile_cont(score_micro, 0.5) AS q2,
             |         quantile_cont(score_micro, 0.75) AS q3
             |  FROM scored),
             |b AS (
             |  SELECT doc_id,
             |    1 + (CASE WHEN score_micro > q1 THEN 1 ELSE 0 END)
             |      + (CASE WHEN score_micro > q2 THEN 1 ELSE 0 END)
             |      + (CASE WHEN score_micro > q3 THEN 1 ELSE 0 END) AS bucket,
             |    ('0x' || substr(md5('cur|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
             |  FROM scored CROSS JOIN cuts),
             |r AS (
             |  SELECT doc_id, bucket,
             |    row_number() OVER (PARTITION BY bucket ORDER BY h, doc_id) AS rk
             |  FROM b)
             |SELECT doc_id, CAST(bucket AS BIGINT) AS bucket, rk
             |FROM r WHERE rk <= 8 * bucket ORDER BY bucket, rk""".stripMargin)),

    // ---- model-based quality filter: Naive-Bayes presence classifier ----
    // The deterministic twin of the fastText-style quality classifiers
    // used by CCNet/LLaMA pipelines: hashed-bigram PRESENCE features
    // (256 buckets), Bernoulli-NB per-class likelihoods with Laplace
    // smoothing fit on the `train` split only (the docSplitHash rule, so
    // training never sees the docs it scores), and a log-odds score with
    // class prior applied to the held-out (val+test) docs. Present-only
    // scoring (absent-feature terms dropped) is the standard linear-
    // scorer simplification. Unlike DSIR (token-COUNT importance ratios
    // over the full pool, for sampling), this is a split-disciplined
    // per-document classification decision.
    // Scale shape: one tokenize scan → (doc, bucket)-keyed distinct →
    // counts fold to a 256-row weight table that broadcasts; scoring is
    // one equi-join + per-doc integer sum. Micro-nat rounding before
    // summation keeps both engines exact.
    "q_quality_classifier" -> Q(
      (s, dir) => nbClassifierScores(s, dir),
      Some("""WITH toks AS (
             |  SELECT doc_id, source,
             |    regexp_split_to_array(trim(lower(text)), '\s+') AS ts
             |  FROM documents),
             |occ AS (
             |  SELECT DISTINCT doc_id, source,
             |    ('0x' || substr(md5(ts[i] || ' ' || ts[i+1]), 1, 15))::BIGINT % 256 AS bkt
             |  FROM (SELECT doc_id, source, ts,
             |          unnest(generate_series(1, len(ts)-1)) AS i FROM toks)),
             |sp AS (
             |  SELECT doc_id, source, bkt,
             |    CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10 < 8
             |           THEN 'train'
             |         WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10 = 8
             |           THEN 'val' ELSE 'test' END AS split,
             |    source IN ('src0','src1') AS tgt
             |  FROM occ),
             |tot AS (
             |  SELECT CAST(sum(CASE WHEN source IN ('src0','src1') THEN 1 ELSE 0 END) AS BIGINT) AS np,
             |         CAST(sum(CASE WHEN source NOT IN ('src0','src1') THEN 1 ELSE 0 END) AS BIGINT) AS nq
             |  FROM documents
             |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10 < 8),
             |cnt AS (
             |  SELECT g.bkt,
             |    CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS cp,
             |    CAST(sum(CASE WHEN NOT tgt THEN 1 ELSE 0 END) AS BIGINT) AS cq
             |  FROM (SELECT unnest(generate_series(0, 255)) AS bkt) g
             |  LEFT JOIN (SELECT * FROM sp WHERE split = 'train') t ON g.bkt = t.bkt
             |  GROUP BY g.bkt),
             |w AS (
             |  SELECT bkt,
             |    CAST(round(ln(CAST(cp + 1 AS DOUBLE) / CAST(np + 2 AS DOUBLE)) * 1e6, 0) AS BIGINT)
             |      - CAST(round(ln(CAST(cq + 1 AS DOUBLE) / CAST(nq + 2 AS DOUBLE)) * 1e6, 0) AS BIGINT)
             |      AS w_micro,
             |    CAST(round(ln(CAST(np AS DOUBLE) / CAST(nq AS DOUBLE)) * 1e6, 0) AS BIGINT)
             |      AS prior_micro
             |  FROM cnt CROSS JOIN tot)
             |SELECT doc_id, source,
             |  CAST(sum(w_micro) AS BIGINT) + any_value(prior_micro) AS score_micro,
             |  CAST(CASE WHEN CAST(sum(w_micro) AS BIGINT) + any_value(prior_micro) > 0
             |       THEN 1 ELSE 0 END AS BIGINT) AS pred
             |FROM sp JOIN w USING (bkt)
             |WHERE split <> 'train'
             |GROUP BY doc_id, source
             |ORDER BY doc_id""".stripMargin))
  )

  // previous invocation's persisted funnel survivors, swept on re-entry —
  // on the shared GateCache discipline (stopped-session sweep, one
  // retained generation, evict-before-repersist)
  private val funnelCaches = GateCache.frame()

  // the DSIR per-(doc, bucket) count frame — forked by the count tables
  // and the scoring join; one retained generation per (session, corpus)
  private val dsirCaches = GateCache.frame()

  /** Test hook (GateCacheReviveSpec): the memoized DSIR count frame for
    * (session, dir), if already built. */
  private[graft] def dsirMemoForTest(s: SparkSession,
      dir: String): Option[DataFrame] = dsirCaches.peek(s, dir)

  // the quality classifier's per-(doc, bucket) presence frame — forked by
  // the train-split count tables and the held-out scoring join, so the
  // tokenize→explode→distinct pass runs once, not per consumer
  private val nbCaches = GateCache.frame()

  /** Bernoulli-NB quality classifier over hashed-bigram presence
    * features: fit on the train split only, score the held-out splits.
    * `target` names the positive-class sources — a parameter (the
    * DSIR/$param discipline), defaulting to the gate's reference domain.
    * The cached presence frame is TARGET-FREE (doc, source, bkt, split);
    * the class label derives at use time, so a re-bind never reads a
    * frame that baked in a different target. */
  private[graft] def nbClassifierScores(s: SparkSession, dir: String,
      target: Seq[String] = Seq("src0", "src1")): DataFrame = {
    val B = 256
    val sp = TextAnalysis.splitOf(TextAnalysis.docSplitHash)
    val toks = Tables.spread(docs(s, dir))
      .select(col("doc_id"), col("source"),
        split(trim(lower(col("text"))), "\\s+").as("ts"))
    nbCaches.evict(s, dir)
    val occ0 = toks.filter(size(col("ts")) >= 2)
      .select(col("doc_id"), col("source"), explode(zip_with(
        slice(col("ts"), lit(1), size(col("ts")) - 1),
        slice(col("ts"), lit(2), size(col("ts")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("bg"))
      .withColumn("bkt",
        // md5_60 == conv(substring(md5,1,15),16,10) with one thread-local
        // digest call and no hex round-trip — this hash runs per BIGRAM
        graft.functions.VectorExpressions.md5_60(s, col("bg")) % B)
      .select(col("doc_id"), col("source"), col("bkt")).distinct()
      .withColumn("split", sp)
      .persist()
    occ0.count() // settle: the train counts and the scoring join fork this
    nbCaches.put(s, dir, occ0)
    val occ = occ0.withColumn("tgt", col("source").isin(target: _*))
    val tot = docs(s, dir).select(col("doc_id"), col("source"))
      .withColumn("split", sp)
      .filter(col("split") === "train")
      .agg(sum(when(col("source").isin(target: _*), 1L).otherwise(0L)).as("np"),
        sum(when(!col("source").isin(target: _*), 1L).otherwise(0L)).as("nq"))
    // full 256-bucket spine so unseen-in-train buckets still carry
    // the smoothed ln(1/(n+2)) weight in both engines
    val cnt = s.range(B).select(col("id").as("bkt"))
      .join(occ.filter(col("split") === "train"), Seq("bkt"), "left_outer")
      .groupBy(col("bkt"))
      .agg(sum(when(col("tgt") === true, 1L).otherwise(0L)).as("cp"),
        sum(when(col("tgt") === false, 1L).otherwise(0L)).as("cq"))
    val w = cnt.crossJoin(tot).select(col("bkt"),
      (round(log((col("cp") + 1).cast("double") /
          (col("np") + 2).cast("double")) * 1e6, 0).cast("long") -
        round(log((col("cq") + 1).cast("double") /
          (col("nq") + 2).cast("double")) * 1e6, 0).cast("long"))
        .as("w_micro"),
      round(log(col("np").cast("double") / col("nq").cast("double")) * 1e6, 0)
        .cast("long").as("prior_micro"))
    occ.filter(col("split") =!= "train")
      .join(broadcast(w), Seq("bkt"))
      .groupBy(col("doc_id"), col("source"))
      .agg((sum(col("w_micro")) + first(col("prior_micro"))).as("score_micro"))
      .select(col("doc_id"), col("source"), col("score_micro"),
        when(col("score_micro") > 0, 1L).otherwise(0L).as("pred"))
      .orderBy(col("doc_id"))
  }

  // final + literal = compile-time constant, safe to read from the lazy
  // SQL builders that `all` (declared above) forces during object init
  private final val bpeRounds = 8

  // one BPE training run per (session, corpus), shared by the trainer
  // gate and the encode gate (the pqCaches memoization discipline); the
  // cached value is (merge table, pieces-artifact parquet path, vocab
  // row count). The merge table is driver-local by construction (8 rows,
  // one per round); the (word → piece count) table is NOT — on real web
  // text the distinct-whitespace-word table is corpus-scale (typos,
  // URLs, numbers), so it lands as a parquet artifact the encode gate
  // joins distributed (the vector-index artifact discipline), never a
  // driver collect.
  private val bpeCaches =
    new GateCache[(Seq[(Long, String, String, String, Long)], String, Long)](
      _ => ())

  // above this vocab row count the encode join runs as a plain shuffle
  // join instead of a broadcast — an explicit cap, not a hope that the
  // word table stays small (at 100 TB it does not)
  private[graft] final val bpeBroadcastCap = 4L * 1000 * 1000

  /** Train the 8-round BPE merge table. The only corpus-scale work is
    * the initial word-count scan; every round iterates over the cached
    * word-count frame with a 1-row argmax driver sync (the k-means
    * discipline) and a codegen'd aggregate() merge fold. Every
    * generation (wc included) is a transient persist that settles and
    * drops inside this build — on failure too (the try/finally releases
    * whichever generations are still live, since getOrBuild caches
    * nothing on a throw). What survives is the 8-row merge table
    * (driver-local) plus the full (word → piece count) table written as
    * a parquet artifact — distributed end to end, so a corpus whose
    * distinct-word table is billions of rows never routes through the
    * driver. */
  private def bpeTrain(s: SparkSession, dir: String)
      : (Seq[(Long, String, String, String, Long)], String, Long) =
    bpeCaches.getOrBuild(s, dir) {
      val wc = docs(s, dir)
        .select(explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
        .filter(col("word") =!= "") // a leading tab/newline splits to ""
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
        .select(col("word"), col("n"),
          transform(sequence(lit(1), length(col("word"))),
            i => col("word").substr(i, lit(1))).as("syms"))
        .persist()
      var words = wc
      try {
        wc.count() // settle: round 1 reads it; later rounds read their predecessor
        val merges = Seq.newBuilder[(Long, String, String, String, Long)]
        var r = 1
        var exhausted = false
        while (r <= bpeRounds && !exhausted) {
          val best = words.filter(size(col("syms")) >= 2)
            .select(col("n"),
              explode(transform(sequence(lit(1), size(col("syms")) - 1),
                i => struct(element_at(col("syms"), i).as("l"),
                  element_at(col("syms"), i + 1).as("r")))).as("p"))
            .groupBy(col("p.l").as("l"), col("p.r").as("r"))
            .agg(sum(col("n")).as("cnt"))
            .orderBy(col("cnt").desc, col("l"), col("r"))
            .limit(1).collect()
          if (best.isEmpty) exhausted = true
          else {
            val (l, rt) = (best(0).getString(0), best(0).getString(1))
            val m = l + rt
            merges += ((r.toLong, l, rt, m, best(0).getLong(2)))
            // leftmost-greedy non-overlapping merge: fold the tail onto
            // [head]; a freshly merged symbol never re-merges because its
            // name (l||r) differs from l. aggregate() over an empty tail
            // (1-symbol word) returns the seed unchanged.
            val next = words.select(col("word"), col("n"),
              aggregate(slice(col("syms"), lit(2), size(col("syms")) - 1),
                slice(col("syms"), lit(1), lit(1)),
                (acc, x) => when(element_at(acc, -1) === l && x === rt,
                  concat(slice(acc, lit(1), size(acc) - 1), array(lit(m))))
                  .otherwise(concat(acc, array(x)))).as("syms"))
              .persist()
            next.count() // settle before releasing the prior generation
            if (words ne wc) words.unpersist(false)
            words = next
            r += 1
          }
        }
        // land the trained (word → piece count + the US-joined piece
        // SEQUENCE) table as a parquet artifact: the encode and
        // segmentation gates join it distributed, and only the bounded
        // vocab COUNT crosses the driver. US (\u001f) can never occur
        // inside a symbol (symbols are merged text characters), so the
        // join is unambiguous.
        val piecesPath = graft.TempDirs.create("graft-bpe").toString + "/pieces"
        words.select(col("word"), size(col("syms")).cast("long").as("k"),
            array_join(col("syms"), "\u001f").as("ps"))
          .write.mode("overwrite").parquet(piecesPath)
        val vocab = s.read.parquet(piecesPath).count()
        (merges.result(), piecesPath, vocab)
      } finally {
        if (words ne wc) words.unpersist(false)
        wc.unpersist(false)
      }
    }

  /** The encode join against the trained pieces artifact. Broadcast only
    * under the explicit row cap; above it (or with the cap forced to 0,
    * as GatesSpec does to prove the path) the join is a plain
    * distributed equi-join on `word` — correct at any vocab size. */
  private[graft] def bpeEncodeCounts(s: SparkSession, dir: String,
      broadcastCap: Long = bpeBroadcastCap): DataFrame = {
    val (_, piecesPath, vocab) = bpeTrain(s, dir)
    val pieces = s.read.parquet(piecesPath)
    val enc = if (vocab <= broadcastCap) broadcast(pieces) else pieces
    docs(s, dir)
      .select(col("doc_id"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .join(enc, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("k")).as("n_bpe_tokens"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB twin of the training loop: the same rounds unrolled as
    * chained CTEs — p_k (weighted adjacent-pair counts), b_k (argmax
    * with the (cnt DESC, l, r) total order), w_{k+1} (the leftmost-
    * greedy merge as a list_reduce fold over a chr(31)-delimited
    * accumulator; symbols are [a-z]+ concatenations so the delimiter
    * can never occur inside one). Shared WITH-body for both gates;
    * lazy because `all` (declared above) captures it during init. */
  private lazy val bpeChainSql: String = {
    val us = "chr(31)"
    val layers = (0 until bpeRounds).map { k =>
      s"""p$k AS (
         |  SELECT s.l AS l, s.r AS r, CAST(sum(n) AS BIGINT) AS cnt
         |  FROM (SELECT n, unnest(list_transform(range(1, len(syms)),
         |          i -> struct_pack(l := syms[i], r := syms[i+1]))) AS s
         |        FROM w$k WHERE len(syms) >= 2)
         |  GROUP BY 1, 2),
         |b$k AS (
         |  -- exactly one row even when p$k is empty (merges exhausted):
         |  -- the chr(30) sentinel never matches a real symbol, so the
         |  -- merge fold below no-ops and the word table rides through.
         |  -- Single reference to p$k: DuckDB inlines CTEs, so a second
         |  -- reference would double each layer's work (2^rounds blowup).
         |  SELECT coalesce(t.l, chr(30)) AS l, coalesce(t.r, chr(30)) AS r,
         |         coalesce(t.l || t.r, chr(30)) AS m,
         |         coalesce(t.cnt, CAST(-1 AS BIGINT)) AS cnt
         |  FROM (VALUES (1)) v(one)
         |  LEFT JOIN (SELECT l, r, cnt FROM p$k
         |             ORDER BY cnt DESC, l, r LIMIT 1) t ON true),
         |w${k + 1} AS (
         |  SELECT word, n, string_split(list_reduce(syms,
         |    (acc, x) -> CASE WHEN string_split(acc, $us)[-1] = b.l AND x = b.r
         |                THEN substr(acc, 1, length(acc) - length(b.l)) || b.m
         |                ELSE acc || $us || x END), $us) AS syms
         |  FROM w$k, b$k b)""".stripMargin
    }.mkString(",\n")
    s"""toks AS (
       |  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word
       |  FROM documents),
       |w0 AS (
       |  SELECT word, CAST(count(*) AS BIGINT) AS n,
       |    list_transform(range(1, length(word) + 1), i -> substr(word, i, 1)) AS syms
       |  FROM toks WHERE word <> '' GROUP BY word),
       |$layers""".stripMargin
  }

  private lazy val bpeOracleSql: String = {
    val sel = (0 until bpeRounds).map(k =>
      s"SELECT ${k + 1} AS merge_rank, l, r, m AS merged, cnt FROM b$k WHERE cnt >= 0")
      .mkString("\nUNION ALL\n")
    s"""WITH $bpeChainSql
       |SELECT CAST(merge_rank AS BIGINT) AS merge_rank, l, r, merged, cnt
       |FROM ($sel) ORDER BY merge_rank""".stripMargin
  }

  private lazy val bpeEncodeOracleSql: String =
    s"""WITH $bpeChainSql,
       |enc AS (SELECT word, CAST(len(syms) AS BIGINT) AS k FROM w$bpeRounds),
       |dt AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word
       |  FROM documents)
       |-- empty tokens are dropped by the inner join: w0 never contains ''
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(k) AS BIGINT) AS n_bpe_tokens
       |FROM dt JOIN enc USING (word)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** DuckDB twin of the SEGMENTATION gate: the same trained word table,
    * but emitting each document's full in-order piece sequence (words
    * joined by RS=chr(30), pieces within a word by US=chr(31) — neither
    * occurs in a symbol) digested to md5. */
  private lazy val bpeSegmentsOracleSql: String =
    s"""WITH $bpeChainSql,
       |enc2 AS (
       |  SELECT word, CAST(len(syms) AS BIGINT) AS k,
       |    array_to_string(syms, chr(31)) AS ps
       |  FROM w$bpeRounds),
       |toks2 AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS ts
       |  FROM documents),
       |dtw AS (
       |  SELECT doc_id, i, ts[i] AS word
       |  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts))) AS i
       |        FROM toks2)
       |  WHERE ts[i] <> '')
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(k) AS BIGINT) AS n_bpe_tokens,
       |  md5(string_agg(ps, chr(30) ORDER BY i)) AS seg_md5
       |FROM dtw JOIN enc2 USING (word)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** DuckDB twin of [[dsirScores]] for a given target-domain source
    * list — templated so the default and re-targeted gates share every
    * character except the IN-list (they can never drift apart). */
  private def dsirOracleSql(targets: Seq[String]): String = {
    val inList = targets.map(t => s"'$t'").mkString(",")
    s"""WITH toks AS (
       |  SELECT doc_id, source,
       |    regexp_split_to_array(trim(lower(text)), '\\s+') AS ts
       |  FROM documents),
       |occ AS (
       |  SELECT doc_id, source,
       |    ('0x' || substr(md5(ts[i] || ' ' || ts[i+1]), 1, 15))::BIGINT % 256 AS bkt
       |  FROM (SELECT doc_id, source, ts,
       |          unnest(generate_series(1, len(ts)-1)) AS i FROM toks)),
       |by_doc AS (
       |  SELECT doc_id, source, bkt, count(*) AS c FROM occ GROUP BY 1, 2, 3),
       |cnt AS (
       |  SELECT bkt,
       |    CAST(sum(CASE WHEN source IN ($inList) THEN c ELSE 0 END) AS BIGINT) AS cp,
       |    CAST(sum(CASE WHEN source NOT IN ($inList) THEN c ELSE 0 END) AS BIGINT) AS cq
       |  FROM by_doc GROUP BY 1),
       |tot AS (
       |  SELECT
       |    CAST(sum(CASE WHEN source IN ($inList) THEN c ELSE 0 END) AS BIGINT) AS np,
       |    CAST(sum(CASE WHEN source NOT IN ($inList) THEN c ELSE 0 END) AS BIGINT) AS nq
       |  FROM by_doc),
       |r AS (
       |  SELECT bkt,
       |    CAST(round(ln(CAST(cp + 1 AS DOUBLE) / CAST(np + 256 AS DOUBLE)) * 1e6, 0) AS BIGINT)
       |      - CAST(round(ln(CAST(cq + 1 AS DOUBLE) / CAST(nq + 256 AS DOUBLE)) * 1e6, 0) AS BIGINT) AS r_micro
       |  FROM cnt CROSS JOIN tot)
       |SELECT doc_id, source, CAST(sum(c * r_micro) AS BIGINT) AS score_micro
       |FROM by_doc JOIN r USING (bkt)
       |WHERE source NOT IN ($inList)
       |GROUP BY doc_id, source
       |ORDER BY score_micro DESC, doc_id LIMIT 50""".stripMargin
  }

  /** DSIR importance scores for EVERY document (`is_target` flags the
    * reference-domain docs the target distribution was fit on). The gate
    * takes the raw-pool top-K; GatesSpec pins the separation property —
    * mean target score > 0 > mean raw-pool score, the sampled form of
    * KL(p||q) >= 0 >= -KL(q||p) — which only shows over the full score
    * table, not the gate's truncated output. */
  def dsirScores(s: SparkSession, dir: String,
      target: Seq[String] = Seq("src0", "src1")): DataFrame = {
    val B = 256 // hashed feature buckets
    val toks = Tables.spread(docs(s, dir))
      .select(col("doc_id"), col("source"),
        split(trim(lower(col("text"))), "\\s+").as("ts"))
    // bigrams build inside the array before the explode (the
    // collocations discipline: exploded rows carry one string, never
    // the whole token array)
    val occ = toks.filter(size(col("ts")) >= 2)
      .select(col("doc_id"), col("source"), explode(zip_with(
        slice(col("ts"), lit(1), size(col("ts")) - 1),
        slice(col("ts"), lit(2), size(col("ts")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("bg"))
      .withColumn("bkt",
        // md5_60 == conv(substring(md5,1,15),16,10) with one thread-local
        // digest call and no hex round-trip — this hash runs per BIGRAM
        graft.functions.VectorExpressions.md5_60(s, col("bg")) % B)
    // the cached frame is TARGET-FREE (doc, source, bkt, c): the target
    // domain is a query-time parameter (the named-query/$param
    // discipline), so a re-bind must never be answered from a frame
    // that baked in a different target — which is also exactly what
    // makes it SHAREABLE across re-binds: the three DSIR gates (default
    // target, re-target, Gumbel) memoize ONE tokenize→bigram→bucket
    // pass per (session, corpus) instead of each paying it again
    val byDoc0 = dsirCaches.getOrBuild(s, dir) {
      val f = occ.groupBy(col("doc_id"), col("source"), col("bkt"))
        .agg(count(lit(1)).as("c"))
        .persist()
      f.count() // settle: count tables + scoring join fork this plan
      f
    }
    val byDoc = byDoc0
      .withColumn("is_target", col("source").isin(target: _*))
    val cnt = byDoc.groupBy(col("bkt"))
      .agg(sum(when(col("is_target"), col("c")).otherwise(0L)).as("cp"),
        sum(when(!col("is_target"), col("c")).otherwise(0L)).as("cq"))
    val tot = byDoc.agg(
      sum(when(col("is_target"), col("c")).otherwise(0L)).as("np"),
      sum(when(!col("is_target"), col("c")).otherwise(0L)).as("nq"))
    val r = cnt.crossJoin(tot).select(col("bkt"),
      (round(log((col("cp") + 1).cast("double") /
          (col("np") + B).cast("double")) * 1e6, 0).cast("long") -
        round(log((col("cq") + 1).cast("double") /
          (col("nq") + B).cast("double")) * 1e6, 0).cast("long"))
        .as("r_micro"))
    byDoc.join(broadcast(r), Seq("bkt"))
      .groupBy(col("doc_id"), col("source"), col("is_target"))
      .agg(sum(col("c") * col("r_micro")).as("score_micro"))
  }
}
