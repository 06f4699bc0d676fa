package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Relational.Q

/** Corpus-level statistics and cross-document dedup operators that round
  * out the training-data pipeline: TF-IDF keyword extraction, exact
  * duplicated-substring spans (the Lee et al. "deduplicating training
  * data makes language models better" shape), Bloom-filter benchmark
  * decontamination, time-range rolling features, and mergeable
  * per-group distinct sketches.
  *
  * Scale design:
  *  - tfidf:     two key-partitioned aggregations ((doc,term) then term)
  *               + one shuffle join on term + a per-doc window. Partial
  *               aggregation collapses each doc's term counts map-side,
  *               so the shuffles carry one row per distinct (doc, term),
  *               never the text. No broadcast of the vocabulary — at
  *               100 TB the document-frequency table is itself large, so
  *               it stays a plain equi-join AQE can re-plan.
  *  - substring: every 8-token window hashes to a 60-bit long AT SCAN
  *               TIME inside one codegen'd projection (array transform —
  *               no per-window row explosion until the hash is a long).
  *               One groupBy over window hashes finds cross-doc
  *               duplicates; a semi-join back + per-doc window merges
  *               adjacent positions into maximal spans. The shuffle
  *               volume is O(total windows) longs, the span state is
  *               O(1) per row.
  *  - bloom:     the classic scale asymmetry: the benchmark side folds
  *               into a fixed 65,536-bit filter (≤ 64K distinct set-bit
  *               rows REGARDLESS of benchmark size) which broadcasts to
  *               every executor, so the 100-TB train side is ONE
  *               map-side pass + a per-doc count — no shuffle of train
  *               n-grams against the benchmark, no false negatives, and
  *               the false-positive rate is the (m,k) textbook bound.
  *               The gate emits flagged-vs-exact counts side by side so
  *               the FP overshoot is visible data, not a claim.
  *  - range window: per-user time-range frame (RANGE BETWEEN 1h
  *               PRECEDING) over microsecond epochs — integer frame
  *               bounds, partition-local state, the standard rolling-
  *               feature shape.
  *  - sketch merge: per-group HLL buckets are max-mergeable, so group
  *               sketches AND their global union come from the same
  *               (group, bucket, max-rho) state — the mergeability that
  *               lets 1000 executors sketch independently and a final
  *               O(m) fold answer both per-group and all-up distincts.
  */
object Corpus {

  // spread: tokenize/hash kernels dominate these gates (Tables.spread)
  // NOT spread wholesale: several Corpus gates carry map-only plan pins
  // (gopher). Heavy kernels spread surgically at their call sites.
  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.df(s, dir, "documents")

  private def h60(s: SparkSession, c: Column): Column =
    graft.functions.VectorExpressions.md5_60(s, c)

  // ---- shared 20-char stride-5 gram pass (same shape as
  // q_decontaminate, so bloom-vs-exact results are comparable) ----
  private def grams20(s: SparkSession, d: DataFrame): DataFrame = d
    .select(col("doc_id"),
      explode(sequence(lit(1), length(col("t")) - 19, lit(5))).as("i"),
      col("t"))
    .select(col("doc_id"), h60(s, col("t").substr(col("i"), lit(20))).as("h"))

  private val grams20Sql =
    """g AS (
      |  SELECT doc_id, ('0x' || substr(md5(substr(t, i, 20)), 1, 15))::BIGINT AS h
      |  FROM (SELECT doc_id, trim(text) AS t,
      |          unnest(generate_series(1, length(trim(text)) - 19, 5)) AS i
      |        FROM documents WHERE length(trim(text)) >= 20))""".stripMargin

  // ---- HLL bucket/rho ladder (identical integer arithmetic to
  // q_distinct_sketch so the two gates cross-check each other) ----
  private val hllC: Double = 0.709 * 4096.0 * math.pow(2.0, 55)
  private def rhoOf(w: Column): Column =
    (0 until 54).foldLeft[Column](lit(null)) { (acc, i) =>
      if (i == 0) when(w >= (1L << 53), 1)
      else acc.when(w >= (1L << (53 - i)), i + 1)
    }.otherwise(55)
  private val rhoSql = s"CASE ${(0 until 54).map(i =>
    s"WHEN (h >> 6) >= ${1L << (53 - i)} THEN ${i + 1}").mkString(" ")} ELSE 55 END"

  // previous invocation's persisted window pass, swept on re-entry (the
  // shared GateCache discipline)
  private val ssCaches = GateCache.frame()

  /** Bloom sizing, derived from the eval-set gram count with integer
    * thresholds only (no float logs — both engines must agree exactly):
    * the smallest p in [16,24] with 2^p >= 10n, i.e. ~10 bits per
    * inserted gram. */
  private[queries] def bloomLog2m(n: Long): Int = {
    var p = 16
    while (p < 24 && (1L << p) < 10L * n) p += 1
    p
  }
  // thresholds are floor(2^p / 10): p applies iff n <= that
  private[queries] val bloomLog2mSql =
    "(CASE WHEN n <= 6553 THEN 16 WHEN n <= 13107 THEN 17 " +
      "WHEN n <= 26214 THEN 18 WHEN n <= 52428 THEN 19 " +
      "WHEN n <= 104857 THEN 20 WHEN n <= 209715 THEN 21 " +
      "WHEN n <= 419430 THEN 22 WHEN n <= 838860 THEN 23 ELSE 24 END)"

  /** k = floor(ln2 * m / n) = (693 * m DIV n) DIV 1000, clamped to [2,7] —
    * exact integer arithmetic (693 * 2^24 is far below Long overflow). */
  private[queries] def bloomK(m: Long, n: Long): Int =
    math.min(7L, math.max(2L, (693L * m / n) / 1000L)).toInt
  private[queries] val bloomKSql =
    "LEAST(7, GREATEST(2, ((693 * m) // n) // 1000))"

  val all: Map[String, Q] = Map(

    // ---- the dataset card: one-row corpus datasheet ----
    // The summary a training-data pipeline publishes with every corpus
    // snapshot (the Datasheets-for-Datasets habit, arXiv:1803.09010, as
    // a query): volume (docs, whitespace tokens), composition (distinct
    // sources/langs), redundancy (exact-dup doc count via the md5
    // fingerprint), and the token-length distribution's p50/p90. ONE
    // column-pruned corpus pass folding into a 1-row aggregate — at
    // 100 TB this is the cheapest full-corpus statement there is, and
    // every number is integer-exact except the two interpolated
    // percentiles (integer inputs, so the interpolation is exact in
    // both engines — the q_score_bucket cutpoint precedent).
    "q_corpus_card" -> Q(
      (s, dir) => {
        val t = split(trim(col("text")), "\\s+")
        val proj = docs(s, dir).select(col("source"), col("lang"),
          size(t).cast("long").as("dl"), md5(col("text")).as("fp"))
        proj.agg(
          count(lit(1)).as("docs"),
          countDistinct(col("source")).as("sources"),
          countDistinct(col("lang")).as("langs"),
          sum(col("dl")).as("total_tokens"),
          expr("sum(dl) DIV count(1)").as("tokens_per_doc"),
          (count(lit(1)) - countDistinct(col("fp"))).as("dup_docs"),
          expr("percentile(dl, 0.5)").as("p50_tokens"),
          expr("percentile(dl, 0.9)").as("p90_tokens"))
      },
      Some("""WITH proj AS (
             |  SELECT source, lang,
             |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS dl,
             |    md5(text) AS fp
             |  FROM documents)
             |SELECT CAST(count(*) AS BIGINT) AS docs,
             |  CAST(count(DISTINCT source) AS BIGINT) AS sources,
             |  CAST(count(DISTINCT lang) AS BIGINT) AS langs,
             |  CAST(sum(dl) AS BIGINT) AS total_tokens,
             |  CAST(sum(dl) // count(*) AS BIGINT) AS tokens_per_doc,
             |  CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS dup_docs,
             |  quantile_cont(dl, 0.5) AS p50_tokens,
             |  quantile_cont(dl, 0.9) AS p90_tokens
             |FROM proj""".stripMargin)),

    // ---- TF-IDF top-3 keywords per document ----
    // Scores round to 6 decimals BEFORE ranking so the float tail of
    // ln() can neither flip an order nor leak into the gate hash; ties
    // break on the term itself.
    "q_text_tfidf" -> Q(
      (s, dir) => {
        val d = docs(s, dir)
        // corpus size folds into the plan as a 1-row aggregate crossJoin
        // (the q_sketch_cms pattern) — a separate count() action would be
        // one extra full pass over documents at 100 TB and would bake N
        // into the plan as a literal, making it unreusable across corpora
        val nTotal = d.select(count(lit(1)).cast("double").as("corpus_n"))
        val tf = Tables.spread(d)
          .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("term"))
          .select(col("doc_id"), lower(col("term")).as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val scored = tf.join(df, "term").crossJoin(nTotal)
          .withColumn("score", round(col("tf").cast("double") *
            log(col("corpus_n") / col("df").cast("double")), 6))
        scored
          .withColumn("rk", row_number().over(Window.partitionBy(col("doc_id"))
            .orderBy(col("score").desc, col("term"))))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("term"), col("tf"), col("df"),
            col("score"), col("rk").cast("long").as("rk"))
          .orderBy(col("doc_id"), col("rk"))
      },
      Some("""WITH tf AS (
             |  SELECT doc_id, lower(unnest(regexp_split_to_array(trim(text), '\s+'))) AS term
             |  FROM documents),
             |tfc AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY 1, 2),
             |dfc AS (SELECT term, count(*) AS df FROM tfc GROUP BY 1),
             |scored AS (
             |  SELECT doc_id, term, tf, df,
             |    round(CAST(tf AS DOUBLE) *
             |          ln(CAST((SELECT count(*) FROM documents) AS DOUBLE) /
             |             CAST(df AS DOUBLE)), 6) AS score
             |  FROM tfc JOIN dfc USING (term)),
             |ranked AS (
             |  SELECT doc_id, term, tf, df, score,
             |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
             |  FROM scored)
             |SELECT doc_id, term, tf, df, score, rk
             |FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin)),

    // ---- exact duplicated-substring spans (8-token windows) ----
    // A window hash shared by ≥2 distinct docs marks its position
    // duplicated; adjacent duplicated positions merge into maximal
    // spans via the pos − row_number() run-grouping trick. Runs over
    // the cloned corpus so genuine cross-doc duplicate spans exist.
    "q_dedup_substring" -> Q(
      (s, dir) => {
        val W = 8
        // sweep the previous invocation's cache (one retained run per
        // (session, corpus), the lshCaches discipline)
        ssCaches.evict(s, dir)
        val tok = Dedup.corpus(s, dir)
          .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
          .filter(size(col("t")) >= W)
        // persisted: BOTH consumers below (the dup-hash aggregate and the
        // semi-join probe) read the window pass — without the pin the
        // whole tokenize+hash scan runs twice
        val wins = tok.select(col("doc_id"),
            posexplode(transform(sequence(lit(0), size(col("t")) - W),
              i => h60(s, concat_ws(" ", slice(col("t"), i + 1, lit(W))))))
              .as(Seq("pos", "h")))
          .persist()
        ssCaches.put(s, dir, wins)
        val dupH = wins.groupBy("h")
          .agg(countDistinct(col("doc_id")).as("nd"))
          .filter(col("nd") >= 2).select("h")
        val dpos = wins.join(dupH, Seq("h"), "left_semi")
        val grp = col("pos") - row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("pos")))
        dpos.withColumn("grp", grp)
          .groupBy("doc_id", "grp")
          .agg(min(col("pos")).cast("long").as("start_tok"),
            (max(col("pos")) + W).cast("long").as("end_tok"),
            count(lit(1)).as("n_win"))
          .select(col("doc_id"), col("start_tok"), col("end_tok"), col("n_win"))
          .orderBy(col("doc_id"), col("start_tok"))
      },
      Some(s"""WITH ${Dedup.corpusSql},
              |tk AS (
              |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
              |  FROM corpus WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= 8),
              |w AS (
              |  SELECT doc_id, i AS pos,
              |    ('0x' || substr(md5(array_to_string(t[i+1:i+8], ' ')), 1, 15))::BIGINT AS h
              |  FROM (SELECT doc_id, t, unnest(generate_series(0, len(t) - 8)) AS i FROM tk)),
              |dup AS (SELECT h FROM w GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
              |dpos AS (SELECT doc_id, pos FROM w WHERE h IN (SELECT h FROM dup)),
              |sp AS (
              |  SELECT doc_id, pos,
              |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
              |  FROM dpos)
              |SELECT doc_id, min(pos) AS start_tok, max(pos) + 8 AS end_tok,
              |  count(*) AS n_win
              |FROM sp GROUP BY doc_id, grp ORDER BY doc_id, start_tok""".stripMargin)),

    // ---- doc-level duplication fraction (containment) ----
    // For each doc: what share of its 8-token windows also occur in at
    // least one OTHER doc — the filter signal pipelines threshold to drop
    // mostly-duplicated documents (clones score 1.0, untouched docs 0).
    // Same shuffle budget as the span gate: one groupBy over window
    // hashes + a semi-join back + one per-doc count; the ratio is a
    // single division of exact counts.
    "q_dedup_containment" -> Q(
      (s, dir) => {
        val W = 8
        // THREE consumers read the window pass (dup-hash aggregate,
        // semi-join probe, per-doc n_win count) — pin it like the span
        // gate does; (doc_id, pos, h) is fixed-width, so the pin is cheap
        ssCaches.evict(s, dir)
        val tok = Dedup.corpus(s, dir)
          .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
          .filter(size(col("t")) >= W)
        val wins = tok.select(col("doc_id"),
            posexplode(transform(sequence(lit(0), size(col("t")) - W),
              i => h60(s, concat_ws(" ", slice(col("t"), i + 1, lit(W))))))
              .as(Seq("pos", "h")))
          .persist()
        ssCaches.put(s, dir, wins)
        val dupH = wins.groupBy("h")
          .agg(countDistinct(col("doc_id")).as("nd"))
          .filter(col("nd") >= 2).select("h")
        val nd = wins.join(dupH, Seq("h"), "left_semi")
          .groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
        wins.groupBy("doc_id").agg(count(lit(1)).as("n_win"))
          .join(nd, Seq("doc_id"), "left_outer")
          .select(col("doc_id"), col("n_win"),
            coalesce(col("n_dup"), lit(0L)).as("n_dup"),
            (coalesce(col("n_dup"), lit(0L)).cast("double") /
              col("n_win").cast("double")).as("dup_frac"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH ${Dedup.corpusSql},
              |tk AS (
              |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
              |  FROM corpus WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= 8),
              |w AS (
              |  SELECT doc_id, i AS pos,
              |    ('0x' || substr(md5(array_to_string(t[i+1:i+8], ' ')), 1, 15))::BIGINT AS h
              |  FROM (SELECT doc_id, t, unnest(generate_series(0, len(t) - 8)) AS i FROM tk)),
              |dup AS (SELECT h FROM w GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
              |nd AS (SELECT doc_id, count(*) AS n_dup FROM w
              |       WHERE h IN (SELECT h FROM dup) GROUP BY 1),
              |nw AS (SELECT doc_id, count(*) AS n_win FROM w GROUP BY 1)
              |SELECT nw.doc_id, n_win, coalesce(n_dup, 0) AS n_dup,
              |  CAST(coalesce(n_dup, 0) AS DOUBLE) / CAST(n_win AS DOUBLE) AS dup_frac
              |FROM nw LEFT JOIN nd ON nw.doc_id = nd.doc_id
              |ORDER BY nw.doc_id""".stripMargin)),

    // ---- Bloom-filter decontamination (derived m, k) ----
    // n_flagged counts train grams whose k bits are all set (Bloom
    // positive); n_exact is true membership on the same gram pass —
    // flagged ⊇ exact always (no false negatives), and the gap is the
    // FP overshoot. The filter SIZE is derived from the eval-set gram
    // count the way the embedding quantizer derives its cell width:
    // m = 2^p with the smallest p in [16,24] giving ~10 bits per inserted
    // gram (integer thresholds, no float logs), k = floor(ln2 * m / n)
    // clamped to [2,7] in exact integer arithmetic — so the FP rate stays
    // ~1% as the benchmark suite grows instead of saturating a fixed
    // 2^16 filter, while the bit set stays broadcastable (2^24 bits =
    // 2MB as a bitmap; here the set of SET bits is what ships, bounded
    // by k * n_eval longs). Both engines derive identical (m, k) from
    // the same count, so the gate stays hash-exact.
    "q_decontaminate_bloom" -> Q(
      (s, dir) => {
        val d = Tables.spread(docs(s, dir))
          .select(col("doc_id"), trim(col("text")).as("t"))
          .filter(length(col("t")) >= 20)
        val g = grams20(s, d)
        val evalG = g.filter(col("doc_id") % 97 === 0).select("h").distinct()
        val trainG = g.filter(col("doc_id") % 97 =!= 0).distinct()
        val nEval = math.max(1L, evalG.count())
        val m = 1L << Corpus.bloomLog2m(nEval)
        val k = Corpus.bloomK(m, nEval)
        // k bit positions per gram: shifted-xor mixes of the 60-bit hash
        // (j+1 so the j=0 mix is not xor(h,h)=0). A gram is Bloom-positive
        // iff EVERY probe index j hits a set bit — count(distinct j), so a
        // within-gram bit collision neither double-counts nor undercounts
        def bitsOf(h: Column) = array((0 until k).map(j =>
          shiftright(h, 7 * (j + 1)).bitwiseXOR(h) % m): _*)
        val bits = evalG.select(explode(bitsOf(col("h"))).as("b")).distinct()
        val flagged = trainG
          .select(col("doc_id"), col("h"),
            posexplode(bitsOf(col("h"))).as(Seq("j", "b")))
          .join(broadcast(bits), "b")
          .groupBy("doc_id", "h").agg(countDistinct(col("j")).as("hits"))
          .filter(col("hits") === k)
          .groupBy("doc_id").agg(count(lit(1)).as("n_flagged"))
        val exact = trainG.join(evalG, "h")
          .groupBy("doc_id").agg(count(lit(1)).as("n_exact"))
        flagged.join(exact, Seq("doc_id"), "left_outer")
          .select(col("doc_id"), col("n_flagged"),
            coalesce(col("n_exact"), lit(0L)).as("n_exact"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $grams20Sql,
              |evalg AS (SELECT DISTINCT h FROM g WHERE doc_id % 97 = 0),
              |traing AS (SELECT DISTINCT doc_id, h FROM g WHERE doc_id % 97 != 0),
              |p AS (
              |  SELECT n, m, ${Corpus.bloomKSql} AS k
              |  FROM (SELECT n, (1::BIGINT << ${Corpus.bloomLog2mSql}) AS m
              |        FROM (SELECT GREATEST(1, count(*)) AS n FROM evalg))),
              |bits AS (
              |  SELECT DISTINCT xor(h >> (7*(j+1)), h) % m AS b
              |  FROM evalg, p, (SELECT unnest(generate_series(0, 6)) AS j)
              |  WHERE j < k),
              |tb AS (
              |  SELECT doc_id, h, j, k, xor(h >> (7*(j+1)), h) % m AS b
              |  FROM traing, p, (SELECT unnest(generate_series(0, 6)) AS j)
              |  WHERE j < k),
              |hit AS (SELECT doc_id, h FROM tb JOIN bits USING (b)
              |        GROUP BY doc_id, h
              |        HAVING count(DISTINCT j) = max(k)),
              |fl AS (SELECT doc_id, count(*) AS n_flagged FROM hit GROUP BY 1),
              |ex AS (SELECT doc_id, count(*) AS n_exact
              |       FROM traing JOIN evalg USING (h) GROUP BY 1)
              |SELECT doc_id, n_flagged, coalesce(n_exact, 0) AS n_exact
              |FROM fl LEFT JOIN ex USING (doc_id) ORDER BY doc_id""".stripMargin)),

    // ---- per-user 1-hour rolling features (RANGE frame on µs epoch) ----
    // Frame bounds are exact integers (microseconds), the summed value
    // is floor-to-cents BIGINT — no float accumulation order anywhere.
    "q_window_range_time" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"))
          .rangeBetween(-3600L * 1000000L, 0)
        Tables.df(s, dir, "events")
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
            floor(col("value") * 100).cast("long").as("cents"))
          .select(col("event_id"), col("user_id"),
            count(lit(1)).over(w).as("cnt_1h"),
            sum(col("cents")).over(w).as("sum_cents_1h"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id,
             |  count(*) OVER w AS cnt_1h,
             |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER w AS BIGINT) AS sum_cents_1h
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin)),

    // ---- mergeable distinct sketches: per-type and merged-global ----
    // The per-(type, bucket) max-rho table IS the sketch; the 'ALL' row
    // re-folds those maxima per bucket — proof the state merges without
    // touching raw rows again. Empty buckets contribute 2^55 to z (their
    // rho is 0), and the HLL small-range branch switches to linear
    // counting (m · ln(m/empty)) when the raw estimate is under 2.5m —
    // without it a low-cardinality group overestimates ~30x. Estimates
    // round to 6 decimals so the ln() float tail stays out of the hash.
    "q_sketch_merge" -> Q(
      (s, dir) => {
        val ranked = Tables.df(s, dir, "events")
          .select(col("event_type"), h60(s, col("user_id").cast("string")).as("h"))
          .select(col("event_type"), (col("h") % 64).as("bucket"),
            rhoOf(shiftright(col("h"), 6)).cast("long").as("rho"))
        val sk = ranked.groupBy("event_type", "bucket")
          .agg(max(col("rho")).as("r"))
        def foldAgg = Seq(
          (sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - r AS INT))")) +
            (lit(64L) - count(lit(1))) * (1L << 55)).as("z"),
          (lit(64L) - count(lit(1))).as("empty"),
          count(lit(1)).as("filled"))
        val per = sk.groupBy("event_type").agg(foldAgg.head, foldAgg.tail: _*)
        val merged = sk.groupBy("bucket").agg(max(col("r")).as("r"))
          .agg(foldAgg.head, foldAgg.tail: _*)
          .select(lit("ALL").as("event_type"), col("z"), col("empty"), col("filled"))
        per.select(col("event_type"), col("z"), col("empty"), col("filled"))
          .unionAll(merged)
          .select(col("event_type"),
            round(when((lit(hllC) / col("z").cast("double")) <= 160.0 && col("empty") > 0,
              lit(64.0) * log(lit(64.0) / col("empty").cast("double")))
              .otherwise(lit(hllC) / col("z").cast("double")), 6).as("est_distinct"),
            col("filled"))
          .orderBy(col("event_type"))
      },
      Some(s"""WITH hashed AS (
              |  SELECT event_type,
              |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
              |  FROM events),
              |ranked AS (
              |  SELECT event_type, h % 64 AS bucket, $rhoSql AS rho FROM hashed),
              |sk AS (SELECT event_type, bucket, max(rho) AS r
              |       FROM ranked GROUP BY 1, 2),
              |folded AS (
              |  SELECT event_type, CAST(sum(1::BIGINT << (55 - r)) AS BIGINT)
              |      + (64 - count(*)) * (1::BIGINT << 55) AS z,
              |    64 - count(*) AS empty, count(*) AS filled
              |  FROM sk GROUP BY 1
              |  UNION ALL
              |  SELECT 'ALL', CAST(sum(1::BIGINT << (55 - r)) AS BIGINT)
              |      + (64 - count(*)) * (1::BIGINT << 55), 64 - count(*), count(*)
              |  FROM (SELECT bucket, max(r) AS r FROM sk GROUP BY 1))
              |SELECT event_type,
              |  round(CASE WHEN $hllC / CAST(z AS DOUBLE) <= 160.0 AND empty > 0
              |    THEN 64.0 * ln(64.0 / CAST(empty AS DOUBLE))
              |    ELSE $hllC / CAST(z AS DOUBLE) END, 6) AS est_distinct,
              |  filled
              |FROM folded ORDER BY event_type""".stripMargin)),

    // ---- count-min sketch heavy hitters: the bounded-memory frequency
    // summary that completes the mergeable-sketch family (HLL for
    // distincts, rank-quantiles, CMS for frequencies). A d=4 × w=256
    // counter grid — 1 KB of state however big the corpus — estimates
    // any key's frequency as min over 4 hash rows; the rows are plain
    // sums, so 1000 executors sketch independently and the grids ADD.
    // The domain is corpus bigrams (916 distinct > 256 buckets, so
    // collisions are REAL here): the gate reports exact count vs CMS
    // estimate side by side for every ≥0.1%-frequency bigram, making the
    // one-sided overcount (est ≥ exact, bounded by the row sums'
    // collision mass) visible data rather than a claim. Buckets derive
    // from non-overlapping bytes of the shared 60-bit md5 hash —
    // arithmetic the oracle replicates bit for bit. Scale: one bigram
    // shuffle builds the count table; the sketch and the probe both fold
    // FROM that table (vocab-sized), never re-reading the corpus.
    "q_sketch_cms" -> Q(
      (s, dir) => {
        val toks = docs(s, dir)
          .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("ts"))
        val inst = toks
          .select(posexplode(col("ts")).as(Seq("i", "w")),
            col("ts"), size(col("ts")).as("n"))
          .filter(col("i") < col("n") - 1)
          .select(concat(col("w"), lit(" "),
            element_at(col("ts"), col("i") + 2)).as("bg"))
        ssCaches.evict(s, s"$dir#cms") // pre-persist (shared-entry rule)
        val counts = inst.groupBy("bg").agg(count(lit(1)).as("cnt"))
          .withColumn("h", h60(s, col("bg"))).persist()
        counts.count() // three consumers: sketch fold, total, hh probe
        ssCaches.put(s, s"$dir#cms", counts) // one retained generation
        def buckets = posexplode(array(
          col("h") % 256, shiftright(col("h"), 8) % 256,
          shiftright(col("h"), 16) % 256, shiftright(col("h"), 24) % 256))
        val sketch = counts.select(col("cnt"), buckets.as(Seq("i", "b")))
          .groupBy("i", "b").agg(sum(col("cnt")).as("c"))
        val tot = counts.select(sum(col("cnt")).as("n"))
        val hh = counts.crossJoin(tot)
          .filter(col("cnt") * 1000 >= col("n"))
          .select(col("bg"), col("cnt"), buckets.as(Seq("i", "b")))
        hh.join(sketch, Seq("i", "b"))
          .groupBy(col("bg"), col("cnt"))
          .agg(min(col("c")).as("cms_est"))
          .select(col("bg"), col("cnt").as("exact_cnt"), col("cms_est"))
          .orderBy(col("bg"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ts
             |  FROM documents),
             |inst AS (
             |  SELECT ts[i] || ' ' || ts[i+1] AS bg
             |  FROM (SELECT ts, unnest(generate_series(1, len(ts)-1)) AS i
             |        FROM toks)),
             |counts AS (
             |  SELECT bg, count(*) AS cnt,
             |         ('0x' || substr(md5(bg), 1, 15))::BIGINT AS h
             |  FROM inst GROUP BY bg),
             |buck AS (
             |  SELECT bg, cnt, i, (h >> (i * 8)) % 256 AS b
             |  FROM counts CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i)),
             |sketch AS (SELECT i, b, sum(cnt) AS c FROM buck GROUP BY i, b),
             |tot AS (SELECT sum(cnt) AS n FROM counts)
             |SELECT bg, cnt AS exact_cnt, CAST(min(c) AS BIGINT) AS cms_est
             |FROM buck JOIN sketch USING (i, b) CROSS JOIN tot
             |WHERE cnt * 1000 >= n
             |GROUP BY bg, cnt ORDER BY bg""".stripMargin))
  )
}
