package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Relational.Q

/** Product-analytics and data-layout operators a training-data platform
  * runs alongside the prep pipeline: cohort retention, ordered conversion
  * funnels, collocation mining, and Z-order locality keys.
  *
  * Scale notes (100 TB):
  *  - retention/funnel are one shuffle each on `user_id` — the natural
  *    partition key for event logs; per-user state is O(1).
  *  - collocations explode to bigram space but aggregate map-side first
  *    (partial aggregation), so the shuffle carries distinct bigrams, not
  *    token instances.
  *  - the Z-order key is a pure per-row expression; at scale it feeds
  *    `repartitionByRange(zkey)` + parquet write so multi-dimensional
  *    range predicates prune files (the layout trick Delta/Iceberg OPTIMIZE
  *    ZORDER uses).
  *
  * Determinism: all arithmetic is integer (counts, bit interleaves) or a
  * single double division of exact integers — bit-identical across engines
  * per the repo's oracle rules. No ln()/log() anywhere: libm rounding is
  * not pinned across engines, so PMI-style scores use the linear lift
  * `c_xy * N / (c_x * c_y)` instead of its logarithm (same ranking).
  */
object Analytics {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.df(s, dir, name)

  /** Day-partitioned events layout for q_layout_partition_prune: written
    * once per (session, dir) — the gate's steady-state cost is the pruned
    * read, not the layout build (same one-off discipline as the bucketed
    * join and the dedup index). */
  private val partitionedReady = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), String]

  private[graft] def partitionedEventsPath(s: SparkSession, dir: String): String =
    partitionedReady.getOrElseUpdate((s, dir), {
      val p = graft.TempDirs.create("graft-partlayout").toString + "/events"
      Tables.df(s, dir, "events")
        .withColumn("day", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("day").parquet(p)
      p
    })

  val all: Map[String, Q] = Map(

    // ---- partition-pruned layout read: the OTHER half of the layout
    // story (z-order prunes within files via min/max stats; this prunes
    // whole directories before any file opens). Events re-land ONCE
    // partitioned by day; a one-day predicate then reads 1/30th of the
    // corpus — at 100 TB, Spark's partition discovery resolves the
    // predicate against directory names only, so the scan task list
    // never even mentions the other 29 days (PlanAuditSpec pins the
    // PartitionFilters entry and that no ts-filter fallback scan
    // remains). The oracle answers from the unpartitioned table — same
    // rows, proving the layout is a pure physical optimization ----
    "q_layout_partition_prune" -> Q(
      (s, dir) => {
        // phase-split: the one-off partitioned re-land vs the pruned read
        graft.PhaseTimings.reset("q_layout_partition_prune")
        val p = graft.PhaseTimings.timed("q_layout_partition_prune", "layout_build") {
          partitionedEventsPath(s, dir)
        }
        s.read.parquet(p)
          .filter(col("day") === lit("2024-01-15").cast("date"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(floor(col("value") * 100).cast("long")).as("sum_cents"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
             |FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-15'
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- cohort retention triangle over the event log ----
    // Cohort = the user's first active day; each (cohort_day, day_offset)
    // cell counts users active that many days after their first touch.
    // One shuffle keyed on user_id for the cohort assignment, then a
    // bounded aggregate (days × days cells). At 100 TB the events scan
    // prunes to (user_id, ts) and partial-aggregates per day before the
    // exchange.
    "q_events_retention" -> Q(
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("d"))
        val cohort = ev.groupBy("user_id").agg(min(col("d")).as("cohort_day"))
        ev.join(cohort, "user_id")
          .groupBy(col("cohort_day"),
            datediff(col("d"), col("cohort_day")).cast("long").as("day_offset"))
          .agg(countDistinct(col("user_id")).as("active_users"))
          .filter(col("day_offset") <= 7)
          .orderBy(col("cohort_day"), col("day_offset"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, CAST(ts AS DATE) AS d FROM events),
             |cohort AS (
             |  SELECT user_id, min(d) AS cohort_day FROM ev GROUP BY 1)
             |SELECT c.cohort_day,
             |  CAST(datediff('day', c.cohort_day, e.d) AS BIGINT) AS day_offset,
             |  count(DISTINCT e.user_id) AS active_users
             |FROM ev e JOIN cohort c USING (user_id)
             |GROUP BY 1, 2 HAVING day_offset <= 7
             |ORDER BY cohort_day, day_offset""".stripMargin)),

    // ---- strictly-ordered conversion funnel: view -> click -> purchase ----
    // Stage k counts users whose earliest stage-k event happens AFTER their
    // earliest stage-(k-1) event. Implemented as one conditional-aggregation
    // pass per user (min ts per type), so the whole funnel is a single
    // shuffle on user_id with O(1) state per user — no self-joins, no
    // per-user event sorting. Epoch micros are compared as integers.
    "q_events_funnel" -> Q(
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        def firstOf(tpe: String): Column =
          min(when(col("event_type") === tpe, col("us"))).as(s"t_$tpe")
        val perUser = ev.groupBy("user_id")
          .agg(firstOf("view"), firstOf("click"), firstOf("purchase"))
        perUser.agg(
          count(lit(1)).as("n_users"),
          count(col("t_view")).as("n_view"),
          count(when(col("t_click") > col("t_view"), 1)).as("n_view_click"),
          count(when(col("t_click") > col("t_view") &&
            col("t_purchase") > col("t_click"), 1)).as("n_full_funnel"))
      },
      Some("""WITH per_user AS (
             |  SELECT user_id,
             |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
             |    min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
             |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_purchase
             |  FROM events GROUP BY 1)
             |SELECT count(*) AS n_users,
             |  count(t_view) AS n_view,
             |  count(CASE WHEN t_click > t_view THEN 1 END) AS n_view_click,
             |  count(CASE WHEN t_click > t_view AND t_purchase > t_click THEN 1 END)
             |    AS n_full_funnel
             |FROM per_user""".stripMargin)),

    // ---- collocation mining: adjacent-bigram lift over the corpus ----
    // The PMI-style collocation score with the log dropped (identical
    // ranking, no libm): lift = c_xy * N_bigrams / (c_x * c_y) where the
    // unigram counts come from the same token stream. Bigrams aggregate
    // map-side before the exchange; the two unigram joins are on the
    // bounded distinct-token set. Output: top-25 collocations among bigrams
    // seen >= 5 times, ties broken lexicographically.
    "q_text_collocations" -> Q(
      (s, dir) => {
        val toks = Tables.spread(t(s, dir, "documents"))
          .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("ts"))
        // bigrams build as zip(ts[0..n-2], ts[1..n-1]) INSIDE the array
        // before the explode — the exploded rows carry one 2-field struct
        // each, never the whole token array (a posexplode + element_at
        // formulation drags the full array through every token row:
        // O(doc_len²) bytes per doc, quadratic in document length)
        val bigrams = toks
          .filter(size(col("ts")) >= 2)
          .select(explode(zip_with(
            slice(col("ts"), lit(1), size(col("ts")) - 1),
            slice(col("ts"), lit(2), size(col("ts")) - 1),
            (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
          .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        gateFrames.evict(s, s"$dir#colloc")
        val big = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
          .persist()
        big.count() // settle: four consumers below fork the plan
        gateFrames.put(s, s"$dir#colloc", big)
        // unigram slot counts DERIVE from the aggregated bigram table
        // (c1(w) = Σ c_xy over w1=w) — the token explode runs once, and
        // the marginals aggregate the already-tiny distinct-bigram set
        val u1 = big.groupBy(col("w1").as("w")).agg(sum(col("c_xy")).as("c1"))
        val u2 = big.groupBy(col("w2").as("w")).agg(sum(col("c_xy")).as("c2"))
        val nTot = big.agg(sum(col("c_xy"))).head().getLong(0)
        big.filter(col("c_xy") >= 5)
          .join(u1, big("w1") === u1("w")).drop("w")
          .join(u2, big("w2") === u2("w")).drop("w")
          .select(col("w1"), col("w2"), col("c_xy"),
            (col("c_xy").cast("double") * lit(nTot.toDouble) /
              (col("c1") * col("c2")).cast("double")).as("lift"))
          .orderBy(col("lift").desc, col("w1"), col("w2"))
          .limit(25)
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ts
             |  FROM documents),
             |bigrams AS (
             |  SELECT ts[i] AS w1, ts[i+1] AS w2
             |  FROM (SELECT ts, unnest(generate_series(1, len(ts)-1)) AS i FROM toks)),
             |big AS (SELECT w1, w2, count(*) AS c_xy FROM bigrams GROUP BY 1,2),
             |u1 AS (SELECT w1 AS w, CAST(sum(c_xy) AS BIGINT) AS c1 FROM big GROUP BY 1),
             |u2 AS (SELECT w2 AS w, CAST(sum(c_xy) AS BIGINT) AS c2 FROM big GROUP BY 1),
             |n AS (SELECT CAST(sum(c_xy) AS BIGINT) AS n_tot FROM big)
             |SELECT w1, w2, c_xy,
             |  CAST(c_xy AS DOUBLE) * CAST(n_tot AS DOUBLE)
             |    / CAST(c1 * c2 AS DOUBLE) AS lift
             |FROM big, n
             |JOIN u1 ON big.w1 = u1.w JOIN u2 ON big.w2 = u2.w
             |WHERE c_xy >= 5
             |ORDER BY lift DESC, w1, w2 LIMIT 25""".stripMargin)),

    // ---- 3-sigma anomaly counts per metric group, exactly ----
    // The metric-quality gate (flag value outliers per event_type) with a
    // twist that makes it hash-checkable: values quantize to exact
    // micro-units (floor(v*1e6+0.5) — identical rounding both engines) and
    // the 3-sigma test cross-multiplies to pure integer arithmetic,
    //   (n·v − S1)²·(n−1) > 9·n·(n·S2 − S1²),
    // so no engine ever rounds. mean/stddev are reported as one double
    // division/sqrt each on identical integer inputs (sqrt is
    // correctly-rounded IEEE). DECIMAL(38,0) holds the cross-products up
    // to ~10M rows per group; past that a production run switches the
    // REPORTING to doubles while the flag logic stays integral per split.
    // Two linear scans (tiny stats table broadcast back), no wide shuffle.
    "q_events_anomaly" -> Q(
      (s, dir) => {
        val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
        val iv = floor(col("value") * 1000000d + 0.5).cast("long")
        val ev = t(s, dir, "events").select(col("event_type"), iv.as("iv"))
        val stats = ev.groupBy("event_type").agg(
          count(lit(1)).as("n"),
          sum(col("iv").cast(d38)).cast(d38).as("s1"),
          sum(col("iv").cast(d38) * col("iv")).cast(d38).as("s2"))
        val dev = col("n").cast(d38) * col("iv") - col("s1")
        val varNum = col("n").cast(d38) * col("s2") - col("s1") * col("s1")
        ev.join(broadcast(stats), "event_type")
          .groupBy("event_type")
          .agg(
            first(col("n")).as("n"),
            (first(col("s1")).cast("double") / first(col("n"))).as("mean"),
            sqrt(first(varNum).cast("double") /
              (first(col("n")).cast("double") * (first(col("n")) - 1))).as("sd"),
            count(when(dev * dev * (col("n") - 1).cast(d38) >
              lit(9).cast(d38) * col("n") * varNum, 1)).as("n_outliers"))
          .orderBy(col("event_type"))
      },
      Some("""WITH ev AS (
             |  SELECT event_type,
             |         CAST(floor(value * 1000000 + 0.5) AS HUGEINT) AS iv
             |  FROM events),
             |stats AS (
             |  SELECT event_type, count(*) AS n,
             |         CAST(sum(iv) AS HUGEINT) AS s1,
             |         CAST(sum(iv * iv) AS HUGEINT) AS s2
             |  FROM ev GROUP BY 1)
             |SELECT ev.event_type, any_value(n) AS n,
             |  CAST(any_value(s1) AS DOUBLE) / any_value(n) AS mean,
             |  sqrt(CAST(any_value(n) * any_value(s2) - any_value(s1) * any_value(s1) AS DOUBLE)
             |       / (CAST(any_value(n) AS DOUBLE) * (any_value(n) - 1))) AS sd,
             |  count(CASE WHEN (n * iv - s1) * (n * iv - s1) * (n - 1)
             |                  > 9 * n * (n * s2 - s1 * s1) THEN 1 END) AS n_outliers
             |FROM ev JOIN stats USING (event_type)
             |GROUP BY ev.event_type ORDER BY event_type""".stripMargin)),

    // ---- rare-ngram novelty scoring: the hapax-ratio quality signal ----
    // Per-doc fraction of bigrams that occur exactly ONCE in the whole
    // corpus (doc-unique n-grams — the Gopher-style rarity signal) plus
    // the mean corpus frequency of the doc's bigrams. Corpus counts come
    // from one aggregated bigram table equi-joined back to the per-doc
    // instances — partial-aggregated shuffles only, integers throughout,
    // one double division per output row.
    // ---- unigram-LM surprisal scoring (the KenLM-filter standin) ----
    // Per-doc mean surprisal -ln p(token) under the corpus's own unigram
    // distribution: the classic model-based quality signal (boilerplate
    // scores low, gibberish scores high). Determinism across engines:
    // each token's surprisal ln(N/cnt) rounds to 6 decimals FIRST (the
    // tfidf-proven guard against libm ULP skew), the per-doc total sums
    // those as DECIMAL(18,6) — exact and order-independent, immune to
    // float summation order — and the mean is one double division at the
    // end. Scale: explode once, token counts partial-aggregate, the
    // count table equi-joins back on the token (never broadcast), per-doc
    // agg carries two fixed-width columns.
    "q_text_unigram_lp" -> Q(
      (s, dir) => {
        // evict BEFORE the new persist: identical logical plans share ONE
        // cache entry, so a post-persist clean of the old generation
        // would drop the new frame's cache with it
        gateFrames.evict(s, s"$dir#uni_lp")
        val inst = t(s, dir, "documents")
          .select(col("doc_id"),
            explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
          .persist()
        inst.count() // two consumers: corpus counts + the instance join
        gateFrames.put(s, s"$dir#uni_lp", inst)
        val counts = inst.groupBy("w").agg(count(lit(1)).as("cnt"))
        val total = inst.select(count(lit(1)).as("n_total"))
        val surp = round(
          log(col("n_total").cast("double") / col("cnt").cast("double")), 6)
        inst.join(counts, Seq("w")).crossJoin(total)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tok"),
            sum(surp.cast(org.apache.spark.sql.types.DecimalType(18, 6)))
              .as("sum_surp"))
          .select(col("doc_id"), col("n_tok"),
            (col("sum_surp").cast("double") / col("n_tok")).as("mean_surprisal"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH inst AS (
             |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
             |  FROM documents),
             |counts AS (SELECT w, count(*) AS cnt FROM inst GROUP BY 1),
             |total AS (SELECT count(*) AS n_total FROM inst)
             |SELECT doc_id, count(*) AS n_tok,
             |  CAST(sum(CAST(round(ln(CAST(n_total AS DOUBLE) / CAST(cnt AS DOUBLE)), 6)
             |       AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS mean_surprisal
             |FROM inst JOIN counts USING (w) CROSS JOIN total
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- held-out LM scoring: the leakage-honest perplexity filter ----
    // Scoring a doc under a model trained on ITSELF understates its
    // surprisal — the subtle leak in naive perplexity filtering. Here
    // the unigram model trains on the train split ONLY (the same
    // md5(doc_id)%10<8 rule as q_split_sample, so model membership and
    // split assignment can never disagree), with add-one smoothing over
    // the train vocabulary so out-of-vocabulary tokens in val/test score
    // the finite ceiling ln(N+V) instead of exploding. Same
    // round₆-then-DECIMAL determinism as the unigram gate; one left
    // join against the train count table (absent → cnt 0), never a
    // broadcast. Emits the split label so the train-vs-heldout score
    // gap is visible data.
    "q_text_heldout_lp" -> Q(
      (s, dir) => {
        gateFrames.evict(s, s"$dir#held_lp") // pre-persist (shared-entry rule)
        val h = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long")
        val inst = Tables.spread(t(s, dir, "documents"))
          .select(col("doc_id"), (h % 10 < 8).as("is_train"),
            explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
          .persist()
        inst.count() // three consumers: train counts, train totals, scoring
        gateFrames.put(s, s"$dir#held_lp", inst)
        val counts = inst.filter(col("is_train"))
          .groupBy("w").agg(count(lit(1)).as("cnt"))
        val totals = counts.agg(sum(col("cnt")).as("n_train"),
          count(lit(1)).as("v_train"))
        val surp = round(log(
          (col("n_train") + col("v_train")).cast("double") /
            (coalesce(col("cnt"), lit(0L)) + 1).cast("double")), 6)
        inst.join(counts, Seq("w"), "left").crossJoin(totals)
          .groupBy(col("doc_id"), col("is_train"))
          .agg(count(lit(1)).as("n_tok"),
            sum(surp.cast(org.apache.spark.sql.types.DecimalType(18, 6)))
              .as("sum_surp"))
          .select(col("doc_id"),
            when(col("is_train"), "train").otherwise("heldout").as("split"),
            col("n_tok"),
            (col("sum_surp").cast("double") / col("n_tok")).as("mean_surprisal"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH inst AS (
             |  SELECT doc_id,
             |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             |      % 10 < 8 AS is_train,
             |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
             |  FROM documents),
             |counts AS (
             |  SELECT w, count(*) AS cnt FROM inst WHERE is_train GROUP BY w),
             |totals AS (
             |  SELECT sum(cnt) AS n_train, count(*) AS v_train FROM counts)
             |SELECT doc_id,
             |  CASE WHEN is_train THEN 'train' ELSE 'heldout' END AS split,
             |  count(*) AS n_tok,
             |  CAST(sum(CAST(round(ln(CAST(n_train + v_train AS DOUBLE) /
             |       CAST(coalesce(cnt, 0) + 1 AS DOUBLE)), 6)
             |       AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS mean_surprisal
             |FROM inst LEFT JOIN counts USING (w) CROSS JOIN totals
             |GROUP BY doc_id, is_train ORDER BY doc_id""".stripMargin)),

    // ---- bigram-LM surprisal: one rung up the model-based-filter ladder
    // from q_text_unigram_lp. Per-doc mean -ln p(w2|w1) under the
    // corpus's own bigram model with add-one smoothing:
    // p = (c(w1,w2)+1) / (c(w1·)+V), V = unigram vocabulary size — the
    // signal that separates fluent text from locally-plausible word salad
    // (every unigram common, transitions never seen). Determinism: each
    // instance's surprisal ln((c1+V)/(c12+1)) rounds to 6 decimals FIRST,
    // sums as DECIMAL(18,6) (order-independent), one double division at
    // the end. Scale: bigram instances aggregate partial; the two count
    // tables equi-join back (never broadcast — the bigram vocabulary is
    // corpus-sized); V is one scalar cross join.
    "q_text_bigram_lp" -> Q(
      (s, dir) => {
        val toks = t(s, dir, "documents")
          .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("ts"))
        gateFrames.evict(s, s"$dir#bigram_lp") // pre-persist (shared-entry rule)
        // bigrams build INSIDE the array before the explode (the
        // collocations discipline): the posexplode formulation dragged the
        // whole token array through every exploded row — O(doc_len**2)
        // bytes per doc — just to element_at the next token
        val inst = toks
          .filter(size(col("ts")) >= 2)
          .select(col("doc_id"), explode(zip_with(
            slice(col("ts"), lit(1), size(col("ts")) - 1),
            slice(col("ts"), lit(2), size(col("ts")) - 1),
            (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
          .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
          .persist()
        inst.count() // three consumers: c12, c1, the instance join
        gateFrames.put(s, s"$dir#bigram_lp", inst)
        val c12 = inst.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        val c1 = inst.groupBy("w1").agg(count(lit(1)).as("c1"))
        val vocab = toks
          .select(explode(col("ts")).as("w"))
          .agg(countDistinct(col("w")).as("v"))
        val surp = round(log(
          (col("c1") + col("v")).cast("double") /
            (col("c12") + 1).cast("double")), 6)
        inst.join(c12, Seq("w1", "w2")).join(c1, Seq("w1")).crossJoin(vocab)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
            sum(surp.cast(org.apache.spark.sql.types.DecimalType(18, 6)))
              .as("sum_surp"))
          .select(col("doc_id"), col("n_bigrams"),
            (col("sum_surp").cast("double") / col("n_bigrams"))
              .as("mean_surprisal"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ts
             |  FROM documents),
             |inst AS (
             |  SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
             |  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts)-1)) AS i
             |        FROM toks)),
             |c12 AS (SELECT w1, w2, count(*) AS c12 FROM inst GROUP BY 1, 2),
             |c1 AS (SELECT w1, count(*) AS c1 FROM inst GROUP BY 1),
             |vocab AS (
             |  SELECT count(DISTINCT w) AS v
             |  FROM (SELECT unnest(ts) AS w FROM toks))
             |SELECT doc_id, count(*) AS n_bigrams,
             |  CAST(sum(CAST(round(ln(CAST(c1 + v AS DOUBLE) / CAST(c12 + 1 AS DOUBLE)), 6)
             |       AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS mean_surprisal
             |FROM inst JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vocab
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- character-entropy quality signal: Shannon entropy (bits/char)
    // of each doc's character distribution — the gibberish/compression
    // detector (random keyboard mash scores ~4.7 bits, base64 blobs ~6,
    // natural text ~4.1, "aaaa…" ~0). Determinism: entropy =
    // (Σ cnt·round₆(ln(n/cnt))) / n / ln2 — the ln rounds to 6 decimals
    // BEFORE the exact integer-×-decimal product and decimal sum, and
    // the two trailing double divisions are single IEEE ops on identical
    // operands, so the gate hash carries no libm tail. Scale: one
    // per-char explode (map-side), partial-aggregated (doc, char)
    // counts — the shuffle carries ≤ |alphabet| rows per doc, not the
    // text — then one doc_id window ----
    "q_text_entropy" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.types.DecimalType
        // In-row per-doc histogram (r18, verdict item 7): the old shape
        // exploded one row per CHARACTER into a hash aggregate, a second
        // exchange and a doc window — all to count runs of equal chars.
        // Sorting the doc's char array in-row and run-length-encoding it
        // yields the identical (char, cnt) multiset with zero exchanges:
        // the whole gate is one map-only projection plus the final sort.
        // Determinism is unchanged: the per-term decimal products and
        // their exact decimal sum are the same terms in a different
        // order, and decimal addition is exact (no float-sum ordering),
        // so the gate hash is bit-identical (oracle-verified at all SFs).
        val arr = array_sort(transform(
          sequence(lit(1), length(col("text"))),
          i => col("text").substr(i, lit(1))))
        val docs = Tables.spread(t(s, dir, "documents"))
          // a null text produced no exploded rows (and so no output row)
          // in the old shape — preserve that exactly
          .filter(col("text").isNotNull)
          .select(col("doc_id"), arr.as("cs"))
          .select(col("doc_id"), col("cs"),
            size(col("cs")).cast("long").as("n"),
            // run starts: positions whose char differs from its neighbor
            filter(sequence(lit(1), size(col("cs"))),
              i => i === 1 ||
                element_at(col("cs"), i) =!= element_at(col("cs"), i - 1))
              .as("starts"))
          .select(col("doc_id"), col("n"),
            size(col("starts")).cast("long").as("n_distinct"),
            // run lengths = gaps between consecutive starts (last run
            // closed by n+1), each contributing cnt * round6(ln(n/cnt))
            // to the exact decimal sum — the same terms the old
            // per-(doc, char) aggregate summed
            aggregate(
              zip_with(col("starts"),
                concat(slice(col("starts"), lit(2), size(col("starts"))),
                  array(col("n") + 1)),
                (a, b) => b - a),
              lit(java.math.BigDecimal.ZERO).cast(DecimalType(38, 6)),
              (acc, cnt) => acc + cnt * round(log(col("n").cast("double") /
                cnt.cast("double")), 6).cast(DecimalType(18, 6))).as("s"))
          .select(col("doc_id"), col("n").as("n_chars"), col("n_distinct"),
            (col("s").cast("double") / col("n") /
              lit(0.6931471805599453)).as("entropy_bits"))
        docs.orderBy(col("doc_id"))
      },
      Some("""WITH chars AS (
             |  SELECT doc_id, substr(text, i, 1) AS c
             |  FROM (SELECT doc_id, text,
             |          unnest(generate_series(1, length(text))) AS i
             |        FROM documents)),
             |counts AS (SELECT doc_id, c, count(*) AS cnt FROM chars GROUP BY 1, 2),
             |withn AS (
             |  SELECT doc_id, cnt,
             |    sum(cnt) OVER (PARTITION BY doc_id) AS n
             |  FROM counts)
             |SELECT doc_id, CAST(min(n) AS BIGINT) AS n_chars,
             |  count(*) AS n_distinct,
             |  CAST(sum(cnt * CAST(round(ln(CAST(n AS DOUBLE) / CAST(cnt AS DOUBLE)), 6)
             |       AS DECIMAL(18,6))) AS DOUBLE)
             |    / CAST(min(n) AS BIGINT) / 0.6931471805599453 AS entropy_bits
             |FROM withn GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    "q_text_novelty" -> Q(
      (s, dir) => {
        val toks = t(s, dir, "documents")
          .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("ts"))
        gateFrames.evict(s, s"$dir#novelty") // pre-persist (shared-entry rule)
        // bigrams build INSIDE the array before the explode (the
        // collocations discipline): the posexplode formulation dragged the
        // whole token array through every exploded row — O(doc_len**2)
        // bytes per doc — just to element_at the next token
        val inst = toks
          .filter(size(col("ts")) >= 2)
          .select(col("doc_id"), explode(zip_with(
            slice(col("ts"), lit(1), size(col("ts")) - 1),
            slice(col("ts"), lit(2), size(col("ts")) - 1),
            (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
          .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
          .persist()
        inst.count() // two consumers: corpus counts + the instance join
        gateFrames.put(s, s"$dir#novelty", inst)
        val corpus = inst.groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
        inst.join(corpus, Seq("w1", "w2"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
            count(when(col("c_xy") === 1, 1)).as("n_hapax"),
            (count(when(col("c_xy") === 1, 1)).cast("double") /
              count(lit(1))).as("hapax_ratio"),
            (sum(col("c_xy")).cast("double") / count(lit(1))).as("mean_freq"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ts
             |  FROM documents),
             |inst AS (
             |  SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
             |  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts)-1)) AS i
             |        FROM toks)),
             |corpus AS (SELECT w1, w2, count(*) AS c_xy FROM inst GROUP BY 1, 2)
             |SELECT doc_id, count(*) AS n_bigrams,
             |  count(CASE WHEN c_xy = 1 THEN 1 END) AS n_hapax,
             |  CAST(count(CASE WHEN c_xy = 1 THEN 1 END) AS DOUBLE) / count(*)
             |    AS hapax_ratio,
             |  CAST(sum(c_xy) AS DOUBLE) / count(*) AS mean_freq
             |FROM inst JOIN corpus USING (w1, w2)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- Z-order locality key: Morton-interleave (custkey, price) ----
    // The multi-dimensional clustering key behind OPTIMIZE ZORDER: both
    // dimensions quantize to 8-bit ranks and the bits interleave, so rows
    // close in EITHER dimension land close in the sort order. Per-row bit
    // arithmetic only (codegen); at scale the key feeds
    // repartitionByRange + sortWithinPartitions before the parquet write,
    // and min/max file stats then prune 2-D range predicates. The gate
    // aggregates per z-bucket to prove both engines interleave identically.
    "q_zorder" -> Q(
      (s, dir) => {
        val o = t(s, dir, "orders")
        // 8-bit quantization of each dimension (custkey dense ranks are
        // uniform; price spans [~850, ~560k] — fixed bounds, clamped)
        // floor + truncating cast on BOTH engines: DuckDB's bare
        // double->BIGINT cast ROUNDS while Spark's truncates
        val cq = least(greatest(col("o_custkey") % 256, lit(0)), lit(255))
        val pq = least(floor(col("o_totalprice") / lit(2500.0)).cast("long"), lit(255))
        // interleave 8+8 bits: custkey bits even positions, price bits odd
        val z = (0 until 8).map { b =>
          (shiftleft(shiftright(cq, b) % 2, 2 * b) +
            shiftleft(shiftright(pq, b) % 2, 2 * b + 1)): Column
        }.reduce(_ + _)
        o.select(col("o_orderkey"), z.as("zkey"))
          .groupBy(expr("zkey DIV 4096").as("zbucket"))
          .agg(count(lit(1)).as("n"), min(col("zkey")).as("zmin"),
            max(col("zkey")).as("zmax"))
          .orderBy(col("zbucket"))
      },
      Some {
        val cq = "least(greatest(o_custkey % 256, 0), 255)"
        val pq = "least(CAST(floor(o_totalprice / 2500.0) AS BIGINT), 255)"
        val z = (0 until 8).map { b =>
          s"((($cq >> $b) % 2) << ${2 * b}) + ((($pq >> $b) % 2) << ${2 * b + 1})"
        }.mkString(" + ")
        s"""WITH zk AS (SELECT o_orderkey, $z AS zkey FROM orders)
           |SELECT zkey // 4096 AS zbucket, count(*) AS n,
           |  min(zkey) AS zmin, max(zkey) AS zmax
           |FROM zk GROUP BY 1 ORDER BY zbucket""".stripMargin
      }),

    // ---- DAU / WAU / stickiness, exact ----
    // The engagement staple: per calendar day, distinct active users
    // (DAU), the distinct users of the trailing 7-day window ending that
    // day (WAU), and DAU/WAU stickiness as one double division of exact
    // counts. The WAU join is day×7 fan-out over the ALREADY-aggregated
    // (day, user) pairs — the event volume never re-shuffles.
    "q_events_dau_wau" -> Q(
      (s, dir) => {
        val du = t(s, dir, "events")
          .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
        val dau = du.groupBy("d").agg(countDistinct(col("user_id")).as("dau"))
        val wau = du.select(explode(sequence(lit(0), lit(6))).as("off"),
            col("d"), col("user_id"))
          .select(date_add(col("d"), col("off")).as("d"), col("user_id"))
          .groupBy("d").agg(countDistinct(col("user_id")).as("wau"))
        dau.join(wau, "d")
          .select(col("d"), col("dau"), col("wau"),
            (col("dau").cast("double") / col("wau").cast("double")).as("stickiness"))
          .orderBy(col("d"))
      },
      Some("""WITH du AS (
             |  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
             |dau AS (SELECT d, count(DISTINCT user_id) AS dau FROM du GROUP BY 1),
             |wau AS (
             |  SELECT d + to_days(CAST(off AS INTEGER)) AS d, count(DISTINCT user_id) AS wau
             |  FROM (SELECT unnest(generate_series(0, 6)) AS off, d, user_id FROM du)
             |  GROUP BY 1)
             |SELECT d, dau, wau,
             |  CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE) AS stickiness
             |FROM dau JOIN wau USING (d) ORDER BY d""".stripMargin)),

    // ---- winsorization: robust p5/p95 clipping, exact ----
    // Feature clipping for training: per event type, values clamp to the
    // [p5, p95] band. The percentile is percentile_disc semantics
    // computed by INTEGER rank — the value at sorted position
    // ceil(q·n) — so ties and engine sort order cannot move it, and the
    // clamped sums are exact cents. One shuffle for the rank window,
    // one bounded threshold join.
    "q_events_winsorize" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("event_type"))
        val ranked = t(s, dir, "events")
          .select(col("event_type"), floor(col("value") * 100).cast("long").as("cents"))
          .withColumn("rn", row_number().over(w.orderBy(col("cents"))))
          .withColumn("n", count(lit(1)).over(w))
        val thresholds = ranked
          .filter(col("rn") === expr("(n * 5 + 99) DIV 100") ||
            col("rn") === expr("(n * 95 + 99) DIV 100"))
          .groupBy("event_type")
          .agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
        ranked.join(thresholds, "event_type")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(when(col("cents") < col("lo"), 1L).otherwise(0L)).as("n_clip_lo"),
            sum(when(col("cents") > col("hi"), 1L).otherwise(0L)).as("n_clip_hi"),
            min(col("lo")).as("p5_cents"), min(col("hi")).as("p95_cents"),
            sum(least(greatest(col("cents"), col("lo")), col("hi"))).as("sum_clipped"))
          .orderBy(col("event_type"))
      },
      Some("""WITH ranked AS (
             |  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents,
             |    row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
             |    count(*) OVER (PARTITION BY event_type) AS n
             |  FROM events),
             |th AS (
             |  SELECT event_type, min(cents) AS lo, max(cents) AS hi
             |  FROM ranked
             |  WHERE rn = (n * 5 + 99) // 100 OR rn = (n * 95 + 99) // 100
             |  GROUP BY 1)
             |SELECT event_type, count(*) AS n,
             |  CAST(sum(CASE WHEN cents < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
             |  CAST(sum(CASE WHEN cents > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
             |  min(lo) AS p5_cents, min(hi) AS p95_cents,
             |  CAST(sum(least(greatest(cents, lo), hi)) AS BIGINT) AS sum_clipped
             |FROM ranked JOIN th USING (event_type)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- distribution drift monitor: PSI between two snapshots ----
    // The data-quality gate every recurring ingest needs: bin the value
    // distribution of an early window (days 1-15) and a late window
    // (days 16+) per event type and compute the population stability
    // index Σ (p_a − p_b)·ln(p_a/p_b) — the standard drift alarm
    // (PSI > 0.2 → investigate). Laplace-smoothed counts keep empty
    // bins finite, and the ln argument is ONE exact integer ratio
    // ((a+1)(n_b+B)) / ((b+1)(n_a+B)) so the libm call rounds to 6
    // decimals before the per-bin terms (each itself rounded) sum as
    // DECIMAL — deterministic whatever the aggregation order. Scale:
    // one pass, one (type, bin) aggregate — the drift of a 100-TB day
    // against history costs a scan of the new day plus O(types × bins)
    // state, and the per-bin count table is itself a persistable
    // artifact (yesterday's histogram joins tomorrow's) ----
    "q_drift_psi" -> Q(
      (s, dir) => {
        val cut = lit("2024-01-16").cast("date")
        val binned = t(s, dir, "events")
          .select(col("event_type"),
            (to_date(col("ts")) < cut).as("early"),
            least(floor(col("value") / 10).cast("long"), lit(9L)).as("bin"))
        val counts = binned.groupBy(col("event_type"), col("bin"))
          .agg(count(when(col("early"), 1)).as("a_cnt"),
            count(when(!col("early"), 1)).as("b_cnt"))
        val totals = counts.groupBy(col("event_type"))
          .agg(sum(col("a_cnt")).as("n_a"), sum(col("b_cnt")).as("n_b"))
        val pa = (col("a_cnt") + 1).cast("double") / (col("n_a") + 10).cast("double")
        val pb = (col("b_cnt") + 1).cast("double") / (col("n_b") + 10).cast("double")
        val lnRatio = round(log(
          ((col("a_cnt") + 1) * (col("n_b") + 10)).cast("double") /
            ((col("b_cnt") + 1) * (col("n_a") + 10)).cast("double")), 6)
        val term = round((pa - pb) * lnRatio, 6)
        counts.join(totals, "event_type")
          .groupBy(col("event_type"))
          .agg(min(col("n_a")).as("n_a"), min(col("n_b")).as("n_b"),
            sum(term.cast(org.apache.spark.sql.types.DecimalType(18, 6)))
              .as("psi_dec"))
          .select(col("event_type"), col("n_a"), col("n_b"),
            col("psi_dec").cast("double").as("psi"))
          .orderBy(col("event_type"))
      },
      Some("""WITH binned AS (
             |  SELECT event_type, CAST(ts AS DATE) < DATE '2024-01-16' AS early,
             |    LEAST(CAST(floor(value / 10) AS BIGINT), 9) AS bin
             |  FROM events),
             |counts AS (
             |  SELECT event_type, bin,
             |    count(CASE WHEN early THEN 1 END) AS a_cnt,
             |    count(CASE WHEN NOT early THEN 1 END) AS b_cnt
             |  FROM binned GROUP BY 1, 2),
             |totals AS (
             |  SELECT event_type, CAST(sum(a_cnt) AS BIGINT) AS n_a,
             |    CAST(sum(b_cnt) AS BIGINT) AS n_b
             |  FROM counts GROUP BY 1)
             |SELECT event_type, min(n_a) AS n_a, min(n_b) AS n_b,
             |  CAST(sum(CAST(round(
             |    (CAST(a_cnt + 1 AS DOUBLE) / (n_a + 10) -
             |     CAST(b_cnt + 1 AS DOUBLE) / (n_b + 10)) *
             |    round(ln(CAST((a_cnt + 1) * (n_b + 10) AS DOUBLE) /
             |             CAST((b_cnt + 1) * (n_a + 10) AS DOUBLE)), 6), 6)
             |    AS DECIMAL(18,6))) AS DOUBLE) AS psi
             |FROM counts JOIN totals USING (event_type)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- hopping (sliding) window aggregates: 1h windows every 15min ----
    // The smoothing counterpart of the tumbling q_events_hourly: each
    // event lands in exactly window/slide = 4 windows, Spark's native
    // window(ts, '1 hour', '15 minutes') fans that out inside the scan
    // stage (no self-join), and the aggregate partial-collapses per
    // (window, type) — shuffle volume is O(windows × types), never 4×
    // the event volume. The oracle states the identical fan-out as an
    // explicit k ∈ [0,4) slide-bucket explode, pinning Spark's window
    // assignment arithmetic against integer epoch division ----
    "q_events_hopping" -> Q(
      (s, dir) => {
        t(s, dir, "events")
          .groupBy(window(col("ts"), "1 hour", "15 minutes").as("win"),
            col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(floor(col("value") * 100).cast("long")).as("sum_cents"))
          .select(col("win.start").as("w_start"), col("event_type"),
            col("n"), col("sum_cents"))
          .orderBy(col("w_start"), col("event_type"))
      },
      Some("""WITH ev AS (
             |  SELECT event_type, epoch_us(ts) AS us,
             |    CAST(floor(value * 100) AS BIGINT) AS cents
             |  FROM events),
             |fan AS (
             |  SELECT event_type, cents,
             |    make_timestamp(((us // 900000000) - k) * 900000000) AS w_start
             |  FROM ev CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k))
             |SELECT w_start, event_type, count(*) AS n,
             |  CAST(sum(cents) AS BIGINT) AS sum_cents
             |FROM fan GROUP BY w_start, event_type
             |ORDER BY w_start, event_type""".stripMargin)),

    // ---- MAD robust outliers: the median-based complement of the
    // 3-sigma gate (q_events_anomaly is moment-based, so one extreme
    // value inflates its own sigma and hides; the median absolute
    // deviation has a 50% breakdown point). All integer: exact cents,
    // lower-median by row_number rank (ties cannot move it), and the
    // flag |x - med| > 3 * 1.4826 * MAD cross-multiplies to
    // dev * 10000 > 44478 * mad — no float appears anywhere, so the
    // gate hash is arithmetic identity, not float luck. Two rank
    // windows per event type (same shape winsorize already pays);
    // everything after is one aggregate ----
    "q_events_mad" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("event_type"))
        val ranked = t(s, dir, "events")
          .select(col("event_type"), floor(col("value") * 100).cast("long").as("cents"))
          .withColumn("rn", row_number().over(w.orderBy(col("cents"))))
          .withColumn("n", count(lit(1)).over(w))
        val med = ranked.filter(col("rn") === expr("(n + 1) DIV 2"))
          .select(col("event_type"), col("cents").as("med"))
        gateFrames.evict(s, s"$dir#mad") // pre-persist (shared-entry rule)
        val dev = ranked.join(med, "event_type")
          .select(col("event_type"), col("cents"), col("med"),
            abs(col("cents") - col("med")).as("dev"))
          .persist()
        dev.count() // two consumers: the MAD rank pass + the flag join
        gateFrames.put(s, s"$dir#mad", dev)
        val devRanked = dev
          .withColumn("rn", row_number().over(w.orderBy(col("dev"))))
          .withColumn("n", count(lit(1)).over(w))
        val mad = devRanked.filter(col("rn") === expr("(n + 1) DIV 2"))
          .select(col("event_type"), col("dev").as("mad"))
        dev.join(mad, "event_type")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            min(col("med")).as("med_cents"), min(col("mad")).as("mad_cents"),
            sum(when(col("dev") * 10000 > col("mad") * 44478, 1L)
              .otherwise(0L)).as("n_outliers"))
          .orderBy(col("event_type"))
      },
      Some("""WITH ranked AS (
             |  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents,
             |    row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
             |    count(*) OVER (PARTITION BY event_type) AS n
             |  FROM events),
             |med AS (
             |  SELECT event_type, cents AS med FROM ranked
             |  WHERE rn = (n + 1) // 2),
             |dev AS (
             |  SELECT r.event_type, r.cents, m.med, abs(r.cents - m.med) AS dev
             |  FROM ranked r JOIN med m USING (event_type)),
             |devr AS (
             |  SELECT event_type, dev,
             |    row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
             |    count(*) OVER (PARTITION BY event_type) AS n
             |  FROM dev),
             |mad AS (
             |  SELECT event_type, dev AS mad FROM devr
             |  WHERE rn = (n + 1) // 2)
             |SELECT d.event_type, count(*) AS n,
             |  min(d.med) AS med_cents, min(m.mad) AS mad_cents,
             |  CAST(sum(CASE WHEN d.dev * 10000 > m.mad * 44478
             |                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
             |FROM dev d JOIN mad m USING (event_type)
             |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin)),

    // ---- time-decayed engagement scoring, exact ----
    // Recency weighting without a single float: age buckets by 7-day
    // half-life from the corpus max timestamp (a deterministic anchor —
    // wall clock would unpin the oracle), and the decay is an integer
    // right-shift of exact cents: weight halves per bucket, sums are
    // BIGINT, order-independent. One map pass + one user_id aggregate.
    "q_events_decay" -> Q(
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("user_id"), unix_micros(col("ts")).as("us"),
            floor(col("value") * 100).cast("long").as("cents"))
        val maxUs = ev.agg(max(col("us"))).head().getLong(0)
        val weekUs = 7L * 86400L * 1000000L
        ev.select(col("user_id"),
            col("cents"), ((lit(maxUs) - col("us")) / weekUs).cast("long").as("age_w"))
          .select(col("user_id"),
            // Clamp the bucket: Java shifts mask the amount to 6 bits, so an
            // unclamped age_w >= 64 would wrap (cents >> 64 == cents) while the
            // oracle's shift does not. 63 already floors positive cents to 0.
            expr("shiftright(cents, CAST(least(age_w, 63) AS INT))").as("dec"), col("cents"))
          .groupBy("user_id")
          .agg(sum(col("dec")).as("decayed_cents"),
            sum(col("cents")).as("raw_cents"), count(lit(1)).as("n_events"))
          .orderBy(col("user_id"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, epoch_us(ts) AS us,
             |    CAST(floor(value * 100) AS BIGINT) AS cents
             |  FROM events),
             |aged AS (
             |  SELECT user_id, cents,
             |    ((SELECT max(us) FROM ev) - us) // 604800000000 AS age_w
             |  FROM ev)
             |SELECT user_id,
             |  CAST(sum(cents >> LEAST(age_w, 63)) AS BIGINT) AS decayed_cents,
             |  CAST(sum(cents) AS BIGINT) AS raw_cents,
             |  count(*) AS n_events
             |FROM aged GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- event-transition matrix (Markov "paths" primitive) ----
    // For each user's time-ordered event stream, count (from → to)
    // adjacent transitions corpus-wide and report each row's share of
    // its from-state (single division of exact counts). One user_id
    // shuffle for the lag window + one bounded aggregate (|types|²
    // cells); ties on (ts, event_id) are ordered by the unique event_id
    // so both engines see the same adjacency.
    "q_events_transitions" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val t2 = t(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
        t2.withColumn("from_total",
            sum(col("n")).over(Window.partitionBy(col("from_type"))))
          .select(col("from_type"), col("to_type"), col("n"),
            (col("n").cast("double") / col("from_total").cast("double")).as("share"))
          .orderBy(col("from_type"), col("to_type"))
      },
      Some("""WITH seq AS (
             |  SELECT event_type AS from_type,
             |    lead(event_type, 1) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS to_type
             |  FROM events),
             |m AS (SELECT from_type, to_type, count(*) AS n FROM seq
             |      WHERE to_type IS NOT NULL GROUP BY 1, 2)
             |SELECT from_type, to_type, n,
             |  CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE) AS share
             |FROM m ORDER BY from_type, to_type""".stripMargin)),

    // ---- weighted PageRank over the nation trade graph, exact ----
    // Iterative graph computation as repeated join+aggregate — the BSP
    // shape GraphX/Pregel lowers to, expressed so Catalyst plans each
    // superstep. Edges: customer-nation → supplier-nation weighted by
    // lineitem count (one wide join pass, aggregated before anything
    // iterates; persisted because 3 supersteps + marginals reuse it).
    // Ranks live in integer units of 1e-12 and every update is BIGINT
    // floor arithmetic — (r·w) DIV wout, 85·Σ DIV 100 — so the result
    // is bit-identical across engines and iteration order: no float
    // sum-order anywhere. At 100 TB the edge build dominates (the
    // iteration space is |nodes|); ranks broadcast to the edge join per
    // superstep. DECIMAL(38) is the headroom knob if r·w ever nears
    // 2^63 (r ≤ 1e12 · w ≤ 1e6 here).
    "q_graph_pagerank" -> Q(
      (s, dir) => {
        prCaches.evict(s, dir)
        val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
        val ords = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        val cust = t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
        val supp = t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
        // pre-aggregate the fact side BEFORE the orderkey shuffle: after
        // the (planner-chosen) supplier join, lineitem collapses to one
        // row per (order, supplier-nation) with a count — partial
        // aggregation runs map-side, so the wide exchange carries the
        // aggregated rows, not every lineitem. customer/supplier joins
        // stay hint-free (they grow with scale; AQE broadcasts at test SF)
        val liAgg = li
          .join(supp, col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("l_orderkey"), col("s_nationkey"))
          .agg(count(lit(1)).as("cnt"))
        val edges = liAgg
          .join(ords, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey").cast("long").as("src"),
            col("s_nationkey").cast("long").as("dst"))
          .agg(sum(col("cnt")).as("w"))
          .persist()
        val nodes = edges.select(col("src").as("nk"))
          .unionAll(edges.select(col("dst").as("nk"))).distinct().persist()
        val n = nodes.count() // one action settles edges + nodes
        // (edges JOIN wout) is superstep-INVARIANT: hoist and pin it so
        // the three unrolled iterations read one |edges|-bounded cached
        // frame instead of re-deriving the join inside each superstep
        val wout = edges.groupBy("src").agg(sum(col("w")).as("wout"))
        val ew = edges.join(wout, "src").persist()
        ew.count() // settle before the supersteps fork it
        prCaches.put(s, dir, Seq(edges, nodes, ew))
        var ranks = nodes.select(col("nk"), lit(1000000000000L / n).as("r"))
        for (_ <- 1 to 3) {
          val contrib = ew
            .join(ranks, col("src") === col("nk"))
            .select(col("dst"), expr("(r * w) DIV wout").as("c"))
            .groupBy("dst").agg(sum(col("c")).as("c"))
          ranks = nodes.join(contrib, col("nk") === col("dst"), "left_outer")
            .select(col("nk"),
              (lit(150000000000L / n) + expr("(85 * coalesce(c, CAST(0 AS BIGINT))) DIV 100")).as("r"))
        }
        ranks.select(col("nk").as("nation"), col("r").as("rank_units"))
          .orderBy(col("rank_units").desc, col("nation"))
      },
      Some {
        def iter(prev: String, i: Int) =
          s"""r$i AS (
             |  SELECT no.nk, 150000000000 // nn.n
             |      + (85 * coalesce(sc.c, 0)) // 100 AS r
             |  FROM nodes no CROSS JOIN nn
             |  LEFT JOIN (SELECT e.dst AS nk,
             |               CAST(sum((r.r * e.w) // wo.wout) AS BIGINT) AS c
             |             FROM edges e JOIN $prev r ON e.src = r.nk
             |             JOIN wout wo ON e.src = wo.src
             |             GROUP BY 1) sc ON no.nk = sc.nk)""".stripMargin
        s"""WITH edges AS (
           |  SELECT CAST(c_nationkey AS BIGINT) AS src,
           |    CAST(s_nationkey AS BIGINT) AS dst, count(*) AS w
           |  FROM lineitem
           |  JOIN orders ON l_orderkey = o_orderkey
           |  JOIN customer ON o_custkey = c_custkey
           |  JOIN supplier ON l_suppkey = s_suppkey
           |  GROUP BY 1, 2),
           |nodes AS (SELECT src AS nk FROM edges UNION SELECT dst FROM edges),
           |nn AS (SELECT count(*) AS n FROM nodes),
           |wout AS (SELECT src, CAST(sum(w) AS BIGINT) AS wout FROM edges GROUP BY 1),
           |r0 AS (SELECT nk, 1000000000000 // n AS r FROM nodes CROSS JOIN nn),
           |${iter("r0", 1)},
           |${iter("r1", 2)},
           |${iter("r2", 3)}
           |SELECT nk AS nation, CAST(r AS BIGINT) AS rank_units
           |FROM r3 ORDER BY rank_units DESC, nation""".stripMargin
      })
  )

  // previous invocation's persisted edge/node frames, swept on re-entry
  // (same retention discipline as Dedup.lshCaches)
  private val prCaches = GateCache.frames()

  // per-gate persisted intermediates (instance/bigram/deviation passes),
  // one retained generation per (session, corpus, gate) — previously bare
  // persist() calls that relied on the ContextCleaner's GC timing to
  // release blocks; the GateCache evict-on-reentry keeps retention
  // deterministic (see GateCache.scala)
  private val gateFrames = GateCache.frame()
}
