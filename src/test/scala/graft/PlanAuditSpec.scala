package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the plan properties the engine's scale story depends on — a
  * regression here would still pass the value gates but ship a plan that
  * falls over at 100x data.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def physical(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  private def analyzed(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.analyzed.toString

  test("filters and projections reach the parquet scan") {
    val plan = physical("q_proj_filter")
    assert("PushedFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined,
      s"no pushed filters in:\n$plan")
    // column pruning: the scan must not read columns the query never uses
    assert(!plan.contains("l_comment"), "scan reads an unused column")
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    assert(physical("q_topk").contains("TakeOrderedAndProject"))
  }

  test("aggregation is partial (map-side combine) before the shuffle") {
    val plan = physical("q1_agg")
    assert("partial_".r.findFirstIn(plan).isDefined,
      s"no partial aggregation in:\n$plan")
  }

  test("dedup pipelines carry no broadcast hints (planner stays free to pick)") {
    // an explicit broadcast() pins a corpus-proportional build side at any
    // scale; these plans must leave the join strategy to cost + AQE
    for (q <- Seq("q_dedup_lsh", "q_dedup_embedding", "q_dedup_incremental")) {
      assert(!analyzed(q).contains("ResolvedHint"),
        s"$q still carries a broadcast hint")
    }
  }

  test("incremental dedup and the leakage-safe split carry no products") {
    // the prior-vs-fresh stages must stay equi-joins on hashes/band keys —
    // a cartesian or nested-loop anywhere here is the O(N·increment)
    // failure the banding exists to prevent
    for (q <- Seq("q_dedup_incremental", "q_split_leakage_safe")) {
      val plan = physical(q)
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoop"),
        s"$q plans a product join:\n$plan")
    }
  }

  test("gopher gate and shard export stay map-side until their one shuffle") {
    // q_quality_gopher: per-row flags, so the only exchange is the gate's
    // final order — a second exchange means per-doc work leaked into a
    // shuffle. q_shard_export: the shard agg must combine map-side
    // (partial_) so the exchange carries ~16 rows per input partition,
    // not one row per document.
    val gopher = physical("q_quality_gopher")
    assert("Exchange".r.findAllIn(gopher).length <= 1,
      s"q_quality_gopher shuffles more than the final order:\n$gopher")
    val shard = physical("q_shard_export")
    assert("partial_".r.findFirstIn(shard).isDefined,
      s"no map-side combine in q_shard_export:\n$shard")
    assert(!shard.contains("text"), "shard export reads the text column")
  }

  test("q13/q21 keep the reduce-before-join discipline, no products") {
    // q13: orders partial-aggregates to one row per custkey BEFORE the
    // left join with customer — the count must combine map-side
    val q13 = physical("q_tpch_q13")
    assert("partial_count".r.findFirstIn(q13).isDefined,
      s"q13 joins unaggregated orders:\n$q13")
    // q21: the EXISTS/NOT EXISTS pair must decorrelate into the one
    // per-orderkey aggregate — a surviving correlated subquery would
    // plan a nested-loop or cartesian against the fact table
    val q21 = physical("q_tpch_q21")
    for (p <- Seq(q13, q21)) {
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoop"), s"product join in:\n$p")
    }
    assert(q21.contains("TakeOrderedAndProject"),
      s"q21 top-100 plans a global sort:\n$q21")
  }

  test("headline plans keep whole-stage codegen after AQE finalizes") {
    // EXPLAIN.md's census reads the pre-AQE plan string, where codegen
    // spans show as 0 — this pin runs the query and asserts the FINAL
    // adaptive plan fuses its hot path into WholeStageCodegen stages
    // (a non-codegen Expression creeping into a hot pipeline would
    // split or drop these spans)
    for (q <- Seq("q_tpch_q18", "q_tpch_q17", "q_text_tfidf",
        "q_text_collocations", "q_sketch_cms",
        "q_tpch_q9_shape", "q_tpch_q2_shape")) {
      val df = SparkEntry.queries(q)(spark, dir)
      df.collect() // settle AQE so executedPlan is the final plan
      val plan = df.queryExecution.executedPlan.toString
      // WholeStageCodegenExec renders as a `*(id)` operator prefix in the
      // plan string; distinct ids = fused codegen stages
      val spans = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan)
        .map(_.group(1)).toSet.size
      assert(plan.contains("isFinalPlan=true"),
        s"$q did not finalize adaptively:\n${plan.take(400)}")
      assert(spans >= 2,
        s"$q has only $spans WholeStageCodegen spans post-AQE:\n$plan")
    }
  }

  test("q6 is pure pushdown: no join, one exchange, predicates at the scan") {
    val plan = physical("q_tpch_q6")
    assert(!plan.contains("Join"), s"q6 plans a join:\n$plan")
    assert("Exchange".r.findAllIn(plan).length <= 1,
      s"q6 shuffles more than the final aggregate:\n$plan")
    assert("PushedFilters: \\[[^\\]]*l_shipdate".r.findFirstIn(plan).isDefined,
      s"q6 date band not pushed:\n$plan")
  }

  test("q7's directional region predicate derives into both nation scans") {
    // Catalyst must turn ((r1=0 AND r2=1) OR (r1=1 AND r2=0)) into a
    // per-copy Or(n_regionkey=0, n_regionkey=1) filter PUSHED into each
    // role-playing nation scan — losing that derivation would carry every
    // nation row into the join
    val plan = physical("q_tpch_q7")
    assert("Or\\(EqualTo\\(n_regionkey,[01]\\),EqualTo\\(n_regionkey,[01]\\)\\)".r
      .findAllIn(plan).length >= 2,
      s"region disjunction not derived into both nation scans:\n$plan")
  }

  test("q15's per-supplier aggregate is cached for its two consumers") {
    // the 1-row max frame and the main branch both read the persisted
    // aggregate — an uncached plan scans+aggregates filtered lineitem
    // twice (the shape EXPLAIN.md's first capture showed)
    // both consumers must read the cache (InMemoryTableScan ×2); the
    // lineitem FileScan lines in the plan text live INSIDE the printed
    // InMemoryRelation descriptions (the cached child), not as live scans
    val plan = physical("q_tpch_q15")
    assert("InMemoryTableScan".r.findAllIn(plan).length >= 2,
      s"q15 re-derives the per-supplier aggregate:\n$plan")
  }

  test("token budget windows over the source key, not a single partition") {
    // an empty-frame/global window (`Window.orderBy` without partitionBy)
    // funnels the whole corpus through ONE task — the classic window
    // scale-killer this op must never regress into
    val plan = physical("q_sample_token_budget")
    assert(!plan.contains("SinglePartition"),
      s"q_sample_token_budget plans a single-partition window:\n$plan")
    // the de-skew contract: the doc-level running sum (ordered by the
    // doc hash h) must partition by (source, bucket) — a window spec
    // that orders by h but partitions by source alone is the skew
    // straggler (one reducer sorts a whole 60%-of-corpus source). The
    // tiny prefix-sum window over the (source, bucket) aggregate orders
    // by b, not h, so this regex isolates the doc-level window exactly.
    assert("windowspecdefinition\\(source#\\d+, h#".r.findFirstIn(plan).isEmpty,
      s"doc-level window partitions by source alone (skew straggler):\n$plan")
    assert("windowspecdefinition\\(source#\\d+, b#\\d+L?, h#".r
      .findFirstIn(plan).isDefined,
      s"doc-level window is not bucket-partitioned:\n$plan")
  }

  test("q20 shape decorrelates: one lineitem pass, no correlated re-scan") {
    // the agg-threshold semi-join chain must come from ONE aggregate over
    // lineitem that yields both the surrogate (part,supp) pairs and the
    // banded quantity — a second lineitem scan (or any product join)
    // means the correlated subquery survived, the quadratic failure the
    // decorrelation exists to prevent
    val plan = physical("q_tpch_q20_shape")
    assert("FileScan[^\\n]*lineitem".r.findAllIn(plan).length == 1,
      s"q20 shape scans lineitem more than once:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"q20 shape plans a product join:\n$plan")
  }

  test("q11 shape caches the per-part aggregate for both consumers") {
    // the global scalar and the HAVING branch must read the persisted
    // per-part value frame (q15 discipline) — uncached, the distinct over
    // lineitem pairs runs twice
    val plan = physical("q_tpch_q11_shape")
    assert("InMemoryTableScan".r.findAllIn(plan).length >= 2,
      s"q11 shape re-derives the per-part aggregate:\n$plan")
    // the only nested-loop allowed is the 1-row global-scalar crossJoin
    // (the q15/q22 pattern); a real cartesian is still a failure
    assert(!plan.contains("CartesianProduct"),
      s"q11 shape plans a cartesian:\n$plan")
  }

  test("ivfpq rerank reads full vectors only behind the candidate join") {
    // two-stage retrieval contract: stage 1 truncates the codes-only ADC
    // ranking to C=50 candidates (TakeOrdered, never a global sort), the
    // candidate set broadcasts, and the exact distance is computed ABOVE
    // the join — i.e. on ≤C joined rows, never as a second vector sweep
    val plan = physical("q_knn_ivfpq_rerank")
    assert(plan.contains("TakeOrderedAndProject(limit=50"),
      s"stage-1 candidate truncation is not a TakeOrdered:\n$plan")
    assert(plan.contains("TakeOrderedAndProject(limit=10"),
      s"final top-k is not a TakeOrdered:\n$plan")
    val bhj = plan.indexOf("BroadcastHashJoin")
    assert(bhj >= 0, s"candidate set does not broadcast:\n$plan")
    val exactAt = plan.indexOf("exact_dist#")
    assert(exactAt >= 0 && exactAt < bhj,
      s"exact distance is computed below the candidate join:\n$plan")
    val bx = plan.indexOf("BroadcastExchange")
    assert(bx > bhj && plan.indexOf("TakeOrderedAndProject(limit=50") > bx,
      s"broadcast build side is not the C-row candidate frame:\n$plan")
  }

  test("attached two-stage kNN SQL: one vectors pass, TakeOrdered at both " +
      "truncations, heavy scans touch only code/centroid bytes") {
    // the module-SQL twin of the rerank gate — the exact text a named
    // query runs over the ATTACHED index views (ServerSpec's twoStageSql,
    // here against the artifact paths directly since views are
    // stream-scoped). Scale contract:
    //  - the vectors fileset appears in exactly ONE FileScan: the stage-2
    //    fetch behind the ≤C candidate set — the ADC stage ranks from the
    //    codes fileset alone (4 longs/vector — PQ's memory story; the
    //    cell filter bounds the CANDIDATE work, and at operator level
    //    cells are partition directories, so a collected-cell probe reads
    //    one directory — module SQL's scalar-subquery form trades that
    //    file-level prune for staying fully declarative)
    //  - both truncations compile to TakeOrderedAndProject, never a
    //    global Sort
    import org.apache.spark.sql.functions._
    val idx = graft.TempDirs.create("graft-planvec").toString
    graft.queries.Similarity.buildVectorIndex(spark, dir, idx)
    val qvec = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") === 7)
      .select(transform(col("embedding"),
        x => floor(x.cast("double") * 64 + lit(0.5)).cast("long")).as("v"))
      .head().getSeq[Long](0).mkString(",")
    val df = spark.sql(graft.queries.Similarity.twoStageKnnSql(
      graft.queries.Similarity.artifactRelation(idx), s"'$qvec'", "10"))
    assert(df.head().getLong(0) == 7L && df.head().getLong(2) == 0L)
    val plan = df.queryExecution.executedPlan.toString
    assert("FileScan parquet [^\\n]*/vectors".r.findAllIn(plan).size == 1,
      s"vectors must be scanned exactly once (the stage-2 fetch):\n$plan")
    assert(plan.contains("TakeOrderedAndProject(limit=50"),
      s"stage-1 candidate truncation is not a TakeOrdered:\n$plan")
    assert(plan.contains("TakeOrderedAndProject(limit=10"),
      s"final top-k is not a TakeOrdered:\n$plan")
  }

  test("q2/q9/q16/q12 shapes: decorrelated, product-free, bounded windows") {
    // q2: the correlated min-cost subquery decorrelates into a window MIN
    // partitioned by partkey — one lineitem pass, never a join-back
    // re-scan, and never a single-partition window
    val q2 = physical("q_tpch_q2_shape")
    assert("FileScan[^\\n]*lineitem".r.findAllIn(q2).length == 1,
      s"q2 shape scans lineitem more than once:\n$q2")
    assert(!q2.contains("SinglePartition"),
      s"q2 shape plans a single-partition window:\n$q2")
    // q9's two-key fact⋈partsupp join, q16's NOT-IN anti-join and q12's
    // derived-predicate chain must all stay equi-joins
    for (q <- Seq("q_tpch_q2_shape", "q_tpch_q9_shape",
        "q_tpch_q16_shape", "q_tpch_q12_shape")) {
      val p = physical(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoop"), s"$q plans a product join:\n$p")
    }
    assert(physical("q_tpch_q16_shape").contains("LeftAnti"),
      "q16 shape lost its NOT-IN anti-join")
  }

  test("composed curation pipeline: quota limited map-side, no products, " +
    "bounded corpus scans") {
    // the four-stage chain must not multiply corpus passes: quality +
    // dedup + decontamination + quota compile into a bounded number of
    // documents scans (the gram stages legitimately re-read text), the
    // per-source quota's rank filter stays a map-side WindowGroupLimit
    // (≤10 rows per source per partition cross the exchange), and no
    // stage degenerates into a product join
    val p = physical("q_pipeline_e2e")
    assert(p.contains("WindowGroupLimit"),
      s"quota rank filter lost its map-side group limit:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"),
      s"pipeline plans a product join:\n$p")
    val scans = "FileScan parquet[^\\n]*documents".r.findAllIn(p).size
    assert(scans <= 5, s"pipeline re-reads documents $scans times:\n$p")
  }

  test("increment-vs-index scans the index artifacts, never prior text") {
    // the persisted-index contract: once the prior corpus is indexed, an
    // increment's plan reads the index parquet (fp/bands/shingles) and the
    // increment itself — the prior corpus text never appears in any scan.
    // Source and index live at distinct paths here so the assertion is
    // exact.
    import org.apache.spark.sql.functions._
    val priorDir = graft.TempDirs.create("graft-audit-prior").toString
    val freshDir = graft.TempDirs.create("graft-audit-fresh").toString
    val idxDir = graft.TempDirs.create("graft-audit-idx").toString
    val base = spark.range(200).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 until 12).map(i =>
        md5(concat(col("id"), lit(i)))): _*).as("text"))
    base.write.mode("overwrite").parquet(priorDir)
    base.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000).as("doc_id"), col("text"))
      .write.mode("overwrite").parquet(freshDir)
    graft.queries.Dedup.buildDedupIndex(
      spark, spark.read.parquet(priorDir), idxDir)
    // the PLANNED (lazy) variant: the public API checkpoints eagerly,
    // which would replace every scan with a LogicalRDD before the audit
    val (out, restArr) = graft.queries.Dedup.incrementVsIndexPlanned(
      spark, spark.read.parquet(freshDir), idxDir)
    // the optimized logical plan (AQE hides physical scans behind the
    // adaptive wrapper): every surviving source relation with its path
    val scans = out.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case hfs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            hfs.location.rootPaths.map(_.toString)
          case _ => Seq.empty[String]
        }
    }.flatten
    assert(scans.exists(_.contains(idxDir)),
      s"no index-artifact scan in: $scans")
    assert(scans.exists(_.contains(freshDir)),
      s"no increment scan in: $scans")
    assert(!scans.exists(_.contains(priorDir)),
      s"the prior corpus text is scanned — the index is not being " +
        s"reused: $scans")
    // and the verdicts are right: every 5th doc is an exact dup
    val rows = out.collect().map(r =>
      r.getLong(0) -> r.getString(1)).toMap
    assert(rows.values.forall(_ == "exact"))
    restArr.unpersist(false)
  }

  test("LSH signature build is map-only: no exchange anywhere in the pass") {
    // per-doc shingle-hash arrays assemble in-row (transform + md5_60 +
    // distinct + sort); an Exchange creeping back in means shingles are
    // being shuffled again — the round-5 regression this pin forbids
    val plan = graft.queries.Dedup.shingleHashArr(spark, 5, 2)(
      graft.queries.Dedup.corpus(spark, dir))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"shingle pass shuffles:\n$plan")
  }

  test("knn join's per-query top-k is limited map-side before the shuffle") {
    // InferWindowGroupLimit must split the rank filter into Partial (map
    // side) + Final — without it the qid exchange carries all N·Q scored
    // pairs instead of O(queries · k) survivors per partition
    val plan = physical("q_knn_join")
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      s"no partial window group limit in:\n$plan")
  }

  test("curriculum quota window is limited map-side before the bucket " +
    "exchange") {
    // the literal rk <= 32 conjunct (max quota) is what lets
    // InferWindowGroupLimit insert the Partial top-32 per bucket — the
    // bucket-dependent 8·bucket bound alone would ship the whole corpus
    // into 4 window tasks
    val plan = physical("q_sample_curriculum")
    assert("WindowGroupLimit[^\n]*Partial".r.findFirstIn(plan).isDefined,
      s"no partial window group limit in:\n$plan")
  }

  test("sequence packing shuffles once on grp and sorts within partitions") {
    val plan = physical("q_pack_sequences")
    // one hashpartitioning exchange for grp; the per-group scan order comes
    // from a partition-local sort, never a global one
    assert(plan.contains("hashpartitioning(grp"), s"no grp exchange:\n$plan")
    assert("Sort \\[grp[^\\n]*\\], false".r.findFirstIn(plan).isDefined,
      s"no partition-local sort:\n$plan")
  }

  test("funnel is one aggregation pass: no self-joins over the event log") {
    val plan = physical("q_events_funnel")
    assert(!plan.contains("Join"), s"funnel plans a join:\n$plan")
    assert("partial_".r.findFirstIn(plan).isDefined,
      s"no partial aggregation in:\n$plan")
    // the scan reads only what the funnel needs — not value/props
    assert(!plan.contains("props") && !plan.contains("value"),
      "funnel scan reads unused event columns")
  }

  test("retention and collocations partial-aggregate before their shuffles") {
    for (q <- Seq("q_events_retention", "q_text_collocations")) {
      assert("partial_".r.findFirstIn(physical(q)).isDefined,
        s"$q has no map-side combine")
    }
  }

  test("zorder key is computed in the scan stage (no join, pruned columns)") {
    val plan = physical("q_zorder")
    assert(!plan.contains("Join"), s"zorder plans a join:\n$plan")
    assert(!plan.contains("o_comment"), "zorder scan reads unused columns")
  }

  test("kmeans assignment is a map-only pass over broadcast-free literals") {
    // centroids ride in the expression tree as literals, so the scored
    // scan must contain neither a join nor a broadcast exchange
    val plan = physical("q_emb_kmeans")
    assert(!plan.contains("Join"), s"kmeans assignment joins:\n$plan")
    assert(!plan.contains("BroadcastExchange"),
      s"kmeans assignment broadcasts:\n$plan")
  }

  test("bloom decontamination broadcasts the bit set, never the train side") {
    // the filter side is bounded by 2^16 bits regardless of benchmark
    // size — it MUST broadcast; the train gram stream must not
    val plan = physical("q_decontaminate_bloom")
    assert(plan.contains("BroadcastExchange"),
      s"bloom bit set not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"bloom decontamination degenerated to a product join:\n$plan")
  }

  test("substring-span dedup joins only on window hashes (no products, " +
    "partial-aggregated)") {
    val plan = physical("q_dedup_substring")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"substring dedup plans a product join:\n$plan")
    assert("partial_".r.findFirstIn(plan).isDefined,
      s"window-hash dup count has no map-side combine:\n$plan")
  }

  test("tfidf carries no broadcast hint — the vocabulary join stays " +
    "planner-chosen") {
    assert(!analyzed("q_text_tfidf").contains("ResolvedHint"),
      "tfidf pins a broadcast on the df side")
  }

  test("unigram surprisal joins on the token and partial-aggregates") {
    // the count-table join must stay a planner-chosen equi-join (the
    // vocabulary grows with the corpus — pinning a broadcast would OOM
    // at web scale) and the token counts must combine map-side
    val plan = physical("q_text_unigram_lp")
    assert(!analyzed("q_text_unigram_lp").contains("ResolvedHint"),
      "unigram LP pins a broadcast on the vocabulary")
    assert("partial_".r.findFirstIn(plan).isDefined,
      s"no map-side combine in q_text_unigram_lp:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      "the 1-row total must broadcast, not cartesian")
  }

  test("pagerank supersteps join pre-aggregated edges, not raw lineitem") {
    // the edge build pays the wide join ONCE; each superstep joins the
    // ~|nations|² aggregated edge table (InMemoryRelation after persist)
    val plan = physical("q_graph_pagerank")
    val scanCount = "Scan parquet".r.findAllIn(plan).length
    assert(plan.contains("InMemoryTableScan") || scanCount <= 5,
      s"supersteps re-scan base tables:\n$plan")
  }

  test("range window partitions by user (no global single-partition frame)") {
    val plan = physical("q_window_range_time")
    assert(plan.contains("hashpartitioning(user_id"),
      s"range window not partitioned by user_id:\n$plan")
  }

  test("tpch q3 flagship: filters pushed, customer broadcast, top-10 as " +
    "TakeOrderedAndProject") {
    val plan = physical("q_tpch_q3")
    assert(plan.contains("TakeOrderedAndProject"), s"global sort in:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast dim join:\n$plan")
    assert("PushedFilters: \\[[^\\]]".r.findAllIn(plan).size >= 2,
      s"date/segment filters not pushed:\n$plan")
    assert(!plan.contains("l_comment") && !plan.contains("o_orderpriority"),
      "q3 scans unused columns")
  }

  test("broadcast hints appear ONLY on provably bounded sides") {
    // every hinted side must be bounded by construction, independent of
    // data volume: nation/region (fixed), single/“few”-row stats frames,
    // the ≤64K bloom bit set, O(cells·d) centroid tables, the bounded
    // query batch. A new hint on a scale-growing side (customer,
    // supplier, corpus text, vocabulary…) fails this audit by showing
    // up as an unexpected name.
    val expected = Set(
      "q_join_multi",        // nation + region
      "q_group_concat",      // region
      "q_tpch_q5",           // nation + region
      "q_tpch_q21",          // nation (25 rows forever)
      "q_tpch_q22",          // 1-row (sum, count) stats frame
      "q_tpch_q7",           // two role-playing nation copies
      "q_tpch_q8",           // nation x2 + region
      "q_tpch_q15",          // 1-row max-revenue frame
      "q_quantile_sketch",   // 1-row bounds + 3-row percentiles
      "q_above_avg",         // 1-row global average
      "q_events_anomaly",    // per-type stats (bounded by |types|)
      "q_decontaminate_bloom", // ≤64K set-bit rows
      "q_knn_brute",
      "q_knn_matryoshka",    // 1-row query prefix/full vector frame
      "q_knn_ivf", "q_knn_ivf2", "q_knn_lsh", // query vec + cells
      "q_knn_join",          // bounded query batch
      "q_emb_outliers",      // |labels|·d centroid sums + per-label stats
      "q_sample_token_budget", // ≤ sources·64 bucket-offset rows (sources
                              // are the bounded mixture-spec labels)
      "q_tpch_q20_shape",    // nation (region-filtered, ≤25 rows)
      "q_tpch_q11_shape",    // nation + the 1-row global-value frame
      "q_knn_ivfpq_rerank",  // the C=50-row ADC candidate frame
      "q_tpch_q2_shape",     // region-filtered nation (≤25 rows)
      "q_tpch_q9_shape",     // nation (25 rows forever)
      "q_sample_dsir",       // ≤256-row hashed-bucket ratio table
      "q_sample_dsir_gumbel", // same ratio table (shared dsirScores)
      "q_sample_dsir_target", // same ratio table, re-targeted binding
      "q_quality_classifier", // 256-row hashed-feature weight table
      "q_hybrid_rrf",        // 1-row query vector + norm
      "q_hybrid_rrf_ivf",    // ivfTopK's query-dim/best-cell/query-vec frames
      "q_hybrid_indexed",    // same ivfTopK frames (the shared vector leg)
      "q_retrieval_context_pack", // packs the same shared fused frame
      "q_mixture_doremi",    // 1-row totals/min/sum frames (domain table
                             // is bounded by the mixture-spec labels)
      "q_mixture_doremi_apply", // the same frames + the 20-row quota table
      "q_mixture_indexed",   // the same 1-row frames over the artifact fold
      "q_mixture_delete",    // same fold, post-negative-batch (delete gate)
      "q_mixture_asof",      // same fold pinned to the pre-delete commit
      "q_dedup_semantic",    // labels·d centroid arrays (q_emb_outliers bound)
      "q_tokenizer_encode",  // vocab-bounded (word → piece count) table
      "q_tokenizer_segments", // same pieces artifact, under the same cap
      "q_mining_hard_negatives", // bounded anchor batch + 1-row-per-anchor
                              // d5 threshold table (the q_knn_join bound)
      "q_mining_hard_negatives_ivf" // anchor dim/label batch + per-anchor
                              // probed-cell table (anchors-bounded)
    )
    val actual = HintAuditHelper.hinted(spark, dir)
    assert(actual == expected,
      s"hinted-query set drifted:\n  unexpected: ${(actual -- expected).toSeq.sorted}" +
        s"\n  missing: ${(expected -- actual).toSeq.sorted}")
  }

  test("bucketed co-located join runs with NO exchange on either side") {
    // the q_join_bucketed scale claim: co-bucketed layouts turn the
    // fact-fact shuffle into a per-bucket zip. Broadcast is disabled so
    // small-SF data cannot hide a shuffle behind a broadcast pick — the
    // surviving plan must be a SortMergeJoin over the bucketed scans
    // with no Exchange anywhere in the join subtree.
    graft.queries.Relational.ensureBucketed(spark, dir)
    val l = spark.table(graft.queries.Relational.bucketedName(dir, "lineitem"))
    val o = spark.table(graft.queries.Relational.bucketedName(dir, "orders"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      val j = l.join(o, l("l_orderkey") === o("o_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"not a sort-merge join:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // the join itself is verified by the gate's oracle; here just pin
      // that the exchange-free plan produces the full row count
      val lc = Tables.df(spark, dir, "lineitem").count()
      assert(j.count() == lc, "bucketed join dropped rows")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("cms sketch folds from the cached vocabulary table, not the corpus") {
    // both the counter grid and the probe must aggregate the persisted
    // (bigram, cnt) table — the corpus tokenize pass runs once and every
    // downstream consumer reads the cache (vocab-sized rows), so the
    // sketch is a second-level aggregate, never a 4x re-shuffle of
    // instance volume
    val plan = physical("q_sketch_cms")
    assert(plan.contains("InMemoryTableScan"),
      s"cms consumers re-derive the count table instead of reading the cache:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"cms probe plans a product:\n$plan")
  }

  test("day-partitioned layout prunes whole partitions, not rows") {
    // the q_layout_partition_prune claim: the one-day predicate resolves
    // against directory names at planning time — it must appear as a
    // PartitionFilter on the scan, and no residual ts/data filter may
    // remain (that would mean the scan still opens all 30 days)
    val plan = physical("q_layout_partition_prune")
    assert("PartitionFilters: \\[[^\\]]*day[^\\]]*=[^\\]]*\\]".r
      .findFirstIn(plan).isDefined,
      s"day predicate did not become a partition filter:\n$plan")
    assert(!plan.contains("PushedFilters: [IsNotNull(ts)"),
      s"scan still filters rows by ts:\n$plan")
  }

  test("fixed-k uniform sample compiles to TakeOrderedAndProject") {
    // the q_sample_uniform_k scale claim: per-partition O(k) heaps + a
    // P*k driver merge — a global Sort node here means the 100-TB corpus
    // sorts to pick 100 rows
    val plan = physical("q_sample_uniform_k")
    assert(plan.contains("TakeOrderedAndProject"),
      s"uniform-k sample plans a global sort:\n$plan")
  }

  test("idx range scans prune by parquet min/max stats") {
    // rawGetEvents filters land in the scan as pushed gte/lte on idx
    val store = new graft.stream.StreamStore(spark,
      graft.TempDirs.create("graft-plan").toString)
    val h = store.open("did:test:planaudit")
    val plan = h.rawGetEvents(10, 20).queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(idx,10)") &&
      plan.contains("LessThanOrEqual(idx,20)"),
      s"idx range not pushed:\n$plan")
  }
}
