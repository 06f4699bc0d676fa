package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral invariants of the sampling/robust-stats/flagship gates —
  * the oracle proves cross-engine equality; these pin the semantics.
  */
class GatesSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.queries(name)(spark, dir).collect()

  test("domain quota: never more than 10 docs per source, ranks dense") {
    val rows = run("q_sample_domain_quota").map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, rs) =>
      assert(rs.length <= 10, s"source $src kept ${rs.length} docs")
      assert(rs.map(_._3).sorted.sameElements(1L to rs.length),
        s"source $src ranks not dense")
    }
    // determinism: the same survivors on a rerun
    val again = run("q_sample_domain_quota").map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == again.toSeq)
  }

  test("gopher gate: keep is the conjunction of its audit flags") {
    val rows = SparkEntry.queries("q_quality_gopher")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5), r.getBoolean(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nw, mw, okWc, okMean, okMax, keep) =>
      assert(keep == (okWc && okMean && okMax), s"doc $id keep != flags")
      assert(okWc == (nw >= 20 && nw <= 80), s"doc $id word-count flag")
      assert(okMax == (mw <= 15), s"doc $id max-word flag")
    }
    // the rules must actually discriminate on this corpus
    assert(rows.exists(_._7) && rows.exists(!_._7), "gate never fires")
  }

  test("shard export: every doc lands in exactly one shard, shards balanced") {
    val shards = SparkEntry.queries("q_shard_export")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val total = shards.map(_._2).sum
    val nDocs = SparkEntry.queries("q_text_tokens")(spark, dir).count()
    assert(total == nDocs, s"sharded $total of $nDocs docs")
    assert(shards.map(_._1).toSet.size == shards.length, "duplicate shard ids")
    // hash balance: no shard more than 3x the mean at this tiny sf
    val mean = total.toDouble / shards.length
    shards.foreach { case (sid, n) =>
      assert(n <= mean * 3, s"shard $sid holds $n vs mean $mean")
    }
  }

  test("token budget: every source kept, budget respected, deterministic") {
    def run() = SparkEntry.queries("q_sample_token_budget")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val rows = run()
    val sources = Tables.df(spark, dir, "documents")
      .select("source").distinct().count()
    // a budget smaller than one doc still takes one per source
    assert(rows.map(_._2).distinct.length.toLong == sources)
    rows.groupBy(_._2).foreach { case (src, rs) =>
      // every kept doc except the boundary one stays under budget
      val within = rs.map(_._3).count(_ <= 1500)
      assert(within >= rs.length - 1, s"source $src overshoots budget twice")
    }
    assert(rows.toSeq == run().toSeq, "non-deterministic mix")
  }

  test("mixture: copies equal docs x weight per language") {
    val rows = run("q_sample_mixture").map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, nDocs, nCopies) =>
      val w = lang match { case "en" => 3L; case "de" => 2L; case _ => 1L }
      assert(nCopies == nDocs * w, s"$lang: $nCopies != $nDocs x $w")
    }
  }

  test("winsorize: thresholds ordered, clip counts bounded by the tails") {
    val rows = run("q_events_winsorize").map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (ty, n, lo, hi, p5, p95) =>
      assert(p5 <= p95, s"$ty: p5 $p5 > p95 $p95")
      // strictly-below-p5 rows number < ceil(5n/100); same above p95
      assert(lo < (n * 5 + 99) / 100, s"$ty: clip_lo $lo too large for n=$n")
      assert(hi <= n - (n * 95 + 99) / 100, s"$ty: clip_hi $hi too large")
    }
  }

  test("simhash pairs: clones land at distance 0, all pairs within 3 bits") {
    val rows = run("q_dedup_simhash_pairs").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, d) =>
      assert(a < b, s"unordered pair ($a,$b)")
      assert(d >= 0 && d <= 3, s"pair ($a,$b) distance $d outside the band")
    }
    // every clone has an identical token stream — simhash distance 0
    val pairSet = rows.map(t => (t._1, t._2, t._3)).toSet
    val clones = rows.filter(t => t._2 == t._1 + 1000000L)
    assert(clones.nonEmpty, "no clone pair found")
    clones.foreach { case (a, b, d) =>
      assert(d == 0, s"clone pair ($a,$b) at distance $d")
    }
    assert(pairSet.size == rows.length, "duplicate pair rows")
  }

  test("incremental dedup: clones exact with provenance, verdicts total") {
    val rows = run("q_dedup_incremental").map(r =>
      (r.getLong(0), r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(rows.nonEmpty)
    // verdicts are total; dup_of is set exactly when the doc is a dup
    rows.foreach { case (id, v, dup) =>
      assert(Set("exact", "near", "new")(v), s"$id: unknown verdict $v")
      assert((v == "new") == (dup == -1L), s"$id: $v with dup_of=$dup")
      if (dup != -1L) assert(dup < 1000000L, s"$id: dup_of $dup is not a prior doc")
    }
    // every exact clone (+1e6) resolves 'exact' against the prior corpus
    val clones = rows.filter(r => r._1 >= 1000000L && r._1 < 2000000L)
    assert(clones.nonEmpty)
    clones.foreach { case (id, v, dup) =>
      assert(v == "exact", s"clone $id got verdict $v")
      assert(dup <= id - 1000000L, s"clone $id: dup_of $dup after its source")
    }
    // at least one suffix-mutated doc lands 'near' AND points at its own
    // source; reversed docs can never be exact copies of a prior
    assert(rows.exists(r => r._1 >= 2000000L && r._1 < 3000000L &&
      r._2 == "near" && r._3 == r._1 - 2000000L),
      "no suffixed doc resolved near to its source")
    rows.filter(_._1 >= 3000000L).foreach { case (id, v, _) =>
      assert(v != "exact", s"reversed doc $id cannot be an exact dup")
    }
  }

  test("leakage-safe split: dup-cluster members never straddle splits") {
    val rows = run("q_split_leakage_safe").map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, _, s) =>
      assert(Set("train", "valid", "test")(s), s"$id: unknown split $s") }
    // one decision per unit — members of a cluster inherit it
    rows.groupBy(_._2).foreach { case (u, rs) =>
      assert(rs.map(_._3).distinct.length == 1, s"unit $u straddles splits") }
    // the concrete leakage case: every exact clone lands with its source
    val byId = rows.map(r => r._1 -> r._3).toMap
    val clones = rows.filter(_._1 >= 1000000L)
    assert(clones.nonEmpty)
    clones.foreach { case (id, _, s) =>
      assert(byId(id - 1000000L) == s,
        s"clone $id split '$s' differs from its source's " +
          s"'${byId(id - 1000000L)}' — eval leakage") }
  }

  test("tpch q3: at most 10 rows, revenue non-increasing") {
    val rows = run("q_tpch_q3").map(r => (r.getLong(0), r.getDouble(2)))
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_._2)
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    assert(revs.forall(_ > 0))
  }

  test("tpch q18: every returned order's quantity really exceeds 300") {
    val rows = run("q_tpch_q18")
    assert(rows.nonEmpty && rows.length <= 100)
    // sum_qty is the HAVING column itself — every survivor must clear it
    rows.foreach(r => assert(r.getDouble(5) > 300.0,
      s"order ${r.getLong(2)} kept with sum_qty ${r.getDouble(5)}"))
    val prices = rows.map(_.getDouble(4))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b },
      "not ordered by o_totalprice desc")
  }

  test("mad outliers: flags are a superset-resistant robust count") {
    val rows = run("q_events_mad")
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (tpe, n, _, mad, out) =>
      assert(mad >= 0, s"$tpe negative MAD")
      assert(out >= 0 && out < n, s"$tpe flagged $out of $n — robust stat broke down")
    }
  }

  test("char entropy: bounded by log2(alphabet), clones of uniform text " +
    "score high, constant text would score zero") {
    val rows = run("q_text_entropy")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, k, e) =>
      assert(k <= n, s"doc $id more distinct chars than chars")
      // Shannon bound: 0 <= H <= log2(distinct chars); 1e-9 for the
      // 6-decimal per-term rounding
      val bound = math.log(k.toDouble) / math.log(2.0) + 1e-9
      assert(e >= 0.0 && e <= bound, s"doc $id entropy $e above log2($k)")
    }
  }

  test("uniform-k sample: exactly k rows, hash-ascending, rerun-stable") {
    val rows = run("q_sample_uniform_k").map(r => (r.getLong(0), r.getLong(2)))
    assert(rows.length == 100)
    val hs = rows.map(_._2)
    assert(hs.zip(hs.tail).forall { case (a, b) => a <= b }, "not hash-ordered")
    val again = run("q_sample_uniform_k").map(r => (r.getLong(0), r.getLong(2)))
    assert(rows.toSeq == again.toSeq, "sample not deterministic")
  }

  test("dsir: target domain separates from the raw pool, gate deterministic") {
    // the sampled KL property — fitting p on the target docs and q on the
    // raw pool must put the mean target score above zero and the mean
    // raw-pool score below it (E_p[ln p/q] = KL(p||q) >= 0 >= -KL(q||p));
    // only the full score table shows this, the gate's top-K cannot
    val sc = graft.queries.Pipeline.dsirScores(spark, dir)
      .collect().map(r => (r.getBoolean(2), r.getLong(3)))
    val (tgt, cand) = sc.partition(_._1)
    assert(tgt.nonEmpty && cand.nonEmpty)
    val meanT = tgt.map(_._2).sum.toDouble / tgt.length
    val meanC = cand.map(_._2).sum.toDouble / cand.length
    assert(meanT > 0 && meanC < 0,
      s"no target/raw separation: target mean $meanT, raw mean $meanC")
    // gate structure: raw-pool only, scores descending with doc_id
    // tiebreak, rerun-identical
    val rows = run("q_sample_dsir")
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.length == 50)
    assert(rows.forall(r => r._2 != "src0" && r._2 != "src1"),
      "a target-domain doc leaked into the resample")
    assert(rows.zip(rows.tail).forall { case (a, b) =>
      a._3 > b._3 || (a._3 == b._3 && a._1 < b._1) }, "not score-ordered")
    val again = run("q_sample_dsir")
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq == again.toSeq, "resample not deterministic")
  }

  test("dsir gumbel: noise really resamples, weights really pull, rerun-stable") {
    val greedy = run("q_sample_dsir").map(_.getLong(0)).toSet
    val gum = run("q_sample_dsir_gumbel")
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(gum.length == 50)
    assert(gum.forall(r => r._2 != "src0" && r._2 != "src1"),
      "a target-domain doc leaked into the gumbel resample")
    val overlap = gum.map(_._1).toSet.intersect(greedy).size
    // < 50: the Gumbel noise actually moves the selection off argmax;
    // > ~2x the chance level (50·50/450 ≈ 6): the weights still dominate
    // pure noise — the sampler follows softmax(log w), not uniform
    assert(overlap < 50, "gumbel selection identical to greedy argmax")
    assert(overlap > 12, s"overlap $overlap with greedy is chance-level")
    val again = run("q_sample_dsir_gumbel")
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(gum.toSeq == again.toSeq, "gumbel resample not deterministic")
  }

  test("epoch shuffle: epochs are independent permutations, shards cover " +
    "every doc exactly once per epoch") {
    val rows = run("q_shuffle_epoch")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    val byEpoch = rows.groupBy(_._2)
    assert(byEpoch.keySet == Set(0L, 1L))
    val docs = byEpoch(0L).map(_._1).toSet
    // each epoch covers the whole corpus exactly once
    byEpoch.values.foreach { es =>
      assert(es.map(_._1).toSet == docs && es.length == docs.size)
    }
    // the two epochs give genuinely different loader assignments — if
    // shard routing agreed across epochs the hash ignored the epoch
    val shard0 = byEpoch(0L).map(r => r._1 -> r._3).toMap
    val moved = byEpoch(1L).count(r => shard0(r._1) != r._3)
    assert(moved > docs.size / 2, s"only $moved docs changed shard between epochs")
    // within (epoch, shard) the positions are dense from 1
    rows.groupBy(r => (r._2, r._3)).values.foreach { g =>
      assert(g.map(_._4).sorted.sameElements(1L to g.length))
    }
  }

  test("cms sketch: estimates are one-sided (est >= exact, never under)") {
    val rows = run("q_sketch_cms")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"CMS undercounted '${r.getString(0)}': $est < $exact")
    }
    // the counter grid is 4x256 longs of state; with 916 keys in 256
    // buckets collisions are certain, so at least one estimate must show
    // overcount — if every est == exact the probe read exact counts, not
    // the sketch
    assert(rows.exists(r => r.getLong(2) > r.getLong(1)),
      "no collision overcount anywhere — probe is not reading the sketch")
  }

  test("bigram surprisal: deterministic, positive, below the smoothing " +
    "ceiling ln(N+V)") {
    val rows = run("q_text_bigram_lp")
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows.nonEmpty)
    // every per-instance surprisal is ln((c1+V)/(c12+1)) with c12>=1 when
    // joined and c1 <= N, so the mean is strictly inside (0, ln(N+V))
    val n = rows.map(_._2).sum
    val ceiling = math.log(n.toDouble + 1e6) // V << 1e6 on any fixture
    rows.foreach { case (id, _, s) =>
      assert(s > 0.0 && s < ceiling, s"doc $id surprisal $s out of range") }
    // add-one smoothing is corpus-derived: a rerun must reproduce the
    // exact decimals (no RNG, no float-order drift)
    val again = run("q_text_bigram_lp")
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows == again, "bigram surprisal not deterministic across runs")
  }

  test("bm25: top-20 ordered, positive scores iff a query term is present") {
    val rows = run("q_text_bm25").map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows.length == 20)
    assert(rows.zip(rows.tail).forall { case (a, b) =>
      a._2 > b._2 || (a._2 == b._2 && a._1 < b._1) }, "not score-ordered")
    // with the +1-inside-ln Okapi idf every term weight is > 0, so
    // score > 0 <=> at least one query term occurs in the doc
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .collect().map(r => r.getLong(0) ->
        r.getString(r.fieldIndex("text")).trim.toLowerCase
          .split("\\s+").toSet).toMap
    val terms = Set("hash", "join", "slow")
    assert(rows.exists(_._2 > 0), "no document matched any query term")
    rows.foreach { case (id, sc) =>
      assert((sc > 0) == texts(id).exists(terms),
        s"doc $id score $sc disagrees with term presence") }
    assert(rows == run("q_text_bm25").map(r => (r.getLong(0), r.getLong(1))).toSeq,
      "bm25 not deterministic")
  }

  test("hybrid rrf: fused score is exactly the sum of per-list rank " +
    "contributions, both lists represented") {
    val rows = run("q_hybrid_rrf").map(r => (r.getLong(0),
      if (r.isNullAt(1)) None else Some(r.getLong(1)),
      if (r.isNullAt(2)) None else Some(r.getLong(2)),
      r.getLong(3))).toSeq
    assert(rows.length == 20)
    def c(r: Option[Long]): Long =
      r.map(rk => math.round(1.0e9 / (60.0 + rk))).getOrElse(0L)
    rows.foreach { case (id, rt, rv, f) =>
      assert(rt.isDefined || rv.isDefined, s"doc $id in neither ranking")
      assert(f == c(rt) + c(rv), s"doc $id fused $f != recomputed")
      rt.foreach(r => assert(r >= 1 && r <= 100))
      rv.foreach(r => assert(r >= 1 && r <= 100))
    }
    assert(rows.zip(rows.tail).forall { case (a, b) =>
      a._4 > b._4 || (a._4 == b._4 && a._1 < b._1) }, "not fused-ordered")
    // the fuse is a real hybrid: the top-20 must mix evidence — some doc
    // carries a lexical rank and some doc carries a vector rank
    assert(rows.exists(_._2.isDefined) && rows.exists(_._3.isDefined),
      "one retrieval modality contributed nothing")
    // both-list docs outrank single-list docs at equal rank sums, so the
    // head of the fused list should contain at least one both-list doc
    assert(rows.take(5).exists(r => r._2.isDefined && r._3.isDefined),
      "no doc ranked by both lists in the fused top-5")
  }

  test("k-center coreset: matches an independent greedy recompute, covering " +
    "radii non-increasing") {
    val rows = run("q_emb_kcenter").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows.map(_._1) == (1L to rows.length))
    // radius at selection k bounds radius at k+1 (greedy min-fold)
    val radii = rows.tail.map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b },
      "covering radii increased between rounds")
    // independent recompute of the greedy loop over the same quantization
    val qv = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 64 + 0.5).toLong))
      .toMap
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var md = qv.map { case (i, v) => i -> d2(v, qv(0L)) }
    val expect = Seq.newBuilder[(Long, Long, Long)]
    expect += ((1L, 0L, 0L))
    for (k <- 2 to rows.length) {
      val (bid, bmd) = md.minBy { case (i, m) => (-m, i) }
      expect += ((k.toLong, bid, bmd))
      md = md.map { case (i, m) => i -> math.min(m, d2(qv(i), qv(bid))) }
    }
    assert(rows == expect.result(), "coreset != independent greedy recompute")
    assert(rows == run("q_emb_kcenter").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq,
      "k-center not deterministic")
  }

  test("hybrid rrf ivf: vector leg confined to one probed cell, fusion " +
    "arithmetic exact, rerun-stable") {
    val rows = run("q_hybrid_rrf_ivf").map(r => (r.getLong(0),
      if (r.isNullAt(1)) None else Some(r.getLong(1)),
      if (r.isNullAt(2)) None else Some(r.getLong(2)),
      r.getLong(3))).toSeq
    assert(rows.length == 20)
    def c(r: Option[Long]): Long =
      r.map(rk => math.round(1.0e9 / (60.0 + rk))).getOrElse(0L)
    rows.foreach { case (id, rt, rv, f) =>
      assert(rt.isDefined || rv.isDefined, s"doc $id in neither ranking")
      assert(f == c(rt) + c(rv), s"doc $id fused $f != recomputed") }
    assert(rows.exists(_._2.isDefined) && rows.exists(_._3.isDefined),
      "one retrieval modality contributed nothing")
    // the IVF leg's defining property: every vector-ranked id lives in
    // ONE label cell (the probed one)
    // label cast to long: SchemaContract pins it only to the Integral
    // family, so a bare getInt would throw on an int64 fixture regen
    val labels = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "CAST(label AS LONG) AS label").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vecRanked = rows.filter(_._3.isDefined).map(_._1)
    assert(vecRanked.nonEmpty)
    assert(vecRanked.map(labels).distinct.length == 1,
      s"vector leg spans cells: ${vecRanked.map(labels).distinct}")
    assert(rows == run("q_hybrid_rrf_ivf").map(r => (r.getLong(0),
      if (r.isNullAt(1)) None else Some(r.getLong(1)),
      if (r.isNullAt(2)) None else Some(r.getLong(2)),
      r.getLong(3))).toSeq, "hybrid ivf not deterministic")
  }

  test("hybrid indexed: text leg answers from artifacts (every text-ranked " +
    "doc matches a term, no documents scan in the probe plan), fusion exact") {
    val rows = run("q_hybrid_indexed").map(r => (r.getLong(0),
      if (r.isNullAt(1)) None else Some(r.getLong(1)),
      if (r.isNullAt(2)) None else Some(r.getLong(2)),
      r.getLong(3))).toSeq
    assert(rows.length == 20)
    def c(r: Option[Long]): Long =
      r.map(rk => math.round(1.0e9 / (60.0 + rk))).getOrElse(0L)
    rows.foreach { case (id, rt, rv, f) =>
      assert(rt.isDefined || rv.isDefined, s"doc $id in neither ranking")
      assert(f == c(rt) + c(rv), s"doc $id fused $f != recomputed") }
    assert(rows.exists(_._2.isDefined) && rows.exists(_._3.isDefined),
      "one retrieval modality contributed nothing")
    // the artifact leg's defining property: only MATCHED docs exist in
    // the postings join, so every text-ranked id must hold ≥1 query term
    val terms = Set("hash", "join", "slow")
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.filter(_._2.isDefined).foreach { case (id, _, _, _) =>
      val toks = texts(id).trim.toLowerCase.split("\\s+").toSet
      assert((toks & terms).nonEmpty, s"text-ranked doc $id matches no term")
    }
    // the probe plan never scans the corpus text: the BM25 side reads
    // postings/doc-length/df/stats artifacts, the vector side reads
    // embeddings — documents.parquet appears in NO FileScan (the
    // one-off index build ran before this frame was constructed)
    val plan = SparkEntry.queries("q_hybrid_indexed")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      "probe plan scans the corpus of record")
    assert(rows == run("q_hybrid_indexed").map(r => (r.getLong(0),
      if (r.isNullAt(1)) None else Some(r.getLong(1)),
      if (r.isNullAt(2)) None else Some(r.getLong(2)),
      r.getLong(3))).toSeq, "hybrid indexed not deterministic")
  }

  test("doremi mixture: one weight per domain, update rule recomputes " +
    "exactly, weights sum to ~1e9 and respect the smoothing floor") {
    val rows = run("q_mixture_doremi").map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows.length == 20, s"expected 20 domains, got ${rows.length}")
    assert(rows.map(_._1).distinct.length == 20)
    assert(rows.map(_._3).min == 0L, "no domain has zero excess")
    // independent recompute of the exponentiated-gradient step from the
    // published loss column: e_d = round(exp(η·(excess − excess_max))·1e6)
    // with η = 100/nat (the overflow-proof softmax shift), integral
    // normalize, 0.9/0.1 uniform smoothing
    val exMax = rows.map(_._3).max
    val es = rows.map { case (_, _, ex, _) =>
      math.round(math.exp((ex - exMax).toDouble / 10000.0) * 1e6) }
    val se = es.sum
    val expect = es.map(e =>
      (e * 1000000000L / se) * 9 / 10 + 100000000L / rows.length)
    assert(rows.map(_._4) == expect, "weight_nano != recomputed update")
    val ws = rows.map(_._4)
    assert(ws.sum > 1000000000L - 100 && ws.sum <= 1000000000L,
      s"weights sum ${ws.sum} outside truncation slack")
    assert(ws.min >= 5000000L, "smoothing floor violated")
    assert(ws.max.toDouble / ws.min >= 1.3,
      s"update barely fired: ${ws.min}..${ws.max}")
    // monotone: more excess loss never means less weight
    val byExcess = rows.sortBy(_._3).map(_._4)
    assert(byExcess.zip(byExcess.tail).forall { case (a, b) => a <= b },
      "weight not monotone in excess loss")
    assert(rows == run("q_mixture_doremi").map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq,
      "doremi not deterministic")
  }

  test("oov ladder: coverage recomputes from raw text, monotone in K, " +
    "ppm arithmetic exact") {
    val rows = run("q_corpus_oov").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows.map(_._1) == Seq(4L, 8L, 16L, 32L))
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("text").collect()
      .flatMap(_.getString(0).trim.toLowerCase.split("\\s+"))
      .filter(_.nonEmpty)
    val byFreq = toks.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy { case (t, c) => (-c, t) }
    val total = toks.length.toLong
    rows.foreach { case (k, covered, tot, ppm) =>
      assert(tot == total)
      val want = byFreq.take(k.toInt).map(_._2).sum
      assert(covered == want, s"K=$k covered $covered != recomputed $want")
      assert(ppm == (total - covered) * 1000000L / total,
        s"K=$k ppm arithmetic drifted")
    }
    val cov = rows.map(_._2)
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b },
      "coverage not monotone in K")
  }

  test("doremi indexed: artifact-served weights equal the gate row for " +
    "row, and the probe plan never scans the corpus") {
    val served = run("q_mixture_indexed").map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val gate = run("q_mixture_doremi").map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(served == gate, "artifact path drifted from the direct gate")
    val plan = SparkEntry.queries("q_mixture_indexed")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      "served-weights plan scans the corpus of record")
  }

  test("doremi apply: per-domain counts equal the quotas derived from " +
    "the published weights, ranks dense, hash-prefix deterministic") {
    val picked = run("q_mixture_doremi_apply").map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(picked.nonEmpty)
    val quotas = run("q_mixture_doremi").map(r =>
      r.getString(0) -> r.getLong(3) * 200 / 1000000000L).toMap
    val bySrc = picked.groupBy(_._2)
    // the smoothing floor seats every domain at least once
    assert(bySrc.keySet == quotas.keySet, "a domain got no seats")
    bySrc.foreach { case (src, rs) =>
      assert(rs.length.toLong == quotas(src),
        s"$src seated ${rs.length} != quota ${quotas(src)}")
      assert(rs.map(_._3).sorted == (1L to rs.length),
        s"$src ranks not dense")
    }
    assert(picked.length <= 200, "epoch budget exceeded")
    assert(picked == run("q_mixture_doremi_apply").map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))).toSeq,
      "apply not deterministic")
  }

  test("context pack: kept set is the maximal rank prefix under the " +
    "budget, cumulative arithmetic exact") {
    val rows = run("q_retrieval_context_pack").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows.nonEmpty)
    assert(rows.map(_._1) == (1L to rows.length), "sel_order not a dense prefix")
    var cum = 0L
    rows.foreach { case (_, id, tok, cumGot) =>
      cum += tok
      assert(cumGot == cum, s"doc $id cumulative $cumGot != running $cum")
    }
    assert(cum <= 512, s"budget exceeded: $cum")
    // maximality: the next fused doc (if any) would not have fit —
    // recompute the fused ranking the gate packs from and check the
    // first unpacked entry overflows
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id",
        "CAST(size(split(trim(text), '\\\\s+')) AS LONG) AS t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fused = run("q_hybrid_indexed").map(_.getLong(0)).toSeq
    val packed = rows.map(_._2).toSet
    fused.filterNot(packed).headOption.foreach { next =>
      assert(cum + toks(next) > 512,
        s"doc $next (${toks(next)} tokens) fit but was not packed")
    }
    assert(rows == run("q_retrieval_context_pack").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq,
      "context pack not deterministic")
  }

  test("semantic dedup: every planted exact clone is dropped, its original " +
    "survives the clone pair, near pairs lose exactly one side") {
    val dropped = run("q_dedup_semantic").map(_.getLong(0)).toSeq
    assert(dropped == dropped.sorted, "not vec_id-ordered")
    assert(dropped.distinct == dropped, "duplicate drops")
    val ds = dropped.toSet
    val ids = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id").collect().map(_.getLong(0))
    val exactOrig = ids.filter(_ % 20 == 0)
    val nearOrig = ids.filter(_ % 20 == 10)
    assert(exactOrig.nonEmpty && nearOrig.nonEmpty)
    // keep-farthest + id tiebreak: an exact clone (identical projection,
    // larger id) can never survive its original
    exactOrig.foreach { id =>
      assert(ds.contains(id + 1000000), s"exact clone of $id survived") }
    // a near pair is mutually >= 0.95 cosine, so at least one side of
    // every pair must be dropped (both only via third-party neighbors)
    nearOrig.foreach { id =>
      assert(ds.contains(id) || ds.contains(id + 2000000),
        s"near-dup pair of $id fully survived") }
    // the pruning is selective, not a wipe: most of the base corpus stays
    assert(ds.size < ids.length / 2,
      s"dropped ${ds.size} of ${ids.length + exactOrig.length + nearOrig.length}")
    assert(dropped == run("q_dedup_semantic").map(_.getLong(0)).toSeq,
      "semantic dedup not deterministic")
  }

  test("curriculum sample: quartile quotas ramp 8/16/24/32, ranks dense, " +
    "rerun-stable") {
    val rows = run("q_sample_curriculum")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows.nonEmpty)
    val byBucket = rows.groupBy(_._2)
    assert(byBucket.keySet.subsetOf(Set(1L, 2L, 3L, 4L)))
    assert(byBucket.keySet.size >= 3,
      s"quartile cut degenerate: only buckets ${byBucket.keySet}")
    byBucket.foreach { case (b, rs) =>
      assert(rs.length <= 8 * b, s"bucket $b over quota: ${rs.length}")
      assert(rs.map(_._3).sorted.sameElements(1L to rs.length),
        s"bucket $b ranks not dense")
    }
    // the ramp must actually bind somewhere (a full bucket at its quota)
    assert(byBucket.exists { case (b, rs) => rs.length == 8 * b },
      "no bucket reached its quota — fixture too small for the ramp")
    assert(rows == run("q_sample_curriculum")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq,
      "curriculum sample not deterministic")
  }

  test("segment dedup: matches an independent per-doc recompute, drops fire, " +
    "rerun-stable") {
    val rows = run("q_text_segment_dedup").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == docs.size, "one output row per document")
    rows.foreach { case (id, nSeg, nDrop, md5) =>
      val ts = docs(id).trim.toLowerCase.split("\\s+")
      val segs = ts.grouped(2).filter(_.length == 2)
        .map(_.mkString(" ")).toVector
      val kept = segs.zipWithIndex
        .filter { case (s2, i) => segs.indexOf(s2) == i }.map(_._1)
      assert(nSeg == segs.length, s"doc $id n_seg $nSeg != ${segs.length}")
      assert(nDrop == segs.length - kept.length,
        s"doc $id n_drop $nDrop != ${segs.length - kept.length}")
      val exp = org.apache.commons.codec.digest.DigestUtils
        .md5Hex(kept.mkString(" "))
      assert(md5 == exp, s"doc $id cleaned-content hash mismatch")
    }
    // the tiny fixture vocabulary guarantees natural within-doc repeats,
    // so the drop path is provably exercised without planting
    assert(rows.map(_._3).sum > 0, "no within-document repeats dropped")
    // …and the operator is selective, not a wipe: every non-empty doc
    // keeps its first segment, and most segment mass survives overall
    rows.foreach { case (id, nSeg, nDrop, _) =>
      assert(nSeg == 0 || nDrop < nSeg, s"doc $id lost every segment") }
    val (totSeg, totDrop) = (rows.map(_._2).sum, rows.map(_._3).sum)
    assert(totDrop * 2 < totSeg,
      s"dropped $totDrop of $totSeg segments — not a dedup, a wipe")
    assert(rows == run("q_text_segment_dedup").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq,
      "segment dedup not deterministic")
  }

  test("bpe trainer: matches an independent scala recompute of all 8 merge " +
    "rounds, counts non-increasing, rerun-stable") {
    val rows = run("q_tokenizer_bpe").map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSeq
    assert(rows.map(_._1) == (1L to rows.length), "ranks not dense from 1")
    rows.foreach { case (_, l, r, m, _) =>
      assert(m == l + r, s"merged symbol $m != $l + $r") }
    // each round's winning count bounds the next round's: a pair created
    // by a merge occurs at most once per occurrence of the merged pair
    assert(rows.zip(rows.tail).forall { case (a, b) => a._5 >= b._5 },
      "merge counts increased between rounds")
    // full independent recompute (the reference BPE loop, leftmost-greedy
    // non-overlapping, ties to the lexicographically smallest pair)
    val (expect, _) = bpeRecompute()
    assert(rows == expect, "merge table != independent recompute")
    // no rerun-determinism assertion: bpeTrain is memoized per (session,
    // corpus), so a rerun returns the cached table by construction — the
    // independent recompute above IS the determinism check
  }

  test("bpe encode: per-doc piece counts match encoding every word through " +
    "the independently recomputed merge table") {
    val rows = run("q_tokenizer_encode").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val (_, pieces) = bpeRecompute()
    val docsT = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == docsT.size)
    rows.foreach { case (id, nWords, nBpe) =>
      val ws = docsT(id).trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
      assert(nWords == ws.length, s"doc $id word count")
      val exp = ws.map(pieces).sum
      assert(nBpe == exp, s"doc $id bpe tokens $nBpe != $exp")
      // pieces per word lie in [1, chars], so the totals must bracket
      assert(nBpe >= nWords && nBpe <= ws.map(_.length.toLong).sum)
    }
    // 8 merges on this vocab must actually compress something
    assert(rows.map(_._3).sum < rows.map { case (id, _, _) =>
      docsT(id).trim.toLowerCase.split("\\s+").map(_.length.toLong).sum }.sum,
      "encoding saved nothing — merges never applied")
  }

  test("bpe encode with broadcast disabled (cap 0): the distributed shuffle " +
    "join answers identically — the 100 TB path, no driver-side word table") {
    val withBroadcast = run("q_tokenizer_encode").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // cap 0 drops the hint; autoBroadcastJoinThreshold=-1 stops AQE from
    // re-broadcasting the (locally tiny) table behind our back, so the
    // run below is the genuine shuffle-join plan a huge vocab would get
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = graft.queries.Pipeline
        .bpeEncodeCounts(spark, dir, broadcastCap = 0L)
      val noBroadcast = df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(noBroadcast == withBroadcast,
        "shuffle-join encode diverged from broadcast encode")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"cap 0 still broadcast:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  /** The reference BPE loop (8 rounds, leftmost-greedy non-overlapping,
    * ties to the lexicographically smallest pair): returns the merge
    * table and the final pieces-per-word map. */
  private def bpeRecompute(): (Seq[(Long, String, String, String, Long)],
      Map[String, Long]) = {
    val (m, syms) = bpeRecomputeFull()
    (m, syms.view.mapValues(_.length.toLong).toMap)
  }

  private def bpeRecomputeFull(): (Seq[(Long, String, String, String, Long)],
      Map[String, Vector[String]]) = {
    val wc = scala.collection.mutable.Map.empty[String, Long]
    spark.read.parquet(s"$dir/documents.parquet").select("text").collect()
      .foreach(_.getString(0).trim.toLowerCase.split("\\s+")
        .filter(_.nonEmpty)
        .foreach(w => wc(w) = wc.getOrElse(w, 0L) + 1L))
    var words = wc.toSeq.map { case (w, n) =>
      (w, w.map(_.toString).toVector, n) }
    val expect = Seq.newBuilder[(Long, String, String, String, Long)]
    for (rank <- 1 to 8) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (_, syms, n) =>
        syms.zip(syms.tail).foreach(p => pc(p) = pc.getOrElse(p, 0L) + n) }
      val ((l, r), cnt) = pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      expect += ((rank.toLong, l, r, l + r, cnt))
      words = words.map { case (w, syms, n) =>
        val acc = scala.collection.mutable.Buffer(syms.head)
        syms.tail.foreach { x =>
          if (acc.last == l && x == r) acc(acc.length - 1) = l + r
          else acc += x }
        (w, acc.toVector, n)
      }
    }
    (expect.result(), words.map { case (w, syms, _) =>
      w -> syms }.toMap)
  }

  test("dsir + nb classifier re-target: the reference domain is a " +
    "parameter, not a constant baked into the cached frames") {
    // re-fit both operators against src2 instead of the default
    // src0/src1 — the importance ratios and NB weights must follow the
    // new domain (the sampled-KL inequality holds for ANY target split:
    // E_target[log p/q] >= 0 >= E_rest[log p/q], strict when the
    // distributions differ)
    def mean(xs: Seq[Long]): Double =
      if (xs.isEmpty) 0.0 else xs.sum.toDouble / xs.length
    val alt = graft.queries.Pipeline.dsirScores(spark, dir, Seq("src2"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getBoolean(2), r.getLong(3))).toSeq
    assert(alt.nonEmpty)
    alt.foreach { case (_, srcName, isT, _) =>
      assert(isT == (srcName == "src2"),
        s"is_target must flag exactly the re-bound domain, got $srcName/$isT") }
    val (t2, r2) = alt.partition(_._3)
    assert(t2.nonEmpty && r2.nonEmpty)
    assert(mean(t2.map(_._4)) > mean(r2.map(_._4)),
      "re-targeted DSIR shows no separation toward src2")
    // default binding still separates toward src0/src1 (the cache was
    // not poisoned by the re-bind)
    val dft = graft.queries.Pipeline.dsirScores(spark, dir)
      .collect().map(r => (r.getString(1), r.getBoolean(2), r.getLong(3))).toSeq
    dft.foreach { case (srcName, isT, _) =>
      assert(isT == (srcName == "src0" || srcName == "src1")) }
    val (t0, r0) = dft.partition(_._2)
    assert(mean(t0.map(_._3)) > mean(r0.map(_._3)))

    val nbAlt = graft.queries.Pipeline.nbClassifierScores(spark, dir, Seq("src2"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSeq
    assert(nbAlt.nonEmpty)
    nbAlt.foreach { case (_, _, sc, pred) =>
      assert(pred == (if (sc > 0) 1L else 0L)) }
    // src2 is NOT an engineered-separable domain like src0/src1, so no
    // held-out separation is promised — what the parameter guarantees is
    // that the fitted weights follow the binding: the same held-out docs
    // score differently under the two targets (and the src0/src1
    // separation above proves the default still fits ITS domain)
    val nbDft = graft.queries.Pipeline.nbClassifierScores(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val changed = nbAlt.count { case (id, _, sc, _) => nbDft(id) != sc }
    assert(changed > nbAlt.size / 2,
      s"re-binding the NB target changed only $changed/${nbAlt.size} scores")
  }

  test("bpe segmentation: every doc's seg_md5 equals the digest of the " +
    "independently recomputed in-order piece stream") {
    val rows = run("q_tokenizer_segments").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    val (_, symsOf) = bpeRecomputeFull()
    val docsT = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == docsT.size)
    rows.foreach { case (id, nWords, nBpe, segMd5) =>
      val ws = docsT(id).trim.toLowerCase.split("\\s+").toSeq
        .filter(_.nonEmpty)
      assert(nWords == ws.length)
      val stream = ws.map(w => symsOf(w).mkString(""))
        .mkString("")
      assert(nBpe == ws.map(w => symsOf(w).length.toLong).sum)
      val exp = org.apache.commons.codec.digest.DigestUtils.md5Hex(stream)
      assert(segMd5 == exp, s"doc $id segmentation digest mismatch")
    }
  }

  test("mmr retrieval: diversification provably de-interleaves the planted " +
    "clone pairs that pure relevance seats adjacently") {
    val rows = run("q_retrieval_mmr").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows.map(_._1) == (1L to rows.length), "ranks not dense")
    rows.foreach { case (rk, _, rel, mmr) =>
      assert(mmr <= rel, s"rank $rk: mmr exceeds relevance") }
    // rank 1 is the pure-relevance argmax (no penalty yet)
    assert(rows.head._3 == rows.head._4)
    // the clone structure: an exact clone ties its original's relevance,
    // so pure relevance would seat them adjacently — MMR must never
    // select a clone at the rank right after its original (its penalty
    // is the full 1e9 the moment the original is in)
    val byId = rows.map(r => r._2 -> r._1).toMap
    byId.foreach { case (id, rk) =>
      val twin = if (id >= 1000000L) id - 1000000L else id + 1000000L
      byId.get(twin).foreach { trk =>
        assert(math.abs(trk - rk) > 1,
          s"clone pair ($id, $twin) selected at ADJACENT ranks $rk/$trk " +
            "— diversification never fired") }
    }
    // and diversification actually moved the order: the selection is not
    // the relevance prefix (the clone of the top hit ties it exactly and
    // would sit at rank 2 under pure relevance)
    val relOrder = rows.sortBy(r => (-r._3, r._2)).map(_._2)
    assert(rows.map(_._2) != relOrder || rows.size < 2 ||
      !byId.contains(rows.head._2 + 1000000L) ||
      byId(rows.head._2 + 1000000L) != 2L,
      "selection equals the pure-relevance prefix — MMR added nothing")
  }

  test("hard-negative mining: cross-label only, dense ranks, and the top " +
    "negative really is the closest cross-label vector") {
    val rows = run("q_mining_hard_negatives").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(rows.nonEmpty)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    val labelOf = emb.map(e => e._1 -> e._2).toMap
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      assert(rs.map(_._2).sorted == Seq(1L, 2L, 3L),
        s"anchor $qid ranks not dense: $rs")
      val cs = rs.sortBy(_._2).map(_._4)
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b },
        s"anchor $qid negatives not ranked")
      rs.foreach { case (_, _, nid, _) =>
        assert(labelOf(nid) != labelOf(qid),
          s"anchor $qid mined a SAME-label 'negative' $nid") }
      // hardness: the top mined negative matches the double-cosine
      // argmax over all cross-label vectors (the oracle pins exactness;
      // this pins the SEMANTICS against an independent recompute)
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < a.length) {
          d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
        d / math.sqrt(na * nb)
      }
      val qv = emb.find(_._1 == qid).get._3
      val best = emb.filter(e => e._2 != labelOf(qid))
        .map(e => cos(qv, e._3)).max
      assert(rs.minBy(_._2)._4 >= best - 1e-6,
        s"anchor $qid top negative is not the closest cross-label vector")
    }
  }

  test("matryoshka knn: result is the full-dim top-10 of the prefix-dim " +
    "top-50, both stages agreeing with an independent recompute") {
    val rows = run("q_knn_matryoshka").map(r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(rows.length == 10)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val qv = emb.find(_._1 == 0L).get._2
    def cos(a: Array[Double], b: Array[Double], n: Int): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    // stage 1: prefix-16 top-50
    val cand = emb.filter(_._1 != 0L)
      .map { case (id, v) => (cos(v, qv, 16), id) }
      .sortBy { case (c, id) => (-c, id) }.take(50)
    // stage 2: full-dim top-10 of those candidates
    val want = cand.map { case (_, id) =>
      (cos(emb.find(_._1 == id).get._2, qv, qv.length), id) }
      .sortBy { case (c, id) => (-c, id) }.take(10).map(_._2).toSeq
    assert(rows.map(_._1) == want,
      "two-stage result drifted from independent recompute")
    // full cosine must be the rerank key: returned rows are ordered by it
    val cs = rows.map(_._3)
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b },
      "not ranked by full-dim cosine")
    assert(rows == run("q_knn_matryoshka").map(r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq,
      "matryoshka not deterministic")
  }

  test("hard-negative mining, IVF-composed: negatives confined to ONE " +
    "foreign cell per anchor, exactly the brute top-3 within that cell") {
    val rows = run("q_mining_hard_negatives_ivf").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(rows.nonEmpty)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "CAST(label AS LONG) AS label", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    val labelOf = emb.map(e => e._1 -> e._2).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      assert(rs.map(_._2).sorted == Seq(1L, 2L, 3L),
        s"anchor $qid ranks not dense")
      // the probe's defining property: all negatives live in ONE cell,
      // and it is a FOREIGN one
      val cells = rs.map(r => labelOf(r._3)).distinct
      assert(cells.length == 1, s"anchor $qid negatives span cells $cells")
      assert(cells.head != labelOf(qid), s"anchor $qid probed its own cell")
      // within the probed cell the mining is exact: the returned ids are
      // the independent double-cosine top-3 of that cell's members
      val qv = emb.find(_._1 == qid).get._3
      val want = emb.filter(e => e._2 == cells.head && e._1 % 100 != 0)
        .map(e => (cos(qv, e._3), e._1))
        .sortBy { case (c, id) => (-c, id) }.take(3).map(_._2).toSeq
      assert(rs.sortBy(_._2).map(_._3) == want,
        s"anchor $qid in-cell top-3 drifted from independent recompute")
    }
    assert(rows == run("q_mining_hard_negatives_ivf").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq,
      "ivf hard negatives not deterministic")
  }

  test("quality classifier: train never scored, pred = sign(score), target " +
    "sources separate from the rest on held-out docs") {
    val rows = run("q_quality_classifier").map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows.nonEmpty)
    // the held-out discipline: every scored doc hashes to val/test (8, 9)
    rows.foreach { case (id, _, sc, pred) =>
      val h = java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString)
          .substring(0, 15), 16) % 10
      assert(h >= 8, s"doc $id is a train doc but was scored")
      assert(pred == (if (sc > 0) 1L else 0L), s"doc $id pred != sign(score)")
    }
    // ~20% of the corpus is held out; all of it with >= 1 bigram is scored
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.length > nDocs / 10 && rows.length < nDocs / 2,
      s"${rows.length} scored of $nDocs")
    // the classifier must have learned the target: mean held-out score of
    // src0/src1 docs above the mean of the rest
    val (tgt, rest) = rows.partition(r => r._2 == "src0" || r._2 == "src1")
    assert(tgt.nonEmpty && rest.nonEmpty)
    val mt = tgt.map(_._3).sum.toDouble / tgt.length
    val mr = rest.map(_._3).sum.toDouble / rest.length
    assert(mt > mr, s"no separation: target mean $mt vs rest mean $mr")
    assert(rows == run("q_quality_classifier").map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq,
      "classifier not deterministic")
  }
}
