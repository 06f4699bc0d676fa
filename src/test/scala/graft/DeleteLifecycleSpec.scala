package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Dedup, Pipeline, Retrieval}

/** The delete verb's contract across the artifact families (the vector
  * index's twin lives in SimilaritySpec): a targeted delete is an
  * O(deleted) logical commit whose every subsequent read is
  * INDISTINGUISHABLE from a rebuild over the survivors — incrementally
  * corrected statistics included — and whose physical purge amortizes
  * into the family's existing compaction/re-band pass. Retries and
  * absent ids are no-ops.
  */
class DeleteLifecycleSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  /** n synthetic docs, ~120 tokens each, cycling 4 sources. */
  private def docs(n: Int, base: Long = 0L): DataFrame =
    spark.range(n).select(
      (col("id") + base).as("doc_id"),
      concat(lit("src"), (col("id") % 4).cast("string")).as("source"),
      concat_ws(" ", (0 until 12).map(i =>
        md5(concat(col("id") + base, lit(i)))): _*).as("text"))

  // ---------------- lexical (BM25) ----------------

  private def probeScores(idx: String, terms: Seq[String]): Seq[(Long, Long)] =
    spark.sql(Retrieval.bm25NamedSql(Retrieval.lexRelation(spark, idx),
        s"'${terms.mkString(",")}'", "1000"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("lexical delete ≡ rebuild over survivors: df/n/avgdl corrected " +
    "incrementally, probes bit-identical; compaction purges physically") {
    val d = docs(120)
    // make two terms live across many docs so df correction is visible
    val corpus = d.select(col("doc_id"),
      when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" needle thread")))
        .when(col("doc_id") % 3 === 1, concat(col("text"), lit(" needle")))
        .otherwise(col("text")).as("text"))
    val idx = TempDirs.create("graft-lexdel-spec").toString
    Retrieval.buildLexicalIndexDf(spark, corpus, idx)
    val out = Retrieval.deleteFromLexicalIndex(spark,
      corpus.filter(col("doc_id") % 4 === 1).select("doc_id"), idx)
    assert(out("deleted") == 30L && out("docs") == 90L)
    // idempotent retry + absent ids: nothing double-corrects
    val again = Retrieval.deleteFromLexicalIndex(spark,
      corpus.filter(col("doc_id") % 4 === 1)
        .select((col("doc_id")).as("doc_id"))
        .unionAll(spark.range(5).select((col("id") + 777000).as("doc_id"))),
      idx)
    assert(again("deleted") == 0L && again("docs") == 90L)
    // the ground truth: a fresh index built over the survivors
    val truthIdx = TempDirs.create("graft-lexdel-truth").toString
    Retrieval.buildLexicalIndexDf(spark,
      corpus.filter(col("doc_id") % 4 =!= 1), truthIdx)
    val terms = Seq("needle", "thread")
    val afterDelete = probeScores(idx, terms)
    assert(afterDelete == probeScores(truthIdx, terms),
      "deleted-index scores must equal a rebuild over survivors")
    assert(afterDelete.nonEmpty &&
      afterDelete.forall { case (id, _) => id % 4 != 1 })
    // compaction purges: tombstones drain, postings shrink, scores hold
    val preTerms = spark.read.parquet(
      Retrieval.lexResolveAll(spark, idx)("terms")).count()
    val info = Retrieval.compactLexicalIndex(spark, idx)
    assert(info("tombstones") == 0L)
    val postTerms = spark.read.parquet(
      Retrieval.lexResolveAll(spark, idx)("terms")).count()
    assert(postTerms < preTerms, "purge must drop tombstoned postings")
    assert(probeScores(idx, terms) == afterDelete,
      "the physical purge must not change any score")
  }

  test("lexical commit history + as-of: every meta commit logs a " +
    "snapshot, pre-delete scores are reproducible, boundary is loud") {
    val corpus = docs(100).select(col("doc_id"),
      concat(col("text"), lit(" needle")).as("text"))
    val idx = TempDirs.create("graft-lexasof").toString
    Retrieval.buildLexicalIndexDf(spark, corpus, idx)
    val full = probeScores(idx, Seq("needle"))
    Retrieval.deleteFromLexicalIndex(spark,
      corpus.filter(col("doc_id") % 4 === 1).select("doc_id"), idx)
    val h = Retrieval.lexicalIndexHistory(spark, idx)
    assert(h.map(e => (e("seq"), e("kind"))) ==
      Seq((1L, "build"), (2L, "delete")), h.toString)
    assert(h.forall(_("readable") == true))
    // as of the build commit: the UNCORRECTED full-corpus scores, the
    // deleted docs visible — bit-identical to the pre-delete probe
    def asOf(seq: Int): Seq[(Long, Long)] = spark
      .sql(Retrieval.bm25NamedSql(
        Retrieval.lexRelationAsOf(spark, idx, seq), "'needle'", "1000"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(asOf(1) == full,
      "the as-of read must reproduce the pre-delete scores exactly")
    val afterDelete = probeScores(idx, Seq("needle"))
    assert(afterDelete != full,
      "the live probe must differ (corrected stats, survivors only)")
    // an append's entry sweep retires the BUILD generation (one-cycle
    // retention: only the commit one step back keeps its df/stats) and
    // its new batch must NOT leak into the delete snapshot's census
    Retrieval.appendLexicalIndex(spark,
      docs(10, base = 7000).select(col("doc_id"),
        concat(col("text"), lit(" needle")).as("text")), idx)
    val h2 = Retrieval.lexicalIndexHistory(spark, idx)
    assert(h2.map(_("kind")) == Seq("build", "delete", "append"))
    assert(h2.map(_("readable")) == Seq(false, true, true),
      s"one-cycle retention: build aged out, delete+append live — $h2")
    intercept[IllegalArgumentException] { Retrieval.lexRelationAsOf(spark, idx, 1) }
    assert(asOf(2) == afterDelete,
      "the delete snapshot must keep its own census: post-delete " +
        "scores, appended batch invisible")
  }

  test("delete wins over re-ingest: a tombstoned id arriving in a new " +
    "batch is anti-joined out, so stats never diverge from a survivor " +
    "rebuild (lexical + dedup + vector)") {
    // LEXICAL: the r14 ADVICE gap — re-appending a deleted doc_id used
    // to increment df/n/sum_dl while the postings stayed probe-invisible,
    // permanently diverging scores from a rebuild; the next compaction
    // then dropped the postings but KEPT the inflated stats
    val corpus = docs(80).select(col("doc_id"),
      concat(col("text"), lit(" needle")).as("text"))
    val idx = TempDirs.create("graft-reingest-lex").toString
    Retrieval.buildLexicalIndexDf(spark, corpus, idx)
    val victims = corpus.filter(col("doc_id") % 4 === 1)
    Retrieval.deleteFromLexicalIndex(spark, victims.select("doc_id"), idx)
    // the poisoned batch: every victim again, plus genuinely-new docs
    val freshDocs = docs(20, base = 9000).select(col("doc_id"),
      concat(col("text"), lit(" needle")).as("text"))
    val out = Retrieval.appendLexicalIndex(spark,
      victims.unionAll(freshDocs), idx)
    assert(out("skipped_tombstoned") == 20L, out.toString)
    assert(out("appended") == 20L && out("docs") == 80L, out.toString)
    // ground truth: survivors + fresh, built from scratch
    val truth = TempDirs.create("graft-reingest-truth").toString
    Retrieval.buildLexicalIndexDf(spark,
      corpus.filter(col("doc_id") % 4 =!= 1).unionAll(freshDocs), truth)
    assert(probeScores(idx, Seq("needle")) ==
      probeScores(truth, Seq("needle")),
      "post-re-ingest scores must equal the survivor+fresh rebuild")
    // and the physical purge keeps them equal (the stats were never
    // inflated, so compaction cannot expose a divergence)
    Retrieval.compactLexicalIndex(spark, idx)
    assert(probeScores(idx, Seq("needle")) ==
      probeScores(truth, Seq("needle")))

    // DEDUP: a deleted doc re-appended must not come back as an exact hit
    val d = docs(60).select(col("doc_id"), col("text"))
    val dIdx = TempDirs.create("graft-reingest-dedup").toString
    Dedup.buildDedupIndex(spark, d, dIdx)
    val dVictims = d.filter(col("doc_id") % 6 === 3)
    Dedup.deleteFromDedupIndex(spark, dVictims.select("doc_id"), dIdx)
    Dedup.appendDedupIndex(spark, dVictims, dIdx) // the poisoned batch
    val probe = Dedup.incrementVsIndex(spark,
      dVictims.select((col("doc_id") + 500000).as("doc_id"), col("text")),
      dIdx).collect()
    assert(probe.forall(_.getString(1) != "exact"),
      "re-ingested tombstoned docs must stay invisible to exact lookups")
    assert(Dedup.readIndexMeta(spark, dIdx).count == 50L,
      "the live count must not absorb the skipped re-ingest")

    // VECTOR: a deleted vec_id re-appended must not resurface in probes
    val vSrc = TempDirs.create("graft-reingest-vecsrc").toString
    spark.range(100)
      .select(col("id").as("vec_id"), (col("id") % 4).cast("int").as("label"))
      .select(col("vec_id"), org.apache.spark.sql.functions.expr(
        "transform(sequence(0, 15), i -> CAST(" +
          "(pmod(hash(label, i), 2001) - 1000) / 1000.0 + " +
          "(pmod(hash(vec_id, i, 7), 201) - 100) / 100.0 * 0.15 AS FLOAT))")
        .as("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$vSrc/embeddings.parquet")
    val vIdx = TempDirs.create("graft-reingest-vec").toString
    graft.queries.Similarity.buildVectorIndex(spark, vSrc, vIdx)
    graft.queries.Similarity.deleteFromVectorIndex(spark, Seq(7L), vIdx)
    graft.queries.Similarity.appendVectorIndexDf(spark,
      spark.read.parquet(s"$vSrc/embeddings.parquet")
        .filter(col("vec_id") === 7L), vIdx)
    val live = spark.sql("SELECT vec_id FROM " +
      graft.queries.Similarity.artifactRelation(vIdx)("vectors") + " v")
      .collect().map(_.getLong(0)).toSet
    assert(!live.contains(7L),
      "a tombstoned vec_id must never re-enter the live view")
  }

  // ---------------- mixture statistics ----------------

  test("mixture delete is the monoid's negative batch: served weights " +
    "equal a rebuild over survivors; compaction folds the negatives away") {
    val corpus = docs(200).select(col("doc_id"), col("source"), col("text"))
    val idx = TempDirs.create("graft-mixdel-spec").toString
    Pipeline.buildMixtureStatsDf(spark,
      corpus.select(col("source"), col("text")), idx)
    val victims = corpus.filter(col("doc_id") % 5 === 2)
    val out = Pipeline.deleteMixtureStats(spark,
      victims.select(col("source"), col("text")), idx)
    assert(out("deleted_docs") == 40L && out("docs") == 160L)
    val truthIdx = TempDirs.create("graft-mixdel-truth").toString
    Pipeline.buildMixtureStatsDf(spark,
      corpus.filter(col("doc_id") % 5 =!= 2)
        .select(col("source"), col("text")), truthIdx)
    def weights(p: String): Seq[(String, Long, Long, Long)] =
      Pipeline.mixtureWeights(spark, p).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq.sorted
    val afterDelete = weights(idx)
    assert(afterDelete == weights(truthIdx),
      "negative-batch fold must cancel the deleted docs exactly")
    // compaction folds the negative batch away physically: one batch,
    // no zero rows, weights unchanged
    Pipeline.compactMixtureStats(spark, idx)
    assert(weights(idx) == afterDelete)
    val folded = spark.read.parquet(
      s"$idx/counts.v1/batch=0")
    assert(folded.filter(col("c") <= 0).count() == 0L,
      "folded counts must carry no zero/negative rows")
  }

  // ---------------- dedup index ----------------

  test("dedup delete: tombstoned docs can never be an exact hit, a band " +
    "candidate, or a verify partner; appends carry the tombstones") {
    val d = docs(200)
    val idx = TempDirs.create("graft-deddel-spec").toString
    Dedup.buildDedupIndex(spark, d, idx)
    val out = Dedup.deleteFromDedupIndex(spark,
      d.filter(col("doc_id") < 20).select("doc_id"), idx)
    assert(out("deleted") == 20L && out("count") == 180L &&
      out("tombstones") == 20L)
    // idempotent retry + absent-id no-op
    val again = Dedup.deleteFromDedupIndex(spark,
      spark.range(20).select(col("id").as("doc_id"))
        .unionAll(spark.range(3).select((col("id") + 888000).as("doc_id"))),
      idx)
    assert(again("deleted") == 0L && again("tombstones") == 20L)
    // exact clones of DELETED docs come back 'new' (synthetic content is
    // unique per id — no surviving same-content fallback here); clones
    // of SURVIVORS still land 'exact'
    val probe = d.filter(col("doc_id") < 20 || col("doc_id") >= 190)
      .select((col("doc_id") + 900000).as("doc_id"), col("text"))
    val v = Dedup.incrementVsIndex(spark, probe, idx)
      .collect().map(r => (r.getLong(0) - 900000, r.getString(1))).toMap
    (0L until 20L).foreach(id =>
      assert(v(id) == "new", s"deleted doc $id still matched: ${v(id)}"))
    (190L until 200L).foreach(id =>
      assert(v(id) == "exact", s"survivor clone $id: ${v(id)}"))
    // an append AFTER the delete keeps the tombstones in force
    Dedup.appendDedupIndex(spark, docs(10, base = 5000), idx)
    val v2 = Dedup.incrementVsIndex(spark,
        d.filter(col("doc_id") < 5).select(
          (col("doc_id") + 950000).as("doc_id"), col("text")), idx)
      .collect().map(r => (r.getLong(0) - 950000, r.getString(1))).toMap
    (0L until 5L).foreach(id => assert(v2(id) == "new"))
    val info = Dedup.dedupIndexInfo(spark, idx)
    assert(info("count") == 190L && info("tombstones") == 20L)
  }

  test("dedup delete falls back to a surviving same-content doc: the " +
    "per-doc fingerprint rows make group deletes rebuild-equivalent") {
    // two ids share content; delete the group's MIN representative — an
    // exact probe must now resolve to the survivor, exactly as a rebuilt
    // index would (the min-compressed fp of r13 could not express this)
    val base = docs(50).select(col("doc_id"), col("text"))
    val clone = base.filter(col("doc_id") === 7)
      .select(lit(400L).as("doc_id"), col("text"))
    val idx = TempDirs.create("graft-deddel-grp").toString
    Dedup.buildDedupIndex(spark, base.unionAll(clone), idx)
    Dedup.deleteFromDedupIndex(spark,
      spark.range(1).select(lit(7L).as("doc_id")), idx)
    val v = Dedup.incrementVsIndex(spark,
        base.filter(col("doc_id") === 7)
          .select(lit(990000L).as("doc_id"), col("text")), idx)
      .collect().map(r => (r.getString(1), r.get(2))).head
    assert(v._1 == "exact" && v._2 == 400L,
      s"group delete must fall back to the surviving member: $v")
  }
}
