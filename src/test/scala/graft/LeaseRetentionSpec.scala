package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Dedup, Pipeline, Retrieval, Similarity}
import graft.stream.{PointerCommit, VersionedPutCommit}

/** Round-15 commit-protocol hardening, spec-gated:
  *
  *  - CROSS-PROCESS WRITER LEASE: the batch-numbered appends
  *    (lexical/dedup/mixture) claim their batch number through the
  *    create-if-absent primitive BEFORE staging — a racing append from
  *    another process aborts loudly instead of staging the same
  *    Overwrite-scoped batch dir and being silently absorbed by
  *    whichever meta publish lands last. Expired leases (crashed
  *    holders) are taken over.
  *  - BOUNDED PUBLISH RETRY: only already-exists means "version taken";
  *    persistent IO failure propagates instead of spinning forever.
  *  - CONFIGURABLE RETENTION DEPTH (-Dgraft.retain.generations): depth
  *    N keeps the last N prior snapshots as-of readable across every
  *    family; depth 1 is the historical one-cycle rule.
  */
class LeaseRetentionSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def docs(n: Int, base: Long = 0L): DataFrame =
    spark.range(n).select(
      (col("id") + base).as("doc_id"),
      concat(lit("src"), (col("id") % 4).cast("string")).as("source"),
      concat_ws(" ", (0 until 12).map(i =>
        md5(concat(col("id") + base, lit(i)))): _*).as("text"))

  /** Hand-write a FOREIGN claim (a uuid this process never issued) for
    * `batch` — exactly what a concurrent append from another process
    * leaves between its claim and its meta commit. */
  private def foreignClaim(indexDir: String, batch: Int,
      ageMs: Long = 0L): java.nio.file.Path = {
    val dir = java.nio.file.Paths.get(indexDir, "claims")
    java.nio.file.Files.createDirectories(dir)
    val p = dir.resolve(s"batch-$batch")
    java.nio.file.Files.write(p,
      s"${java.util.UUID.randomUUID()} ${System.currentTimeMillis() - ageMs}"
        .getBytes(UTF_8))
    p
  }

  test("lexical append vs a foreign live claim: aborts loudly, stages " +
    "nothing; an EXPIRED lease is taken over") {
    val idx = TempDirs.create("graft-lease-lex").toString
    Retrieval.buildLexicalIndexDf(spark, docs(60), idx)
    foreignClaim(idx, batch = 1)
    val e = intercept[IllegalStateException] {
      Retrieval.appendLexicalIndex(spark, docs(10, base = 1000), idx)
    }
    assert(e.getMessage.contains("claimed by another writer"))
    // nothing staged: no batch=1 dirs, meta unchanged
    assert(!java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(idx, "terms", "batch=1")),
      "the losing append must not stage over the winner's batch")
    assert(Retrieval.lexicalIndexInfo(spark, idx)("docs") == 60L)
    // the same claim PAST the lease TTL reads as a crashed holder
    foreignClaim(idx, batch = 1, ageMs = 16L * 60 * 1000)
    val out = Retrieval.appendLexicalIndex(spark, docs(10, base = 1000), idx)
    assert(out("appended") == 10L && out("docs") == 70L)
  }

  test("compaction resets batch numbering, so it clears the claims of " +
    "the previous numbering — the next append re-claims batch 1 freely") {
    // the sequence the round-16 token pruning exposed: append commits
    // batch 1 (claim object left as debris for the entry sweep), compact
    // folds batches back to 1, the NEXT append claims batch 1 again —
    // without the compaction clearing claims, the stale object would
    // block it (in-process) or stall it a full lease TTL (cross-process)
    val idx = TempDirs.create("graft-lease-compact").toString
    Retrieval.buildLexicalIndexDf(spark, docs(60), idx)
    assert(Retrieval.appendLexicalIndex(
      spark, docs(10, base = 5000), idx)("batches") == 2L)
    Retrieval.compactLexicalIndex(spark, idx)
    assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(idx, "claims")) ||
      !java.nio.file.Files.list(java.nio.file.Paths.get(idx, "claims"))
        .findAny().isPresent,
      "compaction must clear the previous numbering's claims")
    val out = Retrieval.appendLexicalIndex(spark, docs(10, base = 6000), idx)
    assert(out("appended") == 10L && out("batches") == 2L)

    val mIdx = TempDirs.create("graft-lease-mixcompact").toString
    Pipeline.buildMixtureStatsDf(spark, docs(60).select("source", "text"), mIdx)
    Pipeline.appendMixtureStats(spark,
      docs(10, base = 7000).select("source", "text"), mIdx)
    Pipeline.compactMixtureStats(spark, mIdx)
    val m2 = Pipeline.appendMixtureStats(spark,
      docs(10, base = 8000).select("source", "text"), mIdx)
    assert(m2("appended_docs") == 10L && m2("batches") == 2L)
  }

  test("an interrupted compaction's stranded claims are swept at the " +
    "next append instead of stalling it a full lease TTL (verdict r16 " +
    "finding 3) — and the sweep gate CLOSES once steady state resumes") {
    // the crash window: compact publishes its meta (kind=compact,
    // batches -> 1) and dies BEFORE clearClaims — the old numbering's
    // claims survive on disk looking fresh. Simulate by compacting
    // normally, then hand-writing the debris a crashed compact leaves:
    // a fresh foreign claim for batch 1 (the old numbering's next
    // number, age < TTL).
    val idx = TempDirs.create("graft-lease-crashwin").toString
    Retrieval.buildLexicalIndexDf(spark, docs(60), idx)
    Retrieval.appendLexicalIndex(spark, docs(10, base = 5000), idx)
    Retrieval.compactLexicalIndex(spark, idx)
    foreignClaim(idx, batch = 1) // the stranded old-numbering claim
    // without the sweep this append throws "claimed by another writer"
    // and the operator waits out the 15-min lease; with it, the debris
    // clears (the last commit IS the numbering reset) and the append
    // proceeds immediately
    val out = Retrieval.appendLexicalIndex(spark, docs(10, base = 6000), idx)
    assert(out("appended") == 10L && out("batches") == 2L)
    // steady state: the last commit is now an APPEND — a fresh foreign
    // claim is a live concurrent writer again and must block, not sweep
    foreignClaim(idx, batch = 2)
    val e = intercept[IllegalStateException] {
      Retrieval.appendLexicalIndex(spark, docs(10, base = 7000), idx)
    }
    assert(e.getMessage.contains("claimed by another writer"))

    // the mixture family shares the discipline (append AND delete paths)
    val mIdx = TempDirs.create("graft-lease-crashwin-mix").toString
    Pipeline.buildMixtureStatsDf(spark,
      docs(60).select("source", "text"), mIdx)
    Pipeline.appendMixtureStats(spark,
      docs(10, base = 7000).select("source", "text"), mIdx)
    Pipeline.compactMixtureStats(spark, mIdx)
    foreignClaim(mIdx, batch = 1)
    val m = Pipeline.deleteMixtureStats(spark,
      docs(5, base = 7000).select("source", "text"), mIdx)
    assert(m("deleted_docs") == 5L && m("batches") == 2L)
  }

  test("dedup and mixture appends honor the same lease") {
    val dIdx = TempDirs.create("graft-lease-dedup").toString
    Dedup.buildDedupIndex(spark, docs(60).select("doc_id", "text"), dIdx)
    foreignClaim(dIdx, batch = 1)
    val e1 = intercept[IllegalStateException] {
      Dedup.appendDedupIndex(spark,
        docs(10, base = 2000).select("doc_id", "text"), dIdx)
    }
    assert(e1.getMessage.contains("claimed by another writer"))

    val mIdx = TempDirs.create("graft-lease-mix").toString
    Pipeline.buildMixtureStatsDf(spark,
      docs(60).select("source", "text"), mIdx)
    foreignClaim(mIdx, batch = 1)
    val e2 = intercept[IllegalStateException] {
      Pipeline.appendMixtureStats(spark,
        docs(10, base = 3000).select("source", "text"), mIdx)
    }
    assert(e2.getMessage.contains("claimed by another writer"))
  }

  test("publish propagates a persistent IO failure instead of spinning " +
    "(only already-exists means 'version taken')") {
    val dir = TempDirs.create("graft-failing-fs").toString
    val failing = new org.apache.hadoop.fs.RawLocalFileSystem() {
      override def create(f: org.apache.hadoop.fs.Path,
          permission: org.apache.hadoop.fs.permission.FsPermission,
          overwrite: Boolean, bufferSize: Int, replication: Short,
          blockSize: Long,
          progress: org.apache.hadoop.util.Progressable)
          : org.apache.hadoop.fs.FSDataOutputStream =
        throw new java.io.IOException("quota exceeded (injected)")
      override def create(f: org.apache.hadoop.fs.Path,
          overwrite: Boolean, bufferSize: Int, replication: Short,
          blockSize: Long,
          progress: org.apache.hadoop.util.Progressable)
          : org.apache.hadoop.fs.FSDataOutputStream =
        throw new java.io.IOException("quota exceeded (injected)")
    }
    failing.initialize(java.net.URI.create("file:///"),
      new org.apache.hadoop.conf.Configuration())
    val e = intercept[java.io.IOException] {
      VersionedPutCommit.publish(failing,
        new org.apache.hadoop.fs.Path(dir, "meta.json"), "x".getBytes(UTF_8))
    }
    assert(e.getMessage.contains("quota exceeded"))
  }

  // ---------------- retention depth ----------------

  private def withDepth[A](n: Int)(f: => A): A = {
    val prev = sys.props.get("graft.retain.generations")
    sys.props("graft.retain.generations") = n.toString
    try f finally prev match {
      case Some(v) => sys.props("graft.retain.generations") = v
      case None => sys.props -= "graft.retain.generations"
    }
  }

  test("retention depth 2, lexical: three post-build flips leave BOTH " +
    "prior snapshots queryable; the third back refuses loudly") {
    withDepth(2) {
      val corpus = docs(90).select(col("doc_id"),
        concat(col("text"), lit(" needle")).as("text"))
      val idx = TempDirs.create("graft-depth-lex").toString
      Retrieval.buildLexicalIndexDf(spark, corpus, idx)
      def probe(rel: String => String): Seq[(Long, Long)] =
        spark.sql(Retrieval.bm25NamedSql(rel, "'needle'", "1000"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val live = () => probe(Retrieval.lexRelation(spark, idx))
      val after = scala.collection.mutable.Map.empty[Int, Seq[(Long, Long)]]
      after(1) = live()
      (0 until 3).foreach { i =>
        Retrieval.deleteFromLexicalIndex(spark,
          corpus.filter(col("doc_id") % 9 === i).select("doc_id"), idx)
        after(i + 2) = live()
      }
      val h = Retrieval.lexicalIndexHistory(spark, idx)
      assert(h.map(_("kind")) == Seq("build", "delete", "delete", "delete"))
      assert(h.map(_("readable")) == Seq(false, true, true, true),
        s"depth 2 must keep the TWO prior snapshots readable: $h")
      // both priors reproduce their exact historical answers
      assert(probe(Retrieval.lexRelationAsOf(spark, idx, 3)) == after(3))
      assert(probe(Retrieval.lexRelationAsOf(spark, idx, 2)) == after(2))
      // the third back is past the window — loud, never partial
      val e = intercept[IllegalArgumentException] {
        Retrieval.lexRelationAsOf(spark, idx, 1)
      }
      assert(e.getMessage.contains("retention boundary"))
    }
  }

  test("retention depth 2, vector: the manifest retains two displaced " +
    "generations; as-of counts step back through both deletes") {
    withDepth(2) {
      val d = TempDirs.create("graft-depth-vec").toString
      spark.range(300)
        .select(col("id").as("vec_id"), (col("id") % 5).cast("int").as("label"))
        .select(col("vec_id"), expr(
          "transform(sequence(0, 15), i -> CAST(" +
            "(pmod(hash(label, i), 2001) - 1000) / 1000.0 + " +
            "(pmod(hash(vec_id, i, 7), 201) - 100) / 100.0 * 0.15 AS FLOAT))")
          .as("embedding"), col("label"))
        .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
      val idx = TempDirs.create("graft-depth-vecidx").toString
      Similarity.buildVectorIndex(spark, d, idx)
      def liveCount(rel: String => String): Long =
        spark.sql(s"SELECT count(*) AS c FROM ${rel("vectors")} v")
          .head().getLong(0)
      Similarity.deleteFromVectorIndex(spark, (0L until 10L), idx)
      Similarity.deleteFromVectorIndex(spark, (10L until 30L), idx)
      Similarity.deleteFromVectorIndex(spark, (30L until 60L), idx)
      val h = Similarity.vectorIndexHistory(spark, idx)
      assert(h.map(_("kind")) == Seq("build", "delete", "delete", "delete"))
      assert(h.map(_("readable")) == Seq(false, true, true, true), h.toString)
      assert(liveCount(Similarity.artifactRelationAsOf(idx, 4)) == 240L)
      assert(liveCount(Similarity.artifactRelationAsOf(idx, 3)) == 270L)
      assert(liveCount(Similarity.artifactRelationAsOf(idx, 2)) == 290L)
      val e = intercept[IllegalArgumentException] {
        Similarity.artifactRelationAsOf(idx, 1)
      }
      assert(e.getMessage.contains("retention boundary"))
    }
  }

  test("retention depth 2, dedup + mixture: the remaining two families " +
    "honor the same window") {
    withDepth(2) {
      // DEDUP: three post-build delete flips; as-of sees each boundary
      val d = docs(90).select(col("doc_id"), col("text"))
      val idx = TempDirs.create("graft-depth-dedup").toString
      Dedup.buildDedupIndex(spark, d, idx)
      (0 until 3).foreach { i =>
        Dedup.deleteFromDedupIndex(spark,
          d.filter(col("doc_id") % 9 === i).select("doc_id"), idx)
      }
      val h = Dedup.dedupHistory(idx)
      assert(h.map(_._2) == Seq("build", "delete", "delete", "delete"))
      // probe: exact clones of the FIRST delete's victims — visible in
      // the build snapshot, already gone by the second delete's
      val probe = d.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 800000).as("doc_id"), col("text"))
      def exactHits(seq: Int): Long =
        Dedup.incrementVsIndexAsOf(spark, probe, idx, seq)
          .filter(col("verdict") === "exact").count()
      assert(exactHits(4) == 0L, "live: all three victim groups gone")
      assert(exactHits(3) == 0L)
      assert(exactHits(2) == 0L)
      // seq 1 (the build) is the THIRD snapshot back from seq 4 — past
      // the depth-2 window, its del generation... the build has no del
      // artifact at all, so its readability hinges on nothing swept;
      // the delete sweeps kept the last 2 snapshots' del generations
      // only. Pin whatever dedupMetaAsOf says against the actual census:
      val h1 = Dedup.dedupIndexHistory(spark, idx)
      assert(h1.map(_("readable")).drop(1) == Seq(true, true, true),
        s"the two prior delete snapshots must stay readable: $h1")

      // MIXTURE: compaction is what retires counts generations — at
      // depth 2 two compactions back stays foldable, three refuses
      val corpus = docs(120).select(col("source"), col("text"))
      val mIdx = TempDirs.create("graft-depth-mix").toString
      Pipeline.buildMixtureStatsDf(spark, corpus, mIdx)
      val full = Pipeline.mixtureWeightsAsOf(spark, mIdx, 1).collect().toSeq
      Pipeline.deleteMixtureStats(spark,
        docs(120).filter(col("doc_id") % 6 === 1)
          .select(col("source"), col("text")), mIdx)
      Pipeline.compactMixtureStats(spark, mIdx) // c3: counts.v1
      Pipeline.compactMixtureStats(spark, mIdx) // c4: counts.v2
      val mh = Pipeline.mixtureStatsHistory(spark, mIdx)
      assert(mh.map(_("kind")) ==
        Seq("build", "delete", "compact", "compact"))
      // the pre-delete state is still foldable (its counts generation
      // survived two compactions under depth 2) and integer-exact
      assert(Pipeline.mixtureWeightsAsOf(spark, mIdx, 1)
        .collect().toSeq == full,
        "the monoid's batch prefix must reproduce the pre-delete mixture")
      // a third compaction retires it
      Pipeline.compactMixtureStats(spark, mIdx)
      val e = intercept[IllegalArgumentException] {
        Pipeline.mixtureWeightsAsOf(spark, mIdx, 1)
      }
      assert(e.getMessage.contains("retention boundary"))
    }
  }

  test("vector as-of census pin: rows appended after a commit are " +
    "invisible to that commit's snapshot") {
    val d = TempDirs.create("graft-census-src").toString
    spark.range(200)
      .select(col("id").as("vec_id"), (col("id") % 5).cast("int").as("label"))
      .select(col("vec_id"), expr(
        "transform(sequence(0, 15), i -> CAST(" +
          "(pmod(hash(label, i), 2001) - 1000) / 1000.0 + " +
          "(pmod(hash(vec_id, i, 7), 201) - 100) / 100.0 * 0.15 AS FLOAT))")
        .as("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val idx = TempDirs.create("graft-census-idx").toString
    Similarity.buildVectorIndex(spark, d, idx)
    // commit 2: a delete (any manifest flip records the census)
    Similarity.deleteFromVectorIndex(spark, Seq(0L), idx)
    // vector appends write IN PLACE — no flip, no history line
    val inc = spark.range(50)
      .select((col("id") + 1000).as("vec_id"), (col("id") % 5).cast("int").as("label"))
      .select(col("vec_id"), expr(
        "transform(sequence(0, 15), i -> CAST(" +
          "(pmod(hash(label, i), 2001) - 1000) / 1000.0 + " +
          "(pmod(hash(vec_id, i, 7), 201) - 100) / 100.0 * 0.15 AS FLOAT))")
        .as("embedding"), col("label"))
    Similarity.appendVectorIndexDf(spark, inc, idx)
    def cnt(rel: String => String): Long =
      spark.sql(s"SELECT count(*) AS c FROM ${rel("vectors")} v")
        .head().getLong(0)
    assert(cnt(Similarity.artifactRelation(idx)) == 249L,
      "live view sees the appended rows (200 - 1 deleted + 50)")
    assert(cnt(Similarity.artifactRelationAsOf(idx, 2)) == 199L,
      "the as-of snapshot pins its recorded file census — appended " +
        "rows must NOT leak into history")
    assert(cnt(Similarity.artifactRelationAsOf(idx, 1)) == 200L,
      "the build snapshot (pre-delete, pre-append) is exactly the corpus")
  }

  test("a torn HISTORY tail cut exactly before its crc token drops — " +
    "censuses and crcs shipped together, so a census-carrying line " +
    "without a crc can only be torn") {
    val d = TempDirs.create("graft-torncensus-src").toString
    spark.range(80)
      .select(col("id").as("vec_id"), (col("id") % 5).cast("int").as("label"))
      .select(col("vec_id"), expr(
        "transform(sequence(0, 15), i -> CAST(" +
          "(pmod(hash(label, i), 2001) - 1000) / 1000.0 + " +
          "(pmod(hash(vec_id, i, 7), 201) - 100) / 100.0 * 0.15 AS FLOAT))")
        .as("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val idx = TempDirs.create("graft-torncensus-idx").toString
    Similarity.buildVectorIndex(spark, d, idx)
    val before = Similarity.manifestHistory(idx)
    assert(before.size == 1)
    val hist = java.nio.file.Paths.get(idx, "HISTORY")
    // the crash shape: a census line truncated at a comma boundary
    // exactly before " crc=" — it parses as a self-consistent SMALLER
    // census, which would silently mis-pin an as-of read
    java.nio.file.Files.write(hist,
      "\n2 append census:vectors=part-00000-torn".getBytes(UTF_8),
      java.nio.file.StandardOpenOption.APPEND)
    assert(Similarity.manifestHistory(idx) == before,
      "a crc-less line carrying a census token must drop as torn")
    // pre-census LEGACY lines (no census token, no crc) still parse
    java.nio.file.Files.write(hist,
      "\n2 compact vectors=vectors".getBytes(UTF_8),
      java.nio.file.StandardOpenOption.APPEND)
    assert(Similarity.manifestHistory(idx).size == 2)
  }
}
