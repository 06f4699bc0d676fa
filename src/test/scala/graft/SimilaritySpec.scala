package graft

import org.scalatest.funsuite.AnyFunSuite

/** ANN quality invariants. The synthetic embeddings are ISOTROPIC (mean
  * within-label cosine ≈ across-label, measured ~0.005 both), so no
  * index can beat the scanned fraction on this data — recall ≈ scan
  * fraction is the information-theoretic ceiling, and these assertions
  * pin the structural guarantees that hold regardless: probe-2's
  * candidate set contains probe-1's (recall can only match or improve),
  * every ANN result is a SUBSET-correct ranking (its hits are true
  * neighbors of the scanned region), and nothing degenerates to zero.
  * On clustered real-world embeddings the same operators approach
  * recall 1.0 at the same scan fractions.
  */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.01"

  private def rows(name: String): Seq[(Long, Double)] =
    SparkEntry.queries(name)(spark, dir).collect()
      .map(r => (r.getLong(r.fieldIndex("vec_id")),
        r.getDouble(r.fieldIndex("cos")))).toSeq

  test("probe-2 recall >= probe-1 recall against brute-force truth") {
    val truth = rows("q_knn_brute").map(_._1).toSet
    assert(truth.size == 10)
    val r1 = (rows("q_knn_ivf").map(_._1).toSet & truth).size
    val r2 = (rows("q_knn_ivf2").map(_._1).toSet & truth).size
    assert(r2 >= r1, s"probe-2 recall $r2 below probe-1 $r1")
    assert(r2 >= 1, "probe-2 found no true neighbor at all")
  }

  test("ANN results are internally consistent with the exact ranking") {
    val bruteCos = rows("q_knn_brute").toMap
    for (q <- Seq("q_knn_ivf", "q_knn_ivf2", "q_knn_lsh")) {
      val rs = rows(q)
      assert(rs.nonEmpty, s"$q returned nothing")
      // scores are non-increasing (a real ranking)
      val cs = rs.map(_._2)
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, s"$q not ranked")
      // any id the ANN shares with the brute top-10 carries the IDENTICAL
      // exact cosine — same decimal fold on both paths
      rs.foreach { case (id, c) =>
        bruteCos.get(id).foreach(bc => assert(bc == c,
          s"$q: cos for $id differs from brute force ($c vs $bc)"))
      }
    }
  }

  /** CLUSTERED synthetic corpus: 10 tight label clusters (center from
    * hash(label, dim), noise amplitude 0.15 of unit center scale) — the
    * real-world embedding geometry the isotropic driver table can't
    * provide, making recall MEASURABLE instead of scan-fraction-bound.
    * Deterministic: centers and noise are pure hash functions, no RNG. */
  private lazy val clusteredDir: String = {
    import org.apache.spark.sql.functions._
    val d = graft.TempDirs.create("graft-clustered").toString
    spark.range(2000)
      .select(col("id").as("vec_id"), (col("id") % 10).cast("int").as("label"))
      .select(col("vec_id"), expr(
        "transform(sequence(0, 63), i -> CAST(" +
          "(pmod(hash(label, i), 2001) - 1000) / 1000.0 + " +
          "(pmod(hash(vec_id, i, 7), 201) - 100) / 100.0 * 0.15 AS FLOAT))")
        .as("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private def clusteredIds(name: String): Seq[Long] =
    SparkEntry.queries(name)(spark, clusteredDir).collect()
      .map(_.getLong(0)).toSeq

  test("clustered corpus: IVF and LSH recall targets at declared scan fractions") {
    import org.apache.spark.sql.functions._
    val truth = clusteredIds("q_knn_brute").toSet
    assert(truth.size == 10)
    def recall(name: String): Double =
      (clusteredIds(name).toSet & truth).size / 10.0
    val r1 = recall("q_knn_ivf")
    val r2 = recall("q_knn_ivf2")
    val rl = recall("q_knn_lsh")
    // scan fractions: probe-1 reads one cell (~1/10 of the corpus),
    // probe-2 two cells (~1/5); on clustered data that buys near-total
    // recall — the declared targets the isotropic table cannot measure
    info(f"clustered recall@10: ivf=$r1%.2f ivf2=$r2%.2f lsh=$rl%.2f")
    assert(r1 >= 0.8, f"probe-1 IVF recall $r1%.2f below 0.8 at ~10%% scan")
    assert(r2 >= 0.9, f"probe-2 IVF recall $r2%.2f below 0.9 at ~20%% scan")
    assert(r2 >= r1, "probe-2 recall must not fall below probe-1")
    assert(rl >= 0.5, f"LSH recall $rl%.2f below 0.5")
    // the probed cell really is ~a tenth of the corpus (the scan-fraction
    // half of the recall-at-scan-fraction claim)
    val emb = graft.Tables.df(spark, clusteredDir, "embeddings")
    val total = emb.count().toDouble
    val largestCell = emb.groupBy("label").count()
      .agg(max("count")).head().getLong(0).toDouble
    assert(largestCell / total <= 0.15,
      f"largest IVF cell is ${largestCell / total}%.2f of the corpus")
  }

  test("product quantization: valid codes, sorted ADC, useful recall") {
    // structural checks on the driver fixture (isotropic noise — distance
    // contrast too flat to measure recall there, as with IVF above)
    val rows = SparkEntry.queries("q_emb_pq")(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      (1 to 4).foreach(m => assert(r.getLong(m) >= 0 && r.getLong(m) < 8))
    }
    val dists = rows.map(_.getLong(5))
    assert(dists.sameElements(dists.sorted), "ADC ranking out of order")
    // on the CLUSTERED corpus the promise 4-byte codes CAN make is
    // cluster-level: every ADC top-10 hit must be a cluster-mate of the
    // query (codes collapse a tight cluster to one tuple, so ranking
    // WITHIN the cluster is tie-broken by id — recall@10 against the
    // exact ranking is not the PQ contract, cluster membership is)
    import org.apache.spark.sql.functions._
    val crows = SparkEntry.queries("q_emb_pq")(spark, clusteredDir).collect()
    val labels = spark.read.parquet(s"$clusteredDir/embeddings.parquet")
      .select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val qLabel = labels(0L)
    val hits = crows.map(_.getLong(0)).count(id => labels(id) == qLabel)
    info(s"PQ ADC top-10 cluster-mates on clustered corpus: $hits/10")
    assert(hits == 10, s"ADC search left the query's cluster: $hits/10")
    // the IVF composition probes the query's cell and ADC-ranks within
    // it — every hit must carry that cell
    val ivfpq = SparkEntry.queries("q_knn_ivfpq")(spark, clusteredDir).collect()
    assert(ivfpq.length == 10 &&
      ivfpq.forall(_.getLong(1) == qLabel.toLong),
      "q_knn_ivfpq returned rows outside the probed cell")
  }

  test("two-stage kNN recall@10 vs brute truth: measured, bounded, and " +
    "every hit a cluster-mate (the PQ tie-collapse ceiling made explicit)") {
    // the trade the persisted-index probe makes, finally MEASURED against
    // q_knn_brute on the corpus where recall means something. Geometry of
    // the ceiling: a tight cluster collapses to ONE code tuple, so the
    // ADC stage's 50 candidates tie at equal distance and break by
    // vec_id — the candidate set is ~C/cellsize of the right cell
    // (50/200 = 0.25 here), and recall@10 lands near that fraction, NOT
    // near 1.0 (the exact re-rank is perfect WITHIN the candidates; the
    // documented PQ contract is cluster membership, not in-cluster
    // order). Pinning the measured 0.20 at a 0.15 floor makes any future
    // cell-count / candidate-width / codebook change show its recall
    // cost here; the isotropic decade rows live in SCALE.md
    // (ProfileVectorIndex prints two_stage_recall_at_10).
    import org.apache.spark.sql.functions._
    import graft.queries.Similarity
    val truth = clusteredIds("q_knn_brute").toSet
    assert(truth.size == 10)
    val idx = graft.TempDirs.create("graft-recall2s").toString
    Similarity.buildVectorIndex(spark, clusteredDir, idx)
    val qvec = spark.read.parquet(s"$clusteredDir/embeddings.parquet")
      .filter(col("vec_id") === 0)
      .select(transform(col("embedding"),
        x => floor(x.cast("double") * 64 + lit(0.5)).cast("long")).as("v"))
      .head().getSeq[Long](0).mkString(",")
    // limit 11: the query vector itself sits in the index at distance 0
    val got = spark.sql(Similarity.twoStageKnnSql(
        Similarity.artifactRelation(idx), s"'$qvec'", "11"))
      .collect().map(_.getLong(0)).filter(_ != 0L).take(10)
    assert(got.length == 10)
    val recall = (got.toSet & truth).size / 10.0
    info(f"two-stage recall@10 on clustered corpus: $recall%.2f " +
      "(ceiling ~C/cellsize = 0.25 under tie-collapse)")
    assert(recall >= 0.15,
      f"two-stage recall $recall%.2f fell below the 0.15 floor — a cell " +
        "or candidate-width change is costing recall")
    // the stronger structural promise: every hit is a cluster-mate of
    // the query (the candidate stage never leaves the right cell)
    val labels = spark.read.parquet(s"$clusteredDir/embeddings.parquet")
      .select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.forall(id => labels(id) == labels(0L)),
      s"two-stage hits left the query's cluster: ${got.toSeq}")
  }

  test("matryoshka prefix probe: measured recall@10 vs brute truth on the " +
    "clustered corpus — the prefix-width trade pinned") {
    // q_knn_matryoshka pins rerank ORDER (GatesSpec); this pins the
    // prefix's RECALL: on the corpus where recall means something, the
    // 16-dim first pass must keep enough of the true top-10 in its C=50
    // candidate pool that the exact re-rank recovers them. A prefix-width
    // change now shows its recall cost here (and as the
    // matryoshka_recall_at_10 decade row in ProfileVectorIndex).
    val truth = clusteredIds("q_knn_brute").toSet
    assert(truth.size == 10)
    val got = clusteredIds("q_knn_matryoshka").toSet
    val recall = (got & truth).size / 10.0
    // measured 0.60 at prefix-16/C=50: within a tight 200-mate cluster
    // the prefix ordering is only PARTIALLY faithful to the full-dim
    // ordering (that is the matryoshka trade). The informative baseline
    // is candidate-pool chance — 50 random cluster-mates of 200 would
    // land E[recall] = 0.25 — so the 0.4 floor is well above chance and
    // well below the measured value: a prefix-width regression toward
    // random candidates trips it, fixture noise does not.
    info(f"matryoshka recall@10 on clustered corpus: $recall%.2f " +
      "(chance at C=50/cluster=200 would be 0.25)")
    assert(recall >= 0.4,
      f"matryoshka prefix recall $recall%.2f fell below the 0.4 floor — " +
        "a prefix-width or candidate-width change is costing recall")
    // structural: every hit shares the query's cluster (the prefix pass
    // must not leave the neighborhood the full-dim truth lives in)
    val labels = spark.read.parquet(s"$clusteredDir/embeddings.parquet")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.forall(id => labels(id) == labels(0L)),
      s"matryoshka hits left the query's cluster: ${got.toSeq.sorted}")
  }

  test("PQ geometry derives from the corpus: ladder knees, divisor clip, " +
    "and the measured recall cost of a geometry step") {
    import org.apache.spark.sql.functions._
    import graft.queries.Similarity
    // the derivation ladder (oracle-matched by q_pq_geometry's CASE twin)
    assert(Similarity.pqSubspaces(1000L, 64) == 4)
    assert(Similarity.pqSubspaces(1048575L, 64) == 4)
    assert(Similarity.pqSubspaces(1048576L, 64) == 8)
    assert(Similarity.pqSubspaces(16777215L, 64) == 8)
    assert(Similarity.pqSubspaces(16777216L, 64) == 16)
    // the divisor clip: subspaces must tile d exactly
    assert(Similarity.pqSubspaces(16777216L, 24) == 8,
      "d=24 cannot split 16 ways — clip to the next divisor down, 8")
    assert(Similarity.pqSubspaces(16777216L, 6) == 2)
    // a geometry step's recall cost, MEASURED: the same clustered corpus,
    // one index at the test-scale rung (M=4) and one forced to the next
    // rung (M=8, the >=1M-vector geometry); per-index reads recover each
    // index's own geometry from its codebooks artifact
    val truth = clusteredIds("q_knn_brute").toSet
    val qvec = spark.read.parquet(s"$clusteredDir/embeddings.parquet")
      .filter(col("vec_id") === 0)
      .select(transform(col("embedding"),
        x => floor(x.cast("double") * 64 + lit(0.5)).cast("long")).as("v"))
      .head().getSeq[Long](0).mkString(",")
    def recallAt(forceM: Option[Int]): Double = {
      val idx = graft.TempDirs.create("graft-geom").toString
      Similarity.buildVectorIndexM(spark, clusteredDir, idx, forceM)
      val got = spark.sql(Similarity.twoStageKnnSqlFor(spark, idx,
          Similarity.artifactRelation(idx), s"'$qvec'", "11"))
        .collect().map(_.getLong(0)).filter(_ != 0L).take(10)
      (got.toSet & truth).size / 10.0
    }
    val r4 = recallAt(None)        // derived: test corpus sits on M=4
    val r8 = recallAt(Some(8))     // the next rung, forced
    // attach-level proof the geometry reached the artifact: 8 code cols
    val idx8 = graft.TempDirs.create("graft-geom8").toString
    Similarity.buildVectorIndexM(spark, clusteredDir, idx8, Some(8))
    assert(Similarity.codeColsAt(spark,
      Similarity.resolveAll(idx8)("codebooks")) ==
      (0 until 8).map(i => s"c$i"))
    println(f"[geomrecall] two_stage_recall_at_10 m4=$r4%.2f m8=$r8%.2f " +
      "(clustered corpus, tie-collapse ceiling ~0.25)")
    // finer codes must not LOSE recall (more subspaces = lower
    // quantization error = sharper ADC candidates); both hold the floor
    assert(r4 >= 0.15 && r8 >= 0.15,
      f"geometry step broke the recall floor: m4=$r4%.2f m8=$r8%.2f")
    assert(r8 >= r4 - 1e-9,
      f"the finer geometry REGRESSED recall: m4=$r4%.2f m8=$r8%.2f")
  }

  test("manifest commit: snapshot isolation across a flip, one retained " +
    "generation, stale generation retired at the NEXT flip") {
    import java.nio.file.{Files, Paths}
    import graft.queries.Similarity
    val src = "/root/testdata/sf0.001"
    val idx = graft.TempDirs.create("graft-manifest").toString
    Similarity.buildVectorIndex(spark, src, idx)
    assert(Files.exists(Paths.get(idx, "MANIFEST")),
      "build must commit a manifest")
    val g1 = Similarity.artifactPath(idx, "vectors")
    val before = spark.read.parquet(g1)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.get(1).toString)).sorted.toSeq
    // flip 1: compact moves vectors to a new generation
    Similarity.compactVectorIndex(spark, idx)
    val g2 = Similarity.artifactPath(idx, "vectors")
    assert(g2 != g1, "compaction must commit a NEW generation dir")
    // snapshot isolation: a reader that resolved g1 BEFORE the flip
    // still scans the complete old generation — identical content, no
    // path-not-found, no partial fileset
    val oldGen = spark.read.parquet(g1)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.get(1).toString)).sorted.toSeq
    assert(oldGen == before,
      "retained previous generation is not the complete pre-flip snapshot")
    // flip 2 retires g1 (it has had a full maintenance cycle to drain)
    Similarity.retrainVectorIndex(spark, idx)
    assert(!Files.exists(Paths.get(g1.stripPrefix("file:"))),
      "generation-before-last must be retired at the next flip")
    assert(spark.read.parquet(Similarity.artifactPath(idx, "vectors"))
      .count() == before.size.toLong)
  }

  test("multi-artifact reads resolve from ONE manifest snapshot: a flip " +
    "mid-read can never mix generations") {
    import java.nio.file.{Files, Paths}
    import graft.queries.Similarity
    val src = "/root/testdata/sf0.001"
    val idx = graft.TempDirs.create("graft-snapres").toString
    Similarity.buildVectorIndex(spark, src, idx)
    // a consumer that resolves all four artifacts BEFORE a commit flip
    // (attach views, the two-stage SQL renderer) keeps one internally
    // consistent generation set afterwards — the r13 ADVICE scenario was
    // per-artifact re-reads resolving new centroids over old vectors
    val snapBefore = Similarity.resolveAll(idx)
    val relBefore = Similarity.artifactRelation(idx) // captures its own snapshot
    Similarity.compactVectorIndex(spark, idx) // flips vectors+codes
    val snapAfter = Similarity.resolveAll(idx)
    assert(snapAfter("vectors") != snapBefore("vectors"),
      "compaction must flip the vectors generation")
    // the PRE-flip snapshot still names the complete retained generation:
    // every artifact path exists and scans (no mixed/new paths leak in)
    snapBefore.values.foreach { p =>
      assert(Files.isDirectory(Paths.get(p.stripPrefix("file:"))),
        s"pre-flip snapshot path vanished at the flip: $p")
    }
    val vecsOld = spark.read.parquet(snapBefore("vectors")).count()
    val vecsNew = spark.read.parquet(snapAfter("vectors")).count()
    assert(vecsOld == vecsNew, "compaction changed content")
    // the closure renderer is one snapshot too: post-flip it still renders
    // the pre-flip generation for EVERY artifact (stale-but-consistent),
    // never a mix of old and new
    Similarity.indexArtifactNames.foreach { sub =>
      if (sub == "vectors" || sub == "codes")
        // the live relation anti-joins the tombstones of the SAME
        // pre-flip snapshot — both paths pinned, no re-resolution
        assert(relBefore(sub) ==
          s"(SELECT g.* FROM parquet.`${snapBefore(sub)}` g LEFT ANTI JOIN " +
            s"parquet.`${snapBefore("tombstones")}` gt ON g.vec_id = gt.vec_id)",
          s"artifactRelation re-resolved $sub mid-lifetime")
      else
        assert(relBefore(sub) == s"parquet.`${snapBefore(sub)}`",
          s"artifactRelation re-resolved $sub mid-lifetime")
    }
  }

  test("a maintenance run that crashed before its flip rolls back: staged " +
    "garbage swept, marker dropped, live index untouched") {
    import java.nio.file.{Files, Path, Paths}
    import graft.queries.Similarity
    def copyDir(from: Path, to: Path): Unit = {
      val st = Files.walk(from)
      try st.forEach { p =>
        val t = to.resolve(from.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else Files.copy(p, t)
      } finally st.close()
    }
    val src = "/root/testdata/sf0.001"
    val idx = graft.TempDirs.create("graft-rollback").toString
    Similarity.buildVectorIndex(spark, src, idx)
    val n0 = Similarity.vectorIndexInfo(spark, idx)("vectors")
    val before = spark.read.parquet(Similarity.artifactPath(idx, "vectors"))
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    // manufacture the crash: staged next-generation dirs fully written
    // and the pending marker down, but the manifest NEVER flipped
    val curVec = Paths.get(Similarity.artifactPath(idx, "vectors")
      .stripPrefix("file:"))
    copyDir(curVec, Paths.get(idx, "vectors.v99"))
    copyDir(Paths.get(Similarity.artifactPath(idx, "codes")
      .stripPrefix("file:")), Paths.get(idx, "codes.v99"))
    Files.write(Paths.get(idx, "commit.pending"),
      s"index-commit v1\nold ${curVec.getFileName}\nnew vectors.v99"
        .getBytes("UTF-8"))
    // any write entry rolls BACK: nothing was committed
    Similarity.compactVectorIndex(spark, idx)
    assert(!Files.exists(Paths.get(idx, "commit.pending")),
      "rollback must consume the stale marker")
    assert(!Files.exists(Paths.get(idx, "vectors.v99")) &&
      !Files.exists(Paths.get(idx, "codes.v99")),
      "unreferenced staged dirs must be swept at write entry")
    val after = spark.read.parquet(Similarity.artifactPath(idx, "vectors"))
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(after == before && after.size.toLong == n0,
      "rollback must leave the live index exactly as committed")
  }

  test("a commit that crashed between its flip and its drift salvage heals " +
    "at the next write entry: microwindow append rows survive") {
    // the one window rename-based swaps could silently lose: an
    // out-of-process append completing between the pre-flip re-list and
    // the flip itself. Its rows land in the OLD generation — which the
    // manifest RETAINS — and the pending marker records the validated
    // fileset, so the next write entry re-appends exactly the drift
    // through the new generation.
    import java.nio.file.{Files, Path, Paths}
    import org.apache.spark.sql.functions.col
    import graft.queries.Similarity
    def copyDir(from: Path, to: Path): Unit = {
      val st = Files.walk(from)
      try st.forEach { p =>
        val t = to.resolve(from.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else Files.copy(p, t)
      } finally st.close()
    }
    def listRel(base: Path): Seq[String] = {
      val st = Files.walk(base)
      try {
        val out = Seq.newBuilder[String]
        st.filter(_.toString.endsWith(".parquet"))
          .forEach(p => out += base.relativize(p).toString)
        out.result()
      } finally st.close()
    }
    val src = "/root/testdata/sf0.001"
    val idx = graft.TempDirs.create("graft-salvage").toString
    Similarity.buildVectorIndex(spark, src, idx)
    val n0 = Similarity.vectorIndexInfo(spark, idx)("vectors")
    val oldVecDir = Paths.get(Similarity.artifactPath(idx, "vectors")
      .stripPrefix("file:"))
    val oldCodesDir = Paths.get(Similarity.artifactPath(idx, "codes")
      .stripPrefix("file:"))
    val oldVecName = oldVecDir.getFileName.toString
    // the committed snapshot BEFORE the drift lands
    val snap = listRel(oldVecDir).sorted
    // stage the "new generation" (content-identical copy is fine here)
    copyDir(oldVecDir, Paths.get(idx, "vectors.v99"))
    copyDir(oldCodesDir, Paths.get(idx, "codes.v99"))
    // the microwindow append: one vectors file beyond the snapshot,
    // landing in the OLD generation
    val tmp = graft.TempDirs.create("graft-driftsrc").toString
    spark.read.parquet(oldVecDir.toString)
      .select((col("vec_id") + 2000000L).as("vec_id"), col("v"))
      .limit(25).coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = {
      val st = Files.list(Paths.get(tmp))
      try st.filter(_.toString.endsWith(".parquet")).findFirst.get
      finally st.close()
    }
    val cellDir = {
      val st = Files.list(oldVecDir)
      try st.filter(p => Files.isDirectory(p)).findFirst.get
      finally st.close()
    }
    Files.copy(part, cellDir.resolve("drift-ingest.parquet"))
    // marker down AND manifest flipped — the crash hit before salvage
    val body = (Seq("index-commit v1", s"old $oldVecName",
      "new vectors.v99") ++ snap.map(f => s"snap $f")).mkString("\n")
    Files.write(Paths.get(idx, "commit.pending"), body.getBytes("UTF-8"))
    val manifest = Seq("vector-index-manifest v1",
      s"centroids centroids.v1 -",
      s"codebooks codebooks.v1 -",
      s"codes codes.v99 codes.v1",
      s"vectors vectors.v99 $oldVecName").mkString("\n")
    Files.write(Paths.get(idx, "MANIFEST"), manifest.getBytes("UTF-8"))
    // any write entry heals: the 25 drift rows re-append through the
    // new generation (re-encoded codes included), the marker drops
    Similarity.compactVectorIndex(spark, idx)
    assert(!Files.exists(Paths.get(idx, "commit.pending")))
    val vec = spark.read.parquet(Similarity.artifactPath(idx, "vectors"))
    assert(vec.filter(col("vec_id") >= 2000000L).count() == 25,
      "microwindow append rows were lost by the flip")
    assert(vec.count() == n0 + 25)
    assert(spark.read.parquet(Similarity.artifactPath(idx, "codes"))
      .filter(col("vec_id") >= 2000000L).count() == 25,
      "salvaged rows were not re-encoded through the new generation")
  }

  test("maintenance racing an ingest never loses rows silently") {
    // a compaction's rewrite is computed from a pre-append snapshot; an
    // append landing mid-rewrite would be dropped by the swap. The
    // detector re-lists the fileset before swapping and aborts loudly —
    // so under a concurrent appender the op either throws the documented
    // error or completes having covered every row. Either way the final
    // index (after a quiesced re-run) holds the full corpus.
    import org.apache.spark.sql.functions._
    import graft.queries.Similarity
    val src = "/root/testdata/sf0.001"
    val idx = graft.TempDirs.create("graft-racecompact").toString
    Similarity.buildVectorIndex(spark, src, idx)
    val n0 = Similarity.vectorIndexInfo(spark, idx)("vectors")
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
      .filter(col("vec_id") < 50)

    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val okWaves = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val appender = new Thread(() => {
      var wave = 1L
      while (!stop.get()) {
        try {
          Similarity.appendVectorIndexDf(spark,
            emb.withColumn("vec_id", col("vec_id") + lit(wave * 1000000L)),
            idx)
          okWaves.add(wave)
        } catch {
          // an append hitting the one-rename swap window fails loudly —
          // mid-append, so its rows may have PARTIALLY landed (the
          // documented at-least-once contract; a streaming caller
          // retries the batch). Partial waves are excluded from the
          // must-survive set below.
          case _: Exception =>
        }
        wave += 1
      }
    })
    appender.start()
    Thread.sleep(500) // let appends overlap the rewrite
    val outcomes = (1 to 3).map { _ =>
      try { Similarity.compactVectorIndex(spark, idx); "ok" }
      catch {
        case e: IllegalStateException
            if e.getMessage.contains("concurrent append") => "detected"
      }
    }
    stop.set(true)
    appender.join(60000)
    assert(!appender.isAlive)
    // quiesced: a clean re-run succeeds, and every wave that REPORTED
    // success has all 50 rows in the compacted index — nothing a caller
    // was told landed may be dropped by a maintenance swap
    Similarity.compactVectorIndex(spark, idx)
    import scala.jdk.CollectionConverters._
    val waves = okWaves.asScala.toVector
    val counts = spark.read.parquet(Similarity.artifactPath(idx, "vectors"))
      .filter(col("vec_id") >= 1000000L)
      .groupBy((col("vec_id") / 1000000L).cast("long").as("w"))
      .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    waves.foreach { w =>
      assert(counts.getOrElse(w, 0L) == 50L,
        s"silent loss: wave $w has ${counts.getOrElse(w, 0L)}/50 rows " +
          s"(outcomes: $outcomes, waves ok=${waves.size})")
    }
    assert(Similarity.vectorIndexInfo(spark, idx)("vectors") >=
      n0 + 50L * waves.size)
  }

  test("targeted delete: O(deleted) tombstone commit hides ids from every " +
    "probe immediately; compaction purges physically and drains the set") {
    import org.apache.spark.sql.functions.col
    import graft.queries.Similarity
    val src = "/root/testdata/sf0.001"
    val idx = graft.TempDirs.create("graft-vecdel-spec").toString
    Similarity.buildVectorIndex(spark, src, idx)
    val info0 = Similarity.vectorIndexInfo(spark, idx)
    assert(info0("tombstones") == 0L && info0("live") == info0("vectors"))
    val victims = Seq(3L, 7L, 11L)
    assert(Similarity.deleteFromVectorIndex(spark, victims, idx)
      ("tombstones") == 3L)
    // idempotent retry + absent-id no-op: the set is a set
    assert(Similarity.deleteFromVectorIndex(spark,
      victims :+ 999999999L, idx)("tombstones") == 3L)
    val info1 = Similarity.vectorIndexInfo(spark, idx)
    assert(info1("vectors") == info0("vectors"),
      "a logical delete must move no vector rows")
    assert(info1("live") == info0("vectors") - 3L)
    // the SQL seam excludes the ids for every consumer at once
    val rel = Similarity.artifactRelation(idx)
    def liveIds(): Set[Long] = spark
      .sql(s"SELECT vec_id FROM ${rel("vectors")} t")
      .collect().map(_.getLong(0)).toSet
    val live1 = liveIds()
    assert(victims.forall(v => !live1.contains(v)))
    // the two-stage probe never returns a tombstoned id
    val qvec = spark.read.parquet(s"$src/embeddings.parquet")
      .filter(col("vec_id") === 3L)
      .select(org.apache.spark.sql.functions.transform(col("embedding"),
        x => org.apache.spark.sql.functions.floor(
          x.cast("double") * 64 + org.apache.spark.sql.functions.lit(0.5))
          .cast("long")))
      .head.getSeq[Long](0).mkString(",")
    val knn = spark.sql(Similarity.twoStageKnnSqlFor(spark, idx,
        Similarity.artifactRelation(idx), s"'$qvec'", "10"))
      .collect().map(_.getLong(0)).toSet
    assert(victims.forall(v => !knn.contains(v)),
      s"two-stage probe returned a deleted id: $knn")
    // compaction = the physical purge, in the same atomic flip
    val info2 = Similarity.compactVectorIndex(spark, idx)
    assert(info2("tombstones") == 0L, "compaction must drain the set")
    assert(info2("vectors") == info0("vectors") - 3L,
      "compaction must drop the tombstoned rows from disk")
    assert(liveIds() == live1, "the purge must not change the live set")
  }

  test("commit history + as-of reads: every flip logs a snapshot, the " +
    "previous commit stays queryable, and the retention boundary is loud") {
    import org.apache.spark.sql.functions.col
    import graft.queries.Similarity
    val src = "/root/testdata/sf0.001"
    val idx = graft.TempDirs.create("graft-asof-spec").toString
    Similarity.buildVectorIndex(spark, src, idx)
    Similarity.deleteFromVectorIndex(spark, Seq(3L, 7L), idx)
    val h = Similarity.vectorIndexHistory(spark, idx)
    assert(h.map(e => (e("seq"), e("kind"))) ==
      Seq((1L, "build"), (2L, "delete")), h.toString)
    assert(h.forall(_("readable") == true),
      "both generations must be readable inside the retention window")
    // time travel: as of the build commit the deleted ids are VISIBLE
    def ids(rel: String => String): Set[Long] = spark
      .sql(s"SELECT vec_id FROM ${rel("vectors")} t")
      .collect().map(_.getLong(0)).toSet
    val now = ids(Similarity.artifactRelation(idx))
    val before = ids(Similarity.artifactRelationAsOf(idx, 1))
    assert(!now.contains(3L) && !now.contains(7L))
    assert(before.contains(3L) && before.contains(7L),
      "the as-of read must see the pre-delete generation")
    assert(before == now + 3L + 7L)
    // the purge retires the build snapshot's tombstone generation —
    // as-of past the boundary must refuse loudly, never read a partial
    Similarity.compactVectorIndex(spark, idx)
    val h2 = Similarity.vectorIndexHistory(spark, idx)
    assert(h2.map(_("kind")) == Seq("build", "delete", "compact"))
    assert(h2.last("readable") == true)
    assert(h2.head("readable") == false,
      "the build snapshot must age out at the second flip after it")
    intercept[IllegalArgumentException] {
      Similarity.artifactRelationAsOf(idx, 1)
    }
    // the delete snapshot (one flip back) is still fully queryable
    val preCompact = ids(Similarity.artifactRelationAsOf(idx, 2))
    assert(preCompact == now,
      "the compact purge must not change the live id set, as-of or not")
  }

  test("retrain purges tombstones: deleted rows never pull the retrained " +
    "centroids, and the new generation starts with an empty set") {
    import graft.queries.Similarity
    val src = "/root/testdata/sf0.001"
    val idx = graft.TempDirs.create("graft-vecdel-rt").toString
    Similarity.buildVectorIndex(spark, src, idx)
    val n0 = Similarity.vectorIndexInfo(spark, idx)("vectors")
    Similarity.deleteFromVectorIndex(spark, (0L until 50L).toSeq, idx)
    val info = Similarity.retrainVectorIndex(spark, idx)
    assert(info("tombstones") == 0L && info("vectors") == n0 - 50L)
    val rel = Similarity.artifactRelation(idx)
    val ids = spark.sql(s"SELECT vec_id FROM ${rel("vectors")} t")
      .collect().map(_.getLong(0)).toSet
    assert((0L until 50L).forall(v => !ids.contains(v)))
  }
}
