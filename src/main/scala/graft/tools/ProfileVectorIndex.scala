package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{Tables, TempDirs}
import graft.queries.Similarity

/** Dev harness: the persisted-vector-index lifecycle decade curve.
  * Replicates the embeddings corpus N× (ids offset, labels kept, so the
  * 10 coarse cells each grow ×N — the worst case for a probe, since cell
  * size IS the stage-1 candidate volume) and times every lifecycle verb
  * against the blown-up corpus:
  *
  *  - build        — O(corpus): assignment + encode are the passes that
  *                   must touch every vector; codebook training is
  *                   sample-capped (pqTrainSample)
  *  - append (1×)  — O(increment) claim: must stay ~flat as the BASE
  *                   index grows, because the increment never re-reads it
  *  - two-stage query — the ADC scan grows with codes volume (4
  *                   longs/vector — the PQ trade) and the re-rank stays
  *                   ≤C rows; the curve should be shallow-linear, never
  *                   candidate-quadratic
  *  - compact      — O(corpus) rewrite, bounded files after
  *  - retrain      — O(corpus) re-cluster FROM the artifacts
  *
  * GRAFT_REPLICATE=10 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.tools.ProfileVectorIndex"
  */
object ProfileVectorIndex {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("GRAFT_REPLICATE", "10").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = TempDirs.create("graft-vecprof").toString
    val e = Tables.df(spark, base, "embeddings")
    val vecN = e.agg(max("vec_id")).head().getLong(0) + 1
    val reps = spark.range(mult).select(col("id").as("r"))
    e.crossJoin(reps)
      .select((col("vec_id") + col("r") * vecN).as("vec_id"),
        col("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    println(s"[vecprof] corpus ×$mult: $n vectors at $dir")

    def timed[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val out = f
      println(f"[vecprof] ×$mult $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      out
    }

    val idx = s"$dir/idx"
    timed("build")(Similarity.buildVectorIndex(spark, dir, idx))
    // a 1× increment against the N× index — the O(increment) claim
    val inc = spark.read.parquet(s"$base/embeddings.parquet")
      .withColumn("vec_id", col("vec_id") + lit(mult * vecN))
    timed("append_1x")(Similarity.appendVectorIndexDf(spark, inc, idx))

    val qvec = e.filter(col("vec_id") === 7)
      .select(transform(col("embedding"),
        x => floor(x.cast("double") * 64 + lit(0.5)).cast("long")).as("v"))
      .head().getSeq[Long](0).mkString(",")
    // the *For renderer: a replicated decade corpus can cross the
    // 1M-vector pqSubspaces knee (M=8), where a session-default render
    // would now trip the gchk geometry fence — the profiler must author
    // at the artifact's own geometry like every serving renderer
    val twoStage = Similarity.twoStageKnnSqlFor(spark, idx,
      Similarity.artifactRelation(idx), s"'$qvec'", "10")
    val rows = timed("two_stage_query")(spark.sql(twoStage).collect())
    require(rows.head.getLong(0) == 7L && rows.head.getLong(2) == 0L,
      s"self-hit missing: ${rows.head}")
    timed("two_stage_query_warm")(spark.sql(twoStage).collect())

    // recall@10 of the probe (1 cell + ADC-50 + exact re-rank) against a
    // FULL exact-L2 scan over the same quantized vectors — the approx
    // cost isolated from quantization. On this isotropic corpus the
    // ceiling is the scan fraction (~1/cells); the SCALE.md decade row
    // tracks drift when cell count or candidate width changes.
    val qvLit = qvec.split(",").map(_.toLong)
    val exact = spark.read
      .parquet(Similarity.artifactPath(idx, "vectors"))
      .select(col("vec_id"),
        aggregate(zip_with(col("v"), typedlit(qvLit.toSeq),
          (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x).as("d"))
      .orderBy(col("d"), col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val gotIds = rows.map(_.getLong(0)).take(10).toSet
    println(f"[vecprof] ×$mult two_stage_recall_at_10: " +
      f"${(gotIds & exact).size / 10.0}%.2f")

    // Matryoshka prefix-probe recall on the same corpus: stage 1 ranks
    // on the FIRST 16 dims only (¼ the arithmetic/bytes — the MRL
    // adaptive-retrieval trade), C=50 candidates, stage 2 exact full-dim
    // re-rank — measured against the same full exact-scan truth, so a
    // prefix-width change shows its recall cost as a decade row here
    // (the spec floor lives in SimilaritySpec on the clustered corpus).
    val mat = timed("matryoshka_query") {
      val vecs = spark.read.parquet(Similarity.artifactPath(idx, "vectors"))
      val qpre = qvLit.take(16).toSeq
      vecs.select(col("vec_id"), col("v"),
          aggregate(zip_with(slice(col("v"), 1, 16), typedlit(qpre),
            (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x)
            .as("pd"))
        .orderBy(col("pd"), col("vec_id")).limit(50)
        .select(col("vec_id"),
          aggregate(zip_with(col("v"), typedlit(qvLit.toSeq),
            (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x)
            .as("d"))
        .orderBy(col("d"), col("vec_id")).limit(10)
        .collect().map(_.getLong(0)).toSet
    }
    println(f"[vecprof] ×$mult matryoshka_recall_at_10: " +
      f"${(mat & exact).size / 10.0}%.2f")

    // the delete verb's decade row: tombstoning a FIXED 50 ids must stay
    // ~flat as the base index grows (the only index-sized term is one
    // column-pruned vec_id scan for the present-filter semi-join; the
    // commit itself is O(deleted)); the post-delete probe pays one
    // broadcast anti-join against the 50-row set
    val delIds = spark.range(50).select((col("id") * 97L + 13L).as("vec_id"))
    timed("delete_50")(Similarity.deleteFromVectorIndexDf(spark, delIds, idx))
    val twoStageDel = Similarity.twoStageKnnSqlFor(spark, idx,
      Similarity.artifactRelation(idx), s"'$qvec'", "10")
    val rowsDel = timed("two_stage_query_post_delete")(
      spark.sql(twoStageDel).collect())
    require(rowsDel.head.getLong(0) == 7L,
      s"self-hit missing after delete: ${rowsDel.head}")

    val info = timed("info")(Similarity.vectorIndexInfo(spark, idx))
    println(s"[vecprof] info: $info")
    val compacted = timed("compact")(Similarity.compactVectorIndex(spark, idx))
    println(s"[vecprof] post-compact files: ${compacted("files")}")
    val retrained = timed("retrain")(Similarity.retrainVectorIndex(spark, idx))
    println(s"[vecprof] post-retrain: $retrained")
    // re-render: the compact + retrain flips moved the manifest two
    // generations, and the profiler (unlike attached views) resolves at
    // SQL-generation time
    val twoStagePost = Similarity.twoStageKnnSqlFor(spark, idx,
      Similarity.artifactRelation(idx), s"'$qvec'", "10")
    val rows2 = timed("two_stage_query_post")(spark.sql(twoStagePost).collect())
    require(rows2.head.getLong(0) == 7L && rows2.head.getLong(2) == 0L,
      s"self-hit missing after retrain: ${rows2.head}")
    spark.stop()
  }
}
