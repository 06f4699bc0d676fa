package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Retrieval, Similarity}

/** Round-16 (verdict r15 item 4): the SERVED MMR/context-pack renderers
  * must carry the attached index's OWN PQ geometry, not the session
  * ladder's first rung. A module authored with the default (4, 16)
  * against an index built past the 1M-vector knee (M=8) would ADC-rank
  * with a wrong subspace mapping — silent recall degradation the exact
  * rerank masks on easy corpora. Two seams close it:
  *
  *  - the `*For` renderers recover (M, L) from the codebooks artifact
  *    (the twoStageKnnSqlFor discipline) at authoring time;
  *  - the rendered SQL itself carries a one-row geometry fence (`gchk`,
  *    an assert_true over the codebooks the plan already reads), so a
  *    render whose baked tokens mismatch the artifact — authored with
  *    the default, or STALE after a retrain onto a new rung — fails
  *    loudly at query time instead of degrading recall.
  */
class ServedGeometrySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("forced M=8 index: *For renderers recover the artifact geometry " +
    "(served == brute bit-exact); a session-default render trips the " +
    "in-plan geometry fence") {
    // clustered corpus (the ServerSpec geometry — recall is REAL, so
    // indexed == brute is meaningful) + matching documents for the
    // lexical leg of the pack
    val src = TempDirs.create("graft-geom-src").toString
    spark.range(1000)
      .select(col("id").as("vec_id"), (col("id") % 5).cast("int").as("label"))
      .select(col("vec_id"), expr(
        "transform(sequence(0, 63), i -> CAST(" +
          "(pmod(hash(label, i), 2001) - 1000) / 1000.0 + " +
          "(pmod(hash(vec_id, i, 7), 201) - 100) / 100.0 * 0.15 AS FLOAT))")
        .as("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$src/embeddings.parquet")
    spark.range(1000).select(col("id").as("doc_id"),
        lit("srcA").as("source"),
        concat_ws(" ",
          concat(lit("tok"), (col("id") % 97).cast("string")),
          concat(lit("tok"), (col("id") % 31).cast("string")),
          lit("filler alpha beta gamma"),
          concat(lit("w"), col("id").cast("string"))).as("text"))
      .write.mode("overwrite").parquet(s"$src/documents.parquet")
    val vidx = TempDirs.create("graft-geom-vec").toString
    Similarity.buildVectorIndexM(spark, src, vidx, forceM = Some(8))
    val lidx = TempDirs.create("graft-geom-lex").toString
    Retrieval.buildLexicalIndex(spark, src, lidx)
    assert(Similarity.pqGeometryAt(spark, vidx) == ((8, 8)),
      "the artifact must carry the forced geometry (M=8, L=64/8)")

    val rel = Similarity.artifactRelation(vidx)
    val lrel = Retrieval.lexRelation(spark, lidx)
    val qv = spark.read.parquet(s"$src/embeddings.parquet")
      .where(col("vec_id") === 7L).select("embedding").head()
      .getSeq[Float](0)
      .map(x => math.floor(x.toDouble * 64 + 0.5).toLong).mkString(",")

    def rows(sql: String): Seq[Seq[Any]] =
      spark.sql(sql).collect().map(_.toSeq.toVector).toSeq
    for ((lam, k) <- Seq(("500000", "4"), ("990000", "6"))) {
      val served = rows(Retrieval.mmrNamedSqlIndexedFor(
        spark, vidx, rel, s"'$qv'", lam, k))
      val brute = rows(Retrieval.mmrNamedSqlIndexed(
        rel, s"'$qv'", lam, k, indexed = false))
      assert(served == brute,
        s"served MMR drifted from the brute twin at λ=$lam k=$k (M=8)")
    }
    for (budget <- Seq("512", "200")) {
      val served = rows(Retrieval.contextPackNamedSqlIndexedFor(
        spark, vidx, lrel, rel, "'tok5,tok13'", s"'$qv'", budget))
      val brute = rows(Retrieval.contextPackNamedSqlIndexed(
        lrel, rel, "'tok5,tok13'", s"'$qv'", budget, indexed = false))
      assert(served == brute,
        s"served pack drifted from the brute twin at budget=$budget (M=8)")
      assert(served.nonEmpty, s"budget $budget packed nothing")
    }

    // the fence: a render carrying the session-default (4, 16) tokens
    // against this M=8 artifact must fail LOUDLY, not silently rank
    // with a wrong subspace mapping
    def messages(t: Throwable): String =
      if (t == null) "" else t.toString + "\n" + messages(t.getCause)
    val e1 = intercept[Throwable](rows(Retrieval.mmrNamedSqlIndexed(
      rel, s"'$qv'", "500000", "4")))
    assert(messages(e1).contains("pq geometry mismatch"), messages(e1))
    val e2 = intercept[Throwable](rows(Retrieval.contextPackNamedSqlIndexed(
      lrel, rel, "'tok5,tok13'", s"'$qv'", "512")))
    assert(messages(e2).contains("pq geometry mismatch"), messages(e2))
  }

  test("served two-stage kNN carries the fence too (verdict r16 item 1): " +
    "a forced-M=8 index answers bit-exact through twoStageKnnSqlFor, and " +
    "a session-default render trips gchk instead of ADC-ranking at the " +
    "wrong geometry") {
    val src = TempDirs.create("graft-geom-knn-src").toString
    spark.range(1000)
      .select(col("id").as("vec_id"), (col("id") % 5).cast("int").as("label"))
      .select(col("vec_id"), expr(
        "transform(sequence(0, 63), i -> CAST(" +
          "(pmod(hash(label, i), 2001) - 1000) / 1000.0 + " +
          "(pmod(hash(vec_id, i, 7), 201) - 100) / 100.0 * 0.15 AS FLOAT))")
        .as("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$src/embeddings.parquet")
    val vidx = TempDirs.create("graft-geom-knn-vec").toString
    Similarity.buildVectorIndexM(spark, src, vidx, forceM = Some(8))
    val rel = Similarity.artifactRelation(vidx)
    val qv = spark.read.parquet(s"$src/embeddings.parquet")
      .where(col("vec_id") === 7L).select("embedding").head()
      .getSeq[Float](0)
      .map(x => math.floor(x.toDouble * 64 + 0.5).toLong).mkString(",")

    // the *For renderer recovers (8, 8) and the probe answers: the
    // query vector itself is vec 7 at exact distance 0, and the render
    // is bit-identical to an explicit correct-geometry render (the
    // recovery IS the explicit geometry — nothing else moved)
    val served = spark.sql(Similarity.twoStageKnnSqlFor(
      spark, vidx, rel, s"'$qv'", "10")).collect()
    assert(served.head.getLong(0) == 7L && served.head.getLong(2) == 0L,
      "served kNN lost the identity hit")
    val explicit = spark.sql(Similarity.twoStageKnnSql(
      rel, s"'$qv'", "10", m = 8, l = 8)).collect()
    assert(served.map(_.toSeq).toSeq == explicit.map(_.toSeq).toSeq,
      "the *For recovery must equal the explicit (8, 8) render")

    // the fence: the session-default (4, 16) render against this M=8
    // artifact is exactly the stale-module hazard (authored before a
    // retrain onto a new pqSubspaces rung) — it must fail LOUDLY
    def messages(t: Throwable): String =
      if (t == null) "" else t.toString + "\n" + messages(t.getCause)
    val e = intercept[Throwable](spark.sql(
      Similarity.twoStageKnnSql(rel, s"'$qv'", "10")).collect())
    assert(messages(e).contains("pq geometry mismatch"), messages(e))
  }
}
