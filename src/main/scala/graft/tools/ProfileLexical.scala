package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{Tables, TempDirs}
import graft.queries.Retrieval

/** Dev harness: the persisted-lexical-index lifecycle decade curve.
  * Replicates the documents corpus N× (ids offset, text alphabet
  * rotated per replica so the VOCAB grows with the corpus — the honest
  * postings-growth case) and times every lifecycle verb:
  *
  *  - build        — O(corpus): the two column-pruned text scans
  *  - append (1×)  — O(increment) claim: a fixed increment must stay
  *                   ~flat as the BASE index grows (df re-derives from
  *                   the vocab-sized artifact + delta, never the corpus)
  *  - probe        — the $terms named query over the artifacts; cost is
  *                   the postings probe on the bound terms only
  *  - compact      — O(index) rewrite, bounded files after
  *
  * GRAFT_REPLICATE=10 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.tools.ProfileLexical"
  */
object ProfileLexical {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("GRAFT_REPLICATE", "10").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d = Tables.df(spark, base, "documents")
      .select(col("doc_id"), col("text"))
    val docN = d.agg(max("doc_id")).head().getLong(0) + 1
    val reps = spark.range(mult).select(col("id").as("r"))
    // alphabet-rotated on odd replicas: postings volume grows N× and the
    // vocabulary ~2× (enough to keep the df artifact honest — growing,
    // not a fixed-point) while the probe terms stay present in the
    // even replicas
    val rotated = d.crossJoin(reps)
      .select((col("doc_id") + col("r") * docN).as("doc_id"),
        when(col("r") % 2 === 0, col("text"))
          .otherwise(translate(col("text"),
            "abcdefghijklmnopqrstuvwxyz",
            "bcdefghijklmnopqrstuvwxyza")).as("text"))
    val corpus = rotated.persist()
    val n = corpus.count()
    println(s"[lexprof] corpus ×$mult: $n documents")

    def timed[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val out = f
      println(f"[lexprof] ×$mult $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      out
    }

    val idx = TempDirs.create("graft-lexprof").toString
    timed("build")(Retrieval.buildLexicalIndexDf(spark, corpus, idx))
    // fixed 1× increment against the N× index — the O(increment) claim
    val inc = d.limit(1600)
      .select((col("doc_id") + mult.toLong * docN).as("doc_id"), col("text"))
    timed("append_1600")(Retrieval.appendLexicalIndex(spark, inc, idx))

    // a three-term probe through the artifact path (the named-query SQL)
    val probeSql = graft.queries.Retrieval.bm25ProbeSqlForProfiler(
      spark, idx, Seq("hash", "join", "slow"))
    val rows = timed("probe")(spark.sql(probeSql).collect())
    require(rows.nonEmpty, "probe returned nothing")
    timed("probe_warm")(spark.sql(probeSql).collect())

    val info = Retrieval.lexicalIndexInfo(spark, idx)
    println(s"[lexprof] info: $info")

    // the delete verb's decade row: a FIXED 50-doc takedown must stay
    // ~flat as the index grows — the df correction is one postings pass
    // bounded by a semi-join on the 50 ids, the commit O(deleted)
    import spark.implicits._
    val delIds = (0 until 50).map(i => i * 31L + 2L).toDF("doc_id")
    val delOut = timed("delete_50")(
      Retrieval.deleteFromLexicalIndex(spark, delIds, idx))
    println(s"[lexprof] delete: $delOut")
    val rowsDel = timed("probe_post_delete")(spark.sql(
      graft.queries.Retrieval.bm25ProbeSqlForProfiler(
        spark, idx, Seq("hash", "join", "slow"))).collect())
    require(rowsDel.nonEmpty, "post-delete probe returned nothing")

    val compacted = timed("compact")(Retrieval.compactLexicalIndex(spark, idx))
    println(s"[lexprof] post-compact: $compacted")
    val rows2 = timed("probe_post_compact")(spark.sql(
      graft.queries.Retrieval.bm25ProbeSqlForProfiler(
        spark, idx, Seq("hash", "join", "slow"))).collect())
    require(rows2.map(_.toString).toSeq == rowsDel.map(_.toString).toSeq,
      "compaction (the physical purge) changed probe answers")
    corpus.unpersist(false)
    spark.stop()
  }
}
