package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Analytics, Corpus, Dedup, LeafOps, Multimodal, Pipeline, Relational, Retrieval, Similarity, Temporal, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All query registries (relational surface, engine ops, pipeline ops). */
  private def registry: Map[String, Relational.Q] =
    Relational.all ++ LeafOps.all ++ TextAnalysis.all ++ Dedup.all ++
      Similarity.all ++ Multimodal.all ++ Temporal.all ++ Pipeline.all ++
      Analytics.all ++ Corpus.all ++ Retrieval.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry("q1_agg").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, q) if q.oracle.isDefined => k -> q.oracle.get }
}
