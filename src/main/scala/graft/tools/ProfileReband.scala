package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Dedup

/** Dev profiling harness for the index re-band claim: answering the
  * `stale` signal via [[Dedup.rebandDedupIndex]] must cost a small
  * fraction of the full rebuild it replaces, because it reads only the
  * index's own artifacts (the corpus text is never re-read, re-tokenized
  * or re-shingled).
  *
  * GRAFT_REPLICATE=30 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.tools.ProfileReband"
  */
object ProfileReband {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("GRAFT_REPLICATE", "30").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[reband] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val base = Tables.df(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val stride = base.agg(max(col("doc_id"))).head().getLong(0) + 1
    val corpus = base.crossJoin(spark.range(mult).select(col("id").as("rep")))
      .select((col("doc_id") + col("rep") * stride).as("doc_id"),
        concat(col("text"), lit(" #"), col("rep")).as("text"))
    // build below the knee the appended slice will cross (30x sf0.1 ->
    // ~125k build + ~25k append, crossing the 131,072-doc derivation
    // knee); counts are the ACTUAL filter sizes, not an assumed ratio
    val buildSet = corpus.filter(col("doc_id") % 6 =!= 0)
    val appendSet = corpus.filter(col("doc_id") % 6 === 0)
    val (nb, na) = (buildSet.count(), appendSet.count())
    val idxDir = graft.TempDirs.create("graft-reband-prof").toString
    val r1 = time(s"index build ($nb docs)") {
      Dedup.buildDedupIndex(spark, buildSet, idxDir)
    }
    time(s"append ($na docs)") {
      Dedup.appendDedupIndex(spark, appendSet, idxDir)
    }
    val stale = Dedup.dedupIndexStale(spark, idxDir)
    println(s"[reband] pinned r=$r1 stale=$stale")
    // the drift cost the signal warns about: a fixed-size increment pays
    // candidate volume at the stale (looser) banding...
    val inc = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + stride * 900).as("doc_id"), col("text"))
    time(s"increment vs STALE index") {
      Dedup.incrementVsIndex(spark, inc, idxDir).count()
    }
    val r2 = time("REBAND from artifacts") {
      Dedup.rebandDedupIndex(spark, idxDir)
    }
    println(s"[reband] rebanded r=$r2 stale=${Dedup.dedupIndexStale(spark, idxDir)}")
    // ...and the re-band restores the derived banding's candidate volume
    time(s"increment vs REBANDED index") {
      Dedup.incrementVsIndex(spark, inc, idxDir).count()
    }
    val rebuildDir = graft.TempDirs.create("graft-reband-rebuild").toString
    time(s"full REBUILD (${nb + na} docs)") {
      Dedup.buildDedupIndex(spark, corpus, rebuildDir)
    }
    spark.stop()
  }
}
