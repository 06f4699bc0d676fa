package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Dedup

/** Dev profiling harness for the persisted-index incremental-dedup claim
  * (not part of the API): per-increment cost must track the INCREMENT,
  * not the prior corpus, once the index is a persisted artifact.
  *
  * Usage: ProfileIncrement [dir] [replicas...]. For each replica factor R
  * the documents table is replicated R times with shifted ids, indexed
  * once (reported separately — that cost is the one-off/last-run cost),
  * and then a FIXED-SIZE increment is deduped against the index twice
  * (cold + warm). The warm per-increment seconds across growing R is the
  * curve that must stay flat-ish; the index build is the part allowed to
  * grow linearly. */
object ProfileIncrement {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = {
      val r = args.drop(1).flatMap(_.toIntOption)
      if (r.nonEmpty) r.toSeq
      else if (args.contains("knee")) Seq.empty else Seq(1, 3, 10)
    }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val base = Tables.df(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val baseN = base.count()
    // id-space stride derived from the actual max doc_id so clone
    // groups and replicas can never collide at larger scale factors
    val stride = base.agg(max(col("doc_id"))).head().getLong(0) + 1
    // fixed-size increment regardless of R: clones + mutated + new
    def increment(): DataFrame =
      base.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + stride * 101).as("doc_id"), col("text"))
        .unionAll(base.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + stride * 102).as("doc_id"),
            concat(col("text"), lit(" refreshed")).as("text")))
        .unionAll(base.filter(col("doc_id") % 13 === 0)
          .select((col("doc_id") + stride * 103).as("doc_id"),
            reverse(col("text")).as("text")))
    val incN = increment().count()
    println(s"[profile] base docs=$baseN, fixed increment=$incN")
    replicas.foreach { r =>
      val corpus =
        if (r <= 1) base
        else base.crossJoin(spark.range(r).select(col("id").as("rep")))
          .select((col("doc_id") + col("rep") * stride).as("doc_id"),
            col("text"))
      val idxDir = graft.TempDirs.create(s"graft-profinc-$r").toString
      val (_, buildS) = time(Dedup.buildDedupIndex(spark, corpus, idxDir))
      val (n1, coldS) = time(
        Dedup.incrementVsIndex(spark, increment(), idxDir).count())
      val (n2, warmS) = time(
        Dedup.incrementVsIndex(spark, increment(), idxDir).count())
      require(n1 == incN && n2 == incN, s"verdict count $n1/$n2 != $incN")
      println(f"[profile] R=$r%2d corpus=${baseN * r}%8d " +
        f"index-build ${buildS}%6.1f s | increment cold ${coldS}%6.2f s " +
        f"warm ${warmS}%6.2f s")
    }
    // ---- the derivation-knee experiment: append across 131072 docs ----
    // Build below the knee (r=4), append replicas until the accumulated
    // count crosses it: the stale signal must fire, the stale index must
    // still answer at flat increment cost (banding stayed consistent),
    // and the rebuild the signal asks for re-derives r=5 at the grown
    // count with the increment still flat after it.
    if (args.contains("knee")) {
      def rep(from: Int, until: Int): DataFrame =
        base.crossJoin(spark.range(from, until).select(col("id").as("rep")))
          .select((col("doc_id") + col("rep") * stride).as("doc_id"),
            col("text"))
      val idxDir = graft.TempDirs.create("graft-profinc-knee").toString
      val below = rep(0, 25)                       // 125k docs: r=4
      val (_, b1) = time(Dedup.buildDedupIndex(spark, below, idxDir))
      val m1 = Dedup.readIndexMeta(spark, idxDir)
      val (_, a1) = time(Dedup.appendDedupIndex(spark, rep(25, 30), idxDir))
      val m2 = Dedup.readIndexMeta(spark, idxDir)  // 150k docs: wants r=5
      val (n1, s1) = time(
        Dedup.incrementVsIndex(spark, increment(), idxDir).count())
      val (_, b2) = time(Dedup.buildDedupIndex(spark, rep(0, 30), idxDir))
      val m3 = Dedup.readIndexMeta(spark, idxDir)
      val (n2, s2) = time(
        Dedup.incrementVsIndex(spark, increment(), idxDir).count())
      require(n1 == incN && n2 == incN, s"knee verdict count $n1/$n2")
      require(!m1.stale && m2.stale && !m3.stale, s"stale signal: $m1 $m2 $m3")
      println(f"[profile] knee: build@${m1.count}%d (r=${m1.r}) ${b1}%5.1f s" +
        f" | append→${m2.count}%d ${a1}%5.1f s stale=${m2.stale}" +
        f" (wants r=${m3.r}) | increment-vs-stale ${s1}%5.2f s" +
        f" | rebuild@${m3.count}%d (r=${m3.r}) ${b2}%5.1f s" +
        f" | increment-vs-rebuilt ${s2}%5.2f s")
    }
    spark.stop()
  }
}
