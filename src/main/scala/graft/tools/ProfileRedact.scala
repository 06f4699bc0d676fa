package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.stream.StreamStore

/** Decade curve for the store-of-record redaction verb: the logical
  * redact of a FIXED 50-idx set must stay flat as the log grows (it is
  * an O(redacted) parquet write + one meta rewrite), the post-redaction
  * read must stay within noise of the pre-redaction read (the
  * payload-nulling join is a broadcast against a metadata-sized set),
  * and the compaction purge is the log rewrite compaction already paid.
  *
  * Round 17 adds the COMPOSED takedown's own column: one
  * `graft.stream.Forget` call (user-keyed redact + dedup + mixture legs
  * + the pending→committed intent ledger) with a FIXED takedown size
  * over a log and family indexes that grow together — the verb must
  * stay flat like its legs: the resolution scan is pushdown-filtered,
  * the family deletes are O(deleted), the ledger is two O(1) appends,
  * and the resume-key digest is one aggregate over the takedown frame.
  *
  *   runMain graft.tools.ProfileRedact
  */
object ProfileRedact {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    println("events  redact50_s  byuser_s(rows)  forget_s  scan_pre_s  scan_post_s  compact_s  scan_purged_s")
    Seq(20000L, 60000L, 200000L, 600000L).foreach { n =>
      val store = new StreamStore(spark,
        graft.TempDirs.create("graft-profredact").toString)
      val h = store.open(s"did:prof:redact$n")
      // 8 bulk batches so the log has a multi-file shape like a real
      // stream (per-append files are what compaction exists for)
      val per = n / 8
      (0 until 8).foreach { b =>
        h.bulkImport(spark.range(b * per + 1, (b + 1) * per + 1)
          .select(col("id").as("idx"),
            concat(lit("u"), pmod(col("id"), lit(97))).as("user"),
            encode(concat(lit("payload-"), col("id")), "UTF-8").as("payload"),
            lit(Array.empty[Byte]).as("signature")))
      }
      val (_, tPre) = timed(h.rawGetEvents(1, n).count())
      val victims = (1L to n by (n / 50)).take(50)
      val (_, tRedact) = timed(h.redactEvents(victims))
      // user-keyed takedown (round 16): resolve one author's ~n/97
      // events through the pushdown-filtered raw-log scan, same commit
      val (ru, tByUser) = timed(h.redactEventsByUser(Seq("u13")))
      // the composed verb over family indexes that GROW with the log
      // (docs = n/10): fixed takedown (one author + 2 docs), dedup +
      // mixture legs, intent ledger bracketing — builds untimed
      val docs = spark.range(n / 10).select(col("id").as("doc_id"),
        concat(lit("src"), pmod(col("id"), lit(4))).as("source"),
        concat_ws(" ", (0 until 10).map(i =>
          md5(concat(col("id"), lit(i)))): _*).as("text"))
      val dIdx = graft.TempDirs.create(s"graft-profforget-d$n").toString
      graft.queries.Dedup.buildDedupIndex(spark,
        docs.select("doc_id", "text"), dIdx)
      val mIdx = graft.TempDirs.create(s"graft-profforget-m$n").toString
      graft.queries.Pipeline.buildMixtureStatsDf(spark,
        docs.select("source", "text"), mIdx)
      val fDocs = docs.filter(col("doc_id").isin(5L, 10L))
      val (_, tForget) = timed(graft.stream.Forget(spark, h,
        graft.stream.Forget.Targets(users = Seq("u17"),
          docIds = Seq(5L, 10L), dedupDir = Some(dIdx),
          mixtureDir = Some(mIdx),
          mixtureDocs = Some(fDocs.select("source", "text")))))
      val (_, tPost) = timed(h.rawGetEvents(1, n).count())
      val (_, tCompact) = timed(h.compactLog())
      val (_, tPurged) = timed(h.rawGetEvents(1, n).count())
      println(f"$n%7d  $tRedact%9.2f  $tByUser%8.2f(${ru("redacted")}%5d)  $tForget%7.2f  $tPre%9.2f  $tPost%10.2f  $tCompact%8.2f  $tPurged%12.2f")
    }
    spark.stop()
  }
}
