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
    println("events  redact50_s  byuser_s(rows)  scan_pre_s  scan_post_s  compact_s  scan_purged_s")
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
      val (_, tPost) = timed(h.rawGetEvents(1, n).count())
      val (_, tCompact) = timed(h.compactLog())
      val (_, tPurged) = timed(h.rawGetEvents(1, n).count())
      println(f"$n%7d  $tRedact%9.2f  $tByUser%8.2f(${ru("redacted")}%5d)  $tPre%9.2f  $tPost%10.2f  $tCompact%8.2f  $tPurged%12.2f")
    }
    spark.stop()
  }
}
