package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Pipeline

/** The shared connected-components cache must not pin checkpoint blocks
  * for the life of the process (round-6 ADVICE): entries are LRU-bounded,
  * and clearComponentCache releases a session's checkpoints so a
  * long-lived session sweeping many corpus dirs cannot accumulate block
  * storage without bound. */
class CompCacheSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def persistedCount(): Int =
    spark.sparkContext.getPersistentRDDs.size

  test("clearComponentCache releases the checkpointed component blocks") {
    val run = SparkEntry.queries("q_dedup_cluster")
    // another suite may have warmed the cache for this corpus dir —
    // start from a released state so the build-side assertion holds
    Pipeline.clearComponentCache(spark)
    val before = persistedCount()
    val rows1 = run(spark, dir).collect()
    assert(rows1.nonEmpty)
    assert(persistedCount() > before,
      "the component build must leave one checkpointed frame cached")
    Pipeline.clearComponentCache(spark)
    assert(persistedCount() == before,
      "release must drop the checkpoint blocks from the block manager")
    // a post-release run REBUILDS rather than failing on the dead
    // checkpoint, and returns the same result
    val rows2 = run(spark, dir).collect()
    assert(rows2.map(_.toString).sorted.toSeq ===
      rows1.map(_.toString).sorted.toSeq)
    Pipeline.clearComponentCache(spark)
    assert(persistedCount() == before)
  }
}
