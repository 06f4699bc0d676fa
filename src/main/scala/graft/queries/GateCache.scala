package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** The one keyed persist-sweep-settle discipline behind every gate-level
  * cached artifact (the TPC-H Q15 per-supplier aggregate, k-means
  * centroids, PQ codebooks/coded vectors, PageRank edge/node frames, the
  * substring-window passes, LSH shingle/candidate frames). At operator
  * level these become catalog tables; at gate level the cache makes the
  * steady-state cost the QUERY, not the artifact build.
  *
  * Lifecycle rules (consolidating the per-site disciplines that had been
  * copy-pasted four ways, per the round-10 review):
  *  - stopped-session keys are swept on EVERY access: a stopped session's
  *    entry pins the SparkSession and its (already unreachable) cached
  *    blocks forever in a long-lived JVM with session churn. Stopped-key
  *    removal never calls unpersist — the context is gone.
  *  - `evict` + `put` bound retention to ONE generation per
  *    (session, corpus): the previous generation's frames are unpersisted
  *    when replaced, never when still lazily consumed by the plan just
  *    returned.
  *  - `put` registers a value only after its build completed, and cleans
  *    any value it replaces — a retry cannot leak the superseded persist.
  *  - ORDERING RULE for frames rebuilt from the SAME logical plan (a gate
  *    re-run over the same corpus): Spark's CacheManager keys cache
  *    entries by logical plan, so the old and new generation SHARE one
  *    entry — call `evict` BEFORE the new persist(); a post-persist clean
  *    of the old generation would drop the new frame's cache with it
  *    (the symptom: "Asked to cache already cached data", then a plan
  *    with no InMemoryTableScan).
  */
final class GateCache[V](clean: V => Unit, revive: V => Unit = (_: V) => ()) {
  private val m = TrieMap.empty[(SparkSession, String), V]

  /** Drop entries whose session is stopped (no unpersist — context gone). */
  def sweep(): Unit =
    m.keys.filter(_._1.sparkContext.isStopped).foreach(m.remove)

  /** Gate re-entry: sweep stopped keys, then unpersist + drop this key's
    * previous generation so retention stays at one run per (session, dir). */
  def evict(s: SparkSession, dir: String): Unit = {
    sweep()
    m.remove((s, dir)).foreach(clean)
  }

  /** Register a freshly-built (already persisted/settled) value; cleans
    * whatever it replaces. Call only after the build succeeded. */
  def put(s: SparkSession, dir: String, v: V): Unit = {
    sweep()
    m.put((s, dir), v).foreach(clean)
  }

  /** Memoized artifacts (one training run shared across gates): sweep
    * stopped keys, then get-or-build. The build registers nothing here on
    * failure — a thrown build leaves no entry.
    *
    * HITS ARE EVICTION-PROOFED (r17 verdict item 4): the bench calls
    * `spark.catalog.clearCache()` between gates, which unpersists every
    * cached block while the memo still holds the frame reference. A bare
    * hit would then hand consumers an UNPERSISTED lazy plan — recomputed
    * once per downstream consumer, silently worse than no memo at all.
    * `revive` re-persists and settles such a frame before it is returned
    * (one recompute, shared again), and is a no-op while the blocks are
    * still live. */
  def getOrBuild(s: SparkSession, dir: String)(build: => V): V = {
    sweep()
    m.get((s, dir)) match {
      case Some(v) => revive(v); v
      case None => m.getOrElseUpdate((s, dir), build)
    }
  }

  /** Read-only probe (test hook): the entry for (session, dir), if any —
    * no revive, no build. */
  private[graft] def peek(s: SparkSession, dir: String): Option[V] = {
    sweep()
    m.get((s, dir))
  }
}

object GateCache {
  import org.apache.spark.storage.StorageLevel
  private def reviveFrame(df: DataFrame): Unit =
    if (df.storageLevel == StorageLevel.NONE) {
      df.persist()
      df.count() // settle: memoized frames always have >1 consumer
    }
  /** Cache of one persisted DataFrame per (session, dir). */
  def frame(): GateCache[DataFrame] =
    new GateCache(_.unpersist(false), reviveFrame)
  /** Cache of a generation of persisted frames per (session, dir). */
  def frames(): GateCache[Seq[DataFrame]] =
    new GateCache(_.foreach(_.unpersist(false)), _.foreach(reviveFrame))
}
