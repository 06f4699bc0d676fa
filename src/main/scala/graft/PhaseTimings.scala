package graft

import scala.collection.concurrent.TrieMap

/** Per-query phase timings for gates whose single wall number conflates a
  * one-off setup cost with the operator's steady-state cost (e.g. the
  * incremental-dedup gate builds its whole-corpus index inline, so the
  * headline ~7s is ~90% index build and ~0.5s actual increment). Gates
  * record named phases as they run; Bench serializes them next to the
  * per-query totals so the bench output reflects both numbers. Purely
  * observational — recording never affects results, and queries that
  * record nothing don't appear. */
object PhaseTimings {

  private val byQuery = TrieMap.empty[String, Vector[(String, Double)]]

  /** Run `body`, recording its wall seconds as `phase` under `query`.
    * Phases append in execution order; re-running a query resets its
    * record on the first phase (see [[reset]]). */
  def timed[A](query: String, phase: String)(body: => A): A = {
    val t0 = System.nanoTime()
    try body
    finally {
      val dt = (System.nanoTime() - t0) / 1e9
      byQuery.updateWith(query) {
        case Some(v) => Some(v :+ (phase -> dt))
        case None => Some(Vector(phase -> dt))
      }
    }
  }

  /** Drop a query's phases; gates call this first so a re-run (bench
    * warmup, repeated Verify) reports only its own invocation. */
  def reset(query: String): Unit = byQuery.remove(query)

  /** Snapshot of every recorded query's phases, in execution order. */
  def snapshot: Map[String, Vector[(String, Double)]] = byQuery.toMap
}
