package graft.stream

import scala.collection.mutable

import graft.types.{LeafQuery, SqlValue}

/** Live-query subscriptions over a stream (A8/A9).
  *
  * Behavioral spec: /root/reference/leaf-stream/src/lib.rs —
  * registration 344-379 (initial cursor = start-1 if given, else the stream's
  * current latest: a subscription without `start` only sees NEW events),
  * worker loop 873-986, window math in leaf-stream-types/src/lib.rs:195-212,
  * `has_more` when the query window ends before the stream's latest (937-939).
  *
  * The engine itself never diffs results: "incremental" is purely the moving
  * `$start`/`$limit` contract — each delivery re-runs the named query with
  * `start = cursor + 1` and advances the cursor to the end of the delivered
  * window. Delivery here is a synchronous driver-side pump (`drain`) driven
  * by append notifications; a server layer can call it from any scheduler.
  */
class SubscriptionEngine(store: StreamStore, streamId: String) {

  /** Convenience for callers already holding a handle. */
  def this(h: StreamHandle) = this(h.store, h.id)

  // resolved through the store on every pump so an LRU-evicted handle is
  // transparently reopened (and the stream stays hot in the store's cache
  // while it has active subscribers)
  private def handle: StreamHandle = store.open(streamId)

  /** Resolve-and-use under LRU churn: the engine's contract is to survive
    * evictions, so every use retries through a fresh resolution via the
    * shared [[StreamStore.retryEvicted]] discipline. */
  private def withHandle[A](f: StreamHandle => A): A =
    StreamStore.retryEvicted(handle)(f)

  case class Delivery(rows: Vector[Map[String, SqlValue]], hasMore: Boolean)

  private case class Sub(
      id: Long,
      user: Option[String],
      query: LeafQuery,
      hasRoom: () => Boolean,
      sink: Delivery => Unit,
      var cursor: Long,
      var closed: Boolean = false)

  private val subs = mutable.LinkedHashMap.empty[Long, Sub]
  private var nextId = 0L
  private val pending = mutable.Queue.empty[Long]

  /** Register a subscription; returns its id. Queues an immediate update so
    * a subscriber with an explicit `start` backfills history first.
    *
    * `hasRoom` is the backpressure valve (the reference bounds its
    * subscription channels at 12 entries and parks the worker when full,
    * lib.rs:337,355): while it returns false the pump skips this
    * subscription — nothing is computed, nothing is buffered — until the
    * consumer frees space and calls `resume`. */
  def subscribe(user: Option[String], q: LeafQuery,
      hasRoom: () => Boolean = () => true)(sink: Delivery => Unit): Long =
    synchronized {
      val cursor = q.start.map(_ - 1).getOrElse(withHandle(_.latest))
      nextId += 1
      subs(nextId) = Sub(nextId, user, q, hasRoom, sink, cursor)
      pending.enqueue(nextId)
      nextId
    }

  def unsubscribe(id: Long): Unit = synchronized {
    subs.get(id).foreach(_.closed = true)
    subs.remove(id)
  }

  /** True iff the subscription is still registered. */
  def has(id: Long): Boolean = synchronized(subs.contains(id))

  /** Re-queue a subscription whose consumer just freed buffer space, so the
    * next drain resumes its catch-up where backpressure paused it. */
  def resume(id: Long): Unit = synchronized {
    if (subs.contains(id)) pending.enqueue(id)
  }

  /** A9: notification that new events landed — wake every subscription. */
  def notifyNewEvents(): Unit = synchronized {
    subs.keysIterator.foreach(pending.enqueue(_))
  }

  // one pump at a time: concurrent drains (append handler + pollers) would
  // dequeue the same subscription twice before either advances its cursor
  // and deliver the same window twice
  private val drainLock = new Object

  /** Pump all pending subscription updates until every live subscription is
    * caught up with the stream (the reference's worker self-scheduling on
    * `has_more`, lib.rs:952-963). Returns number of deliveries made.
    *
    * Fan-out sharing: a hot stream with hundreds of identical
    * subscriptions (same query, params, user, cursor) must not run the
    * same Spark query hundreds of times per pump — results are memoized
    * for the duration of ONE pass, keyed by (user, resolved window query,
    * latest snapshot). The latest snapshot is in the key because the
    * cursor advances to a windowEnd derived from it: two subs may only
    * share rows when they also share the advance, otherwise an append
    * landing mid-pass could advance a cursor past events the memoized
    * rows never saw. */
  def drain(): Int = drainLock.synchronized {
    var deliveries = 0
    val memo = mutable.Map.empty[
      (Option[String], LeafQuery, Long), Vector[Map[String, SqlValue]]]
    var next: Option[Sub] = dequeue()
    while (next.isDefined) {
      val sub = next.get
      val latest = withHandle(_.latest)
      if (!sub.closed && sub.cursor < latest && sub.hasRoom()) {
        val q = sub.query.updateForSubscription(sub.cursor + 1)
        val windowEnd = math.min(q.lastEvent, latest)
        val rows = memo.getOrElseUpdate((sub.user, q, latest),
          withHandle(_.queryTagged(sub.user, q)))
        val hasMore = windowEnd < latest
        sub.sink(Delivery(rows, hasMore))
        deliveries += 1
        sub.cursor = windowEnd
        if (hasMore) synchronized(pending.enqueue(sub.id))
      }
      next = dequeue()
    }
    deliveries
  }

  private def dequeue(): Option[Sub] = synchronized {
    while (pending.nonEmpty) {
      val id = pending.dequeue()
      subs.get(id) match {
        case Some(s) => return Some(s)
        case None => // pruned
      }
    }
    None
  }
}
