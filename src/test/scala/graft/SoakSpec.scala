package graft

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import org.scalatest.funsuite.AnyFunSuite

import graft.server.LeafServer
import graft.stream._
import graft.types._

/** Multi-stream concurrency soak: many streams over a deliberately tiny
  * handle LRU, concurrent appenders + queriers + a live subscriber, with
  * the server's 1s backup sweep running the whole time. Asserts the three
  * fleet-scale failure modes stay absent:
  *   - no deadlock (every worker thread joins),
  *   - no lost events (per-stream latest == appended count),
  *   - no sweep-induced handle thrash (once quiesced, further sweep ticks
  *     construct ZERO new handles — the staleness probe skips unchanged
  *     streams instead of reopening and LRU-evicting them every tick).
  * Duration is GRAFT_SOAK_MS (default 8s of active churn) so CI stays
  * fast while a manual run can soak for minutes. */
class SoakSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def payload(s: String): Array[Byte] = {
    import graft.drisl.DValue._
    graft.drisl.Drisl.encode(obj("v" -> text(s)))
  }

  /** Retry on the inherent open-evict race: with a 4-handle LRU under 30+
    * streams, a handle can be evicted between `store.open` and its use —
    * callers reopen, exactly like any client retrying a 5xx. */
  private def retrying[A](what: String, errors: ConcurrentLinkedQueue[Throwable])(
      f: => A): Option[A] = {
    var attempts = 0
    while (attempts < 50) {
      try return Some(f)
      catch {
        case _: IllegalStateException => attempts += 1 // evicted: reopen
        case t: Throwable => errors.add(new RuntimeException(s"$what: $t", t)); return None
      }
    }
    errors.add(new RuntimeException(s"$what: still evicted after 50 reopens"))
    None
  }

  test("32 streams / LRU 4: appenders + queriers + subscriber + 1s sweep") {
    val store = new StreamStore(spark,
      graft.TempDirs.create("graft-soak").toString, maxOpenHandles = 4)
    val module = ModuleDef(
      initSql = "CREATE TABLE IF NOT EXISTS notes (idx BIGINT, who STRING) USING PARQUET",
      materializer = "INSERT INTO notes SELECT idx, user FROM event",
      queries = Map("cnt" -> QueryDef("SELECT count(*) AS c FROM notes")))
    val n = 32
    val ids = (0 until n).map(i => f"did:soak:$i%02d")
    ids.foreach(id => store.open(id).setModule(module))
    val server = new LeafServer(store, 0,
      backupDest = Some("file:" + graft.TempDirs.create("graft-soak-bak")),
      backupSweepMs = 1000)
    server.start()
    val stop = new AtomicBoolean(false)
    val errors = new ConcurrentLinkedQueue[Throwable]()
    val appended = Array.fill(n)(new AtomicLong(0))
    val delivered = new AtomicLong(0)
    try {
      val appenders = (0 until 4).map { t =>
        new Thread(() => {
          var k = t
          while (!stop.get()) {
            val i = k % n
            retrying(s"append ${ids(i)}", errors)(
              store.open(ids(i)).addEvents(Seq(
                IncomingEvent(s"u$t", payload(s"e$k"))))) match {
              case Some(Right(_)) => appended(i).incrementAndGet()
              case Some(Left(m)) =>
                errors.add(new RuntimeException(s"append rejected: $m"))
              case None =>
            }
            k += 7 // co-prime stride: every appender visits every stream
          }
        }, s"soak-app-$t")
      }
      val queriers = (0 until 2).map { t =>
        new Thread(() => {
          var k = t
          while (!stop.get()) {
            val i = (k * 5) % n
            retrying(s"query ${ids(i)}", errors)(
              store.open(ids(i)).queryTagged(None, LeafQuery("cnt")))
            k += 1
          }
        }, s"soak-qry-$t")
      }
      // a live subscriber on one stream, drained on its own clock — holds
      // an engine across evictions of its underlying handle
      val engine = new SubscriptionEngine(store, ids(0))
      engine.subscribe(None, LeafQuery("cnt"))(d => delivered.addAndGet(1L + d.rows.size))
      val subscriber = new Thread(() => {
        while (!stop.get()) {
          // store-level appends don't route through a server RPC, so the
          // subscriber polls the notify+drain pair itself (the server's
          // delivery loop does exactly this on its own clock)
          try { engine.notifyNewEvents(); engine.drain(); Thread.sleep(300) }
          catch { case t: Throwable => errors.add(t) }
        }
      }, "soak-sub")
      val workers = appenders ++ queriers :+ subscriber
      workers.foreach(_.start())
      Thread.sleep(sys.env.get("GRAFT_SOAK_MS").map(_.toLong).getOrElse(8000L))
      stop.set(true)
      workers.foreach(_.join(120000))
      assert(workers.forall(!_.isAlive), "worker thread stuck: deadlock/stall")
      assert(errors.isEmpty, s"soak errors: ${errors.size} first=${errors.peek()}")
      assert(appended.map(_.get()).sum > 0, "soak must have appended something")
      assert(delivered.get() > 0, "subscriber must have received deliveries")
      // no lost events
      ids.zipWithIndex.foreach { case (id, i) =>
        val latest = retrying(s"latest $id", errors)(store.open(id).latest)
        assert(latest.contains(appended(i).get()),
          s"$id: appended ${appended(i).get()} but latest=$latest")
      }
      assert(store.openHandleCount <= 4, "LRU cap must hold")
      // thrash check, latched on the sweep's own pass counter instead of
      // wall-clock stability polling: every sweep pass visits EVERY
      // stream and exports each stale one, so the first full pass that
      // STARTS after the workers stopped drains the whole backlog by the
      // time it completes. Pass p0+1 may have begun mid-churn; once
      // completed passes reach p0+2, a full post-stop pass has finished —
      // every later pass must construct ZERO handles (the staleness probe
      // skips unchanged streams rather than reopening them every tick).
      def awaitPasses(target: Long, what: String): Unit = {
        // bounded only as a hang guard; the SIGNAL is the counter
        val guard = System.nanoTime + 600L * 1000000000L
        while (server.sweepPassesCompleted < target) {
          assert(System.nanoTime < guard, s"sweep stalled waiting for $what")
          Thread.sleep(100)
        }
      }
      val p0 = server.sweepPassesCompleted
      awaitPasses(p0 + 2, "a full post-stop catch-up pass")
      val baseline = store.totalHandleOpens
      awaitPasses(p0 + 5, "three idle passes")
      assert(store.totalHandleOpens == baseline,
        s"sweep reopened handles on unchanged streams " +
          s"(${store.totalHandleOpens - baseline} reopens across idle passes)")
    } finally {
      stop.set(true)
      server.stop()
    }
  }

  test("RPC surface under LRU churn: no spurious eviction failures") {
    // the server-side twin of the retrying() contract above: a handler
    // resolves a handle and ANOTHER request's open can evict it before
    // use. withStream retries through a fresh resolution (eviction is
    // only thrown at op entry, so the retry is side-effect-safe) — so
    // clients must NEVER see the closed-handle error, even with a
    // 2-handle LRU under 8 streams of concurrent queries and appends.
    val store = new StreamStore(spark,
      graft.TempDirs.create("graft-rpcchurn").toString, maxOpenHandles = 2)
    val server = new LeafServer(store, 0, authToken = Some("tok"))
    server.start()
    try {
      val http = java.net.http.HttpClient.newHttpClient()
      def post(path: String, body: Map[String, Any]): Map[String, Any] = {
        val req = java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:${server.boundPort}$path"))
          .header("Authorization", "Bearer tok")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
            graft.server.Json.render(body)))
          .build()
        graft.server.Json.parse(http.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofString()).body())
          .asInstanceOf[Map[String, Any]]
      }
      val cid = post("/module/upload", Map("module" -> Map(
        "init_sql" -> "CREATE TABLE IF NOT EXISTS t (idx BIGINT) USING PARQUET",
        "materializer" -> "INSERT INTO t SELECT idx FROM event",
        "queries" -> Map("n" -> Map("sql" -> "SELECT count(*) AS c FROM t")))))(
        "ok").asInstanceOf[Map[String, Any]]("cid").toString
      val ids = (0 until 8).map { i =>
        post("/stream/create", Map(
          "id" -> s"did:churn:$i", "module_cid" -> cid))("ok")
          .asInstanceOf[Map[String, Any]]("id").toString
      }
      val errors = new ConcurrentLinkedQueue[String]()
      val stop = new AtomicBoolean(false)
      val threads = (0 until 6).map { t =>
        new Thread(() => {
          var k = t
          while (!stop.get()) {
            val id = ids((k * 5 + t) % ids.size)
            val r =
              if (t % 2 == 0) post("/stream/event_batch", Map("id" -> id,
                "events" -> Vector(Map("user" -> "u",
                  "payload_b64" -> java.util.Base64.getEncoder
                    .encodeToString(payload(s"e$k"))))))
              else post("/stream/query", Map("id" -> id,
                "query" -> Map("name" -> "n")))
            r.get("err").foreach(e => errors.add(e.toString))
            k += 1
          }
        })
      }
      threads.foreach(_.start())
      Thread.sleep(sys.env.get("GRAFT_SOAK_MS").map(_.toLong).getOrElse(6000L))
      stop.set(true)
      threads.foreach(_.join(120000))
      assert(threads.forall(!_.isAlive), "RPC churn worker stuck")
      assert(errors.isEmpty,
        s"RPC errors under LRU churn: ${errors.size} first=${errors.peek()}")
      assert(store.openHandleCount <= 2, "LRU cap must hold")
    } finally server.stop()
  }
}
