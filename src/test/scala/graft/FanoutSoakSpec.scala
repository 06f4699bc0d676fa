package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.Base64

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.drisl.DValue
import graft.drisl.DValue._
import graft.drisl.Drisl
import graft.server.{Json, LeafServer, Msgpack}
import graft.stream.StreamStore

/** High fan-out subscription soak: ~500 subscriptions on ONE hot stream,
  * mixed HTTP-polling and websocket, mirroring the reference's
  * bounded-channel + backoff delivery design (connection.rs:444-475).
  * Asserts the fleet-scale properties:
  *   - server memory stays bounded: every subscription's delivery buffer
  *     caps at maxBufferedDeliveries (12) and the pump PARKS rather than
  *     buffering past it,
  *   - no lost has_more backfills: every subscriber drains its complete
  *     window sequence, in order, across however many polls it takes,
  *   - the drain pass shares query work across identical subscriptions
  *     (one hot stream must not mean hundreds of identical Spark jobs),
  *   - idle subscriptions TTL-evict and free their buffers; websocket
  *     subscriptions are session-scoped and survive the TTL.
  */
class FanoutSoakSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private lazy val store = new StreamStore(spark,
    graft.TempDirs.create("graft-fanout").toString)
  // must comfortably exceed the ~500-subscription setup phase: eviction
  // triggers on the first append, and a TTL shorter than the setup would
  // evict the earliest subscribers before they ever got a delivery
  private val idleTtlMs = 20000L
  private lazy val server = {
    val s = new LeafServer(store, 0, authToken = Some("testtoken"),
      subIdleTtlMs = idleTtlMs)
    s.start(); s
  }
  private lazy val client = HttpClient.newHttpClient()

  private def post(path: String, body: Map[String, Any]): Map[String, Any] = {
    // bounded request time: a co-tenant-stalled request must fail the
    // poll (caught, surfaced) rather than wedge its thread past the
    // soak's join timeout and leak into later suites / session teardown
    val b = HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:${server.boundPort}$path"))
      .POST(HttpRequest.BodyPublishers.ofString(Json.render(body)))
      .timeout(java.time.Duration.ofSeconds(120))
      .header("Authorization", "Bearer testtoken")
    Json.parse(client.send(b.build(),
      HttpResponse.BodyHandlers.ofString()).body()).asInstanceOf[Map[String, Any]]
  }

  private def ok(r: Map[String, Any]): Map[String, Any] = {
    assert(!r.contains("err"), r.toString)
    r("ok").asInstanceOf[Map[String, Any]]
  }

  /** Fixed pool of DAEMON threads: a wedged task must never pin the JVM
    * open past the suite (see the r17 driver-box shutdown signature). */
  private def daemonPool(n: Int): java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newFixedThreadPool(n,
      new java.util.concurrent.ThreadFactory {
        def newThread(r: Runnable): Thread = {
          val t = new Thread(r); t.setDaemon(true); t
        }
      })

  private def payloadB64(k: Long): String =
    Base64.getEncoder.encodeToString(Drisl.encode(obj("n" -> int(k))))

  /** Slim socket.io-over-websocket subscriber (the protocol plumbing the
    * full journeys pin lives in SocketIoSpec; here it only subscribes and
    * collects pushes). */
  private class WsSub {
    import java.util.concurrent.{LinkedBlockingQueue, TimeUnit}
    private val texts = new LinkedBlockingQueue[String]
    // frames carry their arrival nanoTime so latency is measured at the
    // socket, not at whenever the test thread gets around to the queue
    private val bins = new LinkedBlockingQueue[(Array[Byte], Long)]
    private var lastBinNanos = 0L
    private val sb = new StringBuilder
    private val bb = new java.io.ByteArrayOutputStream
    private val listener = new java.net.http.WebSocket.Listener {
      override def onText(w: java.net.http.WebSocket, data: CharSequence,
          last: Boolean): java.util.concurrent.CompletionStage[_] = {
        sb.append(data)
        if (last) { texts.add(sb.toString); sb.setLength(0) }
        w.request(1); null
      }
      override def onBinary(w: java.net.http.WebSocket, data: java.nio.ByteBuffer,
          last: Boolean): java.util.concurrent.CompletionStage[_] = {
        val a = new Array[Byte](data.remaining()); data.get(a); bb.write(a)
        if (last) { bins.add((bb.toByteArray, System.nanoTime())); bb.reset() }
        w.request(1); null
      }
    }
    private val ws: java.net.http.WebSocket = HttpClient.newHttpClient()
      .newWebSocketBuilder()
      .buildAsync(URI.create(
        s"ws://127.0.0.1:${server.boundPort}/socket.io/?EIO=4&transport=websocket"),
        listener)
      .join()
    private def sendSio(pkt: Map[String, Any]): Unit =
      ws.sendBinary(java.nio.ByteBuffer.wrap(Msgpack.encode(pkt)), true).join()
    private def nextSio(): Map[String, Any] = {
      val b = bins.poll(30, TimeUnit.SECONDS)
      assert(b != null, "timed out waiting for a websocket frame")
      lastBinNanos = b._2
      Msgpack.decode(b._1).asInstanceOf[Map[String, Any]]
    }
    // engine.io open (text frame "0{...}") arrives first on a fresh ws
    assert(texts.poll(15, TimeUnit.SECONDS).startsWith("0"))
    sendSio(Map("type" -> 0L, "nsp" -> "/",
      "data" -> Map("token" -> "testtoken")))
    assert(nextSio()("type") == 0L, "socket.io CONNECT must ack")

    def subscribe(streamDid: String, query: DValue): Unit = {
      sendSio(Map("type" -> 2L, "nsp" -> "/", "id" -> 1L,
        "data" -> Vector("stream/subscribe_events",
          Drisl.encode(obj("streamDid" -> text(streamDid), "query" -> query)))))
      // skip interleaved EVENT packets (e.g. the authenticated notice)
      var ack = nextSio()
      while (ack("type") != 3L) ack = nextSio()
      assert(ack.get("id").contains(1L), ack.toString)
    }

    /** Await one pushed subscription_response; returns (row count, frame
      * arrival nanoTime) — arrival is stamped at the socket listener. */
    def awaitPushTimed(): (Int, Long) = {
      val n = awaitPushRows()
      (n, lastBinNanos)
    }

    /** Await one pushed subscription_response; returns its row count. */
    def awaitPushRows(): Int = {
      while (true) {
        val pkt = nextSio()
        if (pkt("type") == 2L) {
          val data = pkt("data").asInstanceOf[Vector[Any]]
          if (data.headOption.contains("stream/subscription_response")) {
            val resp = Drisl.decode(data(1).asInstanceOf[Array[Byte]]) match {
              case DMap(m) => m
              case other => fail(s"push not a map: $other")
            }
            val okv = resp("response") match {
              case DMap(r) => r("Ok") match {
                case DMap(o) => o
                case other => fail(s"push response not Ok: $other")
              }
              case other => fail(s"push response not a map: $other")
            }
            okv("rows") match {
              case DArray(rows) => return rows.size
              case other => fail(s"push rows not an array: $other")
            }
          }
        }
      }
      -1
    }
    def close(): Unit =
      ws.sendClose(java.net.http.WebSocket.NORMAL_CLOSURE, "done").join()
  }

  test("500 subs on one hot stream: bounded buffers, complete backfills, TTL") {
    val cid = ok(post("/module/upload", Map("module" -> Map(
      "init_sql" -> "CREATE TABLE IF NOT EXISTS notes (idx BIGINT) USING PARQUET",
      "materializer" -> "INSERT INTO notes SELECT idx FROM event",
      "queries" -> Map("tail" -> Map("sql" ->
        "SELECT idx FROM notes WHERE idx BETWEEN $start AND $start + $limit - 1 ORDER BY idx"))))
    ))("cid").toString
    val sid = ok(post("/stream/create",
      Map("id" -> "did:fanout:hot", "module_cid" -> cid)))("id").toString

    // websocket subscribers first (connection setup is the slow part and
    // the TTL clock for HTTP subs starts at their subscribe)
    val wsSubs = (0 until 10).map { _ =>
      val w = new WsSub
      w.subscribe(sid, obj("name" -> text("tail"),
        "start" -> int(1), "limit" -> int(1000)))
      w
    }
    // HTTP subscribers, registered BEFORE any event exists so the
    // fan-out pump happens in ONE eager drain at the first append:
    //  - wide: start=1, limit=1000 -> whole backfill in one window
    //  - backfill: start=1, limit=5 -> 4-window backfill, has_more math
    //  - slow: start=1, limit=1 -> more windows than the buffer cap, so
    //    the pump must PARK at 12 buffered deliveries
    def subscribe(q: Map[String, Any]): Long =
      ok(post("/stream/subscribe_events",
        Map("id" -> sid, "query" -> q)))("sub_id").asInstanceOf[Long]
    // registration runs on a pool: ~500 sequential roundtrips would take
    // longer than any sane idle TTL, and every subscribe call sweeps for
    // idle subs — the earliest registrations would be evicted before the
    // first event. Concurrent registration is also the realistic shape.
    def subscribeMany(n: Int, q: Map[String, Any]): Vector[Long] = {
      val pool = daemonPool(16)
      try {
        import scala.jdk.CollectionConverters._
        pool.invokeAll(Vector.fill(n)(new java.util.concurrent.Callable[Long] {
          def call(): Long = subscribe(q)
        }).asJava).asScala.map(_.get()).toVector
      } finally pool.shutdown()
    }
    val wide = subscribeMany(450, Map("name" -> "tail",
      "start" -> 1L, "limit" -> 1000L))
    val backfill = subscribeMany(30, Map("name" -> "tail",
      "start" -> 1L, "limit" -> 5L))
    val slow = subscribeMany(10, Map("name" -> "tail",
      "start" -> 1L, "limit" -> 1L))

    // ONE 20-event append pumps all ~500 subscriptions eagerly
    val r = ok(post("/stream/event_batch", Map("id" -> sid,
      "events" -> (1 to 20).map(k =>
        Map("user" -> "u", "payload_b64" -> payloadB64(k))).toVector)))
    assert(r("latest_idx") == 20L)

    // bounded memory: the cap held for every slow sub — 20 windows were
    // due but exactly 12 deliveries buffered, the rest parked
    slow.foreach(id => assert(server.bufferedDeliveries(sid, id) == 12,
      s"slow sub $id buffered ${server.bufferedDeliveries(sid, id)}"))
    backfill.foreach(id => assert(server.bufferedDeliveries(sid, id) == 4))
    wide.take(20).foreach(id =>
      assert(server.bufferedDeliveries(sid, id) == 1))

    // every websocket subscriber got its push with the full window
    wsSubs.foreach(w => assert(w.awaitPushRows() == 20))

    // drain every subscriber to completion: the complete in-order window
    // sequence arrives, has_more true on every delivery but the last
    def drainSub(id: Long): Vector[(Vector[Long], Boolean)] = {
      val got = mutable.Buffer.empty[(Vector[Long], Boolean)]
      var idle = 0
      while (idle < 3) {
        val ds = ok(post("/stream/poll", Map("id" -> sid, "sub_id" -> id)))(
          "deliveries").asInstanceOf[Vector[Any]]
        if (ds.isEmpty) idle += 1
        else {
          idle = 0
          ds.foreach { d =>
            val dm = d.asInstanceOf[Map[String, Any]]
            val idxs = dm("rows").asInstanceOf[Vector[Any]].map(row =>
              row.asInstanceOf[Map[String, Any]]("idx")
                .asInstanceOf[Map[String, Any]]("value").asInstanceOf[Long])
            got += ((idxs, dm("has_more") == true))
          }
        }
      }
      got.toVector
    }
    slow.foreach { id =>
      val ds = drainSub(id)
      assert(ds.flatMap(_._1) == (1L to 20L).toVector,
        s"slow sub $id lost or reordered backfill windows: ${ds.map(_._1)}")
      assert(ds.dropRight(1).forall(_._2) && !ds.last._2,
        s"has_more must be true until the final window: ${ds.map(_._2)}")
    }
    backfill.foreach { id =>
      val ds = drainSub(id)
      assert(ds.flatMap(_._1) == (1L to 20L).toVector)
      assert(ds.map(_._1.size) == Vector(5, 5, 5, 5))
    }
    wide.take(20).foreach { id =>
      assert(drainSub(id).flatMap(_._1) == (1L to 20L).toVector)
    }

    // TTL: leave every HTTP subscription idle past the TTL, then trigger
    // eviction with an append. Buffers free; polls reject; the
    // websocket subscriptions are session-scoped and still get the push.
    Thread.sleep(idleTtlMs + 600)
    ok(post("/stream/event_batch", Map("id" -> sid, "events" ->
      Vector(Map("user" -> "u", "payload_b64" -> payloadB64(21))))))
    (slow ++ backfill ++ wide.take(5)).foreach { id =>
      assert(server.bufferedDeliveries(sid, id) == 0,
        s"evicted sub $id still pins a buffer")
      val resp = post("/stream/poll", Map("id" -> sid, "sub_id" -> id))
      assert(resp.get("err").exists(_.toString.contains("unknown subscription")),
        s"poll of evicted sub $id: $resp")
    }
    wsSubs.foreach(w => assert(w.awaitPushRows() == 1,
      "websocket subs must survive the HTTP idle TTL"))
    wsSubs.foreach(_.close())
  }

  test("sustained ingest: 50 consecutive appends under drain stay flat") {
    // the reference's worker-loop steady state (lib.rs:888-985): events
    // keep arriving while every subscriber keeps draining. One append is
    // not the regime that exposes leaks — a queue that grows by one per
    // batch, a pump that re-delivers old windows, a p99 that creeps as
    // state accumulates all need CONSECUTIVE appends to show. Asserts:
    //  - every subscriber receives exactly the in-order idx sequence
    //    1..N across the whole run (no loss, no reorder, no re-delivery)
    //  - delivery buffers stay far below the park cap throughout (the
    //    drain keeps up — steady state, not a growing backlog)
    //  - per-append delivery p99 over the last fifth of the run is not a
    //    multiple of the first fifth's (flat, not creeping)
    val nAppends = 50
    val nSubs = 60
    val cid = ok(post("/module/upload", Map("module" -> Map(
      "init_sql" -> "CREATE TABLE IF NOT EXISTS notes (idx BIGINT) USING PARQUET",
      "materializer" -> "INSERT INTO notes SELECT idx FROM event",
      "queries" -> Map("tail" -> Map("sql" ->
        "SELECT idx FROM notes WHERE idx BETWEEN $start AND $start + $limit - 1 ORDER BY idx"))))
    ))("cid").toString
    val sid = ok(post("/stream/create",
      Map("id" -> "did:fanout:sustained", "module_cid" -> cid)))("id").toString

    val pool = daemonPool(32)
    import scala.jdk.CollectionConverters._
    val subs = pool.invokeAll(Vector.fill(nSubs)(
      new java.util.concurrent.Callable[Long] {
        def call(): Long = ok(post("/stream/subscribe_events",
          Map("id" -> sid, "query" -> Map("name" -> "tail",
            "start" -> 1L, "limit" -> 1000L))))("sub_id").asInstanceOf[Long]
      }).asJava).asScala.map(_.get()).toVector

    // one continuously-draining poller per sub — on its OWN thread (a
    // shared pool smaller than nSubs would starve the excess pollers,
    // park their pumps at the buffer cap, and measure the test harness
    // instead of the server), recording each delivered idx's arrival
    // nanoTime; terminates once it has seen idx=nAppends
    val arrivals = new java.util.concurrent.ConcurrentHashMap[(Long, Long), Long]
    val sequences = new java.util.concurrent.ConcurrentHashMap[Long, Vector[Long]]
    // daemon drain threads with a hard deadline: a wedged drain (server
    // stalled under co-tenant load, or an earlier assert aborting the
    // append loop) must fail this test loudly, not spin its loop forever
    // and hang the JVM into the harness kill window
    val drainPool = daemonPool(nSubs)
    val drainDeadline = System.nanoTime() + 300L * 1000 * 1000 * 1000
    val drains = subs.map(id => drainPool.submit(new Runnable {
      def run(): Unit = {
        var seen = Vector.empty[Long]
        while (!seen.lastOption.contains(nAppends.toLong)) {
          if (System.nanoTime() > drainDeadline)
            throw new IllegalStateException(
              s"sub $id drain deadline: saw ${seen.size} of $nAppends")
          val ds = ok(post("/stream/poll", Map("id" -> sid, "sub_id" -> id)))(
            "deliveries").asInstanceOf[Vector[Any]]
          val at = System.nanoTime()
          ds.foreach { d =>
            val rows = d.asInstanceOf[Map[String, Any]]("rows")
              .asInstanceOf[Vector[Any]]
            rows.foreach { row =>
              val k = row.asInstanceOf[Map[String, Any]]("idx")
                .asInstanceOf[Map[String, Any]]("value").asInstanceOf[Long]
              arrivals.put((id, k), at)
              seen :+= k
            }
          }
          if (ds.isEmpty) Thread.sleep(20)
        }
        sequences.put(id, seen)
      }
    }))

    val appendStart = new Array[Long](nAppends + 1)
    val probeSubs = subs.take(5)
    try {
      for (k <- 1 to nAppends) {
        appendStart(k) = System.nanoTime()
        val r = ok(post("/stream/event_batch", Map("id" -> sid,
          "events" -> Vector(Map("user" -> "u", "payload_b64" -> payloadB64(k))))))
        assert(r("latest_idx") == k.toLong)
        // steady state means the backlog never approaches the park cap —
        // a creep here is the leak this soak exists to catch
        probeSubs.foreach { id =>
          val buf = server.bufferedDeliveries(sid, id)
          assert(buf <= 12, s"append $k: sub $id backlog $buf")
        }
      }
      drains.foreach(_.get(360, java.util.concurrent.TimeUnit.SECONDS))
    } finally {
      pool.shutdownNow(); drainPool.shutdownNow()
    }

    // completeness + order, every subscriber, whole run
    subs.foreach { id =>
      assert(sequences.get(id) == (1L to nAppends.toLong).toVector,
        s"sub $id saw ${sequences.get(id)}")
    }

    // per-append p50/p99 across subs; flatness over the run
    def pct(xs: Seq[Double], p: Double): Double =
      xs(math.min(xs.size - 1, (p * xs.size).toInt))
    val perAppend = (1 to nAppends).map { k =>
      val lats = subs.map(id =>
        (arrivals.get((id, k.toLong)) - appendStart(k)) / 1e6).sorted
      (pct(lats, 0.5), pct(lats, 0.99))
    }
    val p50s = perAppend.map(_._1); val p99s = perAppend.map(_._2)
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val early = med(p99s.take(10)); val late = med(p99s.takeRight(10))
    println(f"SUSTAINED_FANOUT subs=$nSubs appends=$nAppends " +
      f"per-append p50 med=${med(p50s)}%.0fms p99 med=${med(p99s)}%.0fms " +
      f"p99 first10=${early}%.0fms last10=${late}%.0fms")
    // generous: catches creep (leaked state slowing every append), not
    // machine noise
    assert(late < math.max(5 * early, early + 2000),
      f"p99 crept $early%.0fms -> $late%.0fms over $nAppends appends")
  }

  test("append→delivery latency under 500-sub fan-out (polling + websocket)") {
    val cid = ok(post("/module/upload", Map("module" -> Map(
      "init_sql" -> "CREATE TABLE IF NOT EXISTS notes (idx BIGINT) USING PARQUET",
      "materializer" -> "INSERT INTO notes SELECT idx FROM event",
      "queries" -> Map("tail" -> Map("sql" ->
        "SELECT idx FROM notes WHERE idx BETWEEN $start AND $start + $limit - 1 ORDER BY idx"))))
    ))("cid").toString
    val sid = ok(post("/stream/create",
      Map("id" -> "did:fanout:lat", "module_cid" -> cid)))("id").toString

    val wsSubs = (0 until 10).map { _ =>
      val w = new WsSub
      w.subscribe(sid, obj("name" -> text("tail"),
        "start" -> int(1), "limit" -> int(1000)))
      w
    }
    // 500 identical wide-window HTTP subscriptions: one delivery per sub
    // per append, the drain-memoization hot-stream shape
    val pool = daemonPool(32)
    import scala.jdk.CollectionConverters._
    val subs = pool.invokeAll(Vector.fill(500)(
      new java.util.concurrent.Callable[Long] {
        def call(): Long = ok(post("/stream/subscribe_events",
          Map("id" -> sid, "query" -> Map("name" -> "tail",
            "start" -> 1L, "limit" -> 1000L))))("sub_id").asInstanceOf[Long]
      }).asJava).asScala.map(_.get()).toVector

    // pollers armed BEFORE the append so each sub's number is honest
    // client-observed latency: append wall start → first non-empty poll
    val t0 = new java.util.concurrent.atomic.AtomicLong(0L)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val polls = subs.map(id => pool.submit(
      new java.util.concurrent.Callable[Double] {
        def call(): Double = {
          gate.await()
          while (true) {
            val ds = ok(post("/stream/poll", Map("id" -> sid, "sub_id" -> id)))(
              "deliveries").asInstanceOf[Vector[Any]]
            if (ds.nonEmpty) return (System.nanoTime() - t0.get) / 1e6
            Thread.sleep(50)
          }
          -1.0
        }
      }))
    t0.set(System.nanoTime()); gate.countDown()
    ok(post("/stream/event_batch", Map("id" -> sid,
      "events" -> Vector(Map("user" -> "u", "payload_b64" -> payloadB64(1))))))
    val pollLats = polls.map(_.get()).sorted
    pool.shutdown()
    val wsLats = wsSubs.map { w =>
      val (n, at) = w.awaitPushTimed()
      assert(n == 1, s"ws push had $n rows")
      (at - t0.get) / 1e6
    }.sorted
    def pct(xs: Seq[Double], p: Double): Double =
      xs(math.min(xs.size - 1, (p * xs.size).toInt))
    println(f"FANOUT_LATENCY subs=${subs.size} poll_ms p50=${pct(pollLats, 0.5)}%.0f " +
      f"p99=${pct(pollLats, 0.99)}%.0f ws p50=${pct(wsLats, 0.5)}%.0f " +
      f"p99=${pct(wsLats, 0.99)}%.0f")
    // generous ceilings — these exist to catch a pathological regression
    // (per-sub Spark jobs, a parked pump never resuming), not to pin a
    // machine-dependent number
    assert(pct(pollLats, 0.99) < 60000,
      f"poll p99 ${pct(pollLats, 0.99)}%.0fms — fan-out delivery degraded")
    assert(pct(wsLats, 0.99) < 60000,
      f"ws p99 ${pct(wsLats, 0.99)}%.0fms — push delivery degraded")
    wsSubs.foreach(_.close())
  }

  test("targeted delete under kNN query load: the tombstone commit is " +
    "atomic to pollers — no failed reads, deleted ids never resurface") {
    // the delete-side soak: pollers run the two-stage kNN named query
    // over RPC while (a) a delete RPC tombstones the query's distance-0
    // twins and (b) a compact RPC purges them physically. Every poll
    // must return a complete, ordered result; every poll STARTED after
    // the delete RPC returned must exclude the victims, through both
    // the logical commit and the physical purge.
    import org.apache.spark.sql.functions._
    val src = "/root/testdata/sf0.001"
    val idx = graft.TempDirs.create("graft-delsoak").toString
    graft.queries.Similarity.buildVectorIndex(spark, src, idx)
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    // five distance-0 twins of vector 7 — the victims
    val victims = (1 to 5).map(i => 7L + i * 1000000L)
    graft.queries.Similarity.appendVectorIndexDf(spark,
      emb.filter(col("vec_id") === 7)
        .withColumn("vec_id", explode(typedlit(victims.toSeq)))
        .select(col("vec_id"), col("embedding")), idx)

    val twoStageSql = graft.queries.Similarity.twoStageKnnSql(
      a => s"vd_$a", "$qvec", "CAST($limit AS INT)")
    val cid = ok(post("/module/upload", Map("module" -> Map(
      "queries" -> Map("knn" -> Map(
        "sql" -> twoStageSql,
        "params" -> Vector(Map("name" -> "qvec", "kind" -> "text"))))))))(
      "cid").asInstanceOf[String]
    val sid = ok(post("/stream/create",
      Map("id" -> "did:fanout:delsoak", "module_cid" -> cid)))("id").toString
    ok(post("/admin/vector_index_attach",
      Map("id" -> sid, "prefix" -> "vd", "dir" -> idx)))
    val qv = emb.filter(col("vec_id") === 7)
      .select(transform(col("embedding"),
        x => floor(x.cast("double") * 64 + lit(0.5)).cast("long")).as("v"))
      .head.getSeq[Long](0)

    val running = new java.util.concurrent.atomic.AtomicBoolean(true)
    val deletedAt = new java.util.concurrent.atomic.AtomicLong(Long.MaxValue)
    val failure = new java.util.concurrent.atomic.AtomicReference[String](null)
    val polls = new java.util.concurrent.atomic.AtomicLong(0)
    val pollers = (1 to 2).map { _ =>
      new Thread(() => {
        while (running.get() && failure.get() == null) {
          val started = System.nanoTime()
          try {
            val rows = ok(post("/stream/query", Map("id" -> sid,
              "query" -> Map("name" -> "knn", "limit" -> 6L,
                "params" -> Map("qvec" -> qv.mkString(","))))))("rows")
              .asInstanceOf[Vector[Any]].map { r =>
                val m = r.asInstanceOf[Map[String, Any]]
                def l(f: String) = m(f).asInstanceOf[Map[String, Any]](
                  "value").asInstanceOf[Long]
                (l("vec_id"), l("exact_dist"))
              }
            polls.incrementAndGet()
            if (rows.isEmpty || rows.head._1 != 7L || rows.head._2 != 0L)
              failure.set(s"head drifted: $rows")
            else if (rows.map(_._2) != rows.map(_._2).sorted)
              failure.set(s"distances out of order: $rows")
            else if (started > deletedAt.get() &&
                rows.exists(r => victims.contains(r._1)))
              failure.set(s"deleted id resurfaced post-commit: $rows")
          } catch {
            case e: Exception => failure.set(s"poll threw: $e")
          }
        }
      })
    }
    pollers.foreach(_.setDaemon(true))
    pollers.foreach(_.start())
    // poller shutdown is unconditional: an assertion throwing mid-soak
    // must not leak live pollers into later tests / session teardown
    // (leaked pollers keep submitting jobs and die noisily against the
    // stopping executor pool — the r17 driver-box signature)
    try {
      // let the pollers see the pre-delete world (twins present)
      Thread.sleep(1500)
      val del = ok(post("/admin/vector_index_delete",
        Map("dir" -> idx, "ids" -> victims.toVector.map(v => v: Any))))
      deletedAt.set(System.nanoTime())
      assert(del("tombstones") == victims.size.toLong, del.toString)
      Thread.sleep(1500)
      // the physical purge mid-poll: same answers, empty tombstone set
      val info = ok(post("/admin/vector_index_compact", Map("dir" -> idx)))
      assert(info("tombstones") == 0L, info.toString)
      Thread.sleep(1500)
    } finally {
      running.set(false)
      pollers.foreach(_.join(30000))
    }
    assert(failure.get() == null, String.valueOf(failure.get()))
    assert(polls.get() >= 6, s"only ${polls.get()} polls — soak too short")
    // final state: the twins are gone from the serving path
    val fin = ok(post("/stream/query", Map("id" -> sid,
      "query" -> Map("name" -> "knn", "limit" -> 6L,
        "params" -> Map("qvec" -> qv.mkString(","))))))("rows")
      .asInstanceOf[Vector[Any]].map(r =>
        r.asInstanceOf[Map[String, Any]]("vec_id")
          .asInstanceOf[Map[String, Any]]("value").asInstanceOf[Long])
    assert(fin.head == 7L && fin.forall(id => !victims.contains(id)), fin)
  }

  test("vector-index ingest under kNN query load: flat latency, no torn reads") {
    // the vector twin of the sustained-ingest soak (lib.rs:888-985 steady
    // state): vectorIndexIngestStream appends 50 micro-batches into the
    // persisted index WHILE param-bound two-stage kNN named queries poll
    // the same artifacts over RPC. Asserts the steady-state properties:
    //  - no torn reads: every poll returns a consistent top-k — the head
    //    is always the query's own vector at exact distance 0, distances
    //    are nondecreasing, and the distance-0 twin count only GROWS
    //    (within a batch, vectors commit before codes, so a codes
    //    candidate always inner-joins its vector — the read can observe
    //    a prefix of an append, never an inconsistent one)
    //  - flat latency: query time over the last polls is not a multiple
    //    of the first polls' (the index grows, the probe cost must not)
    import org.apache.spark.sql.functions._
    val src = "/root/testdata/sf0.001"
    val idx = graft.TempDirs.create("graft-vecsoak").toString
    graft.queries.Similarity.buildVectorIndex(spark, src, idx)
    val n0 = graft.queries.Similarity.vectorIndexInfo(spark, idx)("vectors")

    val twoStageSql = graft.queries.Similarity.twoStageKnnSql(
      a => s"vi_$a", "$qvec", "CAST($limit AS INT)")
    val cid = ok(post("/module/upload", Map("module" -> Map(
      "queries" -> Map("knn" -> Map(
        "sql" -> twoStageSql,
        "params" -> Vector(Map("name" -> "qvec", "kind" -> "text"))))))))(
      "cid").asInstanceOf[String]
    val sid = ok(post("/stream/create",
      Map("id" -> "did:fanout:vecsoak", "module_cid" -> cid)))("id").toString
    ok(post("/admin/vector_index_attach",
      Map("id" -> sid, "prefix" -> "vi", "dir" -> idx)))

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val qv = emb.filter(col("vec_id") === 7)
      .select(transform(col("embedding"),
        x => floor(x.cast("double") * 64 + lit(0.5)).cast("long")).as("v"))
      .head.getSeq[Long](0)

    // 50 increments of 40 vectors each (vec 7's twin in every wave), all
    // landed up front; maxFilesPerTrigger=1 makes them 50 micro-batches
    val nWaves = 50; val waveSize = 40L
    val land = graft.TempDirs.create("graft-vecsoak-land").toString
    val wave = emb.filter(col("vec_id") < waveSize)
    for (i <- 1 to nWaves)
      wave.withColumn("vec_id", col("vec_id") + lit(i * 1000000L))
        .coalesce(1).write.mode("append").parquet(land)

    val running = new java.util.concurrent.atomic.AtomicBoolean(true)
    val failure = new java.util.concurrent.atomic.AtomicReference[String](null)
    val lats = new java.util.concurrent.ConcurrentLinkedQueue[Double]
    val pollers = (1 to 2).map { _ =>
      new Thread(() => {
        var lastZero = 0
        while (running.get() && failure.get() == null) {
          val t0 = System.nanoTime()
          try {
            val rows = ok(post("/stream/query", Map("id" -> sid,
              "query" -> Map("name" -> "knn", "limit" -> 5L,
                "params" -> Map("qvec" -> qv.mkString(","))))))("rows")
              .asInstanceOf[Vector[Any]].map { r =>
                val m = r.asInstanceOf[Map[String, Any]]
                def l(f: String) = m(f).asInstanceOf[Map[String, Any]](
                  "value").asInstanceOf[Long]
                (l("vec_id"), l("exact_dist"))
              }
            lats.add((System.nanoTime() - t0) / 1e6)
            if (rows.size != 5)
              failure.set(s"short result: $rows")
            else if (rows.head != ((7L, 0L)))
              failure.set(s"head drifted: $rows")
            else if (rows.map(_._2) != rows.map(_._2).sorted)
              failure.set(s"distances out of order: $rows")
            else {
              val zeros = rows.count(_._2 == 0L)
              if (zeros < lastZero)
                failure.set(s"distance-0 twins went backwards: " +
                  s"$lastZero -> $zeros in $rows")
              lastZero = zeros
            }
          } catch {
            case e: Exception => failure.set(s"poll threw: $e")
          }
        }
      })
    }
    pollers.foreach(_.setDaemon(true))
    pollers.foreach(_.start())

    // poller shutdown is unconditional: a failed/stalled ingest stream
    // must not leak live pollers into later tests / session teardown
    // (the r17 driver-box failure signature: tasks rejected from a
    // shutting-down executor pool while leaked pollers kept submitting)
    val ingestSec = try {
      def landStream = spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1").parquet(land)
      val ckpt = graft.TempDirs.create("graft-vecsoak-ckpt").toString
      val t0 = System.nanoTime()
      val q = graft.streaming.EventStreamPipeline
        .vectorIndexIngestStream(landStream, idx, ckpt)
      q.awaitTermination()
      (System.nanoTime() - t0) / 1e9
    } finally {
      running.set(false)
      pollers.foreach(_.join(30000))
    }
    assert(failure.get() == null, String.valueOf(failure.get()))

    // the index grew by every wave; the final top-5 is ALL distance-0
    // twins of the query vector
    assert(graft.queries.Similarity.vectorIndexInfo(spark, idx)("vectors")
      == n0 + nWaves * waveSize)
    val fin = ok(post("/stream/query", Map("id" -> sid,
      "query" -> Map("name" -> "knn", "limit" -> 5L,
        "params" -> Map("qvec" -> qv.mkString(","))))))("rows")
      .asInstanceOf[Vector[Any]].map(r =>
        r.asInstanceOf[Map[String, Any]]("exact_dist")
          .asInstanceOf[Map[String, Any]]("value").asInstanceOf[Long])
    assert(fin == Vector.fill(5)(0L), fin.toString)

    // flat latency: the index is 5× its starting size — the probe must
    // not be. Generous (catches O(index) creep, not machine noise).
    import scala.jdk.CollectionConverters._
    val ls = lats.asScala.toVector
    assert(ls.size >= 20, s"only ${ls.size} polls completed during ingest")
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val early = med(ls.take(10)); val late = med(ls.takeRight(10))
    println(f"VECSOAK waves=$nWaves polls=${ls.size} ingest=${ingestSec}%.1fs " +
      f"knn_ms med=${med(ls)}%.0f first10=${early}%.0f last10=${late}%.0f")
    assert(late < math.max(5 * early, early + 2000),
      f"kNN latency crept $early%.0fms -> $late%.0fms during ingest")
  }

  test("kNN queries poll DURING concurrent compact + retrain: zero failed " +
    "or torn reads across manifest flips") {
    // the versioned-manifest commit's user-visible contract: maintenance
    // flips (compact, retrain, append in between) run under live query
    // load and no poll ever fails or returns an inconsistent top-k. A
    // reader mid-flip drains on the RETAINED previous generation; the
    // maintenance RPC re-resolves the attached views after each flip,
    // always one full cycle before that generation is retired.
    import org.apache.spark.sql.functions._
    val src = "/root/testdata/sf0.001"
    val idx = graft.TempDirs.create("graft-vecmaint").toString
    graft.queries.Similarity.buildVectorIndex(spark, src, idx)

    val twoStageSql = graft.queries.Similarity.twoStageKnnSql(
      a => s"vm_$a", "$qvec", "CAST($limit AS INT)")
    val cid = ok(post("/module/upload", Map("module" -> Map(
      "queries" -> Map("knn" -> Map(
        "sql" -> twoStageSql,
        "params" -> Vector(Map("name" -> "qvec", "kind" -> "text"))))))))(
      "cid").asInstanceOf[String]
    val sid = ok(post("/stream/create",
      Map("id" -> "did:fanout:vecmaint", "module_cid" -> cid)))("id").toString
    ok(post("/admin/vector_index_attach",
      Map("id" -> sid, "prefix" -> "vm", "dir" -> idx)))

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val qv = emb.filter(col("vec_id") === 7)
      .select(transform(col("embedding"),
        x => floor(x.cast("double") * 64 + lit(0.5)).cast("long")).as("v"))
      .head.getSeq[Long](0)

    val running = new java.util.concurrent.atomic.AtomicBoolean(true)
    val failure = new java.util.concurrent.atomic.AtomicReference[String](null)
    val polls = new java.util.concurrent.atomic.AtomicInteger(0)
    val pollers = (1 to 2).map { _ =>
      new Thread(() => {
        while (running.get() && failure.get() == null) {
          try {
            val rows = ok(post("/stream/query", Map("id" -> sid,
              "query" -> Map("name" -> "knn", "limit" -> 5L,
                "params" -> Map("qvec" -> qv.mkString(","))))))("rows")
              .asInstanceOf[Vector[Any]].map { r =>
                val m = r.asInstanceOf[Map[String, Any]]
                def l(f: String) = m(f).asInstanceOf[Map[String, Any]](
                  "value").asInstanceOf[Long]
                (l("vec_id"), l("exact_dist"))
              }
            polls.incrementAndGet()
            if (rows.size != 5)
              failure.set(s"short result mid-maintenance: $rows")
            else if (rows.head != ((7L, 0L)))
              failure.set(s"head drifted mid-maintenance: $rows")
            else if (rows.map(_._2) != rows.map(_._2).sorted)
              failure.set(s"distances out of order mid-maintenance: $rows")
          } catch {
            case e: Exception => failure.set(s"poll threw mid-maintenance: $e")
          }
        }
      })
    }
    pollers.foreach(_.setDaemon(true))
    pollers.foreach(_.start())

    // three full maintenance cycles under load: append a twin wave, then
    // compact (flip), then retrain (flip) — each flip via the RPC so the
    // server refreshes the attached views like a real deployment
    val wave = emb.filter(col("vec_id") < 40)
    var cycles = 0
    try {
      for (i <- 1 to 3 if failure.get() == null) {
        graft.queries.Similarity.appendVectorIndexDf(spark,
          wave.withColumn("vec_id", col("vec_id") + lit(i * 1000000L)), idx)
        ok(post("/admin/vector_index_compact", Map("dir" -> idx)))
        ok(post("/admin/vector_index_retrain", Map("dir" -> idx)))
        cycles = i
      }
    } finally {
      running.set(false)
      pollers.foreach(_.join(30000))
    }
    assert(failure.get() == null, String.valueOf(failure.get()))
    assert(cycles == 3)
    assert(polls.get() >= 10,
      s"only ${polls.get()} polls landed across 3 maintenance cycles")
    println(s"VECMAINT cycles=3 polls=${polls.get()} — no failed/torn reads")

    // and the final state is exactly the build + 3 waves, fully coded
    val info = graft.queries.Similarity.vectorIndexInfo(spark, idx)
    assert(info("vectors") == emb.count() + 3 * 40, info.toString)
    val fin = ok(post("/stream/query", Map("id" -> sid,
      "query" -> Map("name" -> "knn", "limit" -> 5L,
        "params" -> Map("qvec" -> qv.mkString(","))))))("rows")
      .asInstanceOf[Vector[Any]].map(r =>
        r.asInstanceOf[Map[String, Any]]("exact_dist")
          .asInstanceOf[Map[String, Any]]("value").asInstanceOf[Long])
    // self + the 3 appended twins are exact-distance-0; the 5th is real
    assert(fin.take(4) == Vector.fill(4)(0L) && fin == fin.sorted,
      s"post-maintenance top-5 should lead with self + 3 twins: $fin")
  }

  test("BM25 queries poll DURING concurrent lexical append + compact: " +
    "zero failed or torn reads, final answer oracle-exact") {
    // the third index family's under-load contract, mirroring the kNN
    // maintenance soak: postings appends and compactions flip the
    // versioned meta pointer while two clients hammer the $terms named
    // query — no poll may fail, return short, or mis-order, and after
    // quiesce the served scores equal a plain-Scala Okapi recompute
    // over the full (base + waves) corpus.
    import org.apache.spark.sql.functions.{col, lit, concat}
    val src = "/root/testdata/sf0.001"
    val idx = graft.TempDirs.create("graft-lexsoak").toString
    graft.queries.Retrieval.buildLexicalIndex(spark, src, idx)

    val bmSql = graft.queries.Retrieval.bm25NamedSql(
      a => s"ls_$a", "$terms", "CAST($limit AS INT)")
    val cid = ok(post("/module/upload", Map("module" -> Map(
      "queries" -> Map("bm25" -> Map(
        "sql" -> bmSql,
        "params" -> Vector(Map("name" -> "terms", "kind" -> "text"))))))))(
      "cid").asInstanceOf[String]
    val sid = ok(post("/stream/create",
      Map("id" -> "did:fanout:lexmaint", "module_cid" -> cid)))("id").toString
    ok(post("/admin/lexical_index_attach",
      Map("id" -> sid, "prefix" -> "ls", "dir" -> idx)))

    val docsT = spark.read.parquet(s"$src/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    val freq = docsT.flatMap(_._2.trim.toLowerCase.split("\\s+"))
      .filterNot(_.isEmpty).groupBy(identity).view.mapValues(_.length).toSeq
    val common = freq.maxBy { case (t, c) => (c, t) }._1
    val rare = freq.minBy { case (t, c) => (c, t) }._1
    val terms = Seq(common, rare)

    def askTop(k: Long): Vector[(Long, Long)] =
      ok(post("/stream/query", Map("id" -> sid, "query" -> Map(
        "name" -> "bm25", "limit" -> k,
        "params" -> Map("terms" -> terms.mkString(","))))))("rows")
        .asInstanceOf[Vector[Any]].map { r =>
          val m = r.asInstanceOf[Map[String, Any]]
          def l(f: String) = m(f).asInstanceOf[Map[String, Any]]("value")
            .asInstanceOf[Long]
          (l("doc_id"), l("score_micro"))
        }

    val running = new java.util.concurrent.atomic.AtomicBoolean(true)
    val failure = new java.util.concurrent.atomic.AtomicReference[String](null)
    val polls = new java.util.concurrent.atomic.AtomicInteger(0)
    val pollers = (1 to 2).map { _ =>
      new Thread(() => {
        while (running.get() && failure.get() == null) {
          try {
            val rows = askTop(5L)
            polls.incrementAndGet()
            if (rows.size != 5)
              failure.set(s"short result mid-maintenance: $rows")
            else if (rows.map(r => (-r._2, r._1)) !=
                rows.map(r => (-r._2, r._1)).sorted)
              failure.set(s"ordering broke mid-maintenance: $rows")
            else if (rows.exists(_._2 <= 0L))
              failure.set(s"non-positive BM25 score mid-maintenance: $rows")
          } catch {
            case e: Exception => failure.set(s"poll threw mid-maintenance: $e")
          }
        }
      })
    }
    pollers.foreach(_.setDaemon(true))
    pollers.foreach(_.start())

    // three cycles: append a 20-doc wave (cloned text + a wave token),
    // then compact — both via the RPCs so the server refreshes the
    // attached views across each pointer flip
    val base = spark.read.parquet(s"$src/documents.parquet")
      .select(col("doc_id"), col("text")).limit(20)
    var cycles = 0
    val waves = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    try {
      for (i <- 1 to 3 if failure.get() == null) {
        val incDir = graft.TempDirs.create(s"graft-lexsoak-w$i").toString
        base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
            concat(col("text"), lit(s" wavetok$i")).as("text"))
          .coalesce(1).write.mode("overwrite").parquet(incDir)
        spark.read.parquet(incDir).collect().foreach(r =>
          waves += ((r.getLong(0), r.getString(1))))
        ok(post("/admin/lexical_index_append",
          Map("src" -> incDir, "dir" -> idx)))
        ok(post("/admin/lexical_index_compact", Map("dir" -> idx)))
        cycles = i
      }
    } finally {
      running.set(false)
      pollers.foreach(_.join(30000))
    }
    assert(failure.get() == null, String.valueOf(failure.get()))
    assert(cycles == 3)
    assert(polls.get() >= 10,
      s"only ${polls.get()} polls landed across 3 maintenance cycles")
    println(s"LEXMAINT cycles=3 polls=${polls.get()} — no failed/torn reads")

    // quiesced exactness: the served top-5 equals a plain-Scala Okapi
    // recompute over base + all three waves (HALF_UP rounding ladder,
    // the ServerSpec discipline)
    def rnd(x: Double): Long = java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    val tokAll = (docsT ++ waves).map { case (id, tx) =>
      id -> tx.trim.toLowerCase.split("\\s+").toSeq }
    val n = tokAll.length
    val dls = tokAll.map { case (id, ws) => id -> ws.size.toLong }.toMap
    val avgdl = dls.values.sum.toDouble / n
    val dfOf = terms.map(t => t -> tokAll.count(_._2.contains(t)).toLong).toMap
    val want = tokAll.map { case (id, ws) =>
      id -> terms.map { t =>
        val tf = ws.count(_ == t).toLong
        if (tf == 0L) 0L
        else {
          val idf = rnd(math.log(((n - dfOf(t)).toDouble + 0.5) /
            (dfOf(t).toDouble + 0.5) + 1.0) * 1e6)
          rnd(idf * ((tf.toDouble * 2.2) / (tf.toDouble +
            1.2 * (0.25 + (0.75 * dls(id).toDouble) / avgdl))))
        }
      }.sum
    }.filter(_._2 != 0L).sortBy { case (id, sc) => (-sc, id) }.take(5)
    assert(askTop(5L).toSeq == want,
      "post-maintenance served scores drifted from the Okapi recompute")
  }

  test("auto-maintenance covers the lexical index: the files signal trips " +
    "a background postings compaction") {
    import org.apache.spark.sql.functions.{col, lit, concat}
    val lstore = new StreamStore(spark,
      graft.TempDirs.create("graft-lexmaintstore").toString)
    val lsrv = new LeafServer(lstore, 0, authToken = Some("testtoken"),
      vectorMaintMs = 300L, vectorCompactFilesThreshold = 12L)
    lsrv.start()
    try {
      def lpost(path: String, body: Map[String, Any]): Map[String, Any] = {
        val b = HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${lsrv.boundPort}$path"))
          .POST(HttpRequest.BodyPublishers.ofString(Json.render(body)))
          .header("Authorization", "Bearer testtoken")
        Json.parse(client.send(b.build(),
          HttpResponse.BodyHandlers.ofString()).body())
          .asInstanceOf[Map[String, Any]]
      }
      def lok(r: Map[String, Any]): Map[String, Any] = {
        assert(!r.contains("err"), r.toString)
        r("ok").asInstanceOf[Map[String, Any]]
      }
      val src = "/root/testdata/sf0.001"
      val idx = graft.TempDirs.create("graft-lexmaint").toString
      lok(lpost("/admin/lexical_index_build", Map("src" -> src, "dir" -> idx)))
      val p0 = lsrv.maintPassesCompleted
      while (lsrv.maintPassesCompleted < p0 + 2) Thread.sleep(100)
      def compactions(): Long =
        lok(lpost("/admin/vector_index_maint", Map("dir" -> idx)))
          .get("compactions").map(_.asInstanceOf[Long]).getOrElse(0L)
      val c0 = compactions()
      val incDir = graft.TempDirs.create("graft-lexmaint-inc").toString
      var wave = 1
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      val base = spark.read.parquet(s"$src/documents.parquet")
        .select(col("doc_id"), col("text")).limit(20)
      while (compactions() == c0 && System.nanoTime() < deadline) {
        base.select((col("doc_id") + lit(wave * 1000000L)).as("doc_id"),
            concat(col("text"), lit(s" wave$wave")).as("text"))
          .coalesce(1).write.mode("overwrite").parquet(incDir)
        lok(lpost("/admin/lexical_index_append",
          Map("src" -> incDir, "dir" -> idx)))
        wave += 1
        Thread.sleep(150)
      }
      assert(compactions() > c0,
        s"no lexical auto-compaction after ${wave - 1} appends")
      // quiesce and the bound holds (a few post-compaction appends may
      // have landed, each adds ~2 files)
      val q0 = lsrv.maintPassesCompleted
      while (lsrv.maintPassesCompleted < q0 + 2) Thread.sleep(100)
      val info = lok(lpost("/admin/lexical_index_info", Map("dir" -> idx)))
      assert(info("files").asInstanceOf[Long] <= 12L + 4,
        s"auto-compaction did not bound the postings files: $info")
      assert(info("docs").asInstanceOf[Long] ==
        spark.read.parquet(s"$src/documents.parquet").count() +
          (wave - 1).toLong * 20,
        s"content drifted across auto-compaction: $info")
    } finally lsrv.stop()
  }

  test("auto-maintenance covers the mixture stats: the files signal trips " +
    "a background fold, weights preserved") {
    import org.apache.spark.sql.functions.{col, lit, concat}
    val mstore = new StreamStore(spark,
      graft.TempDirs.create("graft-mixmaintstore").toString)
    val msrv = new LeafServer(mstore, 0, authToken = Some("testtoken"),
      vectorMaintMs = 300L, vectorCompactFilesThreshold = 8L)
    msrv.start()
    try {
      def mpost(path: String, body: Map[String, Any]): Map[String, Any] = {
        val b = HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${msrv.boundPort}$path"))
          .POST(HttpRequest.BodyPublishers.ofString(Json.render(body)))
          .header("Authorization", "Bearer testtoken")
        Json.parse(client.send(b.build(),
          HttpResponse.BodyHandlers.ofString()).body())
          .asInstanceOf[Map[String, Any]]
      }
      def mok(r: Map[String, Any]): Map[String, Any] = {
        assert(!r.contains("err"), r.toString)
        r("ok").asInstanceOf[Map[String, Any]]
      }
      val src = "/root/testdata/sf0.001"
      val idx = graft.TempDirs.create("graft-mixmaint").toString
      mok(mpost("/admin/mixture_stats_build", Map("src" -> src, "dir" -> idx)))
      def weights(): Vector[Any] =
        mok(mpost("/admin/mixture_weights", Map("dir" -> idx)))("weights")
          .asInstanceOf[Vector[Any]]
      val w0 = weights()
      def compactions(): Long =
        mok(mpost("/admin/vector_index_maint", Map("dir" -> idx)))
          .get("compactions").map(_.asInstanceOf[Long]).getOrElse(0L)
      val c0 = compactions()
      val incDir = graft.TempDirs.create("graft-mixmaint-inc").toString
      val base = spark.read.parquet(s"$src/documents.parquet")
        .select(col("source"), col("text")).limit(20)
      var wave = 1
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (compactions() == c0 && System.nanoTime() < deadline) {
        base.select(col("source"),
            concat(col("text"), lit(s" mixwave$wave")).as("text"))
          .coalesce(1).write.mode("overwrite").parquet(incDir)
        mok(mpost("/admin/mixture_stats_append",
          Map("src" -> incDir, "dir" -> idx)))
        wave += 1
        Thread.sleep(150)
      }
      assert(compactions() > c0,
        s"no mixture auto-compaction after ${wave - 1} appends")
      val q0 = msrv.maintPassesCompleted
      while (msrv.maintPassesCompleted < q0 + 2) Thread.sleep(100)
      val info = mok(mpost("/admin/mixture_stats_info", Map("dir" -> idx)))
      assert(info("files").asInstanceOf[Long] <= 8L + 4,
        s"auto-fold did not bound the count files: $info")
      assert(info("docs").asInstanceOf[Long] ==
        spark.read.parquet(s"$src/documents.parquet").count() +
          (wave - 1).toLong * 20, info.toString)
      // the fold is purely physical: the weights moved with the appended
      // waves' tokens but the POST-quiesce served table equals a local
      // recompute over the folded artifact — and one more no-op tick
      // leaves it fixed
      val wEnd = weights()
      assert(wEnd != w0, "appended waves moved no weight")
      assert(weights() == wEnd, "served weights unstable after quiesce")
    } finally msrv.stop()
  }

  test("auto-maintenance: sustained ingest trips the small-files policy, a " +
    "background compaction fires, queries stay correct throughout") {
    // the operator-less path: the lifecycle tick watches every managed
    // index's `files` signal and compacts past the threshold (retrain is
    // only ever FLAGGED — it changes cell geometry). Sustained appends
    // under live query load must trigger at least one automatic
    // compaction, bound the file count, and never fail or skew a poll.
    import org.apache.spark.sql.functions._
    val mstore = new StreamStore(spark,
      graft.TempDirs.create("graft-maintstore").toString)
    val msrv = new LeafServer(mstore, 0, authToken = Some("testtoken"),
      vectorMaintMs = 300L, vectorCompactFilesThreshold = 12L)
    msrv.start()
    try {
      def mpost(path: String, body: Map[String, Any]): Map[String, Any] = {
        val b = HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${msrv.boundPort}$path"))
          .POST(HttpRequest.BodyPublishers.ofString(Json.render(body)))
          .header("Authorization", "Bearer testtoken")
        Json.parse(client.send(b.build(),
          HttpResponse.BodyHandlers.ofString()).body())
          .asInstanceOf[Map[String, Any]]
      }
      def mok(r: Map[String, Any]): Map[String, Any] = {
        assert(!r.contains("err"), r.toString)
        r("ok").asInstanceOf[Map[String, Any]]
      }
      val src = "/root/testdata/sf0.001"
      val idx = graft.TempDirs.create("graft-automaint").toString
      mok(mpost("/admin/vector_index_build", Map("src" -> src, "dir" -> idx)))
      val twoStageSql = graft.queries.Similarity.twoStageKnnSql(
        a => s"am_$a", "$qvec", "CAST($limit AS INT)")
      val cid = mok(mpost("/module/upload", Map("module" -> Map(
        "queries" -> Map("knn" -> Map(
          "sql" -> twoStageSql,
          "params" -> Vector(Map("name" -> "qvec", "kind" -> "text"))))))))(
        "cid").asInstanceOf[String]
      val sid = mok(mpost("/stream/create",
        Map("id" -> "did:fanout:automaint", "module_cid" -> cid)))("id").toString
      mok(mpost("/admin/vector_index_attach",
        Map("id" -> sid, "prefix" -> "am", "dir" -> idx)))
      val emb = spark.read.parquet(s"$src/embeddings.parquet")
      val qv = emb.filter(col("vec_id") === 7)
        .select(transform(col("embedding"),
          x => floor(x.cast("double") * 64 + lit(0.5)).cast("long")).as("v"))
        .head.getSeq[Long](0)

      val failure = new java.util.concurrent.atomic.AtomicReference[String](null)
      val running = new java.util.concurrent.atomic.AtomicBoolean(true)
      val poller = new Thread(() => {
        while (running.get() && failure.get() == null) {
          try {
            val rows = mok(mpost("/stream/query", Map("id" -> sid,
              "query" -> Map("name" -> "knn", "limit" -> 3L,
                "params" -> Map("qvec" -> qv.mkString(","))))))("rows")
              .asInstanceOf[Vector[Any]]
            val head = rows.head.asInstanceOf[Map[String, Any]]
            def l(f: String) = head(f).asInstanceOf[Map[String, Any]](
              "value").asInstanceOf[Long]
            if (rows.size != 3 || l("vec_id") != 7L || l("exact_dist") != 0L)
              failure.set(s"torn/wrong poll during auto-maintenance: $rows")
          } catch {
            case e: Exception => failure.set(s"poll threw: $e")
          }
        }
      })
      var wave = 1
      poller.setDaemon(true)
      poller.start()
      try {
        // let the policy settle the freshly built index first (a build's
        // unrepartitioned partitionBy write IS the small-files problem),
        // then require an INGEST-driven compaction on top of that
        val p0 = msrv.maintPassesCompleted
        while (msrv.maintPassesCompleted < p0 + 2) Thread.sleep(100)
        def compactions(): Long =
          mok(mpost("/admin/vector_index_maint", Map("dir" -> idx)))
            .get("compactions").map(_.asInstanceOf[Long]).getOrElse(0L)
        val c0 = compactions()
        // sustained ingest: each wave appends ≥1 file per touched cell,
        // marching `files` past the threshold within a few waves
        val incDir = graft.TempDirs.create("graft-automaint-inc").toString
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        while (compactions() == c0 && System.nanoTime() < deadline &&
            failure.get() == null) {
          emb.filter(col("vec_id") < 20)
            .withColumn("vec_id", col("vec_id") + lit(wave * 1000000L))
            .coalesce(1).write.mode("overwrite").parquet(incDir)
          mok(mpost("/admin/vector_index_append",
            Map("src" -> incDir, "dir" -> idx)))
          wave += 1
          Thread.sleep(150)
        }
        assert(failure.get() == null, String.valueOf(failure.get()))
        assert(compactions() > c0,
          s"no ingest-driven automatic compaction after ${wave - 1} waves")
      } finally {
        running.set(false)
        poller.join(30000)
      }
      assert(failure.get() == null, String.valueOf(failure.get()))
      // quiesce one full maintenance pass, then the bound must hold:
      // a freshly compacted index sits at ~1 file/cell/artifact (appends
      // since the last tick can add a few)
      val p0 = msrv.maintPassesCompleted
      while (msrv.maintPassesCompleted < p0 + 2) Thread.sleep(100)
      val info = mok(mpost("/admin/vector_index_info", Map("dir" -> idx)))
      val cells = info("cells").asInstanceOf[Long]
      assert(info("files").asInstanceOf[Long] <= 2 * cells + 4,
        s"auto-compaction did not bound the file count: $info")
      // content intact: every appended wave fully present
      val n = info("vectors").asInstanceOf[Long]
      assert(n == emb.count() + (1 until wave).length * 20,
        s"auto-compaction lost rows: $info after ${wave - 1} waves")
    } finally {
      msrv.stop()
    }
  }

  test("tombstone pressure trips the auto-purge: a delete past the share " +
    "threshold is reclaimed by the next tick, vector and lexical alike") {
    // logical deletes must not accumulate unreclaimed: the maintenance
    // tick treats tombstone share like file decay. Files threshold set
    // unreachably high so the ONLY trigger under test is the share.
    import org.apache.spark.sql.functions.col
    val tstore = new StreamStore(spark,
      graft.TempDirs.create("graft-tombstore").toString)
    val tsrv = new LeafServer(tstore, 0, authToken = Some("testtoken"),
      vectorMaintMs = 300L, vectorCompactFilesThreshold = 100000L,
      tombstonePurgeSharePct = 20L)
    tsrv.start()
    try {
      def tpost(path: String, body: Map[String, Any]): Map[String, Any] = {
        val b = HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${tsrv.boundPort}$path"))
          .POST(HttpRequest.BodyPublishers.ofString(Json.render(body)))
          .header("Authorization", "Bearer testtoken")
        Json.parse(client.send(b.build(),
          HttpResponse.BodyHandlers.ofString()).body())
          .asInstanceOf[Map[String, Any]]
      }
      def tok(r: Map[String, Any]): Map[String, Any] = {
        assert(!r.contains("err"), r.toString)
        r("ok").asInstanceOf[Map[String, Any]]
      }
      val src = "/root/testdata/sf0.001"
      val vidx = graft.TempDirs.create("graft-tombvec").toString
      val lidx = graft.TempDirs.create("graft-tomblex").toString
      tok(tpost("/admin/vector_index_build", Map("src" -> src, "dir" -> vidx)))
      tok(tpost("/admin/lexical_index_build", Map("src" -> src, "dir" -> lidx)))
      // settle: the fresh builds must NOT trip anything (share 0)
      val p0 = tsrv.maintPassesCompleted
      while (tsrv.maintPassesCompleted < p0 + 2) Thread.sleep(100)
      def maint(fam: String, d: String): Map[String, Any] =
        tok(tpost("/admin/vector_index_maint",
          Map("dir" -> d, "family" -> fam)))
      assert(maint("vector", vidx)("compactions") == 0L,
        maint("vector", vidx).toString)
      assert(maint("lexical", lidx)("compactions") == 0L)
      // delete ~1/3 of each — far past the 20% share threshold
      val vTotal = spark.read.parquet(s"$src/embeddings.parquet").count()
      val nDocs = spark.read.parquet(s"$src/documents.parquet").count()
      val vIds = spark.read.parquet(s"$src/embeddings.parquet")
        .select("vec_id").filter(col("vec_id") % 3 === 0)
        .collect().map(_.getLong(0)).toVector
      tok(tpost("/admin/vector_index_delete",
        Map("dir" -> vidx, "ids" -> vIds)))
      val lIds = spark.read.parquet(s"$src/documents.parquet")
        .select("doc_id").filter(col("doc_id") % 3 === 0)
        .collect().map(_.getLong(0)).toVector
      tok(tpost("/admin/lexical_index_delete",
        Map("dir" -> lidx, "ids" -> lIds)))
      // the next tick must purge BOTH
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      def purged(): Boolean =
        maint("vector", vidx)("compactions").asInstanceOf[Long] >= 1L &&
          maint("lexical", lidx)("compactions").asInstanceOf[Long] >= 1L
      while (!purged() && System.nanoTime() < deadline) Thread.sleep(100)
      assert(purged(), s"tombstone pressure never tripped the purge: " +
        s"${maint("vector", vidx)} / ${maint("lexical", lidx)}")
      val vInfo = tok(tpost("/admin/vector_index_info", Map("dir" -> vidx)))
      assert(vInfo("tombstones") == 0L &&
        vInfo("vectors").asInstanceOf[Long] == vTotal - vIds.size,
        vInfo.toString)
      val lInfo = tok(tpost("/admin/lexical_index_info", Map("dir" -> lidx)))
      assert(lInfo("tombstones") == 0L &&
        lInfo("docs").asInstanceOf[Long] == nDocs - lIds.size,
        lInfo.toString)
      // steady state: a drained set must not re-trigger
      val c1 = maint("vector", vidx)("compactions").asInstanceOf[Long]
      val p1 = tsrv.maintPassesCompleted
      while (tsrv.maintPassesCompleted < p1 + 2) Thread.sleep(100)
      assert(maint("vector", vidx)("compactions") == c1,
        "a drained tombstone set re-triggered the purge")
    } finally tsrv.stop()
  }

  test("opt-in dedup auto-reband: sustained appends across the derivation " +
    "knee trigger a background re-band, increment reads never fail") {
    import org.apache.spark.sql.functions.{col, concat, concat_ws, lit, md5}
    val rstore = new StreamStore(spark,
      graft.TempDirs.create("graft-rebandstore").toString)
    val rsrv = new LeafServer(rstore, 0, authToken = Some("testtoken"),
      vectorMaintMs = 300L, dedupRebandOnStale = true)
    rsrv.start()
    try {
      def rpost(path: String, body: Map[String, Any]): Map[String, Any] = {
        val b = HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${rsrv.boundPort}$path"))
          .POST(HttpRequest.BodyPublishers.ofString(Json.render(body)))
          .header("Authorization", "Bearer testtoken")
        Json.parse(client.send(b.build(),
          HttpResponse.BodyHandlers.ofString()).body())
          .asInstanceOf[Map[String, Any]]
      }
      def rok(r: Map[String, Any]): Map[String, Any] = {
        assert(!r.contains("err"), r.toString)
        r("ok").asInstanceOf[Map[String, Any]]
      }
      def docs(n: Int, base: Long): org.apache.spark.sql.DataFrame =
        spark.range(n).select((col("id") + base).as("doc_id"),
          concat_ws(" ", (0 until 12).map(i =>
            md5(concat(col("id") + base, lit(i)))): _*).as("text"))
      val idx = graft.TempDirs.create("graft-rebandidx").toString
      // below the 4096-doc knee: build pins r=3
      graft.queries.Dedup.buildDedupIndex(spark, docs(3800, 0L), idx)
      assert(graft.queries.Dedup.readIndexMeta(spark, idx).r == 3)
      // enrollment is a side effect of the MUTATING dedup RPC — an
      // up-to-date index rebands as a no-op and joins the work list
      val enroll = rok(rpost("/admin/dedup_index_reband", Map("dir" -> idx)))
      assert(enroll("r") == 3L)
      // live increment reads throughout: the poller runs the full
      // exact+LSH+verify increment against the index while appends and
      // the background re-band mutate it — every read must succeed (the
      // committed-batch snapshot discipline)
      val failure = new java.util.concurrent.atomic.AtomicReference[String](null)
      val polls = new java.util.concurrent.atomic.AtomicLong(0)
      val running = new java.util.concurrent.atomic.AtomicBoolean(true)
      // clones of three BUILD docs + fresh ones: verdicts stay stable
      val probe = docs(3, 0L)
        .select((col("doc_id") + 9000000L).as("doc_id"), col("text"))
        .unionAll(docs(3, 7777000L))
      val poller = new Thread(() => {
        while (running.get() && failure.get() == null) {
          try {
            val v = graft.queries.Dedup.incrementVsIndex(spark, probe, idx)
              .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
            if ((9000000L to 9000002L).exists(v(_) != "exact") ||
                (7777000L to 7777002L).exists(v(_) != "new"))
              failure.set(s"verdicts drifted mid-maintenance: $v")
            polls.incrementAndGet()
          } catch { case e: Throwable =>
            failure.set(s"increment read failed: $e") }
        }
      })
      poller.setDaemon(true)
      poller.start()
      try {
        // appends march the count across the knee (3800 → 4400); the
        // opt-in tick must then re-band to r=4 on its own
        var base = 100000L
        var appended = 0
        while (appended < 600 && failure.get() == null) {
          graft.queries.Dedup.appendDedupIndex(spark, docs(150, base), idx)
          base += 1000000L
          appended += 150
        }
        def maintRebands(): Long =
          rok(rpost("/admin/vector_index_maint",
            Map("dir" -> idx, "family" -> "dedup")))
            .get("rebands").map(_.asInstanceOf[Long]).getOrElse(0L)
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        while (maintRebands() < 1 && System.nanoTime() < deadline &&
          failure.get() == null) Thread.sleep(150)
        assert(maintRebands() >= 1,
          "the opt-in auto-reband never fired after the knee")
        val m = graft.queries.Dedup.readIndexMeta(spark, idx)
        assert(m.r == 4 && !m.stale,
          s"re-band did not land the derived r: $m")
        // the re-banded index answers correctly: one more full increment
        val v = graft.queries.Dedup.incrementVsIndex(spark, probe, idx)
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        assert((9000000L to 9000002L).forall(v(_) == "exact") &&
          (7777000L to 7777002L).forall(v(_) == "new"), v.toString)
      } finally {
        running.set(false); poller.join(30000L)
      }
      assert(failure.get() == null, String.valueOf(failure.get()))
      assert(polls.get() >= 3, s"soak too short to mean anything: ${polls.get()} polls")
      println(s"[rebandsoak] polls=${polls.get()} across appends + auto-reband — zero failed reads")
    } finally rsrv.stop()
  }
}
