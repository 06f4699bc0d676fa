package graft

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.drisl.DValue._
import graft.drisl.Drisl
import graft.stream._
import graft.types._

/** Lifecycle spec for the stream engine: append/authorize/materialize/
  * replay/state/query/subscription semantics from SURVEY.md §2.A/§3 and
  * Appendix A. */
class StreamSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private lazy val store = new StreamStore(spark,
    graft.TempDirs.create("graft-streams").toString)

  private def payload(kind: String, content: String, n: Long = 0): Array[Byte] =
    Drisl.encode(obj("kind" -> text(kind), "content" -> text(content), "n" -> int(n)))

  private val chatModule = ModuleDef(
    initSql = """CREATE TABLE IF NOT EXISTS messages
                 |(idx BIGINT, author STRING, content STRING, n BIGINT) USING PARQUET""".stripMargin,
    authorizer = """SELECT CASE WHEN drisl_extract(payload, '.kind') = 'banned'
                    |THEN unauthorized(user) ELSE 1 END AS ok FROM event""".stripMargin,
    materializer = """INSERT INTO messages
                      |SELECT idx, user, drisl_extract(payload, '.content'),
                      |       drisl_extract_long(payload, '.n') FROM event""".stripMargin,
    stateInitSql = "CREATE TABLE IF NOT EXISTS state_presence (user STRING, status STRING) USING PARQUET",
    stateMaterializer = """INSERT INTO state_presence
                           |SELECT user, drisl_extract(payload, '.content') FROM event""".stripMargin,
    queries = Map(
      "list" -> QueryDef(
        """SELECT idx, author, content, n FROM messages
          |WHERE idx BETWEEN $start AND $start + $limit - 1
          |ORDER BY idx""".stripMargin),
      "by_author" -> QueryDef(
        "SELECT content FROM messages WHERE author = $who ORDER BY idx",
        Seq(ParamDef("who", ParamKind.PText))),
      "whoami" -> QueryDef("SELECT $requesting_user AS me"),
      "top_author" -> QueryDef(
        """CREATE OR REPLACE TEMPORARY VIEW q_tmp AS
          |  SELECT author, count(*) AS n FROM messages GROUP BY author;
          |SELECT author, n FROM q_tmp ORDER BY n DESC, author LIMIT 1""".stripMargin)))

  test("e2e: create stream, install module, append, query (§7.2 slice)") {
    val h = store.open("did:test:alpha")
    h.setModule(chatModule)
    val r = h.addEvents(Seq(
      IncomingEvent("alice", payload("msg", "hello", 1)),
      IncomingEvent("bob", payload("msg", "world", 2)),
      IncomingEvent("alice", payload("msg", "!", 3))))
    assert(r == Right(3L))
    val rows = h.queryTagged(None, LeafQuery("list"))
    assert(rows.map(_("content")) ==
      Vector(SqlValue.SqlText("hello"), SqlValue.SqlText("world"), SqlValue.SqlText("!")))
    assert(rows.map(_("idx")) == Vector(SqlValue.SqlInteger(1), SqlValue.SqlInteger(2), SqlValue.SqlInteger(3)))
    // multi-statement query: earlier statements stage temp views, the last
    // statement's rows are the result (A7 semantics)
    val top = h.queryTagged(None, LeafQuery("top_author"))
    assert(top == Vector(Map(
      "author" -> SqlValue.SqlText("alice"), "n" -> SqlValue.SqlInteger(2))))
  }

  test("authorizer rejection vetoes the whole batch atomically (lib.rs:696-705)") {
    val h = store.open("did:test:atomic")
    h.setModule(chatModule)
    assert(h.addEvents(Seq(IncomingEvent("a", payload("msg", "ok")))) == Right(1L))
    val r = h.addEvents(Seq(
      IncomingEvent("a", payload("msg", "fine")),
      IncomingEvent("evil", payload("banned", "nope"))))
    assert(r.isLeft, "batch with banned event must be rejected")
    assert(h.latest == 1L, "rejected batch must not advance the log")
    val rows = h.queryTagged(None, LeafQuery("list"))
    assert(rows.size == 1, "no partial materialization from the rejected batch")
  }

  test("query params: validation + binding (A16, types lib.rs:268-320)") {
    val h = store.open("did:test:params")
    h.setModule(chatModule)
    h.addEvents(Seq(
      IncomingEvent("alice", payload("msg", "one")),
      IncomingEvent("bob", payload("msg", "two"))))
    val rows = h.queryTagged(None,
      LeafQuery("by_author", Map("who" -> SqlValue.SqlText("bob"))))
    assert(rows.map(_("content")) == Vector(SqlValue.SqlText("two")))
    // unknown param rejected
    assertThrows[IllegalArgumentException](
      h.query(None, LeafQuery("by_author", Map("nope" -> SqlValue.SqlText("x")))))
    // missing required param rejected
    assertThrows[IllegalArgumentException](h.query(None, LeafQuery("by_author")))
    // wrong kind rejected
    assertThrows[IllegalArgumentException](
      h.query(None, LeafQuery("by_author", Map("who" -> SqlValue.SqlInteger(3)))))
    // unknown query name
    assertThrows[IllegalArgumentException](h.query(None, LeafQuery("nah")))
  }

  test("$requesting_user binds; NULL when anonymous (basic.rs:200-213)") {
    val h = store.open("did:test:user")
    h.setModule(chatModule)
    assert(h.queryTagged(Some("carol"), LeafQuery("whoami")).head("me") ==
      SqlValue.SqlText("carol"))
    assert(h.queryTagged(None, LeafQuery("whoami")).head("me") == SqlValue.SqlNull)
  }

  test("$start/$limit window the query (defaults 1/1000)") {
    val h = store.open("did:test:window")
    h.setModule(chatModule)
    h.addEvents((1 to 10).map(i => IncomingEvent("u", payload("msg", s"m$i", i))))
    val page = h.queryTagged(None, LeafQuery("list", start = Some(4), limit = 3))
    assert(page.map(_("idx")) ==
      Vector(SqlValue.SqlInteger(4), SqlValue.SqlInteger(5), SqlValue.SqlInteger(6)))
    assert(h.queryTagged(None, LeafQuery("list")).size == 10)
  }

  test("module swap resets cursor and replays the whole log (A13+A6)") {
    val h = store.open("did:test:swap")
    h.setModule(chatModule)
    h.addEvents(Seq(
      IncomingEvent("a", payload("msg", "x", 10)),
      IncomingEvent("b", payload("msg", "y", 20))))
    val counting = chatModule.copy(
      initSql = "CREATE TABLE IF NOT EXISTS totals (author STRING, total BIGINT) USING PARQUET",
      materializer = """INSERT INTO totals
                        |SELECT user, drisl_extract_long(payload, '.n') FROM event""".stripMargin,
      queries = Map("sum" -> QueryDef(
        "SELECT CAST(sum(total) AS BIGINT) AS s FROM totals")))
    assert(counting.cid != chatModule.cid)
    h.setModule(counting)
    assert(h.moduleCursor == 2L, "replay must catch the cursor up")
    assert(h.queryTagged(None, LeafQuery("sum")).head("s") == SqlValue.SqlInteger(30))
  }

  test("state events bypass the log and land in state_* (A5); clearState (A12)") {
    val h = store.open("did:test:state")
    h.setModule(chatModule)
    h.addEvents(Seq(IncomingEvent("a", payload("msg", "hi"))))
    assert(h.addStateEvents(Seq(
      IncomingEvent("a", payload("presence", "online")),
      IncomingEvent("b", payload("presence", "away")))).isRight)
    assert(h.latest == 1L, "state events must not be appended to the log")
    val st = spark.sql(s"SELECT status FROM ${h.dbName}.state_presence ORDER BY status")
      .collect().map(_.getString(0)).toSeq
    assert(st == Seq("away", "online"))
    h.clearState()
    assert(spark.sql(s"SELECT count(*) FROM ${h.dbName}.state_presence").head().getLong(0) == 0L)
  }

  test("raw range scan prunes by idx (A10) and raw import validates contiguity (A11)") {
    val h = store.open("did:test:raw")
    h.setModule(chatModule)
    h.addEvents((1 to 5).map(i => IncomingEvent("u", payload("msg", s"m$i"))))
    assert(h.rawGetEvents(2, 4).collect().map(_.getLong(0)).toSeq == Seq(2L, 3L, 4L))
    import spark.implicits._
    val bad = Seq((99L, "u", payload("msg", "gap"), Array.empty[Byte]))
      .toDF("idx", "user", "payload", "signature")
    assertThrows[IllegalArgumentException](h.bulkImport(bad))
    val good = Seq((6L, "u", payload("msg", "m6"), Array.empty[Byte]))
      .toDF("idx", "user", "payload", "signature")
    assert(h.bulkImport(good) == 6L)
    assert(h.queryTagged(None, LeafQuery("list")).size == 6)
  }

  test("log compaction rewrites per-batch files without changing the data") {
    val h = store.open("did:test:compact")
    h.setModule(chatModule)
    (1 to 4).foreach(b => h.addEvents(
      Seq(IncomingEvent("u", payload("msg", s"b$b", b.toLong)))))
    def parquetFiles = {
      val s = java.nio.file.Files.list(h.logDirectory)
      try s.iterator().asScala.count(_.toString.endsWith(".parquet"))
      finally s.close()
    }
    assert(parquetFiles >= 4, "each batch appends at least one file")
    val before = h.queryTagged(None, LeafQuery("list"))
    assert(h.compactLog() == 1)
    assert(parquetFiles == 1)
    assert(h.queryTagged(None, LeafQuery("list")) == before,
      "compaction must be a pure rewrite")
    assert(h.rawGetEvents(2, 3).collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
    // the stream keeps appending normally after compaction
    assert(h.addEvents(Seq(IncomingEvent("u", payload("msg", "b5", 5)))) == Right(5L))
    assert(h.queryTagged(None, LeafQuery("list")).size == 5)
  }

  test("LRU eviction closes idle handles and reopen recovers from disk") {
    val evStore = new StreamStore(spark,
      graft.TempDirs.create("graft-evict").toString,
      maxOpenHandles = 2)
    val h1 = evStore.open("did:test:ev1")
    h1.setModule(chatModule)
    h1.addEvents(Seq(IncomingEvent("a", payload("msg", "one", 1))))
    val h2 = evStore.open("did:test:ev2")
    h2.setModule(chatModule)
    // opening a third stream overflows the cap and evicts the LRU (ev1)
    evStore.open("did:test:ev3").setModule(chatModule)
    assert(evStore.openHandleCount == 2)
    assert(h1.isClosed, "the least-recently-used handle must be closed")
    assert(!h2.isClosed && !evStore.open("did:test:ev3").isClosed)
    // a stale reference is unusable — no silent write through a zombie
    assertThrows[IllegalStateException](
      h1.addEvents(Seq(IncomingEvent("a", payload("msg", "late", 9)))))
    // reopening recovers everything from disk meta (and evicts another LRU)
    val h1b = evStore.open("did:test:ev1")
    assert(!(h1b eq h1) && h1b.latest == 1L)
    assert(h1b.queryTagged(None, LeafQuery("list")).map(_("content")) ==
      Vector(SqlValue.SqlText("one")))
    assert(h1b.addEvents(Seq(IncomingEvent("b", payload("msg", "two", 2)))) == Right(2L))
    assert(evStore.openHandleCount == 2)
  }

  test("concurrent opens beyond the LRU cap: every stream's data lands intact") {
    // 12 streams hammered from 12 threads against a 4-handle cap: evictions
    // race live appends, and the store-level per-stream locks + stale-handle
    // errors must keep every write exactly-once (a zombie handle throws
    // instead of silently writing)
    val lruStore = new StreamStore(spark,
      graft.TempDirs.create("graft-lruhammer").toString,
      maxOpenHandles = 4)
    val n = 12
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to n).map { i =>
      new Thread(() => {
        try {
          var done = false
          while (!done) {
            // the handle may be evicted between open and use; reopen+retry
            // is the documented client contract for stale references
            try {
              val h = lruStore.open(s"did:test:lru$i")
              // setModule before any append is idempotent (replays an
              // empty log), so the retry path can just run it again
              h.setModule(chatModule)
              h.addEvents(Seq(IncomingEvent("u", payload("msg", s"m$i", i))))
              done = true
            } catch { case _: IllegalStateException => /* evicted; retry */ }
          }
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errs.isEmpty, s"worker failures: ${errs.toArray.mkString("; ")}")
    assert(lruStore.openHandleCount <= 4)
    (1 to n).foreach { i =>
      val rows = lruStore.open(s"did:test:lru$i").queryTagged(None, LeafQuery("list"))
      assert(rows.map(_("content")) == Vector(SqlValue.SqlText(s"m$i")),
        s"stream $i: $rows")
    }
  }

  test("compaction is snapshot-safe: concurrent readers never see a dip") {
    val h = store.open("did:test:snapsafe")
    h.setModule(chatModule)
    (1 to 6).foreach(b => h.addEvents(
      Seq(IncomingEvent("u", payload("msg", s"c$b", b.toLong)))))
    @volatile var stop = false
    @volatile var worst = Long.MaxValue
    val counts = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    // reader on the STORE session (a different session than the handle's):
    // the round-2 design had a window where old files were moved out before
    // new ones moved in, so a concurrent count could transiently dip
    val readErrors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val reader = new Thread(() => {
      while (!stop) {
        try {
          val c = store.spark.table(s"${h.dbName}.events").count()
          counts.add(c)
          if (c < worst) worst = c
        } catch { case t: Throwable => readErrors.add(t); stop = true }
      }
    })
    reader.start()
    try {
      var expected = 6L
      (1 to 3).foreach { round =>
        assert(h.compactLog() >= 1)
        h.addEvents(Seq(IncomingEvent("u", payload("msg", s"r$round", 100L + round))))
        expected += 1
      }
      stop = true
      reader.join(10000)
      assert(counts.size() > 0, "reader must have sampled during compaction")
      assert(readErrors.isEmpty, s"concurrent reader failed: ${readErrors.peek()}")
      assert(worst >= 6L,
        s"a concurrent reader observed a transient row-count dip to $worst")
      assert(h.queryTagged(None, LeafQuery("list")).size == expected)
    } finally { stop = true; reader.join(10000) }
  }

  test("subscription: backfill, has_more, only-new-events default (A8)") {
    val h = store.open("did:test:subs")
    h.setModule(chatModule)
    h.addEvents((1 to 7).map(i => IncomingEvent("u", payload("msg", s"m$i", i))))
    val engine = new SubscriptionEngine(h)

    // explicit start=1, window limit=3 → backfill in pages with has_more
    var deliveries = Vector.empty[engine.Delivery]
    engine.subscribe(None, LeafQuery("list", start = Some(1), limit = 3))(d => deliveries :+= d)
    engine.drain()
    assert(deliveries.map(_.rows.size) == Vector(3, 3, 1))
    assert(deliveries.map(_.hasMore) == Vector(true, true, false))
    assert(deliveries.flatMap(_.rows).map(_("idx")).map {
      case SqlValue.SqlInteger(i) => i; case _ => -1L
    } == (1L to 7L).toVector, "backfill must deliver every event exactly once")

    // no start → subscription only sees NEW events (lib.rs:358-362)
    var fresh = Vector.empty[engine.Delivery]
    engine.subscribe(None, LeafQuery("list", limit = 100))(d => fresh :+= d)
    assert(engine.drain() == 0, "nothing to deliver before new events")
    h.addEvents(Seq(IncomingEvent("u", payload("msg", "m8", 8))))
    engine.notifyNewEvents()
    engine.drain()
    assert(fresh.size == 1 && fresh.head.rows.map(_("idx")) == Vector(SqlValue.SqlInteger(8)))
  }

  test("parallel appends on independent streams land completely") {
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val hs = (1 to 3).map { i =>
      val h = store.open(s"did:test:par$i"); h.setModule(chatModule); h
    }
    // 3 streams x 4 batches x 2 events, all appending concurrently
    val futs = for (h <- hs; b <- 1 to 4) yield Future {
      h.addEvents(Seq(
        IncomingEvent("u", payload("msg", s"b$b-1", b)),
        IncomingEvent("u", payload("msg", s"b$b-2", b))))
    }
    val results = Await.result(Future.sequence(futs), 180.seconds)
    assert(results.forall(_.isRight), results.filter(_.isLeft).toString)
    hs.foreach { h =>
      assert(h.latest == 8L, s"${h.id}: ${h.latest}")
      assert(h.queryTagged(None, LeafQuery("list")).size == 8)
    }
  }

  test("two streams execute queries concurrently (per-stream sessions, no global lock)") {
    val h1 = store.open("did:test:conc1"); h1.setModule(chatModule)
    val h2 = store.open("did:test:conc2"); h2.setModule(chatModule)
    h1.addEvents(Seq(IncomingEvent("a", payload("msg", "one", 1))))
    h2.addEvents(Seq(
      IncomingEvent("b", payload("msg", "two", 2)),
      IncomingEvent("b", payload("msg", "three", 3))))
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    // interleave queries on both streams from many threads; each stream's
    // current database and temp views are session-private, so results must
    // never bleed across streams
    val futs = (0 until 12).map { i =>
      Future {
        val (h, expected) = if (i % 2 == 0) (h1, 1) else (h2, 2)
        h.queryTagged(None, LeafQuery("list")).size == expected
      }
    }
    assert(Await.result(Future.sequence(futs), 120.seconds).forall(identity))
  }

  test("dialect rewrites reach module SQL through the full lifecycle") {
    val h = store.open("did:test:dialect")
    h.setModule(ModuleDef(
      initSql = "CREATE TABLE IF NOT EXISTS docs (idx BIGINT, j STRING) USING PARQUET",
      materializer =
        "INSERT INTO docs SELECT idx, drisl_extract(payload, '.content') FROM event",
      queries = Map(
        "fields" -> QueryDef(
          """SELECT idx, j ->> 'name' AS name, json_extract(j, '$.n') AS n,
            |       iif(j ->> 'name' = 'ada', 1, 0) AS is_ada
            |FROM docs ORDER BY idx""".stripMargin),
        "totals" -> QueryDef(
          "SELECT total(CAST(json_extract(j, '$.n') AS BIGINT)) AS t FROM docs"))))
    def jdoc(name: String, n: Long) =
      Drisl.encode(obj("kind" -> text("j"),
        "content" -> text(s"""{"name": "$name", "n": $n}""")))
    h.addEvents(Seq(
      IncomingEvent("u", jdoc("ada", 2)), IncomingEvent("u", jdoc("bob", 3))))
    val rows = h.queryTagged(None, LeafQuery("fields"))
    assert(rows.map(r => (r("name"), r("n"), r("is_ada"))) == Vector(
      (SqlValue.SqlText("ada"), SqlValue.SqlText("2"), SqlValue.SqlInteger(1)),
      (SqlValue.SqlText("bob"), SqlValue.SqlText("3"), SqlValue.SqlInteger(0))))
    assert(h.queryTagged(None, LeafQuery("totals")).head("t") ==
      SqlValue.SqlReal(5.0))
  }

  test("module cid is content-addressed and stable") {
    assert(chatModule.cid == chatModule.copy().cid)
    assert(chatModule.cid != chatModule.copy(initSql = chatModule.initSql + " ").cid)
  }
}
