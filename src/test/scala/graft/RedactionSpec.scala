package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.drisl.DValue._
import graft.drisl.Drisl
import graft.stream._
import graft.types._

/** Redaction at the STORE OF RECORD (the round-15 verb): the per-stream
  * event log forgets a payload while preserving the event-sourcing
  * invariants — idx contiguity, batch signatures, replay determinism.
  * The commit is an O(redacted) parquet set flipped by the stream's
  * atomic meta rewrite; every reader goes through the `events` view, so
  * raw scans, replay, backup and compaction all see NULL payloads for
  * the set. Physical purge = compactLog (the rewrite reads the view, so
  * nulls bake into the new log version and the set drains). */
class RedactionSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private lazy val store = new StreamStore(spark,
    graft.TempDirs.create("graft-redact").toString)

  private def payload(content: String, n: Long): Array[Byte] =
    Drisl.encode(obj("content" -> text(content), "n" -> int(n)))

  private val module = ModuleDef(
    initSql = """CREATE TABLE IF NOT EXISTS notes
                 |(idx BIGINT, author STRING, content STRING, n BIGINT)
                 |USING PARQUET""".stripMargin,
    materializer = """INSERT INTO notes
                      |SELECT idx, user, drisl_extract(payload, '.content'),
                      |       drisl_extract_long(payload, '.n') FROM event""".stripMargin,
    queries = Map("all" -> QueryDef(
      "SELECT idx, author, content, n FROM notes ORDER BY idx")))

  private def freshStream(id: String, n: Int = 12): StreamHandle = {
    val h = store.open(id)
    h.setModule(module)
    assert(h.addEvents((1 to n).map(i =>
      IncomingEvent(s"u${i % 3}", payload(s"c$i", i)))).isRight)
    h
  }

  test("redact nulls the payload in raw scans, keeps idx/user/signature") {
    val h = freshStream("did:redact:raw")
    val r = h.redactEvents(Seq(3L, 7L))
    assert(r("redacted") == 2L)
    val rows = h.rawGetEvents(1, 12).collect()
    assert(rows.length == 12, "idx contiguity preserved")
    assert(rows.map(_.getLong(0)).toSeq == (1L to 12L))
    rows.foreach { row =>
      val idx = row.getLong(0)
      assert(row.getString(1) == s"u${idx % 3}", "user survives redaction")
      if (idx == 3 || idx == 7) assert(row.isNullAt(2), s"idx $idx redacted")
      else assert(!row.isNullAt(2), s"idx $idx untouched")
    }
    // idempotent retry + out-of-range idx are no-ops
    assert(h.redactEvents(Seq(3L, 7L, 999L))("redacted") == 2L)
    assert(h.redactedCount == 2L)
    // the set merges across calls
    assert(h.redactEvents(Seq(5L))("redacted") == 3L)
  }

  test("the events view renders NO join while the redaction set is empty") {
    val h = freshStream("did:redact:plan")
    val plan = h.eventsDF.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"),
      s"pass-through view must not render a join:\n$plan")
    h.redactEvents(Seq(1L))
    val planAfter = h.eventsDF.queryExecution.optimizedPlan.toString
    assert(planAfter.toLowerCase.contains("join"),
      "redacted view must render the payload-nulling join")
  }

  test("replay after redaction converges: module swap sees redacted payloads") {
    val h = freshStream("did:redact:replay")
    h.redactEvents(Seq(2L, 9L))
    // a module swap replays the whole log through the view — redacted
    // events materialize with NULL-derived columns, deterministically
    h.setModule(module.copy(initSql = module.initSql + " "))
    val rows = h.queryTagged(None, LeafQuery("all", limit = 100))
    assert(rows.size == 12)
    rows.foreach { m =>
      val idx = m("idx").asInstanceOf[SqlValue.SqlInteger].v
      if (idx == 2 || idx == 9) {
        assert(m("content") == SqlValue.SqlNull, s"idx $idx content redacted")
        assert(m("n") == SqlValue.SqlNull, s"idx $idx n redacted")
      } else assert(m("content") == SqlValue.SqlText(s"c$idx"))
    }
    // rematerialize=true converges the tables without a module swap
    val h2 = freshStream("did:redact:remat")
    h2.redactEvents(Seq(4L), rematerialize = true)
    val r2 = h2.queryTagged(None, LeafQuery("all", limit = 100))
    assert(r2.count(_("content") == SqlValue.SqlNull) == 1)
  }

  test("redaction persists across close/reopen from disk") {
    val root = graft.TempDirs.create("graft-redact-reopen").toString
    val s1 = new StreamStore(spark, root)
    val h1 = s1.open("did:redact:persist")
    h1.setModule(module)
    h1.addEvents((1 to 6).map(i => IncomingEvent("u", payload(s"c$i", i))))
    h1.redactEvents(Seq(5L))
    h1.close()
    val s2 = new StreamStore(spark, root)
    val h2 = s2.open("did:redact:persist")
    assert(h2.redactedCount == 1L)
    val row5 = h2.rawGetEvents(5, 5).collect()(0)
    assert(row5.isNullAt(2), "redaction survives a cold reopen")
  }

  test("native backup/restore round-trip preserves redaction") {
    val h = freshStream("did:redact:bak")
    h.redactEvents(Seq(6L, 11L))
    val bak = "file:" + graft.TempDirs.create("graft-redact-bakdir")
    BackupService.backup(h, bak)
    val store2 = new StreamStore(spark,
      graft.TempDirs.create("graft-redact-rest").toString)
    val restored = BackupService.restore(store2, "did:redact:restored", bak)
    // the restored stream replays the ARCHIVED (redacted) log — its
    // materialized answers converge with the source's post-redaction view
    val rows = restored.queryTagged(None, LeafQuery("all", limit = 100))
    assert(rows.size == 12)
    assert(rows.count(_("content") == SqlValue.SqlNull) == 2)
    val raw = restored.rawGetEvents(6, 6).collect()(0)
    assert(raw.isNullAt(2), "archived payload is null at the restore too")
  }

  test("redaction reaches EXISTING archives: ranges exported BEFORE the " +
    "takedown re-export nulled on the next incremental tick, both formats") {
    // -------- native format --------
    val h = freshStream("did:redact:bakearly")
    val bak = "file:" + graft.TempDirs.create("graft-redact-bakearly")
    BackupService.backup(h, bak) // the archive predates the takedown
    h.redactEvents(Seq(6L, 11L))
    BackupService.backup(h, bak) // the next ordinary incremental tick
    val store2 = new StreamStore(spark,
      graft.TempDirs.create("graft-redact-bakearly-rest").toString)
    val restored = BackupService.restore(
      store2, "did:redact:bakearly-restored", bak)
    assert(restored.rawGetEvents(1, 12).collect()
      .count(_.isNullAt(2)) == 2,
      "the pre-takedown archive must not keep the forgotten payloads")
    // a tick with nothing new and no redaction advance rewrites nothing
    val rangeDir = java.nio.file.Paths.get(
      bak.stripPrefix("file:"), "events", "1-12")
    val mt = java.nio.file.Files.getLastModifiedTime(rangeDir)
    BackupService.backup(h, bak)
    assert(java.nio.file.Files.getLastModifiedTime(rangeDir) == mt,
      "an already-current archive must stay incremental (no range rewrite)")
    // -------- reference-bucket format --------
    val h2 = freshStream("did:redact:refearly")
    val rb = "file:" + graft.TempDirs.create("graft-redact-refearly-dir")
    BackupService.exportReference(h2, rb) // bucket predates the takedown
    h2.redactEvents(Seq(2L, 9L))
    BackupService.exportReference(h2, rb) // next sweep tick
    val store3 = new StreamStore(spark,
      graft.TempDirs.create("graft-redact-refearly-rest").toString)
    val (restored2, _) = BackupService.importReference(
      store3, "did:redact:refearly-restored", rb, h2.id)
    val rows = restored2.queryTagged(None, LeafQuery("all", limit = 100))
    assert(rows.size == 12 &&
      rows.count(_("content") == SqlValue.SqlNull) == 2,
      "the pre-takedown bucket must not keep the forgotten payloads")
  }

  test("legacy metas with recorded redactions seed redactSeq=1 on load " +
    "(r16 ADVICE): the exposure signal turns truthful and a pre-upgrade " +
    "archive re-exports its forgotten payloads away") {
    val root = graft.TempDirs.create("graft-redact-legacy").toString
    val s1 = new StreamStore(spark, root)
    val h1 = s1.open("did:redact:legacy")
    h1.setModule(module)
    h1.addEvents((1 to 6).map(i => IncomingEvent("u", payload(s"c$i", i))))
    // the archive predates the takedown (exported at redactSeq 0)
    val bak = "file:" + graft.TempDirs.create("graft-redact-legacy-bak")
    BackupService.backup(h1, bak)
    h1.redactEvents(Seq(5L))
    h1.close()
    // simulate the PRE-UPGRADE meta: redactions on disk, no exposure
    // counters recorded (the shape every stream redacted before the
    // counters existed carries)
    val metaP = java.nio.file.Paths.get(root,
      s1.dbNameFor("did:redact:legacy"), "meta.json")
    val body = new String(java.nio.file.Files.readAllBytes(metaP),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(body.contains("\"redactSeq\":1"), body)
    java.nio.file.Files.write(metaP,
      body.replace(",\"redactSeq\":1,\"rematSeq\":0", "")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val s2 = new StreamStore(spark, root)
    val h2 = s2.open("did:redact:legacy")
    // the comment's old premise — "legacy = no recorded redactions" — is
    // false here: the non-empty redactions dir seeds redactSeq to 1, so
    // the exposure signal reads STALE (truthful) instead of converged
    assert(h2.redactionExposure == ((0L, 1L)),
      s"legacy redactions must seed the exposure counter: ${
        h2.redactionExposure}")
    assert(h2.moduleTablesPredateRedaction,
      "module tables materialized before the redaction must read stale")
    // and the next ordinary backup tick re-exports the pre-upgrade
    // archive: without the seed, 0 > 0 never fires and the archived
    // payload survives the takedown forever
    BackupService.backup(h2, bak)
    val s3 = new StreamStore(spark,
      graft.TempDirs.create("graft-redact-legacy-rest").toString)
    val restored = BackupService.restore(s3, "did:redact:legacy-rest", bak)
    assert(restored.rawGetEvents(5, 5).collect()(0).isNullAt(2),
      "the pre-upgrade archive must re-export payload-nulled")
  }

  test("reference-bucket export/import round-trip preserves redaction") {
    val h = freshStream("did:redact:refbak")
    h.redactEvents(Seq(1L, 12L))
    val bak = "file:" + graft.TempDirs.create("graft-redact-refdir")
    BackupService.exportReference(h, bak)
    val store2 = new StreamStore(spark,
      graft.TempDirs.create("graft-redact-refrest").toString)
    val (restored, _) = BackupService.importReference(
      store2, "did:redact:refrestored", bak, h.id)
    // the bucket format carries the nulled payload as zero bytes; replay
    // extracts NULL from it (empty payload = every path absent)
    val rows = restored.queryTagged(None, LeafQuery("all", limit = 100))
    assert(rows.size == 12)
    assert(rows.count(_("content") == SqlValue.SqlNull) == 2)
  }

  test("compaction is the physical purge: nulls bake, the set drains") {
    val h = freshStream("did:redact:compact")
    h.redactEvents(Seq(4L, 8L))
    assert(h.redactedCount == 2L)
    h.compactLog()
    assert(h.redactedCount == 0L, "compaction drains the redaction set")
    // the PHYSICAL new log version carries nulls — read it directly,
    // bypassing the view
    val physical = spark.read.parquet(h.logDirectory.toString)
    assert(physical.filter(col("idx").isin(4L, 8L))
      .filter(col("payload").isNotNull).count() == 0,
      "redacted payload bytes must be gone from the rewritten log")
    assert(physical.count() == 12)
    // answers unchanged through the (now pass-through) view
    val rows = h.rawGetEvents(1, 12).collect()
    assert(rows.count(_.isNullAt(2)) == 2)
    // and the view is back to a no-join pass-through
    val plan = h.eventsDF.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"))
  }

  test("redaction under live query load: zero failed reads through the " +
    "commit, the view flip and the physical purge") {
    val h = freshStream("did:redact:soak", n = 400)
    @volatile var stop = false
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val polls = new java.util.concurrent.atomic.AtomicInteger()
    val poller = new Thread(() => {
      while (!stop) {
        try {
          // a reader mid-flight across the meta flip / view replace /
          // compaction location swap must always see a COMPLETE log —
          // 400 contiguous rows, payloads either pre- or post-redaction
          val rows = h.rawGetEvents(1, 400).collect()
          if (rows.length != 400) errors.add(new AssertionError(
            s"poll saw ${rows.length} rows"))
          polls.incrementAndGet()
        } catch { case e: Throwable => errors.add(e); stop = true }
      }
    })
    poller.start()
    Thread.sleep(300)
    val victims = (1L to 400L by 13).toSeq // 31 ids
    h.redactEvents(victims)
    // a read STARTED after the redact call returned must see the nulls
    assert(h.rawGetEvents(1, 400).collect().count(_.isNullAt(2)) == 31)
    h.compactLog() // the purge under the same live load
    assert(h.rawGetEvents(1, 400).collect().count(_.isNullAt(2)) == 31)
    Thread.sleep(300)
    stop = true
    poller.join(30000)
    assert(errors.isEmpty, s"live polls failed: ${errors.peek()}")
    assert(polls.get() >= 3, "the poller never actually overlapped the flips")
  }

  test("subscription under takedown (verdict r16 item 6): a live " +
    "subscriber backfilling through a user-keyed forget sees only " +
    "pre-commit rows or nulled payloads — never torn state — and " +
    "has_more math stays exact across the module-table replay") {
    import graft.types.SqlValue._
    val subModule = ModuleDef(
      initSql = """CREATE TABLE IF NOT EXISTS notes
                   |(idx BIGINT, author STRING, content STRING, n BIGINT)
                   |USING PARQUET""".stripMargin,
      materializer = """INSERT INTO notes
                        |SELECT idx, user, drisl_extract(payload, '.content'),
                        |       drisl_extract_long(payload, '.n') FROM event""".stripMargin,
      queries = Map("win" -> QueryDef(
        """SELECT idx, author, content, n FROM notes
          |WHERE idx BETWEEN $start AND $start + $limit - 1
          |ORDER BY idx""".stripMargin)))
    val h = store.open("did:redact:subsoak")
    h.setModule(subModule)
    assert(h.addEvents((1 to 60).map(i =>
      IncomingEvent(s"u${i % 3}", payload(s"c$i", i)))).isRight)

    val engine = new SubscriptionEngine(h)
    @volatile var room = true
    val pages = scala.collection.mutable.ArrayBuffer
      .empty[Vector[Map[String, SqlValue]]]
    val more = scala.collection.mutable.ArrayBuffer.empty[Boolean]
    // backpressure-paged backfill: exactly one 5-row window per pump, so
    // the takedown genuinely lands MID-backfill
    val sid = engine.subscribe(None,
      LeafQuery("win", start = Some(1), limit = 5), () => room) { d =>
      pages += d.rows; more += d.hasMore; room = false
    }
    val errors = scala.collection.mutable.ArrayBuffer.empty[Throwable]
    val forgetter = new Thread(() => {
      // the user-keyed takedown, module tables replayed in the commit —
      // the exact verb /stream/forget drives at the store of record
      try h.redactFor(Seq.empty, Seq("u1"), rematerialize = true)
      catch { case t: Throwable => errors.synchronized(errors += t) }
    })
    var kicked = false
    val deadline = System.nanoTime() + 300L * 1000000000L
    while (pages.size < 12 && errors.isEmpty &&
        System.nanoTime() < deadline) {
      room = true
      engine.resume(sid)
      try engine.drain()
      catch { case t: Throwable => errors.synchronized(errors += t) }
      if (!kicked && pages.size >= 4) { forgetter.start(); kicked = true }
    }
    forgetter.join(120000)
    assert(errors.isEmpty, s"no read or takedown may fail mid-soak: " +
      s"${errors.headOption}")
    // has_more math exact across the replay: 12 full 5-row windows,
    // has_more true on every page but the last
    assert(pages.size == 12 && pages.forall(_.size == 5),
      s"windows: ${pages.map(_.size)}")
    assert(more.toVector == Vector.fill(11)(true) :+ false, more.toString)
    // exactly-once, in-order delivery: idx 1..60 across the pages
    val idxs = pages.flatten.map(_("idx")).collect {
      case SqlInteger(i) => i }
    assert(idxs.toVector == (1L to 60L).toVector,
      "backfill must deliver every event exactly once, in order")
    // never torn: every delivered row is EITHER the original payload or
    // the properly nulled takedown shape — u1 rows may be pre-commit
    // (original) or post-commit (null), everyone else's stay intact
    pages.flatten.foreach { row =>
      val i = row("idx") match { case SqlInteger(v) => v; case _ => -1L }
      val author = row("author")
      assert(author == SqlText(s"u${i % 3}"),
        s"authorship must survive the takedown: $row")
      (row("content"), row("n")) match {
        case (SqlText(c), SqlInteger(n)) =>
          assert(c == s"c$i" && n == i, s"torn row: $row")
        case (SqlNull, SqlNull) =>
          assert(i % 3 == 1, s"only the forgotten user's rows null: $row")
        case other => fail(s"torn row (half-redacted): $row -> $other")
      }
    }
    engine.unsubscribe(sid)
    // a FRESH backfill after the commit: the same exact window math, u1
    // now null on every page — the replayed module table serves the
    // subscription surface identically to a never-redacted layout
    val pages2 = scala.collection.mutable.ArrayBuffer
      .empty[Vector[Map[String, SqlValue]]]
    val more2 = scala.collection.mutable.ArrayBuffer.empty[Boolean]
    @volatile var room2 = true
    val sid2 = engine.subscribe(None,
      LeafQuery("win", start = Some(1), limit = 5), () => room2) { d =>
      pages2 += d.rows; more2 += d.hasMore; room2 = false
    }
    while (pages2.size < 12) { room2 = true; engine.resume(sid2); engine.drain() }
    assert(pages2.forall(_.size == 5) &&
      more2.toVector == Vector.fill(11)(true) :+ false)
    pages2.flatten.foreach { row =>
      val i = row("idx") match { case SqlInteger(v) => v; case _ => -1L }
      if (i % 3 == 1) assert(row("content") == SqlNull, s"must be null: $row")
      else assert(row("content") == SqlText(s"c$i"), s"must survive: $row")
    }
    engine.unsubscribe(sid2)
  }

  test("appends after redaction are untouched by the set") {
    val h = freshStream("did:redact:append", n = 4)
    h.redactEvents(Seq(2L))
    assert(h.addEvents(Seq(IncomingEvent("u9", payload("late", 99)))).isRight)
    val rows = h.rawGetEvents(1, 5).collect()
    assert(rows.length == 5)
    assert(!rows(4).isNullAt(2), "new events never match old redactions")
    assert(rows(1).isNullAt(2))
  }

  test("user-keyed redaction: one commit nulls every event a user " +
    "authored; authorship survives; unknown users are no-ops") {
    val h = freshStream("did:redact:byuser") // users cycle u1,u2,u0,…
    val r = h.redactEventsByUser(Seq("u1"))
    assert(r("redacted") == 4L) // idx 1,4,7,10
    h.rawGetEvents(1, 12).collect().foreach { row =>
      val idx = row.getLong(0)
      assert(row.getString(1) == s"u${idx % 3}",
        "authorship must survive redaction (only the payload forgets)")
      if (idx % 3 == 1) assert(row.isNullAt(2), s"idx $idx")
      else assert(!row.isNullAt(2), s"idx $idx")
    }
    // union with an explicit idx set lands in ONE commit
    val r2 = h.redactFor(Seq(3L), Seq("u1"))
    assert(r2("redacted") == 5L)
    assert(h.redactionExposure._2 == 2L, "exactly two redaction commits")
    // an unknown user is an idempotent no-op that widens no exposure
    val r3 = h.redactEventsByUser(Seq("nobody"))
    assert(r3("redacted") == 5L && h.redactionExposure._2 == 2L)
  }

  test("exposure signal: module tables predate redaction until a " +
    "rematerialize / module swap converges them; persists across reopen") {
    val h = freshStream("did:redact:stale")
    assert(!h.moduleTablesPredateRedaction, "no redactions yet")
    h.redactEvents(Seq(2L)) // default rematerialize = false
    assert(h.moduleTablesPredateRedaction,
      "module tables still hold the pre-redaction row — signal must rise")
    assert(h.redactionExposure == ((0L, 1L)))
    // idempotent retry / out-of-range no-op widens no exposure
    h.redactEvents(Seq(2L, 9999L))
    assert(h.redactionExposure == ((0L, 1L)))
    // the signal survives a process restart (meta-persisted)
    h.close()
    val h2 = store.open("did:redact:stale")
    assert(h2.moduleTablesPredateRedaction)
    // rematerialize converges: tables replay over the redacted log
    h2.redactEvents(Seq(5L), rematerialize = true)
    assert(!h2.moduleTablesPredateRedaction)
    assert(h2.redactionExposure == ((2L, 2L)))
    // a later redact re-raises; a module SWAP converges it too
    h2.redactEvents(Seq(7L))
    assert(h2.moduleTablesPredateRedaction)
    h2.setModule(module)
    assert(!h2.moduleTablesPredateRedaction)
  }
}
