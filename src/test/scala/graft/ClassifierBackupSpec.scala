package graft

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.drisl.DValue._
import graft.drisl.Drisl
import graft.stream._
import graft.types._

/** Statement classifier (read-only queries, state-scoped writes) and
  * backup/restore round-trip. */
class ClassifierBackupSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private lazy val store = new StreamStore(spark,
    graft.TempDirs.create("graft-cb").toString)

  private def payload(content: String, n: Long = 0): Array[Byte] =
    Drisl.encode(obj("content" -> text(content), "n" -> int(n)))

  private val module = ModuleDef(
    initSql = "CREATE TABLE IF NOT EXISTS notes (idx BIGINT, who STRING, content STRING) USING PARQUET",
    materializer = "INSERT INTO notes SELECT idx, user, drisl_extract(payload, '.content') FROM event",
    stateInitSql = "CREATE TABLE IF NOT EXISTS state_flags (who STRING, flag STRING) USING PARQUET",
    stateMaterializer = "INSERT INTO state_flags SELECT user, drisl_extract(payload, '.content') FROM event",
    queries = Map(
      "list" -> QueryDef("SELECT idx, who, content FROM notes ORDER BY idx"),
      "evil_insert" -> QueryDef("INSERT INTO notes SELECT 99, 'x', 'pwned'"),
      "evil_ddl" -> QueryDef("DROP TABLE notes"),
      "evil_multi" -> QueryDef("SELECT 1; DELETE FROM notes; SELECT 2")))

  test("query context is read-only: INSERT/DDL/DML statements rejected") {
    val h = store.open("did:test:classifier")
    h.setModule(module)
    h.addEvents(Seq(IncomingEvent("a", payload("keep"))))
    for (bad <- Seq("evil_insert", "evil_ddl", "evil_multi")) {
      val e = intercept[IllegalArgumentException](h.query(None, LeafQuery(bad)))
      assert(e.getMessage.contains("read-only"), s"$bad: ${e.getMessage}")
    }
    // table untouched by the rejected statements
    assert(h.queryTagged(None, LeafQuery("list")).size == 1)
  }

  test("state materializer may only write state_* tables") {
    val h = store.open("did:test:stateonly")
    h.setModule(module.copy(
      stateMaterializer = "INSERT INTO notes SELECT 1, user, 'sneak' FROM event"))
    val r = h.addStateEvents(Seq(IncomingEvent("a", payload("x"))))
    assert(r.isLeft && r.left.exists(_.contains("state_")))
    // the legit state materializer works
    val h2 = store.open("did:test:stateok")
    h2.setModule(module)
    assert(h2.addStateEvents(Seq(IncomingEvent("a", payload("on")))).isRight)
  }

  test("upsert-style state via INSERT OVERWRITE (reference's ON CONFLICT shape)") {
    // the reference fixture upserts last_read per user with ON CONFLICT
    // (FIXTURES.md §2); Spark has no v1 upsert, but INSERT OVERWRITE of the
    // merged view expresses the same last-write-wins state contract
    val h = store.open("did:test:upsert")
    h.setModule(ModuleDef(
      initSql = "CREATE TABLE IF NOT EXISTS noop (x BIGINT) USING PARQUET",
      stateInitSql = "CREATE TABLE IF NOT EXISTS state_last_read (who STRING, last_idx BIGINT) USING PARQUET",
      stateMaterializer =
        """INSERT OVERWRITE state_last_read
          |SELECT who, max(last_idx) FROM (
          |  SELECT who, last_idx FROM state_last_read
          |  UNION ALL
          |  SELECT user AS who, drisl_extract_long(payload, '.lastRead') AS last_idx FROM event)
          |GROUP BY who""".stripMargin,
      queries = Map("reads" -> QueryDef(
        "SELECT who, last_idx FROM state_last_read ORDER BY who"))))
    def lastRead(n: Long) = Drisl.encode(obj("lastRead" -> int(n)))
    assert(h.addStateEvents(Seq(
      IncomingEvent("ann", lastRead(2)), IncomingEvent("bob", lastRead(1)))).isRight)
    assert(h.addStateEvents(Seq(IncomingEvent("ann", lastRead(7)))).isRight)
    val rows = h.queryTagged(None, LeafQuery("reads"))
    assert(rows.map(r => (r("who"), r("last_idx"))) == Vector(
      (SqlValue.SqlText("ann"), SqlValue.SqlInteger(7)),
      (SqlValue.SqlText("bob"), SqlValue.SqlInteger(1))))
  }

  test("INSERT OVERWRITE DIRECTORY is rejected in query and state contexts") {
    // InsertIntoDir is neither a Command nor an InsertIntoStatement in
    // Spark 4 — a root-only match would let it write arbitrary paths
    val h = store.open("did:test:dirwrite")
    h.setModule(module.copy(queries = module.queries + ("evil_dir" -> QueryDef(
      "INSERT OVERWRITE DIRECTORY '/tmp/graft-pwn' USING PARQUET SELECT * FROM notes"))))
    val e = intercept[IllegalArgumentException](h.query(None, LeafQuery("evil_dir")))
    assert(e.getMessage.contains("read-only"), e.getMessage)

    val h2 = store.open("did:test:dirstate")
    h2.setModule(module.copy(stateMaterializer =
      "INSERT OVERWRITE DIRECTORY '/tmp/graft-pwn2' USING PARQUET SELECT user FROM event"))
    val r = h2.addStateEvents(Seq(IncomingEvent("a", payload("x"))))
    assert(r.isLeft && r.left.exists(_.contains("state_")), r.toString)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get("/tmp/graft-pwn")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get("/tmp/graft-pwn2")))
  }

  test("upsert-shaped log materializer takes the set-based path (no per-event collect)") {
    val h = store.open("did:test:upsertlog")
    h.setModule(ModuleDef(
      initSql = "CREATE TABLE IF NOT EXISTS last_n (who STRING, n BIGINT) USING PARQUET",
      materializer =
        """INSERT OVERWRITE last_n
          |SELECT who, max(n) FROM (
          |  SELECT who, n FROM last_n
          |  UNION ALL
          |  SELECT user AS who, drisl_extract_long(payload, '.n') AS n FROM event)
          |GROUP BY who""".stripMargin,
      queries = Map("ns" -> QueryDef("SELECT who, n FROM last_n ORDER BY who"))))
    assert(h.addEvents(Seq(
      IncomingEvent("ann", payload("a", 3)),
      IncomingEvent("bob", payload("b", 5)),
      IncomingEvent("ann", payload("c", 9)))).isRight)
    assert(h.perEventReplays == 0L,
      "self-overwrite upsert must be classified batch-safe (one set-based pass)")
    val rows = h.queryTagged(None, LeafQuery("ns"))
    assert(rows.map(r => (r("who"), r("n"))) == Vector(
      (SqlValue.SqlText("ann"), SqlValue.SqlInteger(9)),
      (SqlValue.SqlText("bob"), SqlValue.SqlInteger(5))))
  }

  test("UPDATE…FROM event rewrites to the set-based upsert, replay-identical") {
    // the SQLite UPDATE-FROM module idiom ("fold the latest event value
    // into a keyed row", reference lib.rs authorizer/materializer SQL
    // surface) — Spark cannot even parse UPDATE…FROM, so the engine
    // rewrites the provably batch-safe shape (SET rhs + residuals
    // reference event only; equi-keys target.col = expr(event)) into the
    // self-overwrite INSERT and takes the SET-BASED path. The batch
    // collapse must match sequential per-event replay exactly.
    def updModule = ModuleDef(
      initSql =
        """CREATE TABLE IF NOT EXISTS kv (k STRING, v BIGINT, tag STRING) USING PARQUET;
          |INSERT INTO kv VALUES ('a', 0, 'seed'), ('b', 0, 'seed'), ('c', 0, 'seed')""".stripMargin,
      materializer =
        """UPDATE kv SET v = drisl_extract_long(event.payload, '.n'),
          |    tag = event.user
          |FROM event
          |WHERE kv.k = drisl_extract(event.payload, '.content')
          |  AND event.user <> 'spammer'""".stripMargin,
      queries = Map("all" -> QueryDef("SELECT k, v, tag FROM kv ORDER BY k")))

    // one batch: key 'a' updated twice (LAST wins), 'b' once, 'zz' misses
    // (UPDATE never inserts), one event residual-filtered out
    val events = Seq(
      IncomingEvent("ann", payload("a", 3)),
      IncomingEvent("bob", payload("b", 5)),
      IncomingEvent("spammer", payload("c", 666)), // residual drops it
      IncomingEvent("cat", payload("a", 9)),       // last write to 'a'
      IncomingEvent("dan", payload("zz", 7)))      // no matching row
    val h = store.open("did:test:updfrom")
    h.setModule(updModule)
    assert(h.addEvents(events).isRight)
    assert(h.perEventReplays == 0L,
      "UPDATE…FROM with event-only rhs must take the set-based path")
    val expected = Vector(
      (SqlValue.SqlText("a"), SqlValue.SqlInteger(9), SqlValue.SqlText("cat")),
      (SqlValue.SqlText("b"), SqlValue.SqlInteger(5), SqlValue.SqlText("bob")),
      (SqlValue.SqlText("c"), SqlValue.SqlInteger(0), SqlValue.SqlText("seed")))
    assert(h.queryTagged(None, LeafQuery("all"))
      .map(r => (r("k"), r("v"), r("tag"))) == expected)

    // replay equivalence: the same events as FIVE single-event batches
    // (the per-event regime by construction) end in the identical table
    val h2 = store.open("did:test:updfrom2")
    h2.setModule(updModule)
    events.foreach(e => assert(h2.addEvents(Seq(e)).isRight))
    assert(h2.queryTagged(None, LeafQuery("all"))
      .map(r => (r("k"), r("v"), r("tag"))) == expected)

    // a SET rhs reading the evolving target (even via a subquery) must
    // NOT be collapsed: the rewrite refuses and the raw UPDATE (which
    // Spark cannot run) surfaces as the append error it is today
    val h3 = store.open("did:test:updfrom3")
    h3.setModule(updModule.copy(materializer =
      """UPDATE kv SET v = (SELECT max(v) FROM kv) + 1
        |FROM event WHERE kv.k = drisl_extract(event.payload, '.content')""".stripMargin))
    intercept[Exception] {
      h3.addEvents(Seq(IncomingEvent("ann", payload("a", 1)))) match {
        case Left(e) => throw new IllegalStateException(e)
        case Right(_) => fail(
          "self-reading UPDATE rhs must not be silently batch-collapsed")
      }
    }
    // the failed batch rolled back: nothing materialized, table intact
    assert(h3.queryTagged(None, LeafQuery("all")).size == 3)
  }

  test("UPDATE…FROM honours OR precedence, literals, and name collisions") {
    // three once-wrong shapes, each batch-safe ONLY if handled exactly:
    //
    // (1) `k = e AND a OR b` means `(k=e AND a) OR b` — a token-level AND
    // split would mis-factor it as key ∧ (a OR b) and silently
    // materialize a diverged table. The Catalyst conjunct split sees ONE
    // Or conjunct whose target reference fails the event-only probe, so
    // the rewrite refuses and the raw UPDATE surfaces as the append
    // error a non-rewritable UPDATE is today.
    val hOr = store.open("did:test:updfrom_or")
    hOr.setModule(ModuleDef(
      initSql = """CREATE TABLE IF NOT EXISTS kv (k STRING, v BIGINT) USING PARQUET;
                   |INSERT INTO kv VALUES ('a', 0), ('b', 0)""".stripMargin,
      materializer =
        """UPDATE kv SET v = drisl_extract_long(event.payload, '.n')
          |FROM event
          |WHERE kv.k = drisl_extract(event.payload, '.content')
          |  AND event.user <> 'spammer' OR event.user = 'admin'""".stripMargin,
      queries = Map("all" -> QueryDef("SELECT k, v FROM kv ORDER BY k"))))
    // refusal surfaces as Left OR a thrown append error — but NEVER as a
    // successful batch (the fail() must not hide inside an intercept,
    // where its own TestFailedException would satisfy the interception)
    val orRefused =
      try hOr.addEvents(Seq(IncomingEvent("admin", payload("a", 7)))).isLeft
      catch { case _: Exception => true }
    assert(orRefused, "an OR above the key conjunct must refuse the batch collapse")
    assert(hOr.queryTagged(None, LeafQuery("all")).map(_("v")) ==
      Vector(SqlValue.SqlInteger(0), SqlValue.SqlInteger(0)))

    // (2) a string literal containing "event." must pass through
    // untouched (tree transform, not text substitution), and (3) a BARE
    // event-column name that collides with a target column binds to the
    // event — batch and five single-event batches end identical.
    def collideModule = ModuleDef(
      initSql =
        """CREATE TABLE IF NOT EXISTS kv (k STRING, user STRING, tag STRING) USING PARQUET;
          |INSERT INTO kv VALUES ('a', 'seed', 'seed'), ('b', 'seed', 'seed')""".stripMargin,
      materializer =
        """UPDATE kv SET user = user,
          |    tag = concat('event.', event.user)
          |FROM event
          |WHERE kv.k = drisl_extract(event.payload, '.content')""".stripMargin,
      queries = Map("all" -> QueryDef("SELECT k, user, tag FROM kv ORDER BY k")))
    val events = Seq(
      IncomingEvent("ann", payload("a")),
      IncomingEvent("bob", payload("b")),
      IncomingEvent("cat", payload("a"))) // last write to 'a'
    val h1 = store.open("did:test:updfrom_lit")
    h1.setModule(collideModule)
    assert(h1.addEvents(events).isRight)
    assert(h1.perEventReplays == 0L, "collision shape must stay set-based")
    val expected = Vector(
      (SqlValue.SqlText("a"), SqlValue.SqlText("cat"),
        SqlValue.SqlText("event.cat")),
      (SqlValue.SqlText("b"), SqlValue.SqlText("bob"),
        SqlValue.SqlText("event.bob")))
    assert(h1.queryTagged(None, LeafQuery("all"))
      .map(r => (r("k"), r("user"), r("tag"))) == expected)
    val h2 = store.open("did:test:updfrom_lit2")
    h2.setModule(collideModule)
    events.foreach(e => assert(h2.addEvents(Seq(e)).isRight))
    assert(h2.queryTagged(None, LeafQuery("all"))
      .map(r => (r("k"), r("user"), r("tag"))) == expected)

    // (4) a lambda argument SHADOWING an event-column name stays the
    // lambda's variable — `user -> upper(user)` must upper-case each
    // array element, never the event's user column
    val hLam = store.open("did:test:updfrom_lambda")
    hLam.setModule(ModuleDef(
      initSql = """CREATE TABLE IF NOT EXISTS kv (k STRING, shout STRING) USING PARQUET;
                   |INSERT INTO kv VALUES ('a', 'seed')""".stripMargin,
      materializer =
        """UPDATE kv SET shout = array_join(
          |    transform(split(drisl_extract(event.payload, '.content'), ','),
          |              user -> upper(user)), '+')
          |FROM event
          |WHERE kv.k = 'a'""".stripMargin,
      queries = Map("all" -> QueryDef("SELECT k, shout FROM kv ORDER BY k"))))
    assert(hLam.addEvents(Seq(IncomingEvent("lowercase_ann", payload("x,y")))).isRight)
    assert(hLam.perEventReplays == 0L)
    assert(hLam.queryTagged(None, LeafQuery("all")).map(_("shout")) ==
      Vector(SqlValue.SqlText("X+Y")),
      "lambda variable was rebound to the event column")
  }

  test("per-event fallback warns when replays cross the telemetry threshold") {
    // a materializer that reads its own output in non-upsert shape forces
    // the per-event replay loop; the warning must fire once per 10k
    // replayed events so a driver-loop ingest is VISIBLE before it
    // dominates. The counter is pre-seeded to just under the threshold —
    // actually replaying 10k single-row batches would test nothing more,
    // 10k times slower.
    val h = store.open("did:test:fallbackwarn")
    h.setModule(ModuleDef(
      initSql = "CREATE TABLE IF NOT EXISTS running (idx BIGINT, total BIGINT) USING PARQUET",
      materializer =
        """INSERT INTO running
          |SELECT idx, coalesce((SELECT max(total) FROM running), 0)
          |  + drisl_extract_long(payload, '.n')
          |FROM event""".stripMargin,
      queries = Map("r" -> QueryDef("SELECT idx, total FROM running ORDER BY idx"))))
    assert(h.addEvents(Seq(
      IncomingEvent("a", payload("x", 2)),
      IncomingEvent("a", payload("y", 3)))).isRight)
    assert(h.perEventReplays == 2L,
      "a self-reading non-upsert materializer must take the per-event path")
    assert(h.perEventWarnings == 0L, "no warning below the 10k threshold")
    // the running total proves per-event ORDER: 2 then 2+3
    val rows = h.queryTagged(None, LeafQuery("r"))
    assert(rows.map(_("total")) == Vector(
      SqlValue.SqlInteger(2), SqlValue.SqlInteger(5)))
    h.perEventReplays = 9999L
    assert(h.addEvents(Seq(IncomingEvent("a", payload("z", 1)))).isRight)
    assert(h.perEventReplays == 10000L)
    assert(h.perEventWarnings == 1L,
      "crossing the 10k replay threshold must emit the telemetry warning")
  }

  test("failed batch restores tables overwritten earlier in the same batch") {
    val h = store.open("did:test:owrollback")
    h.setModule(ModuleDef(
      initSql = """CREATE TABLE IF NOT EXISTS last_n (who STRING, n BIGINT) USING PARQUET;
                   |CREATE TABLE IF NOT EXISTS probe (n BIGINT) USING PARQUET""".stripMargin,
      materializer =
        """INSERT OVERWRITE last_n
          |SELECT who, max(n) FROM (
          |  SELECT who, n FROM last_n
          |  UNION ALL
          |  SELECT user AS who, drisl_extract_long(payload, '.n') AS n FROM event)
          |GROUP BY who;
          |INSERT INTO probe
          |SELECT CASE WHEN drisl_extract_long(payload, '.n') > 100
          |       THEN throw('too big') ELSE drisl_extract_long(payload, '.n') END
          |FROM event""".stripMargin,
      queries = Map("ns" -> QueryDef("SELECT who, n FROM last_n ORDER BY who"))))
    assert(h.addEvents(Seq(IncomingEvent("ann", payload("a", 3)))).isRight)
    // second batch: the overwrite succeeds first, then the probe INSERT
    // throws — rollback must bring back the pre-batch last_n files, which
    // the overwrite physically deleted
    val r = h.addEvents(Seq(IncomingEvent("ann", payload("b", 999))))
    assert(r.isLeft, r.toString)
    assert(h.latest == 1L)
    val rows = h.queryTagged(None, LeafQuery("ns"))
    assert(rows.map(r => (r("who"), r("n"))) ==
      Vector((SqlValue.SqlText("ann"), SqlValue.SqlInteger(3))),
      "overwritten table must be restored to its pre-batch contents")
  }

  test("backup -> restore round-trip rebuilds tables by replay (Hadoop FS URI)") {
    val h = store.open("did:test:bak")
    h.setModule(module)
    h.addEvents((1 to 5).map(i => IncomingEvent(s"u$i", payload(s"m$i", i))))
    // state events bypass the log — restore must come from the snapshot
    assert(h.addStateEvents(Seq(
      IncomingEvent("ann", payload("flagA")),
      IncomingEvent("bob", payload("flagB")))).isRight)
    // destination through the Hadoop FileSystem API: file: here, s3a:// in
    // production — same code path
    val dir = "file:" + graft.TempDirs.create("graft-bakdir")
    BackupService.backup(h, dir)

    val r = BackupService.restore(store, "did:test:restored", dir)
    assert(r.latest == 5L)
    assert(r.currentModule.map(_.cid) == Some(module.cid),
      "module definition must round-trip with identical content address")
    val rows = r.queryTagged(None, LeafQuery("list"))
    assert(rows.map(_("content")) == (1 to 5).map(i => SqlValue.SqlText(s"m$i")).toVector)
    val flags = r.tableDF("state_flags").collect()
      .map(x => (x.getString(0), x.getString(1))).sorted.toSeq
    assert(flags == Seq(("ann", "flagA"), ("bob", "flagB")),
      "state snapshot must be reinstated on restore")
  }

  test("incremental backup: 3-range chain round-trips, old ranges untouched") {
    val h = store.open("did:test:incbak")
    h.setModule(module)
    h.addEvents((1 to 2).map(i => IncomingEvent(s"u$i", payload(s"m$i", i))))
    val dirP = graft.TempDirs.create("graft-incbak")
    val dir = "file:" + dirP
    assert(BackupService.backup(h, dir) == Some((1L, 2L)))
    // second backup archives ONLY the new events as a new range...
    h.addEvents((3 to 5).map(i => IncomingEvent(s"u$i", payload(s"m$i", i))))
    def filesOf(rel: String) = {
      val s = java.nio.file.Files.list(dirP.resolve(rel))
      try s.iterator().asScala.map(p =>
        p.getFileName.toString -> java.nio.file.Files.getLastModifiedTime(p))
        .toMap
      finally s.close()
    }
    val firstRange = filesOf("events/1-2")
    assert(BackupService.backup(h, dir) == Some((3L, 5L)))
    // ...leaving the already-archived range byte-for-byte alone (this is
    // what makes backup O(new events) instead of O(corpus))
    assert(filesOf("events/1-2") == firstRange,
      "an incremental backup must not rewrite prior range archives")
    h.addEvents(Seq(IncomingEvent("u6", payload("m6", 6))))
    assert(BackupService.backup(h, dir) == Some((6L, 6L)))
    // a current destination is a no-op (no new range)
    assert(BackupService.backup(h, dir).isEmpty)
    assert(java.nio.file.Files.isDirectory(dirP.resolve("events/1-2")) &&
      java.nio.file.Files.isDirectory(dirP.resolve("events/3-5")) &&
      java.nio.file.Files.isDirectory(dirP.resolve("events/6-6")))
    // restore stitches the chain back together
    val r = BackupService.restore(store, "did:test:increstored", dir)
    assert(r.latest == 6L)
    assert(r.queryTagged(None, LeafQuery("list")).map(_("content")) ==
      (1 to 6).map(i => SqlValue.SqlText(s"m$i")).toVector)
  }

  test("compaction composes with incremental backup: post-compaction sweep is exactly the delta") {
    // The sweep prunes the log by idx min/max stats over the CURRENT file
    // set; compaction rewrites that file set wholesale (new directory, new
    // idx ranges per file) between sweeps. The contract under test: a sweep
    // after a compaction that folded both backed-up and pending events into
    // fresh files still exports exactly (lastBacked+1 .. latest) — no
    // re-export of the old range, no gap — and the chain restores intact.
    val h = store.open("did:test:compbak")
    h.setModule(module)
    // one event per append → several small per-batch log files to compact
    (1 to 4).foreach(i => h.addEvents(Seq(IncomingEvent(s"u$i", payload(s"m$i", i)))))
    val dirP = graft.TempDirs.create("graft-compbak")
    val dir = "file:" + dirP
    assert(BackupService.backup(h, dir) == Some((1L, 4L)))
    val refP = graft.TempDirs.create("graft-compbak-ref")
    assert(BackupService.exportReference(h, "file:" + refP) == Vector((1L, 4L)))
    // the delta lands pre-compaction; the compaction rewrite then folds
    // backed-up range and delta together into new, idx-disjoint files
    (5 to 7).foreach(i => h.addEvents(Seq(IncomingEvent(s"u$i", payload(s"m$i", i)))))
    assert(h.compactLog() >= 1)
    def filesOf(rel: String) = {
      val s = java.nio.file.Files.list(dirP.resolve(rel))
      try s.iterator().asScala.map(p =>
        p.getFileName.toString -> java.nio.file.Files.getLastModifiedTime(p))
        .toMap
      finally s.close()
    }
    val firstRange = filesOf("events/1-4")
    assert(BackupService.backup(h, dir) == Some((5L, 7L)),
      "post-compaction sweep must export exactly the unbacked delta")
    assert(filesOf("events/1-4") == firstRange,
      "compaction must not cause a re-export of the already-archived range")
    assert(BackupService.exportReference(h, "file:" + refP) == Vector((5L, 7L)))
    assert(java.nio.file.Files.exists(
        refP.resolve("streams/did:test:compbak/1-4.events.drisl.zstd")) &&
      java.nio.file.Files.exists(
        refP.resolve("streams/did:test:compbak/5-7.events.drisl.zstd")),
      "reference bucket must hold exactly the two incremental archives")
    // a pure rewrite with no new events is invisible to both sweeps
    assert(h.compactLog() >= 1)
    assert(BackupService.backup(h, dir).isEmpty,
      "compaction alone must not trigger a spurious export")
    assert(BackupService.exportReference(h, "file:" + refP).isEmpty)
    // both chains restore to the live stream's exact event tuples
    def tuples(df: org.apache.spark.sql.DataFrame) = df
      .select("idx", "user", "payload", "signature").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getAs[Array[Byte]](2).toSeq, r.getAs[Array[Byte]](3).toSeq))
      .sortBy(_._1).toSeq
    val live = tuples(h.eventsDF)
    val rNat = BackupService.restore(store, "did:test:comprestored", dir)
    assert(tuples(rNat.eventsDF) == live,
      "native chain restore must hash-match the live log across compaction")
    assert(rNat.queryTagged(None, LeafQuery("list")).map(_("content")) ==
      (1 to 7).map(i => SqlValue.SqlText(s"m$i")).toVector)
    val (rRef, _) = BackupService.importReference(store,
      "did:test:comprestored-ref", "file:" + refP, "did:test:compbak")
    assert(tuples(rRef.eventsDF) == live,
      "reference chain restore must hash-match the live log across compaction")
  }

  test("restore rejects a gapped or non-1-based backup chain") {
    val h = store.open("did:test:gapbak")
    h.setModule(module)
    h.addEvents((1 to 6).map(i => IncomingEvent(s"u$i", payload(s"m$i", i))))
    val dirP = graft.TempDirs.create("graft-gapbak")
    val dir = "file:" + dirP
    assert(BackupService.backup(h, dir) == Some((1L, 6L)))
    // tampering outside the Hadoop fs invalidates its sidecar checksum
    def tamper(json: String): Unit = {
      java.nio.file.Files.write(dirP.resolve("meta.json"), json.getBytes("UTF-8"))
      java.nio.file.Files.deleteIfExists(dirP.resolve(".meta.json.crc"))
    }
    // a manifest with a hole between ranges must be refused outright
    tamper("""{"latest_idx":6,"state_tables":[],"ranges":[[1,2],[4,6]]}""")
    val gap = intercept[IllegalArgumentException](
      BackupService.restore(store, "did:test:gaprest1", dir))
    assert(gap.getMessage.contains("gap"), gap.getMessage)
    // ...as must a chain that does not start at idx 1
    tamper("""{"latest_idx":6,"state_tables":[],"ranges":[[2,6]]}""")
    val off = intercept[IllegalArgumentException](
      BackupService.restore(store, "did:test:gaprest2", dir))
    assert(off.getMessage.contains("start at idx 1"), off.getMessage)
  }

  test("reference-format archive: incremental chunked export + import round-trip") {
    val h = store.open("did:test:refarc")
    h.setModule(module)
    h.addEvents((1 to 7).map(i => IncomingEvent(s"u$i", payload(s"m$i", i))))
    // state events bypass the log — the export must snapshot them
    assert(h.addStateEvents(Seq(IncomingEvent("ann", payload("flagR")))).isRight)
    val dirP = graft.TempDirs.create("graft-refarc")
    val dir = "file:" + dirP
    // chunked export: 7 events at chunk 3 -> objects 1-3, 4-6, 7-7
    assert(BackupService.exportReference(h, dir, owners = Seq("did:plc:owner1"),
      chunkEvents = 3) == Vector((1L, 3L), (4L, 6L), (7L, 7L)))
    val sdir = dirP.resolve(s"streams/${h.id}")
    for (n <- Seq("1-3.events.drisl.zstd", "4-6.events.drisl.zstd",
        "7-7.events.drisl.zstd", "metadata.drisl"))
      assert(java.nio.file.Files.exists(sdir.resolve(n)), s"missing $n")
    // a second export is incremental: only events past the archived tail
    h.addEvents(Seq(IncomingEvent("u8", payload("m8", 8))))
    val before = java.nio.file.Files.getLastModifiedTime(
      sdir.resolve("1-3.events.drisl.zstd"))
    assert(BackupService.exportReference(h, dir, chunkEvents = 3) ==
      Vector((8L, 8L)))
    assert(java.nio.file.Files.getLastModifiedTime(
      sdir.resolve("1-3.events.drisl.zstd")) == before,
      "incremental export must not rewrite prior archives")
    // the bucket must carry the module blob in wire encoding
    val wireBytes = {
      val mods = java.nio.file.Files.list(dirP.resolve("modules"))
      val blobs = try mods.iterator().asScala
        .filterNot(_.getFileName.toString.startsWith("."))  // hadoop .crc
        .toVector finally mods.close()
      assert(blobs.size == 1 &&
        blobs.head.getFileName.toString.endsWith(".module.drisl.zstd"))
      java.nio.file.Files.readAllBytes(blobs.head)
    }
    assert(wireBytes.nonEmpty)
    // import the chain into a FRESH store (no pre-registered module): the
    // module must install from the bucket blob, then events replay
    val store2 = new StreamStore(spark,
      graft.TempDirs.create("graft-refarc-restore").toString)
    val (r, meta) = BackupService.importReference(
      store2, "did:test:refarc-restored", dir, h.id)
    assert(r.latest == 8L)
    assert(meta.owners == Vector("did:plc:owner1"))
    assert(r.currentModule.map(_.cid) == Some(module.cid),
      "module must round-trip through the wire blob with identical content")
    assert(r.queryTagged(None, LeafQuery("list")).map(_("content")) ==
      (1 to 8).map(i => SqlValue.SqlText(s"m$i")).toVector)
    assert(r.tableDF("state_flags").collect()
      .map(x => (x.getString(0), x.getString(1))).toSeq == Seq(("ann", "flagR")),
      "state snapshot must be reinstated from the archive")
    // signatures survive byte-for-byte (the archive carries them verbatim)
    val sigs = h.rawGetEvents(1, 8).select("idx", "signature").collect()
      .map(x => x.getLong(0) -> x.getAs[Array[Byte]](1).toSeq).toMap
    val rsigs = r.rawGetEvents(1, 8).select("idx", "signature").collect()
      .map(x => x.getLong(0) -> x.getAs[Array[Byte]](1).toSeq).toMap
    assert(sigs == rsigs)
  }

  test("reference-format archive: a hand-built (reference-shaped) bucket imports") {
    // simulate a bucket written by the REFERENCE server: zstd(DRISL) bytes
    // assembled here from the published format, not by exportReference
    val dirP = graft.TempDirs.create("graft-refimport")
    val sdir = dirP.resolve("streams/did:test:fromref")
    java.nio.file.Files.createDirectories(sdir)
    def zstd(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new com.github.luben.zstd.ZstdOutputStream(bos)
      try z.write(b) finally z.close()
      bos.toByteArray
    }
    def archive(lo: Int, hi: Int): Array[Byte] =
      zstd(Drisl.encode(obj("events" -> graft.drisl.DValue.DArray(
        (lo to hi).toVector.map(i => obj(
          "idx" -> int(i),
          "user" -> text(s"ref$i"),
          "payload" -> graft.drisl.DValue.DBytes(payload(s"r$i", i)),
          "signature" -> graft.drisl.DValue.DBytes(Array[Byte](i.toByte))))))))
    java.nio.file.Files.write(sdir.resolve("1-2.events.drisl.zstd"), archive(1, 2))
    java.nio.file.Files.write(sdir.resolve("3-4.events.drisl.zstd"), archive(3, 4))
    // a module blob in the bucket's wire encoding, named by its CID —
    // import must install it and attach it via the metadata CID
    val wireModBytes = Drisl.encode(BackupService.moduleToWire(module))
    val wireModCid = graft.drisl.Cid.render(graft.drisl.Cid.of(wireModBytes))
    val mdir = dirP.resolve("modules")
    java.nio.file.Files.createDirectories(mdir)
    java.nio.file.Files.write(mdir.resolve(s"$wireModCid.module.drisl.zstd"), zstd(wireModBytes))
    java.nio.file.Files.write(sdir.resolve("metadata.drisl"), Drisl.encode(obj(
      "did" -> text("did:test:fromref"),
      "did_key" -> graft.drisl.DValue.DNull,
      "owners" -> graft.drisl.DValue.DArray(Vector(text("did:plc:refowner"))),
      "module_cid" -> graft.drisl.DValue.DCid(graft.drisl.Cid.parse(wireModCid)))))
    val freshStore = new StreamStore(spark,
      graft.TempDirs.create("graft-fromref-store").toString)
    val (r, meta) = BackupService.importReference(
      freshStore, "did:test:fromref-local", "file:" + dirP, "did:test:fromref")
    assert(r.latest == 4L && meta.owners == Vector("did:plc:refowner"))
    assert(meta.moduleCid == Some(wireModCid))
    // the module installed from the blob and replayed the imported events
    assert(r.currentModule.map(_.cid) == Some(module.cid))
    assert(r.queryTagged(None, LeafQuery("list")).size == 4)
    val got = r.rawGetEvents(1, 4).collect().map(x =>
      (x.getLong(0), x.getString(1))).toSeq
    assert(got == (1 to 4).map(i => (i.toLong, s"ref$i")))
    // a gapped chain (missing middle object) must be refused
    java.nio.file.Files.delete(sdir.resolve("1-2.events.drisl.zstd"))
    val bad = intercept[IllegalArgumentException](BackupService.importReference(
      store, "did:test:fromref-bad", "file:" + dirP, "did:test:fromref"))
    assert(bad.getMessage.contains("start at idx 1"), bad.getMessage)
    // ...and a mismatched metadata DID is refused before any import
    val sdir2 = dirP.resolve("streams/did:test:wrongdid")
    java.nio.file.Files.createDirectories(sdir2)
    java.nio.file.Files.write(sdir2.resolve("1-1.events.drisl.zstd"), archive(1, 1))
    java.nio.file.Files.write(sdir2.resolve("metadata.drisl"), Drisl.encode(obj(
      "did" -> text("did:test:other"),
      "did_key" -> graft.drisl.DValue.DNull,
      "owners" -> graft.drisl.DValue.DArray(Vector.empty),
      "module_cid" -> graft.drisl.DValue.DNull)))
    val mis = intercept[IllegalArgumentException](BackupService.importReference(
      store, "did:test:wrongdid-local", "file:" + dirP, "did:test:wrongdid"))
    assert(mis.getMessage.contains("does not match"), mis.getMessage)
  }

  test("background sweep archives new ranges on its own") {
    val h = store.open("did:test:sweep")
    h.setModule(module)
    h.addEvents(Seq(IncomingEvent("a", payload("s1", 1))))
    val dirP = graft.TempDirs.create("graft-sweep")
    val sweep = BackupService.scheduleSweep(h, "file:" + dirP, intervalMs = 250)
    try {
      def covered: Long =
        if (!java.nio.file.Files.exists(dirP.resolve("meta.json"))) 0L
        else "\"latest_idx\":(\\d+)".r.findFirstMatchIn(new String(
          java.nio.file.Files.readAllBytes(dirP.resolve("meta.json")), "UTF-8"))
          .map(_.group(1).toLong).getOrElse(0L)
      val deadline = System.nanoTime + 30L * 1000000000L
      while (covered < 1L && System.nanoTime < deadline) Thread.sleep(100)
      assert(covered == 1L, "sweep must archive the first event")
      h.addEvents(Seq(IncomingEvent("a", payload("s2", 2))))
      while (covered < 2L && System.nanoTime < deadline) Thread.sleep(100)
      assert(covered == 2L, "sweep must pick up new events incrementally")
    } finally sweep.close()
  }

  test("module blobs are staged to disk and GC collects unreferenced ones") {
    val root = graft.TempDirs.create("graft-gc").toString
    val store1 = new StreamStore(spark, root)
    val kept = module
    val orphan = module.copy(initSql = module.initSql + " ")
    store1.registerModule(kept)
    store1.registerModule(orphan)
    val h = store1.open("did:test:gc")
    h.setModule(kept)
    // a freshly-staged blob is inside the staging TTL: the sweep must not
    // collect it out from under an in-flight stream create
    assert(store1.gcModuleBlobs() == 0, "fresh blobs are within the staging TTL")
    // age the blobs past the TTL; now exactly the unreferenced one dies
    val modsDir = java.nio.file.Paths.get(root, "modules")
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 600 * 1000L)
    val ls = java.nio.file.Files.list(modsDir)
    try ls.iterator().asScala.foreach(p =>
      java.nio.file.Files.setLastModifiedTime(p, old))
    finally ls.close()
    assert(store1.gcModuleBlobs() == 1, "exactly the orphan blob is dead")
    // a fresh store over the same root resolves the kept cid from disk
    val store2 = new StreamStore(spark, root)
    assert(store2.module(kept.cid).isDefined)
    assert(store2.module(orphan.cid).isEmpty)
  }

  test("reopening a stream from a fresh store reloads the persisted module") {
    val root = graft.TempDirs.create("graft-reopen").toString
    val store1 = new StreamStore(spark, root)
    val h1 = store1.open("did:test:reopen")
    h1.setModule(module)
    h1.addEvents(Seq(IncomingEvent("a", payload("persisted"))))

    // a brand-new store over the same root (fresh module registry) must
    // recover the module definition from disk and keep serving queries
    val store2 = new StreamStore(spark, root)
    val h2 = store2.open("did:test:reopen")
    assert(h2.latest == 1L)
    assert(h2.currentModule.map(_.cid) == Some(module.cid))
    val rows = h2.queryTagged(None, LeafQuery("list"))
    assert(rows.map(_("content")) == Vector(SqlValue.SqlText("persisted")))
  }

  test("a single 500k-event archive object imports in bounded batches") {
    // the reference's sweep writes ONE object per interval regardless of
    // size (storage.rs:660-760) — a genuine foreign bucket can carry a
    // multi-hundred-k-event object. Import must stream it: the batch-count
    // witness proves the driver never materialized the whole object.
    import org.apache.spark.sql.functions._
    val n = 500000
    val h = store.open("did:test:bigarc")
    h.setModule(ModuleDef(queries = Map(
      "n" -> QueryDef("SELECT count(*) AS c FROM events"))))
    h.bulkImport(spark.range(1, n + 1).select(
      col("id").as("idx"),
      concat(lit("u"), col("id") % 97).as("user"),
      concat(lit("payload-"), col("id")).cast("binary").as("payload"),
      lit(Array.empty[Byte]).as("signature")))
    assert(h.latest == n.toLong)
    val dir = "file:" + graft.TempDirs.create("graft-bigarc")
    assert(BackupService.exportReference(h, dir, chunkEvents = n) ==
      Vector((1L, n.toLong)), "export must produce exactly one object")
    val store2 = new StreamStore(spark,
      graft.TempDirs.create("graft-bigarc-restore").toString)
    val (r, meta) = BackupService.importReference(
      store2, "did:test:bigarc-in", dir, h.id)
    assert(r.latest == n.toLong)
    assert(meta.importBatches == 5,
      s"a $n-event object must apply as ceil($n/100000) = 5 bounded batches, " +
        s"got ${meta.importBatches}")
    // spot-check the round-trip at the batch seams and ends
    val got = r.rawGetEvents(1, n).filter(
      col("idx").isin(1L, 99999L, 100000L, 100001L, 250000L, n.toLong))
      .collect().map(x => x.getLong(0) ->
        new String(x.getAs[Array[Byte]](2), "UTF-8")).toMap
    assert(got == Map(1L -> "payload-1", 99999L -> "payload-99999",
      100000L -> "payload-100000", 100001L -> "payload-100001",
      250000L -> "payload-250000", n.toLong -> s"payload-$n"))
  }

  test("export chunking is byte-aware: fat payloads split into more objects") {
    // 6 events of ~2 KB each: a 4 KB byte cap must override the 1000-event
    // count cap and split the archive into multiple objects, so payload
    // size can never pile an unbounded object onto the driver
    val h = store.open("did:test:fatchunk")
    h.setModule(ModuleDef(queries = Map(
      "n" -> QueryDef("SELECT count(*) AS c FROM events"))))
    val fat = "x" * 2048
    h.addEvents((1 to 6).map(i => IncomingEvent(s"u$i", payload(fat, i))))
    val dirP = graft.TempDirs.create("graft-fatchunk")
    val ranges = BackupService.exportReference(h, "file:" + dirP,
      chunkEvents = 1000, maxChunkBytes = 4096)
    assert(ranges.length > 1,
      s"byte cap ignored: 6 fat events exported as ${ranges.mkString(",")}")
    assert(ranges.head._1 == 1L && ranges.last._2 == 6L)
    // and the chain still restores whole
    val store2 = new StreamStore(spark,
      graft.TempDirs.create("graft-fatchunk-restore").toString)
    val (r, _) = BackupService.importReference(
      store2, "did:test:fatchunk-in", "file:" + dirP, h.id)
    assert(r.latest == 6L)
  }

  private def zstdBytes(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new com.github.luben.zstd.ZstdOutputStream(bos)
    try z.write(b) finally z.close()
    bos.toByteArray
  }

  private def sqliteFixture: Array[Byte] = {
    val in = getClass.getResourceAsStream("/state_fixture.db")
    require(in != null, "state_fixture.db test resource missing")
    try in.readAllBytes() finally in.close()
  }

  /** Assemble a reference-shaped bucket by hand: one event archive, a wire
    * module blob, metadata pointing at it. Returns the bucket root. */
  private def refBucket(did: String, m: ModuleDef,
      stateDb: Option[Array[Byte]]): java.nio.file.Path = {
    val dirP = graft.TempDirs.create("graft-refstate")
    val sdir = dirP.resolve(s"streams/$did")
    java.nio.file.Files.createDirectories(sdir)
    java.nio.file.Files.write(sdir.resolve("1-2.events.drisl.zstd"),
      zstdBytes(Drisl.encode(obj("events" -> graft.drisl.DValue.DArray(
        (1 to 2).toVector.map(i => obj(
          "idx" -> int(i), "user" -> text(s"ref$i"),
          "payload" -> graft.drisl.DValue.DBytes(payload(s"r$i", i)),
          "signature" -> graft.drisl.DValue.DBytes(Array.empty[Byte]))))))))
    val wire = Drisl.encode(BackupService.moduleToWire(m))
    val wireCid = graft.drisl.Cid.render(graft.drisl.Cid.of(wire))
    val mdir = dirP.resolve("modules")
    java.nio.file.Files.createDirectories(mdir)
    java.nio.file.Files.write(mdir.resolve(s"$wireCid.module.drisl.zstd"),
      zstdBytes(wire))
    java.nio.file.Files.write(sdir.resolve("metadata.drisl"), Drisl.encode(obj(
      "did" -> text(did),
      "did_key" -> graft.drisl.DValue.DNull,
      "owners" -> graft.drisl.DValue.DArray(Vector.empty),
      "module_cid" -> graft.drisl.DValue.DCid(graft.drisl.Cid.parse(wireCid)))))
    stateDb.foreach(db => java.nio.file.Files.write(
      sdir.resolve("state.db.zstd"), zstdBytes(db)))
    dirP
  }

  test("reference state.db.zstd (real SQLite file) restores into state tables") {
    // module whose state DDL matches the committed fixture's tables — the
    // reference archives state as the module's own DDL in a vacuumed
    // SQLite file (storage.rs:781-815)
    val m = module.copy(stateInitSql =
      """CREATE TABLE IF NOT EXISTS state_counts (k STRING, n BIGINT, avg DOUBLE) USING PARQUET;
        |CREATE TABLE IF NOT EXISTS state_sessions (sid BIGINT, who STRING, blob_v BINARY, note STRING) USING PARQUET""".stripMargin)
    val dirP = refBucket("did:test:sdb", m, Some(sqliteFixture))
    val store2 = new StreamStore(spark,
      graft.TempDirs.create("graft-sdb-store").toString)
    val (r, _) = BackupService.importReference(
      store2, "did:test:sdb-local", "file:" + dirP, "did:test:sdb")
    assert(r.latest == 2L)
    val counts = r.tableDF("state_counts").collect()
    assert(counts.length == 301)
    val byK = counts.filterNot(_.isNullAt(0))
      .map(x => x.getString(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    assert(byK("key_0123") == ((123L * 7, 123 / 3.0)))
    val nullRow = counts.find(_.isNullAt(0)).get
    assert(nullRow.getLong(1) == -42L && nullRow.isNullAt(2))
    val sess = r.tableDF("state_sessions").collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(sess.keySet == Set(7L, 9001L, 9002L))
    assert(sess(7L).getString(1) == "alice" &&
      sess(7L).getAs[Array[Byte]](2).toSeq == Seq[Byte](1, 2, 3, 4, 5))
    assert(sess(9001L).getString(3) == "x" * 5000,
      "overflow-chain payload must reassemble whole")
  }

  test("state.db.zstd with DECIMAL columns and a quoted rowid alias restores") {
    val tricky = {
      val in = getClass.getResourceAsStream("/state_tricky.db")
      require(in != null, "state_tricky.db test resource missing")
      try in.readAllBytes() finally in.close()
    }
    val m = module.copy(stateInitSql =
      """CREATE TABLE IF NOT EXISTS state_tricky (id BIGINT, session_id BIGINT, note STRING) USING PARQUET;
        |CREATE TABLE IF NOT EXISTS state_prices (k STRING, price DECIMAL(10,2)) USING PARQUET""".stripMargin)
    val dirP = refBucket("did:test:tricky", m, Some(tricky))
    val store2 = new StreamStore(spark,
      graft.TempDirs.create("graft-tricky-store").toString)
    val (r, _) = BackupService.importReference(
      store2, "did:test:tricky-local", "file:" + dirP, "did:test:tricky")
    val t = r.tableDF("state_tricky").collect()
      .map(x => x.getString(2) -> ((x.getLong(0), x.getLong(1)))).toMap
    assert(t("a") == ((5L, 42L)),
      "quoted session_id must carry the rowid alias; id must keep its value")
    assert(t("b")._1 == 6L && t("b")._2 > 42L)
    val prices = r.tableDF("state_prices").collect()
      .map(x => x.getString(0) ->
        (if (x.isNullAt(1)) null else x.getDecimal(1))).toMap
    assert(prices("int") == new java.math.BigDecimal("2.00"))
    assert(prices("frac") == new java.math.BigDecimal("2.50"),
      "non-integral NUMERIC value must restore into the DECIMAL column")
    assert(prices("none") == null)
  }

  test("state.db.zstd that cannot map onto the module is refused, no stream left") {
    // module WITHOUT the fixture's state tables: restore-or-reject means
    // the import fails loudly and leaves nothing behind — never a stream
    // with silently-missing state
    val dirP = refBucket("did:test:sdbbad", module, Some(sqliteFixture))
    val store2 = new StreamStore(spark,
      graft.TempDirs.create("graft-sdbbad-store").toString)
    val e = intercept[IllegalArgumentException](BackupService.importReference(
      store2, "did:test:sdbbad-local", "file:" + dirP, "did:test:sdbbad"))
    assert(e.getMessage.contains("refusing a partial state restore"), e.getMessage)
    assert(!store2.exists("did:test:sdbbad-local"),
      "a failed import must not leave a partially-created stream")
    assert(store2.listStreams().isEmpty)
  }

  test("failed mid-replay import cleans up the partial stream") {
    // chain validates (1-2 then 3-4) but the SECOND object's contents are
    // corrupt — the failure happens after batches of the first object
    // already imported, and the partial stream must be deleted
    val dirP = refBucket("did:test:midfail", module, None)
    val sdir = dirP.resolve("streams/did:test:midfail")
    java.nio.file.Files.write(sdir.resolve("3-4.events.drisl.zstd"),
      zstdBytes(Drisl.encode(obj("events" -> graft.drisl.DValue.DArray(
        Vector(obj("idx" -> int(3), "user" -> text("x"),
          "payload" -> graft.drisl.DValue.DBytes(Array.empty[Byte]),
          "signature" -> graft.drisl.DValue.DBytes(Array.empty[Byte])),
          text("not-an-event")))))))
    val store2 = new StreamStore(spark,
      graft.TempDirs.create("graft-midfail-store").toString)
    val e = intercept[IllegalArgumentException](BackupService.importReference(
      store2, "did:test:midfail-local", "file:" + dirP, "did:test:midfail"))
    assert(e.getMessage.contains("non-map event"), e.getMessage)
    assert(!store2.exists("did:test:midfail-local"))
  }

  test("restore refuses a non-empty target") {
    val dir = graft.TempDirs.create("graft-bakdir2").toString
    val h = store.open("did:test:bak")
    BackupService.backup(h, dir)
    assertThrows[IllegalArgumentException](
      BackupService.restore(store, "did:test:bak", dir))
  }

  test("QueryCtx CACHE/UNCACHE allows only single-part names — a dotted " +
    "name could evict other streams' caches in the shared catalog") {
    import graft.stream.SqlClassifier
    import graft.stream.SqlClassifier.QueryCtx
    // the allowance: (un)caching a temp view this query staged
    assert(SqlClassifier.check(spark, QueryCtx, "CACHE TABLE pool").isRight)
    assert(SqlClassifier.check(spark, QueryCtx,
      "UNCACHE TABLE IF EXISTS pool").isRight)
    // cross-database reach is rejected (CacheTable is a Command, so the
    // regex miss falls through to the read-only gate)
    assert(SqlClassifier.check(spark, QueryCtx,
      "CACHE TABLE graft_other_stream.events").isLeft)
    assert(SqlClassifier.check(spark, QueryCtx,
      "UNCACHE TABLE graft_other_stream.notes").isLeft)
    // the creating form stays rejected
    assert(SqlClassifier.check(spark, QueryCtx,
      "CACHE TABLE t AS SELECT 1").isLeft)
  }
}
