package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.Base64

import org.scalatest.funsuite.AnyFunSuite

import graft.drisl.DValue._
import graft.drisl.Drisl
import graft.server.{Json, LeafServer}
import graft.stream.StreamStore

/** End-to-end RPC surface test: upload module → create stream → events →
  * query → subscription poll → state → admin, over real HTTP. */
class ServerSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private lazy val store = new StreamStore(spark,
    graft.TempDirs.create("graft-server").toString)
  private lazy val server = {
    val s = new LeafServer(store, 0, authToken = Some("testtoken"))
    s.start(); s
  }
  private lazy val client = HttpClient.newHttpClient()

  private def post(path: String, body: Map[String, Any],
      token: Option[String] = Some("testtoken"),
      did: Option[String] = None): Map[String, Any] = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${server.boundPort}$path"))
      .POST(HttpRequest.BodyPublishers.ofString(Json.render(body)))
    token.foreach(t => b.header("Authorization", s"Bearer $t"))
    did.foreach(d => b.header("X-Graft-Did", d))
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    Json.parse(resp.body()).asInstanceOf[Map[String, Any]]
  }

  private def ok(resp: Map[String, Any]): Map[String, Any] = {
    assert(!resp.contains("err"), s"rpc error: ${resp.get("err")}")
    resp("ok") match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case other => Map("value" -> other)
    }
  }

  private def payload(content: String, n: Long): String =
    Base64.getEncoder.encodeToString(
      Drisl.encode(obj("content" -> text(content), "n" -> int(n))))

  test("full RPC lifecycle over HTTP") {
    // module upload
    val cid = ok(post("/module/upload", Map("module" -> Map(
      "init_sql" -> "CREATE TABLE IF NOT EXISTS notes (idx BIGINT, who STRING, content STRING, n BIGINT) USING PARQUET",
      "materializer" -> "INSERT INTO notes SELECT idx, user, drisl_extract(payload, '.content'), drisl_extract_long(payload, '.n') FROM event",
      "queries" -> Map(
        "list" -> Map("sql" -> "SELECT idx, who, content, n FROM notes WHERE idx BETWEEN $start AND $start + $limit - 1 ORDER BY idx"),
        "over" -> Map(
          "sql" -> "SELECT content FROM notes WHERE n > $min ORDER BY idx",
          "params" -> Vector(Map("name" -> "min", "kind" -> "integer")))))))
    )("cid").asInstanceOf[String]
    assert(cid.startsWith("b"))
    assert(ok(post("/module/exists", Map("cid" -> cid)))("exists") == true)
    assert(ok(post("/module/exists", Map("cid" -> "bogus")))("exists") == false)

    // stream create + info
    val sid = ok(post("/stream/create", Map("id" -> "did:graft:rpc", "module_cid" -> cid)))("id").toString
    val info0 = ok(post("/stream/info", Map("id" -> sid)))
    assert(info0("module_cid") == cid && info0("latest_idx") == 0L)

    // event batch
    val r1 = ok(post("/stream/event_batch", Map("id" -> sid, "events" -> Vector(
      Map("user" -> "ann", "payload_b64" -> payload("alpha", 1)),
      Map("user" -> "bob", "payload_b64" -> payload("beta", 5))))))
    assert(r1("latest_idx") == 2L)

    // one-shot query
    val rows = ok(post("/stream/query", Map("id" -> sid,
      "query" -> Map("name" -> "list"))))("rows").asInstanceOf[Vector[Any]]
    assert(rows.size == 2)
    val row0 = rows(0).asInstanceOf[Map[String, Any]]
    assert(row0("content").asInstanceOf[Map[String, Any]]("value") == "alpha")
    assert(row0("idx").asInstanceOf[Map[String, Any]]("$type") ==
      "muni.town.sqliteValue.integer")

    // parameterized query
    val over = ok(post("/stream/query", Map("id" -> sid,
      "query" -> Map("name" -> "over", "params" -> Map("min" -> 2L)))))("rows")
      .asInstanceOf[Vector[Any]]
    assert(over.size == 1)

    // param validation error surfaces as err
    val bad = post("/stream/query", Map("id" -> sid,
      "query" -> Map("name" -> "over", "params" -> Map("nope" -> 1L))))
    assert(bad.contains("err"))

    // subscription: backfill + incremental poll
    val subId = ok(post("/stream/subscribe_events", Map("id" -> sid,
      "query" -> Map("name" -> "list", "start" -> 1L))))("sub_id").asInstanceOf[Long]
    val d1 = ok(post("/stream/poll", Map("id" -> sid, "sub_id" -> subId)))("deliveries")
      .asInstanceOf[Vector[Any]]
    assert(d1.size == 1)
    assert(d1(0).asInstanceOf[Map[String, Any]]("rows").asInstanceOf[Vector[Any]].size == 2)
    ok(post("/stream/event_batch", Map("id" -> sid, "events" -> Vector(
      Map("user" -> "cyd", "payload_b64" -> payload("gamma", 9))))))
    val d2 = ok(post("/stream/poll", Map("id" -> sid, "sub_id" -> subId)))("deliveries")
      .asInstanceOf[Vector[Any]]
    assert(d2.size == 1)
    val newRows = d2(0).asInstanceOf[Map[String, Any]]("rows").asInstanceOf[Vector[Any]]
    assert(newRows.size == 1, "poll after new events must deliver only the new row")
    ok(post("/stream/unsubscribe", Map("id" -> sid, "sub_id" -> subId)))

    // admin + auth
    val streams = ok(post("/admin/list_streams", Map.empty))("streams").asInstanceOf[Vector[Any]]
    assert(streams.contains(sid))
    assert(post("/stream/info", Map("id" -> sid), token = None).contains("err"))
    assert(post("/stream/info", Map("id" -> sid), token = Some("wrong")).contains("err"))

    // unknown stream ids error instead of silently creating a stream
    val missing = post("/stream/info", Map("id" -> "did:graft:nope"))
    assert(missing.get("err").exists(_.toString.contains("not found")), missing.toString)
    assert(post("/stream/event_batch", Map("id" -> "did:graft:nope2",
      "events" -> Vector())).contains("err"))
  }

  private def uploadModule(): String =
    ok(post("/module/upload", Map("module" -> Map(
      "init_sql" -> "CREATE TABLE IF NOT EXISTS notes (idx BIGINT, who STRING, content STRING, n BIGINT) USING PARQUET",
      "materializer" -> "INSERT INTO notes SELECT idx, user, drisl_extract(payload, '.content'), drisl_extract_long(payload, '.n') FROM event",
      "queries" -> Map("list" -> Map(
        "sql" -> "SELECT idx, who, content, n FROM notes WHERE idx BETWEEN $start AND $start + $limit - 1 ORDER BY idx"))))))(
      "cid").asInstanceOf[String]

  test("push delivery: long-poll receives new events without /stream/poll") {
    val cid = uploadModule()
    val sid = ok(post("/stream/create",
      Map("id" -> "did:graft:push", "module_cid" -> cid)))("id").toString
    val subId = ok(post("/stream/subscribe_events", Map("id" -> sid,
      "query" -> Map("name" -> "list"))))("sub_id").asInstanceOf[Long]

    // park a long-poll BEFORE any events exist, then append concurrently
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val parked = Future(post("/stream/events_push",
      Map("id" -> sid, "sub_id" -> subId, "timeout_ms" -> 30000L)))
    Thread.sleep(300) // let the long-poll park
    ok(post("/stream/event_batch", Map("id" -> sid, "events" -> Vector(
      Map("user" -> "ann", "payload_b64" -> payload("pushed", 1))))))
    val deliveries = ok(Await.result(parked, 60.seconds))("deliveries")
      .asInstanceOf[Vector[Any]]
    assert(deliveries.nonEmpty, "long-poll must wake on the new event")
    val rows = deliveries(0).asInstanceOf[Map[String, Any]]("rows").asInstanceOf[Vector[Any]]
    assert(rows.size == 1)
    // an immediate long-poll with nothing pending returns empty at timeout
    val empty = ok(post("/stream/events_push",
      Map("id" -> sid, "sub_id" -> subId, "timeout_ms" -> 200L)))("deliveries")
      .asInstanceOf[Vector[Any]]
    assert(empty.isEmpty)
  }

  test("owner ACLs gate update_module, clear_state and set_handle") {
    val cid = uploadModule()
    val sid = ok(post("/stream/create",
      Map("id" -> "did:graft:owned", "module_cid" -> cid),
      did = Some("did:plc:alice")))("id").toString

    // a different DID cannot mutate
    for (bad <- Seq(
        post("/stream/update_module", Map("id" -> sid, "module_cid" -> cid),
          did = Some("did:plc:mallory")),
        post("/stream/clear_state", Map("id" -> sid), did = Some("did:plc:mallory")),
        post("/stream/set_handle", Map("id" -> sid, "handle" -> "evil.example"),
          did = Some("did:plc:mallory")),
        post("/stream/clear_state", Map("id" -> sid)))) // no identity at all
      assert(bad.get("err").exists(_.toString.contains("owner") ||
        bad("err").toString.contains("creator")), bad.toString)

    // the owner can
    ok(post("/stream/update_module", Map("id" -> sid, "module_cid" -> cid),
      did = Some("did:plc:alice")))
    ok(post("/stream/set_handle", Map("id" -> sid, "handle" -> "alice.example"),
      did = Some("did:plc:alice")))
    assert(ok(post("/stream/info", Map("id" -> sid)))("handle") == "alice.example")
    ok(post("/stream/clear_state", Map("id" -> sid), did = Some("did:plc:alice")))
  }

  test("DRISL request/response bodies round-trip (reference wire encoding)") {
    val cid = uploadModule()
    val sid = ok(post("/stream/create",
      Map("id" -> "did:graft:drisl", "module_cid" -> cid)))("id").toString
    // event batch as a DRISL body: payload carried as raw bytes, no base64
    val body = Drisl.encode(obj(
      "id" -> text(sid),
      "events" -> arr(obj(
        "user" -> text("dru"),
        "payload" -> graft.drisl.DValue.DBytes(
          Drisl.encode(obj("content" -> text("wire"), "n" -> int(7))))))))
    val req = HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:${server.boundPort}/stream/event_batch"))
      .POST(HttpRequest.BodyPublishers.ofByteArray(body))
      .header("Authorization", "Bearer testtoken")
      .header("Content-Type", "application/drisl")
      .header("Accept", "application/drisl")
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofByteArray())
    val dec = Drisl.decode(resp.body()).asInstanceOf[graft.drisl.DValue.DMap]
    val okMap = dec.v("ok").asInstanceOf[graft.drisl.DValue.DMap]
    assert(okMap.v("latest_idx") == graft.drisl.DValue.DInt(1L), dec.toString)
    // the event landed with its payload intact
    val rows = ok(post("/stream/query", Map("id" -> sid,
      "query" -> Map("name" -> "list"))))("rows").asInstanceOf[Vector[Any]]
    assert(rows.size == 1)
    assert(rows(0).asInstanceOf[Map[String, Any]]("content")
      .asInstanceOf[Map[String, Any]]("value") == "wire")
  }

  test("JWT auth verifies identity end-to-end and feeds the ACLs") {
    import java.security.KeyPairGenerator
    import java.security.spec.ECGenParameterSpec
    val kpg = KeyPairGenerator.getInstance("EC")
    kpg.initialize(new ECGenParameterSpec("secp256r1"))
    val alice = kpg.generateKeyPair()
    val bob = kpg.generateKeyPair()
    val keys = Map(
      "did:plc:alice" -> graft.server.JwtAuth.P256(alice.getPublic),
      "did:plc:bob" -> graft.server.JwtAuth.P256(bob.getPublic))
    val jwtServer = new graft.server.LeafServer(store, 0,
      jwt = Some(new graft.server.JwtAuth("did:web:graft.test", keys.get)))
    jwtServer.start()
    try {
      def tok(did: String, key: java.security.PrivateKey): String = {
        val b64 = (b: Array[Byte]) =>
          java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(b)
        val h = b64(Json.render(Map("alg" -> "ES256")).getBytes("UTF-8"))
        val c = b64(Json.render(Map(
          "iss" -> did, "aud" -> "did:web:graft.test",
          "lxm" -> "town.muni.leaf.authenticate",
          "exp" -> (System.currentTimeMillis() / 1000 + 600))).getBytes("UTF-8"))
        val signer = java.security.Signature.getInstance("SHA256withECDSA")
        signer.initSign(key); signer.update(s"$h.$c".getBytes("UTF-8"))
        val der = signer.sign()
        // DER -> raw r||s
        def readInt(at: Int): (Array[Byte], Int) = {
          val len = der(at + 1) & 0xff
          (der.slice(at + 2, at + 2 + len).dropWhile(_ == 0), at + 2 + len)
        }
        val (r, next) = readInt(2); val (s, _) = readInt(next)
        def pad(b: Array[Byte]) = Array.fill[Byte](32 - b.length)(0) ++ b
        s"$h.$c.${b64(pad(r) ++ pad(s))}"
      }
      def jpost(path: String, body: Map[String, Any], bearer: Option[String]): Map[String, Any] = {
        val b = HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${jwtServer.boundPort}$path"))
          .POST(HttpRequest.BodyPublishers.ofString(Json.render(body)))
        bearer.foreach(t => b.header("Authorization", s"Bearer $t"))
        Json.parse(client.send(b.build(),
          HttpResponse.BodyHandlers.ofString()).body()).asInstanceOf[Map[String, Any]]
      }
      val cid = uploadModule()
      // no/invalid token rejected
      assert(jpost("/stream/info", Map("id" -> "x"), None).contains("err"))
      assert(jpost("/stream/info", Map("id" -> "x"), Some("garbage")).contains("err"))
      // an untrusted (JWT) caller may not choose the stream id — that is
      // the takeover-by-create channel (attach to an existing stream,
      // swap its module, mint owner rights)
      val chose = jpost("/stream/create",
        Map("id" -> "did:graft:jwt", "module_cid" -> cid),
        Some(tok("did:plc:alice", alice.getPrivate)))
      assert(chose.get("err").exists(_.toString.contains("trusted")), chose.toString)
      // alice creates (JWT identity becomes the owner), bob cannot mutate
      val sid = jpost("/stream/create", Map("module_cid" -> cid),
        Some(tok("did:plc:alice", alice.getPrivate)))("ok")
        .asInstanceOf[Map[String, Any]]("id").toString
      val denied = jpost("/stream/clear_state", Map("id" -> sid),
        Some(tok("did:plc:bob", bob.getPrivate)))
      assert(denied.get("err").exists(_.toString.contains("owner")), denied.toString)
      assert(!jpost("/stream/clear_state", Map("id" -> sid),
        Some(tok("did:plc:alice", alice.getPrivate))).contains("err"))
      // a JWT (untrusted) connection may not override event users...
      val overr = jpost("/stream/event_batch", Map("id" -> sid, "events" -> Vector(
        Map("user" -> "someone-else", "payload_b64" -> payload("x", 1)))),
        Some(tok("did:plc:alice", alice.getPrivate)))
      assert(overr.get("err").exists(_.toString.contains("user_override")), overr.toString)
      // ...but its own events land under the verified issuer identity
      assert(!jpost("/stream/event_batch", Map("id" -> sid, "events" -> Vector(
        Map("payload_b64" -> payload("mine", 2)))),
        Some(tok("did:plc:alice", alice.getPrivate))).contains("err"))
      // admin RPCs are trusted-connection only
      val adm = jpost("/admin/list_streams", Map.empty,
        Some(tok("did:plc:alice", alice.getPrivate)))
      assert(adm.get("err").exists(_.toString.contains("trusted")), adm.toString)
    } finally jwtServer.stop()
  }

  test("admin compaction RPC rewrites a stream's log files") {
    val cid = uploadModule()
    val sid = ok(post("/stream/create",
      Map("id" -> "did:graft:compact", "module_cid" -> cid)))("id").toString
    (1 to 3).foreach(i => ok(post("/stream/event_batch", Map("id" -> sid,
      "events" -> Vector(Map("user" -> "u", "payload_b64" -> payload(s"m$i", i)))))))
    assert(ok(post("/admin/compact", Map("id" -> sid)))("files") == 1L)
    val rows = ok(post("/stream/query", Map("id" -> sid,
      "query" -> Map("name" -> "list"))))("rows").asInstanceOf[Vector[Any]]
    assert(rows.size == 3)
  }

  test("full user journey: upload -> create -> events -> subscribe -> swap -> backup -> restore") {
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val cid = uploadModule()
    val sid = ok(post("/stream/create",
      Map("id" -> "did:graft:journey", "module_cid" -> cid),
      did = Some("did:plc:journey")))("id").toString
    // live subscription with backfill from the start
    val subId = ok(post("/stream/subscribe_events", Map("id" -> sid,
      "query" -> Map("name" -> "list", "start" -> 1L))))("sub_id").asInstanceOf[Long]
    ok(post("/stream/event_batch", Map("id" -> sid, "events" -> Vector(
      Map("user" -> "j1", "payload_b64" -> payload("first", 1)),
      Map("user" -> "j2", "payload_b64" -> payload("second", 2))))))
    val pushed = ok(post("/stream/events_push",
      Map("id" -> sid, "sub_id" -> subId, "timeout_ms" -> 30000L)))("deliveries")
      .asInstanceOf[Vector[Any]]
    assert(pushed.flatMap(_.asInstanceOf[Map[String, Any]]("rows")
      .asInstanceOf[Vector[Any]]).size == 2)
    // swap to a counting module (owner-gated), full replay
    val cid2 = ok(post("/module/upload", Map("module" -> Map(
      "init_sql" -> "CREATE TABLE IF NOT EXISTS totals (n BIGINT) USING PARQUET",
      "materializer" -> "INSERT INTO totals SELECT drisl_extract_long(payload, '.n') FROM event",
      "queries" -> Map("sum" -> Map(
        "sql" -> "SELECT CAST(sum(n) AS BIGINT) AS s FROM totals"))))))("cid").toString
    ok(post("/stream/update_module", Map("id" -> sid, "module_cid" -> cid2),
      did = Some("did:plc:journey")))
    val s1 = ok(post("/stream/query", Map("id" -> sid,
      "query" -> Map("name" -> "sum"))))("rows").asInstanceOf[Vector[Any]]
    assert(s1.head.asInstanceOf[Map[String, Any]]("s")
      .asInstanceOf[Map[String, Any]]("value") == 3L)
    // backup server-side, restore as a new stream, same answers
    val bak = "file:" + graft.TempDirs.create("graft-journey-bak")
    graft.stream.BackupService.backup(store.open(sid), bak)
    graft.stream.BackupService.restore(store, "did:graft:journey2", bak)
    val s2 = ok(post("/stream/query", Map("id" -> "did:graft:journey2",
      "query" -> Map("name" -> "sum"))))("rows").asInstanceOf[Vector[Any]]
    assert(s2 == s1, "restored stream must answer identically")
  }

  test("create of an existing stream id is rejected (takeover-by-create)") {
    val cid = uploadModule()
    val sid = ok(post("/stream/create",
      Map("id" -> "did:graft:victim", "module_cid" -> cid),
      did = Some("did:plc:victim")))("id").toString
    (1 to 2).foreach(i => ok(post("/stream/event_batch", Map("id" -> sid,
      "events" -> Vector(Map("user" -> "v", "payload_b64" -> payload(s"v$i", i)))))))
    // re-creating the same id would attach to the existing stream, swap its
    // module (dropping its tables) and add the caller as an owner
    val hijack = post("/stream/create",
      Map("id" -> sid, "module_cid" -> cid), did = Some("did:plc:mallory"))
    assert(hijack.get("err").exists(_.toString.contains("already exists")), hijack.toString)
    // the victim's data and ownership are intact
    val rows = ok(post("/stream/query", Map("id" -> sid,
      "query" -> Map("name" -> "list"))))("rows").asInstanceOf[Vector[Any]]
    assert(rows.size == 2)
    assert(post("/stream/clear_state", Map("id" -> sid),
      did = Some("did:plc:mallory")).contains("err"))
  }

  test("takeover guard survives a server restart (disk-backed catalog)") {
    val rstore = new StreamStore(spark,
      graft.TempDirs.create("graft-restartguard").toString)
    def boot(): LeafServer = {
      val s = new LeafServer(rstore, 0, authToken = Some("testtoken"))
      s.start(); s
    }
    def postTo(srv: LeafServer, path: String, body: Map[String, Any],
        did: Option[String] = None): Map[String, Any] = {
      val b = HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${srv.boundPort}$path"))
        .POST(HttpRequest.BodyPublishers.ofString(Json.render(body)))
        .header("Authorization", "Bearer testtoken")
      did.foreach(d => b.header("X-Graft-Did", d))
      Json.parse(client.send(b.build(),
        HttpResponse.BodyHandlers.ofString()).body()).asInstanceOf[Map[String, Any]]
    }
    val first = boot()
    val cid = try {
      val c = postTo(first, "/module/upload", Map("module" -> Map(
        "init_sql" -> "CREATE TABLE IF NOT EXISTS notes (idx BIGINT) USING PARQUET",
        "materializer" -> "INSERT INTO notes SELECT idx FROM event")))(
        "ok").asInstanceOf[Map[String, Any]]("cid").toString
      assert(!postTo(first, "/stream/create", Map(
        "id" -> "did:graft:persisted", "module_cid" -> c),
        did = Some("did:plc:victim")).contains("err"))
      c
    } finally first.stop()
    // a FRESH server on the same store has no in-memory create history —
    // the guard must come from the on-disk catalog
    val second = boot()
    try {
      val hijack = postTo(second, "/stream/create", Map(
        "id" -> "did:graft:persisted", "module_cid" -> cid),
        did = Some("did:plc:mallory"))
      assert(hijack.get("err").exists(_.toString.contains("already exists")),
        hijack.toString)
      // and the admin list is rebuilt from disk, not from driver memory
      val listed = postTo(second, "/admin/list_streams", Map.empty)("ok")
        .asInstanceOf[Map[String, Any]]("streams").asInstanceOf[Vector[Any]]
      assert(listed.contains("did:graft:persisted"), listed.toString)
    } finally second.stop()
  }

  test("boot lifecycle: backup sweep and blob GC tick without explicit calls") {
    val lstore = new StreamStore(spark,
      graft.TempDirs.create("graft-lifecycle").toString)
    val dest = graft.TempDirs.create("graft-lifecycle-bak")
    val srv = new LeafServer(lstore, 0, authToken = Some("testtoken"),
      backupDest = Some("file:" + dest), backupSweepMs = 250,
      blobGcMs = 250, blobGcMinAgeMs = 1)
    srv.start()
    try {
      def lpost(path: String, body: Map[String, Any]): Map[String, Any] = {
        val b = HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${srv.boundPort}$path"))
          .POST(HttpRequest.BodyPublishers.ofString(Json.render(body)))
          .header("Authorization", "Bearer testtoken")
        Json.parse(client.send(b.build(),
          HttpResponse.BodyHandlers.ofString()).body()).asInstanceOf[Map[String, Any]]
      }
      def lok(r: Map[String, Any]) = {
        assert(!r.contains("err"), r.toString)
        r("ok").asInstanceOf[Map[String, Any]]
      }
      // an uploaded-but-never-referenced module is an orphaned staged blob
      val orphanCid = lok(lpost("/module/upload", Map("module" -> Map(
        "init_sql" -> "CREATE TABLE IF NOT EXISTS orphan_t (x BIGINT) USING PARQUET",
        "materializer" -> "INSERT INTO orphan_t SELECT idx FROM event"))))("cid").toString
      val usedCid = lok(lpost("/module/upload", Map("module" -> Map(
        "init_sql" -> "CREATE TABLE IF NOT EXISTS notes (idx BIGINT) USING PARQUET",
        "materializer" -> "INSERT INTO notes SELECT idx FROM event"))))("cid").toString
      val sid = lok(lpost("/stream/create", Map(
        "id" -> "did:graft:swept", "module_cid" -> usedCid)))("id").toString
      lok(lpost("/stream/event_batch", Map("id" -> sid, "events" ->
        Vector(Map("user" -> "u", "payload_b64" -> payload("swept", 1))))))
      val storeRoot = java.nio.file.Paths.get(lstore.root)
      val orphanBlob = storeRoot.resolve(s"modules/$orphanCid.json")
      val backupMeta = dest.resolve(s"streams/$sid/meta.json")
      val deadline = System.nanoTime + 30L * 1000000000L
      def covered = java.nio.file.Files.exists(backupMeta) &&
        "\"latest_idx\":(\\d+)".r.findFirstMatchIn(new String(
          java.nio.file.Files.readAllBytes(backupMeta), "UTF-8"))
          .exists(_.group(1).toLong >= 1L)
      def done = covered && !java.nio.file.Files.exists(orphanBlob)
      while (!done && System.nanoTime < deadline) Thread.sleep(100)
      assert(covered,
        "the boot-started sweep must archive the stream's event unprompted")
      assert(!java.nio.file.Files.exists(orphanBlob),
        "the boot-started GC must collect the orphaned staged blob")
      // the referenced module must survive the GC
      assert(java.nio.file.Files.exists(
        storeRoot.resolve(s"modules/$usedCid.json")))
    } finally srv.stop()
  }

  test("boot sweep can write reference-format buckets") {
    val lstore = new StreamStore(spark,
      graft.TempDirs.create("graft-refsweep").toString)
    val dest = graft.TempDirs.create("graft-refsweep-bak")
    val srv = new LeafServer(lstore, 0, authToken = Some("testtoken"),
      backupDest = Some("file:" + dest), backupReferenceFormat = true,
      backupSweepMs = 250)
    srv.start()
    try {
      def lpost(path: String, body: Map[String, Any]): Map[String, Any] = {
        val b = HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${srv.boundPort}$path"))
          .POST(HttpRequest.BodyPublishers.ofString(Json.render(body)))
          .header("Authorization", "Bearer testtoken")
        Json.parse(client.send(b.build(),
          HttpResponse.BodyHandlers.ofString()).body()).asInstanceOf[Map[String, Any]]
      }
      def lok(r: Map[String, Any]) = {
        assert(!r.contains("err"), r.toString)
        r("ok").asInstanceOf[Map[String, Any]]
      }
      val cid = lok(lpost("/module/upload", Map("module" -> Map(
        "init_sql" -> "CREATE TABLE IF NOT EXISTS notes (idx BIGINT) USING PARQUET",
        "materializer" -> "INSERT INTO notes SELECT idx FROM event"))))("cid").toString
      val sid = lok(lpost("/stream/create", Map(
        "id" -> "did:graft:refswept", "module_cid" -> cid)))("id").toString
      lok(lpost("/stream/event_batch", Map("id" -> sid, "events" ->
        Vector(Map("user" -> "u", "payload_b64" -> payload("rs", 1))))))
      val archive = dest.resolve(s"streams/$sid/1-1.events.drisl.zstd")
      val deadline = System.nanoTime + 30L * 1000000000L
      while (!java.nio.file.Files.exists(archive) && System.nanoTime < deadline)
        Thread.sleep(100)
      assert(java.nio.file.Files.exists(archive),
        "the sweep must write a reference-format event archive unprompted")
      assert(java.nio.file.Files.exists(dest.resolve(s"streams/$sid/metadata.drisl")))
      // ...and the bucket restores into a fresh store, module included
      val rstore = new StreamStore(spark,
        graft.TempDirs.create("graft-refsweep-restore").toString)
      val (r, _) = graft.stream.BackupService.importReference(
        rstore, "did:graft:refswept-restored", "file:" + dest, sid)
      assert(r.latest == 1L && r.currentModule.isDefined)
    } finally srv.stop()
  }

  test("slow consumer: delivery buffer is capped and resumes after a poll") {
    val tight = new LeafServer(store, 0, authToken = Some("testtoken"),
      maxBufferedDeliveries = 3)
    tight.start()
    try {
      def tpost(path: String, body: Map[String, Any]): Map[String, Any] = {
        val b = HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${tight.boundPort}$path"))
          .POST(HttpRequest.BodyPublishers.ofString(Json.render(body)))
          .header("Authorization", "Bearer testtoken")
        Json.parse(client.send(b.build(),
          HttpResponse.BodyHandlers.ofString()).body()).asInstanceOf[Map[String, Any]]
      }
      def tok2(r: Map[String, Any]) = { assert(!r.contains("err"), r.toString); r("ok").asInstanceOf[Map[String, Any]] }
      val cid = uploadModule()
      val sid = tok2(tpost("/stream/create",
        Map("id" -> "did:graft:slow", "module_cid" -> cid)))("id").toString
      // limit=1 → one event per delivery window: 10 events = 10 windows
      val subId = tok2(tpost("/stream/subscribe_events", Map("id" -> sid,
        "query" -> Map("name" -> "list", "start" -> 1L, "limit" -> 1L))))("sub_id")
        .asInstanceOf[Long]
      tok2(tpost("/stream/event_batch", Map("id" -> sid, "events" ->
        (1 to 10).map(i => Map("user" -> "u", "payload_b64" -> payload(s"m$i", i.toLong))).toVector)))
      // the eager push pumped until the cap, then paused — NOT 10 windows
      assert(tight.bufferedDeliveries(sid, subId) == 3,
        s"buffer must stop at the cap, got ${tight.bufferedDeliveries(sid, subId)}")
      // each poll takes the buffer and resumes the catch-up for the next one
      var total = 0
      for (_ <- 1 to 4) {
        val ds = tok2(tpost("/stream/poll", Map("id" -> sid, "sub_id" -> subId)))(
          "deliveries").asInstanceOf[Vector[Any]]
        assert(ds.size <= 3, s"a poll must never see more than the cap, got ${ds.size}")
        total += ds.map(_.asInstanceOf[Map[String, Any]]("rows")
          .asInstanceOf[Vector[Any]].size).sum
      }
      assert(total == 10, s"backpressure must not lose rows, got $total")
    } finally tight.stop()
  }

  test("idle subscriptions are evicted after the TTL") {
    val ttl = new LeafServer(store, 0, authToken = Some("testtoken"),
      subIdleTtlMs = 300)
    ttl.start()
    try {
      def tpost(path: String, body: Map[String, Any]): Map[String, Any] = {
        val b = HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${ttl.boundPort}$path"))
          .POST(HttpRequest.BodyPublishers.ofString(Json.render(body)))
          .header("Authorization", "Bearer testtoken")
        Json.parse(client.send(b.build(),
          HttpResponse.BodyHandlers.ofString()).body()).asInstanceOf[Map[String, Any]]
      }
      def tok2(r: Map[String, Any]) = { assert(!r.contains("err"), r.toString); r("ok").asInstanceOf[Map[String, Any]] }
      val cid = uploadModule()
      val sid = tok2(tpost("/stream/create",
        Map("id" -> "did:graft:idle", "module_cid" -> cid)))("id").toString
      val subId = tok2(tpost("/stream/subscribe_events", Map("id" -> sid,
        "query" -> Map("name" -> "list"))))("sub_id").asInstanceOf[Long]
      Thread.sleep(500) // past the TTL with no client activity
      // any append sweeps idle subs before pumping
      tok2(tpost("/stream/event_batch", Map("id" -> sid, "events" -> Vector(
        Map("user" -> "u", "payload_b64" -> payload("late", 1))))))
      val gone = tpost("/stream/poll", Map("id" -> sid, "sub_id" -> subId))
      assert(gone.get("err").exists(_.toString.contains("unknown subscription")),
        gone.toString)
      assert(ttl.bufferedDeliveries(sid, subId) == 0)
    } finally ttl.stop()
  }

  test("poll/unsubscribe are bound to the subscribing caller") {
    import java.security.KeyPairGenerator
    import java.security.spec.ECGenParameterSpec
    val kpg = KeyPairGenerator.getInstance("EC")
    kpg.initialize(new ECGenParameterSpec("secp256r1"))
    val alice = kpg.generateKeyPair()
    val bob = kpg.generateKeyPair()
    val keys = Map(
      "did:plc:suba" -> graft.server.JwtAuth.P256(alice.getPublic),
      "did:plc:subb" -> graft.server.JwtAuth.P256(bob.getPublic))
    val jsrv = new LeafServer(store, 0,
      jwt = Some(new graft.server.JwtAuth("did:web:graft.test", keys.get)))
    jsrv.start()
    try {
      def tok(did: String, key: java.security.PrivateKey): String = {
        val b64 = (b: Array[Byte]) =>
          java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(b)
        val h = b64(Json.render(Map("alg" -> "ES256")).getBytes("UTF-8"))
        val c = b64(Json.render(Map(
          "iss" -> did, "aud" -> "did:web:graft.test",
          "lxm" -> "town.muni.leaf.authenticate",
          "exp" -> (System.currentTimeMillis() / 1000 + 600))).getBytes("UTF-8"))
        val signer = java.security.Signature.getInstance("SHA256withECDSA")
        signer.initSign(key); signer.update(s"$h.$c".getBytes("UTF-8"))
        val der = signer.sign()
        def readInt(at: Int): (Array[Byte], Int) = {
          val len = der(at + 1) & 0xff
          (der.slice(at + 2, at + 2 + len).dropWhile(_ == 0), at + 2 + len)
        }
        val (r, next) = readInt(2); val (s, _) = readInt(next)
        def pad(b: Array[Byte]) = Array.fill[Byte](32 - b.length)(0) ++ b
        s"$h.$c.${b64(pad(r) ++ pad(s))}"
      }
      def jpost(path: String, body: Map[String, Any], bearer: String): Map[String, Any] = {
        val b = HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${jsrv.boundPort}$path"))
          .POST(HttpRequest.BodyPublishers.ofString(Json.render(body)))
          .header("Authorization", s"Bearer $bearer")
        Json.parse(client.send(b.build(),
          HttpResponse.BodyHandlers.ofString()).body()).asInstanceOf[Map[String, Any]]
      }
      val aliceTok = tok("did:plc:suba", alice.getPrivate)
      val bobTok = tok("did:plc:subb", bob.getPrivate)
      val cid = uploadModule()
      val sid = jpost("/stream/create", Map("module_cid" -> cid), aliceTok)("ok")
        .asInstanceOf[Map[String, Any]]("id").toString
      val subId = jpost("/stream/subscribe_events", Map("id" -> sid,
        "query" -> Map("name" -> "list", "start" -> 1L)), aliceTok)("ok")
        .asInstanceOf[Map[String, Any]]("sub_id").asInstanceOf[Long]
      // bob can neither read alice's deliveries nor kill her subscription
      for (stolen <- Seq(
          jpost("/stream/poll", Map("id" -> sid, "sub_id" -> subId), bobTok),
          jpost("/stream/events_push",
            Map("id" -> sid, "sub_id" -> subId, "timeout_ms" -> 100L), bobTok),
          jpost("/stream/unsubscribe", Map("id" -> sid, "sub_id" -> subId), bobTok)))
        assert(stolen.get("err").exists(_.toString.contains("different caller")),
          stolen.toString)
      // alice still can
      assert(!jpost("/stream/poll",
        Map("id" -> sid, "sub_id" -> subId), aliceTok).contains("err"))
      assert(!jpost("/stream/unsubscribe",
        Map("id" -> sid, "sub_id" -> subId), aliceTok).contains("err"))
    } finally jsrv.stop()
  }

  test("module upload larger than 10MB is rejected") {
    val big = "x" * (10 * 1024 * 1024 + 100)
    val r = post("/module/upload", Map("module" -> Map("init_sql" -> big)))
    assert(r.get("err").exists(_.toString.contains("maximum size")), r.toString)
  }

  test("json parser caps container nesting (no stack overflow on [[[…)") {
    val hostile = "[" * 100000 + "]" * 100000
    val e = intercept[IllegalArgumentException](graft.server.Json.parse(hostile))
    assert(e.getMessage.contains("nesting"))
    // shallow documents still parse
    assert(graft.server.Json.parse("[[[1]]]") ==
      Vector(Vector(Vector(1L))))
  }
}
