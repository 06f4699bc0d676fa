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

  test("full-bucket disaster recovery: streams, state.db, ACLs, key custody") {
    import graft.stream.BackupService
    import graft.drisl.{Cid, DValue}
    def zstdBytes(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new com.github.luben.zstd.ZstdOutputStream(bos)
      try z.write(b) finally z.close()
      bos.toByteArray
    }
    val bucketDir = graft.TempDirs.create("graft-dr-bucket")
    val bucket = "file:" + bucketDir
    val secretA = java.security.MessageDigest.getInstance("SHA-256")
      .digest("dr-a-key".getBytes)

    // --- stream A: hand-built in the reference's own producer shape —
    // wire module blob, event archives, metadata carrying did_key +
    // owners, and a vacuumed-SQLite state.db.zstd (the committed
    // real-SQLite fixture)
    val didA = "did:graft:dr-a"
    val mA = graft.types.ModuleDef(
      initSql = "CREATE TABLE IF NOT EXISTS notes (idx BIGINT, who STRING, content STRING) USING PARQUET",
      materializer = "INSERT INTO notes SELECT idx, user, drisl_extract(payload, '.content') FROM event",
      stateInitSql =
        """CREATE TABLE IF NOT EXISTS state_counts (k STRING, n BIGINT, avg DOUBLE) USING PARQUET;
          |CREATE TABLE IF NOT EXISTS state_sessions (sid BIGINT, who STRING, blob_v BINARY, note STRING) USING PARQUET""".stripMargin,
      queries = Map(
        "notes" -> graft.types.QueryDef(
          "SELECT idx, who, content FROM notes ORDER BY idx"),
        "counts" -> graft.types.QueryDef(
          "SELECT count(*) AS c FROM state_counts")))
    val wireA = Drisl.encode(BackupService.moduleToWire(mA))
    val cidA = Cid.render(Cid.of(wireA))
    val sdirA = bucketDir.resolve(s"streams/$didA")
    java.nio.file.Files.createDirectories(sdirA)
    java.nio.file.Files.createDirectories(bucketDir.resolve("modules"))
    java.nio.file.Files.write(
      bucketDir.resolve(s"modules/$cidA.module.drisl.zstd"), zstdBytes(wireA))
    def rawPayload(content: String): Array[Byte] =
      Drisl.encode(obj("content" -> text(content), "n" -> int(1)))
    java.nio.file.Files.write(sdirA.resolve("1-2.events.drisl.zstd"),
      zstdBytes(Drisl.encode(obj("events" -> DValue.DArray(Vector(
        obj("idx" -> int(1), "user" -> text("did:user:alice"),
          "payload" -> DValue.DBytes(rawPayload("hello")),
          "signature" -> DValue.DBytes(Array.empty[Byte])),
        obj("idx" -> int(2), "user" -> text("did:user:alice"),
          "payload" -> DValue.DBytes(rawPayload("world")),
          "signature" -> DValue.DBytes(Array.empty[Byte]))))))))
    val sqliteFixture = {
      val in = getClass.getResourceAsStream("/state_fixture.db")
      require(in != null, "state_fixture.db test resource missing")
      try in.readAllBytes() finally in.close()
    }
    java.nio.file.Files.write(sdirA.resolve("state.db.zstd"),
      zstdBytes(sqliteFixture))
    java.nio.file.Files.write(sdirA.resolve("metadata.drisl"),
      Drisl.encode(obj(
        "did" -> text(didA),
        "did_key" -> obj("K256" -> DValue.DBytes(secretA)),
        "owners" -> DValue.DArray(Vector(text("did:user:alice"))),
        "module_cid" -> DValue.DCid(Cid.parse(cidA)))))

    // --- streams B and C: exported by this engine's own sweep-format
    // path; C will also be pre-created locally so restore must skip it
    val srcStore = new StreamStore(spark,
      graft.TempDirs.create("graft-dr-src").toString)
    val mB = graft.types.ModuleDef(
      initSql = "CREATE TABLE IF NOT EXISTS notes (idx BIGINT) USING PARQUET",
      materializer = "INSERT INTO notes SELECT idx FROM event",
      queries = Map("n" -> graft.types.QueryDef(
        "SELECT count(*) AS c FROM notes")))
    val hB = srcStore.createStream("did:graft:dr-b", mB)
    hB.addEvents(Seq(
      graft.types.IncomingEvent("did:user:bob", rawPayload("b1")),
      graft.types.IncomingEvent("did:user:bob", rawPayload("b2")),
      graft.types.IncomingEvent("did:user:bob", rawPayload("b3"))))
    BackupService.exportReference(hB, bucket, owners = Seq("did:user:bob"))
    val hC = srcStore.createStream("did:graft:dr-c", mB)
    hC.addEvents(Seq(graft.types.IncomingEvent("did:user:carol", rawPayload("c1"))))
    BackupService.exportReference(hC, bucket)

    // --- boot a fresh server against the bucket
    val dstStore = new StreamStore(spark,
      graft.TempDirs.create("graft-dr-dst").toString)
    dstStore.createStream("did:graft:dr-c", mB) // pre-existing local stream
    val plcDir = new graft.server.LocalPlcDirectory
    val srv = new LeafServer(dstStore, 0, authToken = Some("testtoken"),
      plc = Some(plcDir), restoreFrom = Some(bucket))
    srv.start()
    try {
      def dpost(path: String, body: Map[String, Any],
          did: Option[String] = None): Map[String, Any] = {
        val b = HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${srv.boundPort}$path"))
          .POST(HttpRequest.BodyPublishers.ofString(Json.render(body)))
          .header("Authorization", "Bearer testtoken")
        did.foreach(d => b.header("X-Graft-Did", d))
        Json.parse(client.send(b.build(),
          HttpResponse.BodyHandlers.ofString()).body()).asInstanceOf[Map[String, Any]]
      }
      def dok(r: Map[String, Any]) = {
        assert(!r.contains("err"), r.toString)
        r("ok").asInstanceOf[Map[String, Any]]
      }
      // all three bucket streams are local now; a SECOND restore call
      // skips every one of them (the already-local warn path)
      val again = srv.restoreFromBucket(bucket)
      assert(again.restored.isEmpty && again.failed.isEmpty)
      assert(again.skipped.toSet ==
        Set(didA, "did:graft:dr-b", "did:graft:dr-c"))
      // events and modules restored
      assert(dok(dpost("/stream/info", Map("id" -> didA)))("latest_idx") == 2L)
      assert(dok(dpost("/stream/info",
        Map("id" -> "did:graft:dr-b")))("latest_idx") == 3L)
      // the pre-existing local stream was skipped, not clobbered by the
      // bucket's 1-event copy
      assert(dok(dpost("/stream/info",
        Map("id" -> "did:graft:dr-c")))("latest_idx") == 0L)
      // state.db.zstd restored through the SQLite reader into state tables
      val counts = dok(dpost("/stream/query", Map("id" -> didA,
        "query" -> Map("name" -> "counts"))))("rows").asInstanceOf[Vector[Any]]
      assert(counts.head.asInstanceOf[Map[String, Any]]("c")
        .asInstanceOf[Map[String, Any]]("value") == 301L)
      // restored ACLs gate owner-only RPCs: a non-owner is rejected, the
      // bucket's recorded owner passes
      val eve = dpost("/stream/clear_state", Map("id" -> didA),
        did = Some("did:user:eve"))
      assert(eve.get("err").exists(_.toString.contains("owner")), eve.toString)
      assert(!dpost("/stream/clear_state", Map("id" -> didA),
        did = Some("did:user:alice")).contains("err"))
      // key custody reinstated from the bucket's did_key
      assert(plcDir.custodiedSecret(didA).map(_.toSeq) == Some(secretA.toSeq))
      // ...and appends sign with the restored key again
      dok(dpost("/stream/event_batch", Map("id" -> didA, "events" -> Vector(
        Map("user" -> "did:user:alice", "payload_b64" ->
          Base64.getEncoder.encodeToString(rawPayload("post-restore")))))))
      val sig = dstStore.open(didA).eventsDF.orderBy("idx").collect()
        .last.getAs[Array[Byte]]("signature")
      val mac = javax.crypto.Mac.getInstance("HmacSHA256")
      mac.init(new javax.crypto.spec.SecretKeySpec(secretA, "HmacSHA256"))
      val expected = mac.doFinal(Drisl.encode(DValue.DArray(Vector(obj(
        "user" -> text("did:user:alice"),
        "payload" -> DValue.DBytes(rawPayload("post-restore")))))))
      assert(sig.sameElements(expected),
        "restored stream must sign appends with the bucket's did_key")
    } finally srv.stop()
  }

  test("restored streams are marked backed-up for the restore bucket only") {
    import graft.stream.BackupService
    // source: one exported stream in a bucket
    val srcStore = new StreamStore(spark,
      graft.TempDirs.create("graft-mark-src").toString)
    val mB = graft.types.ModuleDef(
      initSql = "CREATE TABLE IF NOT EXISTS notes (idx BIGINT) USING PARQUET",
      materializer = "INSERT INTO notes SELECT idx FROM event")
    val h = srcStore.createStream("did:graft:marked", mB)
    h.addEvents(Seq(graft.types.IncomingEvent("u",
      Drisl.encode(obj("n" -> int(1))))))
    val bucketDir = graft.TempDirs.create("graft-mark-bucket")
    BackupService.exportReference(h, "file:" + bucketDir)
    val metaPath = bucketDir.resolve("streams/did:graft:marked/metadata.drisl")
    val metaBytesBefore = java.nio.file.Files.readAllBytes(metaPath)

    // case 1: sweep targets the SAME bucket we restored from — the
    // restored stream is marked backed-up, so idle sweep ticks must not
    // rewrite its bucket objects
    val store1 = new StreamStore(spark,
      graft.TempDirs.create("graft-mark-dst1").toString)
    val srv1 = new LeafServer(store1, 0, authToken = Some("testtoken"),
      restoreFrom = Some("file:" + bucketDir),
      backupDest = Some("file:" + bucketDir),
      backupReferenceFormat = true, backupSweepMs = 250)
    srv1.start()
    try {
      // the restore constructed the handle exactly once; idle sweep
      // ticks must not reopen it (byte-equality of the deterministic
      // metadata would pass even on a redundant re-export — the handle
      // tally is the assertion that actually pins the skip)
      assert(store1.handleOpens("did:graft:marked") == 1L)
      val p0 = srv1.sweepPassesCompleted
      val guard = System.nanoTime + 60L * 1000000000L
      while (srv1.sweepPassesCompleted < p0 + 3) {
        assert(System.nanoTime < guard, "sweep stalled")
        Thread.sleep(100)
      }
      assert(store1.handleOpens("did:graft:marked") == 1L,
        "idle sweep ticks must not re-export (reopen) a stream restored " +
          "from this same bucket")
      assert(java.util.Arrays.equals(metaBytesBefore,
        java.nio.file.Files.readAllBytes(metaPath)))
    } finally srv1.stop()

    // case 2: sweep targets a DIFFERENT bucket — the restored stream must
    // still receive its first export there
    val store2 = new StreamStore(spark,
      graft.TempDirs.create("graft-mark-dst2").toString)
    val fresh = graft.TempDirs.create("graft-mark-freshdest")
    val srv2 = new LeafServer(store2, 0, authToken = Some("testtoken"),
      restoreFrom = Some("file:" + bucketDir),
      backupDest = Some("file:" + fresh),
      backupReferenceFormat = true, backupSweepMs = 250)
    srv2.start()
    try {
      val archived = fresh.resolve("streams/did:graft:marked/1-1.events.drisl.zstd")
      val deadline = System.nanoTime + 30L * 1000000000L
      while (!java.nio.file.Files.exists(archived) && System.nanoTime < deadline)
        Thread.sleep(100)
      assert(java.nio.file.Files.exists(archived),
        "a restore from bucket A must not suppress the first export to " +
          "a different backup destination B")
    } finally srv2.stop()
  }

  test("custody rotation invalidates the sweep's export fingerprint") {
    // the exported metadata.drisl carries owners and (opt-in) did_key —
    // a key change must re-export even though no probe counter moved
    val lstore = new StreamStore(spark,
      graft.TempDirs.create("graft-fpsweep").toString)
    val dest = graft.TempDirs.create("graft-fpsweep-bak")
    val plcDir = new graft.server.LocalPlcDirectory
    val srv = new LeafServer(lstore, 0, authToken = Some("testtoken"),
      plc = Some(plcDir), backupDest = Some("file:" + dest),
      backupReferenceFormat = true, backupExportKeys = true,
      backupSweepMs = 250)
    srv.start()
    try {
      def fpost(path: String, body: Map[String, Any]): Map[String, Any] = {
        val b = HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${srv.boundPort}$path"))
          .POST(HttpRequest.BodyPublishers.ofString(Json.render(body)))
          .header("Authorization", "Bearer testtoken")
        Json.parse(client.send(b.build(),
          HttpResponse.BodyHandlers.ofString()).body()).asInstanceOf[Map[String, Any]]
      }
      def fok(r: Map[String, Any]) = {
        assert(!r.contains("err"), r.toString)
        r("ok").asInstanceOf[Map[String, Any]]
      }
      val cid = fok(fpost("/module/upload", Map("module" -> Map(
        "init_sql" -> "CREATE TABLE IF NOT EXISTS notes (idx BIGINT) USING PARQUET",
        "materializer" -> "INSERT INTO notes SELECT idx FROM event"))))("cid").toString
      // no requested id: the PLC directory mints the did WITH key custody
      val sid = fok(fpost("/stream/create", Map("module_cid" -> cid)))("id").toString
      assert(sid.startsWith("did:plc:"))
      fok(fpost("/stream/event_batch", Map("id" -> sid, "events" ->
        Vector(Map("user" -> "u", "payload_b64" -> payload("fp", 1))))))
      val metaPath = dest.resolve(s"streams/$sid/metadata.drisl")
      def exportedKey(): Option[Seq[Byte]] =
        // poll loop: a read racing the sweep's write may catch the
        // between-rename gap — treat any transient miss as "not yet"
        if (!java.nio.file.Files.exists(metaPath)) None
        else try decodeKey() catch { case _: Exception => None }
      def decodeKey(): Option[Seq[Byte]] =
        Drisl.decode(java.nio.file.Files.readAllBytes(metaPath)) match {
          case graft.drisl.DValue.DMap(m) => m.get("did_key").collect {
            case graft.drisl.DValue.DMap(k) => k.collectFirst {
              case (_, graft.drisl.DValue.DBytes(s)) => s.toSeq
            }
          }.flatten
          case _ => None
        }
      val key1 = plcDir.custodiedSecret(sid).get.toSeq
      val deadline1 = System.nanoTime + 30L * 1000000000L
      while (!exportedKey().contains(key1) && System.nanoTime < deadline1)
        Thread.sleep(100)
      assert(exportedKey().contains(key1),
        "first sweep must export the custodied did_key")
      // rotate custody: no event, no state change — only the key moved
      val secret2 = java.security.MessageDigest.getInstance("SHA-256")
        .digest("rotated-key".getBytes)
      plcDir.installKey(sid, secret2)
      val deadline2 = System.nanoTime + 30L * 1000000000L
      while (!exportedKey().contains(secret2.toSeq) && System.nanoTime < deadline2)
        Thread.sleep(100)
      assert(exportedKey().contains(secret2.toSeq),
        "a custody rotation must invalidate the sweep's skip fingerprint")
    } finally srv.stop()
  }

  test("dedup index staleness reaches the operator through the admin catalog") {
    import org.apache.spark.sql.functions.{col, concat, concat_ws, lit, md5}
    val idxDir = graft.TempDirs.create("graft-srv-idx").toString
    def docs(n: Int, base: Long) = spark.range(n).select(
      (col("id") + base).as("doc_id"),
      concat_ws(" ", (0 until 12).map(i =>
        md5(concat(col("id") + base, lit(i)))): _*).as("text"))
    // build below the 4096-doc knee (r derives to 3), then append across it
    graft.queries.Dedup.buildDedupIndex(spark, docs(3000, 0), idxDir)
    val fresh = ok(post("/admin/dedup_index_info", Map("dir" -> idxDir)))
    assert(fresh("stale") == false && fresh("r") == 3L, fresh.toString)
    graft.queries.Dedup.appendDedupIndex(spark, docs(1500, 100000), idxDir)
    val grown = ok(post("/admin/dedup_index_info", Map("dir" -> idxDir)))
    assert(grown("stale") == true, grown.toString)
    assert(grown("r") == 3L && grown("recommended_r") == 4L &&
      grown("count") == 4500L, grown.toString)
    // the maintenance action the signal asks for: re-band from the
    // index's own artifacts over the RPC, then the signal clears
    val rb = ok(post("/admin/dedup_index_reband", Map("dir" -> idxDir)))
    assert(rb("r") == 4L, rb.toString)
    val cleared = ok(post("/admin/dedup_index_info", Map("dir" -> idxDir)))
    assert(cleared("stale") == false && cleared("r") == 4L, cleared.toString)
    // admin-gated like every other catalog RPC
    val denied = post("/admin/dedup_index_info", Map("dir" -> idxDir), token = None)
    assert(denied.contains("err"))
    val denied2 = post("/admin/dedup_index_reband", Map("dir" -> idxDir), token = None)
    assert(denied2.contains("err"))
    graft.TempDirs.release(java.nio.file.Paths.get(idxDir))
  }

  test("per-event replay telemetry reaches the operator through stream/info") {
    // a materializer that reads the table it writes is not batch-safe:
    // ingest falls back to the driver-side per-event replay loop. The
    // counters that make that visible must reach the operator surface
    // (the dedupIndexStale discipline), not just a log line.
    val cid = ok(post("/module/upload", Map("module" -> Map(
      "init_sql" -> "CREATE TABLE IF NOT EXISTS running (t BIGINT) USING PARQUET",
      "materializer" -> ("INSERT INTO running SELECT " +
        "coalesce((SELECT max(t) FROM running), 0) + " +
        "drisl_extract_long(payload, '.n') FROM event"),
      "queries" -> Map(
        "all" -> Map("sql" -> "SELECT t FROM running ORDER BY t"))))))(
      "cid").asInstanceOf[String]
    val sid = ok(post("/stream/create",
      Map("id" -> "did:graft:perev", "module_cid" -> cid)))("id").toString
    val before = ok(post("/stream/info", Map("id" -> sid)))
    assert(before("per_event_replays") == 0L, before.toString)
    ok(post("/stream/event_batch", Map("id" -> sid, "events" -> Vector(
      Map("user" -> "ann", "payload_b64" -> payload("a", 1)),
      Map("user" -> "ann", "payload_b64" -> payload("b", 2)),
      Map("user" -> "ann", "payload_b64" -> payload("c", 3))))))
    val after = ok(post("/stream/info", Map("id" -> sid)))
    assert(after("per_event_replays") == 3L, after.toString)

    // contrast: a batch-safe module's ingest must never touch the loop
    val cid2 = ok(post("/module/upload", Map("module" -> Map(
      "init_sql" -> "CREATE TABLE IF NOT EXISTS plain (t BIGINT) USING PARQUET",
      "materializer" ->
        "INSERT INTO plain SELECT drisl_extract_long(payload, '.n') FROM event",
      "queries" -> Map(
        "all" -> Map("sql" -> "SELECT t FROM plain ORDER BY t"))))))(
      "cid").asInstanceOf[String]
    val sid2 = ok(post("/stream/create",
      Map("id" -> "did:graft:perev2", "module_cid" -> cid2)))("id").toString
    ok(post("/stream/event_batch", Map("id" -> sid2, "events" -> Vector(
      Map("user" -> "ann", "payload_b64" -> payload("d", 4))))))
    val clean = ok(post("/stream/info", Map("id" -> sid2)))
    assert(clean("per_event_replays") == 0L, clean.toString)
  }

  test("param-bound kNN named query answers from the persisted vector index") {
    // the A7 surface composed with the vector-index artifacts: build the
    // IVF index over the embeddings corpus (admin RPC), attach it to a
    // stream as {prefix}_ views, install a module whose named query binds
    // the QUERY VECTOR as a $text param, probe the nearest centroid cell,
    // and rank that cell's vectors by exact integer L2 — all in module SQL
    // over RPC, answered purely from the index parquet
    import org.apache.spark.sql.functions._
    val src = "/root/testdata/sf0.001"
    val idx = graft.TempDirs.create("graft-vecidx").toString
    val b = ok(post("/admin/vector_index_build",
      Map("src" -> src, "dir" -> idx)))
    assert(b("vectors").asInstanceOf[Long] > 0 &&
      b("cells").asInstanceOf[Long] > 0, b.toString)

    val knnSql =
      """SELECT v.vec_id AS vec_id,
        |  aggregate(zip_with(v.v, transform(split($qvec, ','), x -> CAST(x AS BIGINT)),
        |    (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x) AS dist
        |FROM vecidx_vectors v
        |WHERE v.cell = (
        |  SELECT cell FROM (
        |    SELECT c.cell,
        |      aggregate(zip_with(c.c, transform(split($qvec, ','), x -> CAST(x AS BIGINT)),
        |        (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x) AS cd
        |    FROM vecidx_centroids c)
        |  ORDER BY cd, cell LIMIT 1)
        |ORDER BY dist, vec_id
        |LIMIT CAST($limit AS INT)""".stripMargin
    val cid = ok(post("/module/upload", Map("module" -> Map(
      "queries" -> Map("knn" -> Map(
        "sql" -> knnSql,
        "params" -> Vector(Map("name" -> "qvec", "kind" -> "text"))))))))(
      "cid").asInstanceOf[String]
    val sid = ok(post("/stream/create",
      Map("id" -> "did:graft:vecsearch", "module_cid" -> cid)))("id").toString
    val att = ok(post("/admin/vector_index_attach",
      Map("id" -> sid, "prefix" -> "vecidx", "dir" -> idx)))
    assert(att("tables").asInstanceOf[Vector[Any]].toSet ==
      Set("vecidx_centroids", "vecidx_vectors",
        "vecidx_codebooks", "vecidx_codes"))

    // query vector: vec_id 7's quantized embedding, as the text param
    val qv = spark.read.parquet(s"$src/embeddings.parquet")
      .filter(col("vec_id") === 7)
      .select(transform(col("embedding"),
        x => floor(x.cast("double") * 64 + lit(0.5)).cast("long")).as("v"))
      .head.getSeq[Long](0)
    val rows = ok(post("/stream/query", Map("id" -> sid, "query" -> Map(
      "name" -> "knn", "limit" -> 5L,
      "params" -> Map("qvec" -> qv.mkString(","))))))("rows")
      .asInstanceOf[Vector[Any]]
    val got = rows.map { r =>
      val m = r.asInstanceOf[Map[String, Any]]
      (m("vec_id").asInstanceOf[Map[String, Any]]("value").asInstanceOf[Long],
        m("dist").asInstanceOf[Map[String, Any]]("value").asInstanceOf[Long])
    }

    // oracle: recompute top-5 from the index artifacts directly
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val cents = spark.read.parquet(graft.queries.Similarity.artifactPath(idx, "centroids")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
    val cell = cents.map { case (c, cv) => (d2(cv, qv), c) }.min._2
    val expected = spark.read.parquet(graft.queries.Similarity.artifactPath(idx, "vectors"))
      .select(col("vec_id"), col("v"), col("cell").cast("long").as("cell"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
      .filter(_._3 == cell)
      .map { case (id, v, _) => (d2(v, qv), id) }
      .sorted.take(5).map { case (d, id) => (id, d) }.toVector
    assert(got == expected, s"got $got expected $expected")
    // the probed cell must contain the query's own row at distance 0
    assert(got.head == ((7L, 0L)), got.toString)

    // untrusted callers cannot build or attach
    val denied = post("/admin/vector_index_build",
      Map("src" -> src, "dir" -> idx), token = None)
    assert(denied.contains("err"))

    // ---- index lifecycle: append an increment, watch the skew signal ----
    val info0 = ok(post("/admin/vector_index_info", Map("dir" -> idx)))
    val n0 = info0("vectors").asInstanceOf[Long]
    val cells0 = info0("cells").asInstanceOf[Long]
    assert(n0 > 0 && cells0 > 0 &&
      info0("max_cell_share_pct").asInstanceOf[Long] >= 100 / cells0)

    // increment: the same corpus re-identified (vec_id + 1e6) — every
    // appended vector must land in the SAME cell as its original (same
    // embedding, same centroids, same argmin)
    val incDir = graft.TempDirs.create("graft-vecinc").toString
    spark.read.parquet(s"$src/embeddings.parquet")
      .withColumn("vec_id", col("vec_id") + 1000000L)
      .write.mode("overwrite").parquet(incDir)
    val app = ok(post("/admin/vector_index_append",
      Map("src" -> incDir, "dir" -> idx)))
    assert(app("appended").asInstanceOf[Long] == n0)
    val info1 = ok(post("/admin/vector_index_info", Map("dir" -> idx)))
    assert(info1("vectors").asInstanceOf[Long] == 2 * n0)
    assert(info1("cells").asInstanceOf[Long] == cells0,
      "append must assign into existing cells, never mint new ones")
    // a doubled corpus of identical vectors keeps the share flat
    assert(info1("max_cell_share_pct") == info0("max_cell_share_pct"))
    val cellOf = spark.read.parquet(graft.queries.Similarity.artifactPath(idx, "vectors"))
      .select(col("vec_id"), col("cell").cast("long").as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until math.min(n0, 50L)).foreach { i =>
      assert(cellOf.get(i + 1000000L) == cellOf.get(i),
        s"appended twin of vec $i landed in a different cell")
    }

    // the attached named query answers from the GROWN index: the appended
    // twin of the query vector is a second distance-0 hit
    val rows2 = ok(post("/stream/query", Map("id" -> sid, "query" -> Map(
      "name" -> "knn", "limit" -> 3L,
      "params" -> Map("qvec" -> qv.mkString(","))))))("rows")
      .asInstanceOf[Vector[Any]]
    val got2 = rows2.map { r =>
      val m = r.asInstanceOf[Map[String, Any]]
      (m("vec_id").asInstanceOf[Map[String, Any]]("value").asInstanceOf[Long],
        m("dist").asInstanceOf[Map[String, Any]]("value").asInstanceOf[Long])
    }
    assert(got2.take(2) == Vector((7L, 0L), (1000007L, 0L)), got2.toString)
  }

  test("two-stage ADC + exact re-rank named query answers from index artifacts") {
    // the production probe shape over the PERSISTED index: stage 1 ranks
    // ADC distances computed entirely in module SQL from $qvec × the
    // codebooks artifact against the codes-only fileset of the probed
    // cell (bytes/vector — vectors/ never touched), truncated to C=50;
    // stage 2 fetches full vectors ONLY for those candidates and re-ranks
    // by exact integer L2. Build → attach → param-bound query over RPC,
    // answered purely from index parquet; then the maintenance lifecycle:
    // appends accumulate files → compact bounds them (same answers),
    // retrain re-clusters from the artifacts (same answers on unchanged
    // data).
    import org.apache.spark.sql.functions._
    val src = "/root/testdata/sf0.001"
    val idx = graft.TempDirs.create("graft-vecidx2").toString
    ok(post("/admin/vector_index_build", Map("src" -> src, "dir" -> idx)))

    val twoStageSql = graft.queries.Similarity.twoStageKnnSql(
      a => s"vi_$a", "$qvec", "CAST($limit AS INT)")
    val cid = ok(post("/module/upload", Map("module" -> Map(
      "queries" -> Map("knn2" -> Map(
        "sql" -> twoStageSql,
        "params" -> Vector(Map("name" -> "qvec", "kind" -> "text"))))))))(
      "cid").asInstanceOf[String]
    val sid = ok(post("/stream/create",
      Map("id" -> "did:graft:vecsearch2", "module_cid" -> cid)))("id").toString
    ok(post("/admin/vector_index_attach",
      Map("id" -> sid, "prefix" -> "vi", "dir" -> idx)))

    val qv = spark.read.parquet(s"$src/embeddings.parquet")
      .filter(col("vec_id") === 7)
      .select(transform(col("embedding"),
        x => floor(x.cast("double") * 64 + lit(0.5)).cast("long")).as("v"))
      .head.getSeq[Long](0)
    def ask(k: Long): Vector[(Long, Long, Long)] =
      ok(post("/stream/query", Map("id" -> sid, "query" -> Map(
        "name" -> "knn2", "limit" -> k,
        "params" -> Map("qvec" -> qv.mkString(","))))))("rows")
        .asInstanceOf[Vector[Any]].map { r =>
          val m = r.asInstanceOf[Map[String, Any]]
          def l(f: String) = m(f).asInstanceOf[Map[String, Any]]("value")
            .asInstanceOf[Long]
          (l("vec_id"), l("adc_dist"), l("exact_dist"))
        }

    // oracle: the full two-stage recomputed from the artifacts directly
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def oracle(k: Int): Vector[(Long, Long, Long)] = {
      val cents = spark.read.parquet(graft.queries.Similarity.artifactPath(idx, "centroids")).collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1)))
      val cell = cents.map { case (c, cv) => (d2(cv, qv), c) }.min._2
      val books = spark.read.parquet(graft.queries.Similarity.artifactPath(idx, "codebooks")).collect()
        .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Long](2))).toMap
      def qd(m: Int, j: Long): Long =
        d2(books((m, j.toInt)), qv.slice(m * 16, m * 16 + 16))
      val cand = spark.read.parquet(graft.queries.Similarity.artifactPath(idx, "codes"))
        .select(col("vec_id"), col("c0"), col("c1"), col("c2"), col("c3"),
          col("cell").cast("long").as("cell"))
        .collect().filter(_.getLong(5) == cell)
        .map(r => (r.getLong(0),
          (0 until 4).map(m => qd(m, r.getLong(1 + m))).sum))
        .sortBy { case (id, d) => (d, id) }.take(50)
      val vecOf = spark.read.parquet(graft.queries.Similarity.artifactPath(idx, "vectors"))
        .select(col("vec_id"), col("v"), col("cell").cast("long").as("cell"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      cand.map { case (id, adc) => (id, adc, d2(vecOf(id), qv)) }
        .sortBy { case (id, _, ex) => (ex, id) }.take(k).toVector
    }
    val got = ask(5)
    assert(got == oracle(5), s"got $got expected ${oracle(5)}")
    assert(got.head._1 == 7L && got.head._3 == 0L, got.toString)

    // ---- lifecycle: appends accumulate files, compaction bounds them ----
    val info0 = ok(post("/admin/vector_index_info", Map("dir" -> idx)))
    val files0 = info0("files").asInstanceOf[Long]
    val n0 = info0("vectors").asInstanceOf[Long]
    val incDir = graft.TempDirs.create("graft-vecinc2").toString
    spark.read.parquet(s"$src/embeddings.parquet")
      .withColumn("vec_id", col("vec_id") + 1000000L)
      .write.mode("overwrite").parquet(incDir)
    ok(post("/admin/vector_index_append", Map("src" -> incDir, "dir" -> idx)))
    val incDir2 = graft.TempDirs.create("graft-vecinc3").toString
    spark.read.parquet(s"$src/embeddings.parquet")
      .withColumn("vec_id", col("vec_id") + 2000000L)
      .write.mode("overwrite").parquet(incDir2)
    ok(post("/admin/vector_index_append", Map("src" -> incDir2, "dir" -> idx)))
    val grown = ok(post("/admin/vector_index_info", Map("dir" -> idx)))
    assert(grown("vectors").asInstanceOf[Long] == 3 * n0)
    assert(grown("files").asInstanceOf[Long] > files0,
      "appends must have accumulated per-increment files")
    // the appended twins answer through the two-stage path: three
    // distance-0 hits now (7, 1000007, 2000007)
    assert(ask(3).map(_._1) == Vector(7L, 1000007L, 2000007L))

    val compacted = ok(post("/admin/vector_index_compact", Map("dir" -> idx)))
    assert(compacted("vectors").asInstanceOf[Long] == 3 * n0,
      "compaction must not change content")
    assert(compacted("files").asInstanceOf[Long] <=
      2 * compacted("cells").asInstanceOf[Long],
      s"post-compaction file count must be bounded (~1/cell/artifact): " +
        compacted.toString)
    assert(ask(3).map(_._1) == Vector(7L, 1000007L, 2000007L),
      "compaction must not change query answers")

    // ---- retrain: re-clusters FROM the artifacts, answers unchanged ----
    val before = ask(5)
    val retrained = ok(post("/admin/vector_index_retrain", Map("dir" -> idx)))
    assert(retrained("vectors").asInstanceOf[Long] == 3 * n0,
      "retrain must preserve every vector")
    assert(ask(5) == oracle(5),
      "the retrained index must answer from its own (new) artifacts")
    assert(ask(5).map(_._1) == before.map(_._1),
      "on unchanged data a retrain must not change the neighbor set")
  }

  test("param-bound BM25 named query answers from the lexical index " +
    "artifacts, oracle-checked") {
    // the lexical twin of the two-stage kNN e2e: build the postings
    // artifacts once, attach as views, then an A7 `$terms` param binds an
    // ARBITRARY query-term set at call time — scored without touching the
    // corpus text, verified against an independent plain-Scala Okapi
    // recompute with the identical micro-nat rounding ladder.
    val src = "/root/testdata/sf0.001"
    val idx = graft.TempDirs.create("graft-lexidx").toString
    val built = ok(post("/admin/lexical_index_build",
      Map("src" -> src, "dir" -> idx)))
    assert(built("docs").asInstanceOf[Long] > 0 &&
      built("postings").asInstanceOf[Long] > 0, built.toString)

    val bmSql = graft.queries.Retrieval.bm25NamedSql(
      a => s"lx_$a", "$terms", "CAST($limit AS INT)")
    val cid = ok(post("/module/upload", Map("module" -> Map(
      "queries" -> Map("bm25" -> Map(
        "sql" -> bmSql,
        "params" -> Vector(Map("name" -> "terms", "kind" -> "text"))))))))(
      "cid").asInstanceOf[String]
    val sid = ok(post("/stream/create",
      Map("id" -> "did:graft:lexsearch", "module_cid" -> cid)))("id").toString
    val tabs = ok(post("/admin/lexical_index_attach",
      Map("id" -> sid, "prefix" -> "lx", "dir" -> idx)))
    assert(tabs("tables").asInstanceOf[Vector[Any]].size == 4)

    // the POINT is the binding: a rare term + a common term from the live
    // vocabulary (not the gate's fixed set) + one absent term that must
    // drop out at the df join
    val docsT = spark.read.parquet(s"$src/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val tokAll = docsT.map { case (id, tx) =>
      id -> tx.trim.toLowerCase.split("\\s+").toSeq }
    val freq = tokAll.flatMap(_._2).filterNot(_.isEmpty)
      .groupBy(identity).view.mapValues(_.length).toSeq
    val rare = freq.minBy { case (t, c) => (c, t) }._1
    val common = freq.maxBy { case (t, c) => (c, t) }._1
    val terms = Seq(rare, common, "zzz_absent_term")

    def askT(ts: Seq[String], k: Long): Vector[(Long, Long)] =
      ok(post("/stream/query", Map("id" -> sid, "query" -> Map(
        "name" -> "bm25", "limit" -> k,
        "params" -> Map("terms" -> ts.mkString(","))))))("rows")
        .asInstanceOf[Vector[Any]].map { r =>
          val m = r.asInstanceOf[Map[String, Any]]
          def l(f: String) = m(f).asInstanceOf[Map[String, Any]]("value")
            .asInstanceOf[Long]
          (l("doc_id"), l("score_micro"))
        }
    def ask(k: Long): Vector[(Long, Long)] = askT(terms, k)

    // independent oracle: Okapi BM25 in plain Scala; HALF_UP via
    // java BigDecimal.valueOf == Spark round() on doubles exactly
    def rnd(x: Double): Long = java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    def expect(tok: Seq[(Long, Seq[String])],
        ts: Seq[String]): Seq[(Long, Long)] = {
      val n = tok.length
      val dls = tok.map { case (id, ws) => id -> ws.size.toLong }.toMap
      val avgdl = dls.values.sum.toDouble / n
      val dfOf = ts.map(t => t -> tok.count(_._2.contains(t)).toLong).toMap
      tok.map { case (id, ws) =>
        id -> ts.map { t =>
          val tf = ws.count(_ == t).toLong
          if (tf == 0L) 0L
          else {
            val idf = rnd(math.log(((n - dfOf(t)).toDouble + 0.5) /
              (dfOf(t).toDouble + 0.5) + 1.0) * 1e6)
            rnd(idf * ((tf.toDouble * 2.2) / (tf.toDouble +
              1.2 * (0.25 + (0.75 * dls(id).toDouble) / avgdl))))
          }
        }.sum
      }.filter(_._2 != 0L)
        .sortBy { case (id, sc) => (-sc, id) }
    }
    val expected = expect(tokAll.toSeq, terms)
    assert(expected.size >= 10, s"test terms too rare: $terms")
    val got = ask(10)
    assert(got == expected.take(10).toVector,
      s"terms=$terms got=$got expected=${expected.take(10)}")
    // re-bind with a different term set: same module, different answers —
    // the parameterization is real, not baked into the plan. The
    // rare-term-only binding must lead with the rare term's docs, which
    // the common-term-only binding cannot (rare idf >> common idf).
    val gotRare = askT(Seq(rare), 5L)
    val gotCommon = askT(Seq(common), 5L)
    // a rare-only binding returns ONLY docs containing the rare term
    // (possibly fewer than 5 — correct retrieval semantics)
    val rareDocs = tokAll.filter(_._2.contains(rare)).map(_._1).toSet
    assert(gotRare.nonEmpty && gotRare.map(_._1).forall(rareDocs.contains),
      s"rare-only binding returned non-matching docs: $gotRare")
    assert(gotCommon.size == 5)
    assert(gotRare != gotCommon, "rebinding changed nothing")

    // ---- O(increment) append: new docs land as a batch, df/stats flip
    // via the meta pointer, attached views re-resolve, and the SAME
    // named query now answers from the grown corpus — verified against
    // the union-recompute oracle ----
    val incDir = graft.TempDirs.create("graft-lexinc").toString
    val incDocs = (0 until 40).map { i =>
      (900000L + i, s"$rare $common appended doc number $i $rare")
    }
    import spark.implicits._
    incDocs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(incDir)
    val app = ok(post("/admin/lexical_index_append",
      Map("src" -> incDir, "dir" -> idx)))
    assert(app("appended") == 40L && app("batches") == 2L, app.toString)
    val info = ok(post("/admin/lexical_index_info", Map("dir" -> idx)))
    assert(info("docs") == tokAll.length + 40L, info.toString)
    val tokUnion = tokAll.toSeq ++ incDocs.map { case (id, tx) =>
      id -> tx.trim.toLowerCase.split("\\s+").toSeq }
    val expected2 = expect(tokUnion, terms)
    val got2 = ask(10)
    assert(got2 == expected2.take(10).toVector,
      s"post-append terms=$terms got=$got2 expected=${expected2.take(10)}")
    // the appended docs (double-$rare, tiny dl) dominate the rare
    // ranking now — visible proof the df/stats flip reached the query
    assert(got2.exists(_._1 >= 900000L),
      s"append invisible to the named query: $got2")

    // ---- compaction answers the small-files signal: one bounded batch,
    // identical answers through the re-resolved views ----
    val filesBefore = info("files").asInstanceOf[Long]
    val compacted = ok(post("/admin/lexical_index_compact",
      Map("dir" -> idx)))
    assert(compacted("batches") == 1L, compacted.toString)
    assert(compacted("files").asInstanceOf[Long] < filesBefore,
      s"compaction did not shrink the file count: " +
        s"$filesBefore -> ${compacted("files")}")
    assert(compacted("docs") == tokAll.length + 40L, compacted.toString)
    assert(ask(10) == got2, "compaction changed query answers")
  }

  test("mixture stats lifecycle over RPC: build/append/compact/weights — " +
    "served weights track the gate exactly, torn appends refuse") {
    // the fourth maintained artifact family (DoReMi sufficient
    // statistic): served weights must equal the q_mixture_doremi gate on
    // the same corpus at every lifecycle step.
    import org.apache.spark.sql.functions.{col, lit}
    val src = "/root/testdata/sf0.001"
    val idx = graft.TempDirs.create("graft-mixstats").toString
    val built = ok(post("/admin/mixture_stats_build",
      Map("src" -> src, "dir" -> idx)))
    val nBase = spark.read.parquet(s"$src/documents.parquet").count()
    assert(built("docs") == nBase && built("rows").asInstanceOf[Long] > 0)

    def served(): Vector[(String, Long, Long, Long)] =
      ok(post("/admin/mixture_weights", Map("dir" -> idx)))("weights")
        .asInstanceOf[Vector[Any]].map { r =>
          val m = r.asInstanceOf[Map[String, Any]]
          (m("source").asInstanceOf[String], m("l_micro").asInstanceOf[Long],
            m("excess_micro").asInstanceOf[Long],
            m("weight_nano").asInstanceOf[Long])
        }
    def local(df: org.apache.spark.sql.DataFrame) =
      graft.queries.Pipeline.doremiWeightsFromCounts(
        graft.queries.Pipeline.domainTokenCounts(df))
        .orderBy("source").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toVector

    val base = spark.read.parquet(s"$src/documents.parquet")
      .select(col("source"), col("text"))
    val w0 = served()
    assert(w0 == local(base), "served weights drifted from the gate (build)")

    // append a skewed wave: one domain gets rare-token-heavy docs, so
    // the weights MUST move — and must equal the union recompute
    val incDir = graft.TempDirs.create("graft-mixinc").toString
    import spark.implicits._
    (0 until 30).map(i =>
        ("src0", s"mixuniq$i mixuniq$i anomalous drift tokens here"))
      .toDF("source", "text")
      .write.mode("overwrite").parquet(incDir)
    val app = ok(post("/admin/mixture_stats_append",
      Map("src" -> incDir, "dir" -> idx)))
    assert(app("batches") == 2L && app("docs") == nBase + 30, app.toString)
    val w1 = served()
    assert(w1 == local(base.unionAll(
        spark.read.parquet(incDir).select(col("source"), col("text")))),
      "served weights drifted from the union recompute (append)")
    assert(w1 != w0, "a skewed 30-doc wave moved no weight")

    // compaction: purely physical — identical weights, bounded files
    val infoB = ok(post("/admin/mixture_stats_info", Map("dir" -> idx)))
    val comp = ok(post("/admin/mixture_stats_compact", Map("dir" -> idx)))
    assert(comp("batches") == 1L)
    val infoA = ok(post("/admin/mixture_stats_info", Map("dir" -> idx)))
    assert(infoA("files").asInstanceOf[Long] <
      infoB("files").asInstanceOf[Long], s"$infoB -> $infoA")
    assert(infoA("docs") == nBase + 30, infoA.toString)
    assert(served() == w1, "compaction changed the served weights")

    // torn-append refusal: a stray batch dir (append died before its
    // meta commit) must refuse loudly at read, not score silently
    val meta = graft.queries.Pipeline.readMixMeta(spark, idx)
    spark.range(1).select(lit("srcX").as("source"),
        lit("straytok").as("tok"), lit(1L).as("c"))
      .write.parquet(s"$idx/${meta.countsDir}/batch=99")
    val torn = post("/admin/mixture_weights", Map("dir" -> idx))
    assert(torn.contains("err") &&
      torn("err").toString.contains("TORN"), torn.toString)

    // recovery (the r13 ADVICE fix): RE-RUNNING the append sweeps the
    // dead attempt's partial batch at entry and commits cleanly — the
    // documented remedy used to deadlock on the same refusal it issued
    val retry = ok(post("/admin/mixture_stats_append",
      Map("src" -> incDir, "dir" -> idx)))
    assert(retry("batches") == 2L && retry("docs") == nBase + 60,
      retry.toString)
    val hfs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!hfs.exists(new org.apache.hadoop.fs.Path(
      s"$idx/${graft.queries.Pipeline.readMixMeta(spark, idx).countsDir}/batch=99")),
      "append retry did not sweep the stray batch")
    assert(served() == local(base.unionAll(spark.read.parquet(incDir)
        .select(col("source"), col("text")))
      .unionAll(spark.read.parquet(incDir)
        .select(col("source"), col("text")))),
      "post-recovery served weights drifted from the union recompute")
  }

  test("lexical torn-append recovery: the retry sweeps its dead partial " +
    "batch and commits; read paths refuse until it does") {
    import org.apache.spark.sql.functions.col
    val src = "/root/testdata/sf0.001"
    val idx = graft.TempDirs.create("graft-lextorn").toString
    val built = ok(post("/admin/lexical_index_build",
      Map("src" -> src, "dir" -> idx)))
    val nBase = built("docs").asInstanceOf[Long]
    // simulate the kill: an append writes docs/batch=1 then dies before
    // terms/batch=1 and the meta commit
    import spark.implicits._
    val incDir = graft.TempDirs.create("graft-lextorn-inc").toString
    (0 until 25).map(i => (700000L + i, s"lextorn doc number $i recovery"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(incDir)
    spark.read.parquet(incDir)
      .select(col("doc_id"),
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split(col("text"), "\\s+"))
          .cast("long").as("dl"))
      .write.parquet(s"$idx/docs/batch=1")
    // read paths refuse the torn layout
    val torn = post("/admin/lexical_index_info", Map("dir" -> idx))
    assert(torn.contains("err") &&
      torn("err").toString.contains("TORN"), torn.toString)
    // the retry recovers: partial batch swept at entry, commit lands
    val retry = ok(post("/admin/lexical_index_append",
      Map("src" -> incDir, "dir" -> idx)))
    assert(retry("appended") == 25L && retry("batches") == 2L, retry.toString)
    val info = ok(post("/admin/lexical_index_info", Map("dir" -> idx)))
    assert(info("docs") == nBase + 25, info.toString)
  }

  test("param-bound MMR and context-pack named queries answer from the " +
    "attached index artifacts, oracle-checked against independent " +
    "plain-Scala recomputes") {
    import org.apache.spark.sql.functions.col
    // the RAG serving surface (verdict r13 item 4): λ/K-parameterized MMR
    // and budget-parameterized context packing as A7 named queries over
    // the SAME attached artifacts the other retrieval queries use —
    // corpus text in no scan, every input an index artifact.
    val src = "/root/testdata/sf0.001"
    val vidx = graft.TempDirs.create("graft-ragvec").toString
    ok(post("/admin/vector_index_build", Map("src" -> src, "dir" -> vidx)))
    val lidx = graft.TempDirs.create("graft-raglex").toString
    ok(post("/admin/lexical_index_build", Map("src" -> src, "dir" -> lidx)))

    val mmrSql = graft.queries.Retrieval.mmrNamedSql(
      a => s"rag_$a", "$qvec", "$lambda", "$k")
    val packSql = graft.queries.Retrieval.contextPackNamedSql(
      a => s"lx_$a", a => s"rag_$a", "$terms", "$qvec", "$budget")
    val cid = ok(post("/module/upload", Map("module" -> Map(
      "queries" -> Map(
        "mmr" -> Map("sql" -> mmrSql, "params" -> Vector(
          Map("name" -> "qvec", "kind" -> "text"),
          Map("name" -> "lambda", "kind" -> "integer"),
          Map("name" -> "k", "kind" -> "integer"))),
        "pack" -> Map("sql" -> packSql, "params" -> Vector(
          Map("name" -> "terms", "kind" -> "text"),
          Map("name" -> "qvec", "kind" -> "text"),
          Map("name" -> "budget", "kind" -> "integer"))))))))(
      "cid").asInstanceOf[String]
    val sid = ok(post("/stream/create",
      Map("id" -> "did:graft:rag", "module_cid" -> cid)))("id").toString
    ok(post("/admin/vector_index_attach",
      Map("id" -> sid, "prefix" -> "rag", "dir" -> vidx)))
    ok(post("/admin/lexical_index_attach",
      Map("id" -> sid, "prefix" -> "lx", "dir" -> lidx)))

    // ---- shared oracle inputs: the exact same quantization the index
    // build applied, recomputed independently in plain Scala ----
    def rnd(x: Double): Long = java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    val vq: Map[Long, Array[Long]] =
      spark.read.parquet(s"$src/embeddings.parquet")
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1)
          .map(x => math.floor(x.toDouble * 64 + 0.5).toLong).toArray).toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val n2 = vq.view.mapValues(v => dot(v, v)).toMap
    val qv = vq(7L)
    val qn2 = n2(7L)
    def cosNano(id: Long): Long =
      rnd(dot(vq(id), qv) / (math.sqrt(n2(id).toDouble) *
        math.sqrt(qn2.toDouble)) * 1e9)

    // ---- MMR oracle: Carbonell–Goldstein greedy over the top-C pool ----
    val cand = vq.keys.toSeq.map(id => (id, cosNano(id)))
      .sortBy { case (id, rel) => (-rel, id) }.take(12)
    val simN = (for {
      (a, _) <- cand; (b, _) <- cand; if a != b
    } yield (a, b) -> rnd(dot(vq(a), vq(b)) /
      (math.sqrt(n2(a).toDouble) * math.sqrt(n2(b).toDouble)) * 1e9)).toMap
    def mmrOracle(lam: Long, k: Int): Vector[(Long, Long, Long, Long)] = {
      val out = Vector.newBuilder[(Long, Long, Long, Long)]
      var sel = Vector(cand.head._1)
      out += ((1L, cand.head._1, cand.head._2, lam * cand.head._2))
      for (r <- 2 to k) {
        val pick = cand.filterNot(c => sel.contains(c._1))
          .map { case (id, rel) =>
            (id, rel, lam * rel - (1000000L - lam) *
              sel.map(s => simN((id, s))).max)
          }.minBy { case (id, _, sc) => (-sc, id) }
        out += ((r.toLong, pick._1, pick._2, pick._3))
        sel :+= pick._1
      }
      out.result()
    }
    def askMmr(lam: Long, k: Long): Vector[(Long, Long, Long, Long)] =
      ok(post("/stream/query", Map("id" -> sid, "query" -> Map(
        "name" -> "mmr", "limit" -> 50L,
        "params" -> Map("qvec" -> qv.mkString(","),
          "lambda" -> lam, "k" -> k)))))("rows")
        .asInstanceOf[Vector[Any]].map { r =>
          val m = r.asInstanceOf[Map[String, Any]]
          def l(f: String) = m(f).asInstanceOf[Map[String, Any]]("value")
            .asInstanceOf[Long]
          (l("sel_rank"), l("vec_id"), l("rel_nano"), l("mmr_scaled"))
        }
    val even = askMmr(500000L, 5L)
    assert(even == mmrOracle(500000L, 5), s"λ=½ MMR drifted: $even vs " +
      mmrOracle(500000L, 5))
    // λ=½ IS the gate's rel−maxsim greedy, scaled by the constant 5e5:
    // the same selection, bit-exactly
    even.drop(1).foreach { case (_, id, rel, sc) =>
      val maxsim = even.takeWhile(_._2 != id).map(e => simN((id, e._2))).max
      assert(sc == 500000L * (rel - maxsim),
        "λ=½ did not reduce to the gate arithmetic") }
    // re-bind λ high (relevance-heavy): the parameterization is real —
    // and each binding matches its own oracle
    val heavy = askMmr(990000L, 6L)
    assert(heavy == mmrOracle(990000L, 6))
    assert(heavy.map(_._2) != mmrOracle(500000L, 6).map(_._2),
      "λ re-binding changed nothing — fixture too degenerate to prove " +
        "the parameterization")
    assert(askMmr(500000L, 3L).size == 3, "k binding must bound the prefix")

    // ---- context-pack oracle: BM25 leg + vector leg + RRF + cumsum ----
    val docsT = spark.read.parquet(s"$src/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val tok = docsT.map { case (id, tx) =>
      id -> tx.trim.toLowerCase.split("\\s+").toSeq }.toMap
    val freq = tok.values.flatten.filterNot(_.isEmpty)
      .groupBy(identity).view.mapValues(_.size).toSeq
    val rare = freq.filter(_._2 >= 3).minBy { case (t, c) => (c, t) }._1
    val common = freq.maxBy { case (t, c) => (c, t) }._1
    val terms = Seq(rare, common)
    def bm25(ts: Seq[String]): Seq[(Long, Long)] = {
      val n = tok.size
      val dls = tok.view.mapValues(_.size.toLong).toMap
      val avgdl = dls.values.sum.toDouble / n
      val dfOf = ts.map(t => t -> tok.count(_._2.contains(t)).toLong).toMap
      tok.keys.toSeq.map { id =>
        id -> ts.map { t =>
          val tf = tok(id).count(_ == t).toLong
          if (tf == 0L || dfOf(t) == 0L) 0L
          else {
            val idf = rnd(math.log(((n - dfOf(t)).toDouble + 0.5) /
              (dfOf(t).toDouble + 0.5) + 1.0) * 1e6)
            rnd(idf * ((tf.toDouble * 2.2) / (tf.toDouble +
              1.2 * (0.25 + (0.75 * dls(id).toDouble) / avgdl))))
          }
        }.sum
      }.filter(_._2 != 0L)
    }
    def packOracle(ts: Seq[String],
        budget: Long): Vector[(Long, Long, Long, Long)] = {
      val tRank = bm25(ts).sortBy { case (id, sc) => (-sc, id) }.take(100)
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
      val vRank = vq.keys.toSeq.map(id => (id, cosNano(id)))
        .sortBy { case (id, c) => (-c, id) }.take(100)
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
      def contrib(r: Option[Long]): Long =
        r.map(x => rnd(1.0e9 / (60.0 + x))).getOrElse(0L)
      val fused = (tRank.keySet ++ vRank.keySet).toSeq
        .map(id => (id, contrib(tRank.get(id)) + contrib(vRank.get(id))))
        .sortBy { case (id, f) => (-f, id) }.take(20)
      val out = Vector.newBuilder[(Long, Long, Long, Long)]
      var cum = 0L
      fused.zipWithIndex.foreach { case ((id, _), i) =>
        val tk = tok(id).size.toLong
        cum += tk
        if (cum <= budget) out += ((i + 1L, id, tk, cum))
      }
      out.result()
    }
    def askPack(ts: Seq[String],
        budget: Long): Vector[(Long, Long, Long, Long)] =
      ok(post("/stream/query", Map("id" -> sid, "query" -> Map(
        "name" -> "pack", "limit" -> 50L,
        "params" -> Map("terms" -> ts.mkString(","),
          "qvec" -> qv.mkString(","), "budget" -> budget)))))("rows")
        .asInstanceOf[Vector[Any]].map { r =>
          val m = r.asInstanceOf[Map[String, Any]]
          def l(f: String) = m(f).asInstanceOf[Map[String, Any]]("value")
            .asInstanceOf[Long]
          (l("sel_order"), l("doc_id"), l("tokens"), l("cum_tokens"))
        }
    val p512 = askPack(terms, 512L)
    assert(p512 == packOracle(terms, 512L),
      s"pack drifted: $p512 vs ${packOracle(terms, 512L)}")
    assert(p512.nonEmpty, "budget 512 packed nothing — fixture drifted")
    // the budget re-binding is real: a tighter budget is a strict prefix
    val p150 = askPack(terms, 150L)
    assert(p150 == packOracle(terms, 150L))
    assert(p150.size < p512.size && p512.startsWith(p150),
      s"tighter budget must cut a strict prefix: $p150 vs $p512")
  }

  test("INDEXED MMR/context-pack relevance legs (the serving default) " +
    "ride the persisted two-stage probe: answers identical to the brute " +
    "twins on a clustered corpus, probe artifacts in the executed plan") {
    import org.apache.spark.sql.functions._
    // clustered corpus (the SimilaritySpec geometry — recall is REAL
    // here, so indexed == brute is a meaningful equality, not a
    // scan-fraction accident) + matching documents for the lexical leg
    val src = TempDirs.create("graft-ragidx-src").toString
    spark.range(1000)
      .select(col("id").as("vec_id"), (col("id") % 5).cast("int").as("label"))
      .select(col("vec_id"), expr(
        "transform(sequence(0, 63), i -> CAST(" +
          "(pmod(hash(label, i), 2001) - 1000) / 1000.0 + " +
          "(pmod(hash(vec_id, i, 7), 201) - 100) / 100.0 * 0.15 AS FLOAT))")
        .as("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$src/embeddings.parquet")
    spark.range(1000).select(col("id").as("doc_id"),
        lit("srcA").as("source"),
        concat_ws(" ",
          concat(lit("tok"), (col("id") % 97).cast("string")),
          concat(lit("tok"), (col("id") % 31).cast("string")),
          lit("filler alpha beta gamma"),
          concat(lit("w"), col("id").cast("string"))).as("text"))
      .write.mode("overwrite").parquet(s"$src/documents.parquet")
    val vidx = TempDirs.create("graft-ragidx-vec").toString
    ok(post("/admin/vector_index_build", Map("src" -> src, "dir" -> vidx)))
    val lidx = TempDirs.create("graft-ragidx-lex").toString
    ok(post("/admin/lexical_index_build", Map("src" -> src, "dir" -> lidx)))

    // indexed (serving default) + brute (oracle twin) for both queries
    import graft.queries.Retrieval
    def q(sql: String, params: (String, String)*) = Map(
      "sql" -> sql,
      "params" -> params.toVector.map { case (n, k) =>
        Map("name" -> n, "kind" -> k) })
    val cid = ok(post("/module/upload", Map("module" -> Map(
      "queries" -> Map(
        "mmr_idx" -> q(Retrieval.mmrNamedSqlIndexed(a => s"rg_$a",
            "$qvec", "$lambda", "$k"),
          "qvec" -> "text", "lambda" -> "integer", "k" -> "integer"),
        "mmr_brute" -> q(Retrieval.mmrNamedSqlIndexed(a => s"rg_$a",
            "$qvec", "$lambda", "$k", indexed = false),
          "qvec" -> "text", "lambda" -> "integer", "k" -> "integer"),
        "pack_idx" -> q(Retrieval.contextPackNamedSqlIndexed(
            a => s"lg_$a", a => s"rg_$a", "$terms", "$qvec", "$budget"),
          "terms" -> "text", "qvec" -> "text", "budget" -> "integer"),
        "pack_brute" -> q(Retrieval.contextPackNamedSqlIndexed(
            a => s"lg_$a", a => s"rg_$a", "$terms", "$qvec", "$budget",
            indexed = false),
          "terms" -> "text", "qvec" -> "text", "budget" -> "integer"))))))(
      "cid").asInstanceOf[String]
    val sid = ok(post("/stream/create",
      Map("id" -> "did:graft:ragidx", "module_cid" -> cid)))("id").toString
    ok(post("/admin/vector_index_attach",
      Map("id" -> sid, "prefix" -> "rg", "dir" -> vidx)))
    ok(post("/admin/lexical_index_attach",
      Map("id" -> sid, "prefix" -> "lg", "dir" -> lidx)))

    val qv = spark.read.parquet(s"$src/embeddings.parquet")
      .where(col("vec_id") === 7L).select("embedding").head()
      .getSeq[Float](0)
      .map(x => math.floor(x.toDouble * 64 + 0.5).toLong)
    def rows(name: String, params: Map[String, Any]): Vector[Vector[Any]] =
      ok(post("/stream/query", Map("id" -> sid, "query" -> Map(
        "name" -> name, "limit" -> 100L, "params" -> params))))("rows")
        .asInstanceOf[Vector[Any]].map(r =>
          r.asInstanceOf[Map[String, Any]].toVector.sortBy(_._1)
            .map(_._2))
    // the indexed leg answers EXACTLY what the brute leg answers, at
    // two bindings each — matching recall on clustered geometry
    for ((lam, k) <- Seq((500000L, 5L), (990000L, 6L))) {
      val p = Map[String, Any]("qvec" -> qv.mkString(","),
        "lambda" -> lam, "k" -> k)
      val idx = rows("mmr_idx", p)
      assert(idx == rows("mmr_brute", p),
        s"indexed MMR drifted from the brute twin at λ=$lam k=$k")
      assert(idx.size == k, s"k=$k returned ${idx.size} selections")
    }
    for (budget <- Seq(512L, 200L)) {
      val p = Map[String, Any]("terms" -> "tok5,tok13",
        "qvec" -> qv.mkString(","), "budget" -> budget)
      val idx = rows("pack_idx", p)
      assert(idx == rows("pack_brute", p),
        s"indexed pack drifted from the brute twin at budget=$budget")
      assert(idx.nonEmpty, s"budget $budget packed nothing")
    }

    // plan pin: the indexed relevance legs' plans carry the PROBE
    // artifacts (centroids + codebooks + codes — `adc_dist` is the
    // pool's ADC column, absent from any brute plan); the vectors
    // fileset appears only as the join-bounded rerank fetch. The pack
    // SQL is one statement, so its executed plan pins directly; the MMR
    // SQL stages its pool into a cached temp view (so the unrolled
    // layers read ≤indexedFetch in-memory rows, never re-running the
    // probe), so the pin runs on the staged pool statement.
    val rel = graft.queries.Similarity.artifactRelation(vidx)
    val lrel = graft.queries.Retrieval.lexRelation(spark, lidx)
    val snap = graft.queries.Similarity.resolveAll(vidx)
    def dirToken(sub: String): String =
      snap(sub).stripPrefix("file:").split("/").last
    val packPhys = spark.sql(
        graft.queries.Retrieval.contextPackNamedSqlIndexed(
          lrel, rel, "'tok5,tok13'", s"'${qv.mkString(",")}'", "512"))
      .queryExecution.executedPlan.toString
    assert(packPhys.contains(dirToken("codes")),
      "indexed pack must scan the codes artifact (ADC pool)")
    assert(packPhys.contains(dirToken("centroids")),
      "indexed pack must scan the centroids artifact (cell probe)")
    assert(packPhys.contains("adc_dist"),
      "indexed pack must rank the ADC pool, not a corpus pass")
    val brutePhys = spark.sql(
        graft.queries.Retrieval.contextPackNamedSqlIndexed(
          lrel, rel, "'tok5,tok13'", s"'${qv.mkString(",")}'", "512",
          indexed = false))
      .queryExecution.executedPlan.toString
    assert(!brutePhys.contains(dirToken("codes")),
      "twin sanity: the brute leg reads no codes")
    // the indexed MMR plan: probe artifacts present, and the greedy is
    // the single HOF fold over the collected pool — the pool (and thus
    // every index artifact) appears ONCE, not once per unrolled layer
    val mmrPhys = spark.sql(graft.queries.Retrieval.mmrNamedSqlIndexed(
        rel, s"'${qv.mkString(",")}'", "500000", "4"))
      .queryExecution.executedPlan.toString
    assert(mmrPhys.contains(dirToken("codes")) &&
      mmrPhys.contains(dirToken("centroids")) &&
      mmrPhys.contains("adc_dist"),
      "indexed MMR must pool through the two-stage probe")
    assert(mmrPhys.split(java.util.regex.Pattern.quote(
        dirToken("codes"))).length - 1 <= 1,
      "the codes artifact must be scanned exactly once (single pool)")
  }

  test("redaction over RPC + dedup/mixture history RPCs: the store of " +
    "record forgets, and every family's commit log is surfaced") {
    import org.apache.spark.sql.functions.col
    // ---- /stream/redact: payloads null through the serving path ----
    val cid = ok(post("/module/upload", Map("module" -> Map(
      "init_sql" -> "CREATE TABLE IF NOT EXISTS rn (idx BIGINT, t STRING) USING PARQUET",
      "materializer" ->
        "INSERT INTO rn SELECT idx, drisl_extract(payload, '.t') FROM event",
      "queries" -> Map("all" -> Map(
        "sql" -> "SELECT idx, t FROM rn ORDER BY idx"))))))(
      "cid").asInstanceOf[String]
    val sid = ok(post("/stream/create",
      Map("id" -> "did:graft:redact-rpc", "module_cid" -> cid)))("id").toString
    val evs = (1 to 8).map(i => Map("user" -> "u",
      "payload_b64" -> Base64.getEncoder.encodeToString(
        graft.drisl.Drisl.encode(graft.drisl.DValue.obj(
          "t" -> graft.drisl.DValue.text(s"v$i"))))))
    ok(post("/stream/event_batch", Map("id" -> sid, "events" -> evs.toVector)))
    val red = ok(post("/stream/redact",
      Map("id" -> sid, "idx" -> Vector(3L, 6L), "rematerialize" -> true)))
    assert(red("redacted") == 2L, red.toString)
    val rows = ok(post("/stream/query", Map("id" -> sid,
      "query" -> Map("name" -> "all", "limit" -> 100L))))("rows")
      .asInstanceOf[Vector[Any]].map { r =>
        val m = r.asInstanceOf[Map[String, Any]]
        def v(f: String) = m(f).asInstanceOf[Map[String, Any]]
          .getOrElse("value", null) // SqlNull tags carry no value field
        (v("idx").asInstanceOf[Long], v("t"))
      }
    assert(rows.size == 8, "idx contiguity preserved through redaction")
    assert(rows.filter(r => r._1 == 3 || r._1 == 6).forall(_._2 == null),
      s"redacted payloads must derive NULL: $rows")
    assert(rows.count(_._2 != null) == 6)
    // idempotent retry over RPC
    assert(ok(post("/stream/redact",
      Map("id" -> sid, "idx" -> Vector(3L, 6L))))("redacted") == 2L)

    // ---- history RPCs for the dedup + mixture families ----
    import spark.implicits._
    val docs = spark.range(60).select(col("id").as("doc_id"),
      org.apache.spark.sql.functions.concat_ws(" ",
        (0 until 10).map(i => org.apache.spark.sql.functions.md5(
          org.apache.spark.sql.functions.concat(col("id"),
            org.apache.spark.sql.functions.lit(i)))): _*).as("text"))
    val srcDir = TempDirs.create("graft-histrpc-src").toString
    docs.select(col("doc_id"), org.apache.spark.sql.functions
        .lit("srcA").as("source"), col("text"))
      .write.mode("overwrite").parquet(s"$srcDir/documents.parquet")
    val dIdx = TempDirs.create("graft-histrpc-dedup").toString
    graft.queries.Dedup.buildDedupIndex(spark,
      docs.select("doc_id", "text"), dIdx)
    graft.queries.Dedup.deleteFromDedupIndex(spark,
      docs.filter(col("doc_id") % 5 === 0).select("doc_id"), dIdx)
    val dh = ok(post("/admin/dedup_index_history", Map("dir" -> dIdx)))(
      "commits").asInstanceOf[Vector[Any]]
      .map(_.asInstanceOf[Map[String, Any]])
    assert(dh.map(_("kind")) == Vector("build", "delete"), dh.toString)
    assert(dh.forall(_("readable") == true))
    val mIdx = TempDirs.create("graft-histrpc-mix").toString
    ok(post("/admin/mixture_stats_build",
      Map("src" -> srcDir, "dir" -> mIdx)))
    val mh = ok(post("/admin/mixture_stats_history", Map("dir" -> mIdx)))(
      "commits").asInstanceOf[Vector[Any]]
      .map(_.asInstanceOf[Map[String, Any]])
    assert(mh.map(_("kind")) == Vector("build"), mh.toString)
    assert(mh.forall(_("readable") == true))
  }

  test("targeted deletion over RPC: tombstone commits across the four " +
    "families, probes exclude immediately, compaction purges") {
    val src = "/root/testdata/sf0.001"

    // ---- vector: delete → live drops, physical rows unchanged; the
    // compact RPC purges and drains the set ----
    val vidx = TempDirs.create("graft-srv-vdel").toString
    ok(post("/admin/vector_index_build", Map("src" -> src, "dir" -> vidx)))
    val v0 = ok(post("/admin/vector_index_info", Map("dir" -> vidx)))
    val vTotal = v0("vectors").asInstanceOf[Long]
    val vd = ok(post("/admin/vector_index_delete",
      Map("dir" -> vidx, "ids" -> Vector(1L, 2L, 3L, 987654321L))))
    assert(vd("tombstones") == 3L, vd.toString)
    val v1 = ok(post("/admin/vector_index_info", Map("dir" -> vidx)))
    assert(v1("vectors") == vTotal && v1("live") == vTotal - 3L,
      "a logical delete must move no rows")
    val vc = ok(post("/admin/vector_index_compact", Map("dir" -> vidx)))
    assert(vc("tombstones") == 0L && vc("vectors") == vTotal - 3L,
      s"compaction must purge: $vc")

    // ---- lexical: delete → the $terms named query over RPC matches a
    // plain-Scala Okapi recompute over the SURVIVORS (incremental
    // df/avgdl correction proven end to end through the serving path) ----
    val lidx = TempDirs.create("graft-srv-ldel").toString
    ok(post("/admin/lexical_index_build", Map("src" -> src, "dir" -> lidx)))
    val bmSql = graft.queries.Retrieval.bm25NamedSql(
      a => s"ld_$a", "$terms", "CAST($limit AS INT)")
    val cid = ok(post("/module/upload", Map("module" -> Map(
      "queries" -> Map("bm25" -> Map(
        "sql" -> bmSql,
        "params" -> Vector(Map("name" -> "terms", "kind" -> "text"))))))))(
      "cid").asInstanceOf[String]
    val sid = ok(post("/stream/create",
      Map("id" -> "did:graft:delsearch", "module_cid" -> cid)))("id").toString
    ok(post("/admin/lexical_index_attach",
      Map("id" -> sid, "prefix" -> "ld", "dir" -> lidx)))
    val tokAll = spark.read.parquet(s"$src/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase
        .split("\\s+").toSeq).toSeq
    val common = tokAll.flatMap(_._2).filterNot(_.isEmpty)
      .groupBy(identity).view.mapValues(_.length).toSeq
      .maxBy { case (t, c) => (c, t) }._1
    // delete a third of the docs that actually CONTAIN the probe term —
    // both the df correction and the result exclusion must show
    val victims = tokAll.filter(_._2.contains(common)).map(_._1)
      .filter(_ % 3 == 0)
    assert(victims.nonEmpty)
    val ld = ok(post("/admin/lexical_index_delete",
      Map("dir" -> lidx, "ids" -> victims.toVector)))
    assert(ld("deleted") == victims.size.toLong, ld.toString)
    // the attach re-resolved on the delete's pointer flip: query now
    val got = ok(post("/stream/query", Map("id" -> sid, "query" -> Map(
      "name" -> "bm25", "limit" -> 1000L,
      "params" -> Map("terms" -> common)))))("rows")
      .asInstanceOf[Vector[Any]].map { r =>
        val m = r.asInstanceOf[Map[String, Any]]
        def l(f: String) = m(f).asInstanceOf[Map[String, Any]]("value")
          .asInstanceOf[Long]
        (l("doc_id"), l("score_micro"))
      }
    // plain-Scala Okapi over the survivors (the lexical e2e's oracle)
    def rnd(x: Double): Long = java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    val surv = tokAll.filterNot { case (id, _) => victims.contains(id) }
    val n = surv.length
    val dls = surv.map { case (id, ws) => id -> ws.size.toLong }.toMap
    val avgdl = dls.values.sum.toDouble / n
    val df = surv.count(_._2.contains(common)).toLong
    val expected = surv.flatMap { case (id, ws) =>
      val tf = ws.count(_ == common).toLong
      if (tf == 0L) None
      else {
        val idf = rnd(math.log(((n - df).toDouble + 0.5) /
          (df.toDouble + 0.5) + 1.0) * 1e6)
        Some(id -> rnd(idf * ((tf.toDouble * 2.2) / (tf.toDouble +
          1.2 * (0.25 + (0.75 * dls(id).toDouble) / avgdl)))))
      }
    }.sortBy { case (id, sc) => (-sc, id) }
    assert(got == expected.toVector,
      s"post-delete RPC scores drifted from the survivor recompute")
    assert(got.map(_._1).forall(id => !victims.contains(id)))

    // ---- dedup: delete → live count and tombstones surface over RPC ----
    val didx = TempDirs.create("graft-srv-ddel").toString
    ok(post("/admin/dedup_index_build", Map("src" -> src, "dir" -> didx)))
    val d0 = ok(post("/admin/dedup_index_info", Map("dir" -> didx)))
    val dCount = d0("count").asInstanceOf[Long]
    val dd = ok(post("/admin/dedup_index_delete",
      Map("dir" -> didx, "ids" -> Vector(1L, 2L, 999999999L))))
    assert(dd("deleted") == 2L || dd("deleted") == 3L, dd.toString)
    val d1 = ok(post("/admin/dedup_index_info", Map("dir" -> didx)))
    assert(d1("count").asInstanceOf[Long] ==
      dCount - dd("deleted").asInstanceOf[Long])
    assert(d1("tombstones") == dd("deleted"))

    // ---- mixture: inline-docs delete (the takedown shape) → docs drop,
    // weights re-serve from the corrected fold ----
    val midx = TempDirs.create("graft-srv-mdel").toString
    ok(post("/admin/mixture_stats_build", Map("src" -> src, "dir" -> midx)))
    val w0 = ok(post("/admin/mixture_weights", Map("dir" -> midx)))(
      "weights").asInstanceOf[Vector[Any]]
    val takedown = spark.read.parquet(s"$src/documents.parquet")
      .select("source", "text").limit(3).collect()
      .map(r => Map("source" -> r.getString(0), "text" -> r.getString(1)))
    val md = ok(post("/admin/mixture_stats_delete",
      Map("dir" -> midx, "docs" -> takedown.toVector)))
    assert(md("deleted_docs") == 3L, md.toString)
    val m1 = ok(post("/admin/mixture_stats_info", Map("dir" -> midx)))
    assert(m1("docs").asInstanceOf[Long] ==
      spark.read.parquet(s"$src/documents.parquet").count() - 3L)
    val w1 = ok(post("/admin/mixture_weights", Map("dir" -> midx)))(
      "weights").asInstanceOf[Vector[Any]]
    assert(w1 != w0, "a delete that removes token mass must move weights")
  }

  test("json parser caps container nesting (no stack overflow on [[[…)") {
    val hostile = "[" * 100000 + "]" * 100000
    val e = intercept[IllegalArgumentException](graft.server.Json.parse(hostile))
    assert(e.getMessage.contains("nesting"))
    // shallow documents still parse
    assert(graft.server.Json.parse("[[[1]]]") ==
      Vector(Vector(Vector(1L))))
  }

  test("composed forget over RPC (round 16): ONE call drives redact + " +
    "the four family deletes, one audit line enumerates all five " +
    "commits, and every surface answers survivor-only") {
    import org.apache.spark.sql.functions._
    // corpus: 200 docs (each with a unique lowercase token) + clustered
    // embeddings; a stream whose events carry their own payloads
    val src = TempDirs.create("graft-forget-src").toString
    val docs = spark.range(200).select(col("id").as("doc_id"),
      concat(lit("src"), (col("id") % 4).cast("string")).as("source"),
      concat_ws(" ",
        concat(lit("toku"), col("id").cast("string")) +:
          (0 until 10).map(i => md5(concat(col("id"), lit(i)))): _*)
        .as("text"))
    docs.write.mode("overwrite").parquet(s"$src/documents.parquet")
    spark.range(200)
      .select(col("id").as("vec_id"), (col("id") % 5).cast("int").as("label"))
      .select(col("vec_id"), expr(
        "transform(sequence(0, 15), i -> CAST(" +
          "(pmod(hash(label, i), 2001) - 1000) / 1000.0 + " +
          "(pmod(hash(vec_id, i, 7), 201) - 100) / 100.0 * 0.15 AS FLOAT))")
        .as("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$src/embeddings.parquet")
    val (vidx, lidx, didx, midx) = (
      TempDirs.create("graft-forget-vec").toString,
      TempDirs.create("graft-forget-lex").toString,
      TempDirs.create("graft-forget-dedup").toString,
      TempDirs.create("graft-forget-mix").toString)
    ok(post("/admin/vector_index_build", Map("src" -> src, "dir" -> vidx)))
    ok(post("/admin/lexical_index_build", Map("src" -> src, "dir" -> lidx)))
    ok(post("/admin/dedup_index_build", Map("src" -> src, "dir" -> didx)))
    ok(post("/admin/mixture_stats_build", Map("src" -> src, "dir" -> midx)))

    val cid = ok(post("/module/upload", Map("module" -> Map(
      "init_sql" -> "CREATE TABLE IF NOT EXISTS fn (idx BIGINT, t STRING) USING PARQUET",
      "materializer" ->
        "INSERT INTO fn SELECT idx, drisl_extract(payload, '.t') FROM event",
      "queries" -> Map("all" -> Map(
        "sql" -> "SELECT idx, t FROM fn ORDER BY idx"))))))(
      "cid").asInstanceOf[String]
    val sid = ok(post("/stream/create",
      Map("id" -> "did:graft:forget-rpc", "module_cid" -> cid)))("id").toString
    val evs = (1 to 12).map(i => Map("user" -> "u",
      "payload_b64" -> Base64.getEncoder.encodeToString(
        graft.drisl.Drisl.encode(graft.drisl.DValue.obj(
          "t" -> graft.drisl.DValue.text(s"v$i"))))))
    ok(post("/stream/event_batch", Map("id" -> sid, "events" -> evs.toVector)))
    ok(post("/admin/vector_index_attach",
      Map("id" -> sid, "prefix" -> "fg", "dir" -> vidx)))
    ok(post("/admin/lexical_index_attach",
      Map("id" -> sid, "prefix" -> "fl", "dir" -> lidx)))

    // THE verb: forget events 3 and 7 at the store of record, and docs
    // 5 and 10 across all four derived families, in one call
    val forgotten = docs.filter(col("doc_id").isin(5L, 10L))
      .select("source", "text").collect()
      .map(r => Map("source" -> r.getString(0), "text" -> r.getString(1)))
      .toVector
    val out = ok(post("/stream/forget", Map(
      "id" -> sid, "idx" -> Vector(3L, 7L),
      "vec_ids" -> Vector(5L, 10L), "doc_ids" -> Vector(5L, 10L),
      "vector_dir" -> vidx, "lexical_dir" -> lidx,
      "dedup_dir" -> didx, "mixture_dir" -> midx,
      "docs" -> forgotten, "rematerialize" -> true)))
    assert(out("redacted") == 2L, out.toString)
    assert(out("vector_tombstones") == 2L, out.toString)
    assert(out("lexical_deleted") == 2L, out.toString)
    assert(out("dedup_deleted") == 2L, out.toString)
    assert(out("mixture_deleted_docs") == 2L, out.toString)
    assert(out("audit_seq") == 1L, out.toString)

    // ONE committed audit entry enumerating the FIVE commits (stream +
    // 4 families); the pending intent line folded into it
    val audit = store.open(sid).forgetAudit
    assert(audit.size == 1 && audit.head._1 == 1 &&
      audit.head._2 == "committed", audit.toString)
    val line = audit.head._3
    for (tok <- Seq("stream:redact_seq=1+remat", s"vector:$vidx@seq=",
        s"lexical:$lidx@seq=", s"dedup:$didx@seq=", s"mixture:$midx@seq="))
      assert(line.contains(tok), s"audit line missing '$tok': $line")

    // surface 1 — raw scan: idx 3 and 7 read NULL payloads
    val h = store.open(sid)
    val raws = h.rawGetEvents(1, 12).collect()
    assert(raws.length == 12 &&
      raws.filter(r => r.getLong(0) == 3 || r.getLong(0) == 7)
        .forall(_.isNullAt(2)), "redaction must reach raw scans")
    // surface 2 — module query (rematerialized in the same call): the
    // derived rows forgot too
    val rows = ok(post("/stream/query", Map("id" -> sid,
      "query" -> Map("name" -> "all", "limit" -> 100L))))("rows")
      .asInstanceOf[Vector[Any]].map { r =>
        val m = r.asInstanceOf[Map[String, Any]]
        def v(f: String) = m(f).asInstanceOf[Map[String, Any]]
          .getOrElse("value", null)
        (v("idx").asInstanceOf[Long], v("t"))
      }
    assert(rows.size == 12 &&
      rows.filter(r => r._1 == 3 || r._1 == 7).forall(_._2 == null) &&
      rows.count(_._2 != null) == 10, rows.toString)
    val info = ok(post("/stream/info", Map("id" -> sid)))
    assert(info("module_tables_predate_redaction") == false,
      "rematerialize converged the module tables in the same call")
    // surface 3 — kNN through the persisted index: the deleted vectors
    // are gone from the attached view and from a two-stage probe
    val rel = graft.queries.Similarity.artifactRelation(vidx)
    val liveIds = spark.sql(s"SELECT vec_id FROM ${rel("vectors")} v")
      .collect().map(_.getLong(0)).toSet
    assert(liveIds.size == 198 && !liveIds(5L) && !liveIds(10L))
    val qv = spark.read.parquet(s"$src/embeddings.parquet")
      .where(col("vec_id") === 5L).select("embedding").head()
      .getSeq[Float](0)
      .map(x => math.floor(x.toDouble * 64 + 0.5).toLong).mkString(",")
    val knn = spark.sql(graft.queries.Similarity.twoStageKnnSqlFor(
      spark, vidx, rel, s"'$qv'", "5")).collect().map(_.getLong(0)).toSet
    assert(!knn(5L) && !knn(10L),
      "a probe AT the forgotten vector must answer survivors only")
    // surface 4 — BM25: the forgotten doc's unique token finds nothing;
    // a survivor's still does; n corrected in the same commit
    val lrel = graft.queries.Retrieval.lexRelation(spark, lidx)
    assert(spark.sql(graft.queries.Retrieval.bm25NamedSql(
      lrel, "'toku5'", "10")).count() == 0L,
      "the forgotten doc must be unfindable by its own token")
    assert(spark.sql(graft.queries.Retrieval.bm25NamedSql(
      lrel, "'toku6'", "10")).count() == 1L)
    assert(graft.queries.Retrieval.lexicalIndexInfo(spark, lidx)("docs")
      == 198L)
    // surface 5 — dedup increment: a clone of the forgotten text now
    // classifies NEW (nothing to be a duplicate of), a clone of a
    // survivor stays exact
    import spark.implicits._
    val probe = docs.filter(col("doc_id").isin(5L, 6L))
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val verdicts = graft.queries.Dedup.incrementVsIndex(spark, probe, didx)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(verdicts(100005L) == "new",
      s"forgotten doc must not match the index: $verdicts")
    assert(verdicts(100006L) == "exact", verdicts.toString)
    // surface 6 — mixture weights: integer-exact with a from-scratch
    // build over the survivors
    val midx2 = TempDirs.create("graft-forget-mix2").toString
    graft.queries.Pipeline.buildMixtureStatsDf(spark,
      docs.filter(!col("doc_id").isin(5L, 10L)).select("source", "text"),
      midx2)
    def weights(d: String): Map[String, Any] =
      graft.queries.Pipeline.mixtureWeights(spark, d).collect()
        .map(r => r.getString(0) -> r.get(1)).toMap
    assert(weights(midx) == weights(midx2),
      "post-forget mixture weights must equal the survivor recompute")
    // surface 7 — backup round-trip: the archive carries the redaction
    val bak = "file:" + TempDirs.create("graft-forget-bak")
    graft.stream.BackupService.backup(h, bak)
    val store2 = new StreamStore(spark,
      TempDirs.create("graft-forget-rest").toString)
    val restored = graft.stream.BackupService.restore(
      store2, "did:graft:forget-restored", bak)
    val rraw = restored.rawGetEvents(1, 12).collect()
    assert(rraw.count(_.isNullAt(2)) == 2,
      "the restored stream must carry the redaction")

    // a second forget appends audit seq 2 (no remat: exposure re-rises)
    val out2 = ok(post("/stream/forget",
      Map("id" -> sid, "idx" -> Vector(9L))))
    assert(out2("redacted") == 3L && out2("audit_seq") == 2L, out2.toString)
    assert(ok(post("/stream/info", Map("id" -> sid)))(
      "module_tables_predate_redaction") == true)
    // the audit ledger is served over RPC too
    val served = ok(post("/stream/forget_audit", Map("id" -> sid)))(
      "entries").asInstanceOf[Vector[Any]]
      .map(_.asInstanceOf[Map[String, Any]])
    assert(served.map(_("seq")) == Vector(1L, 2L), served.toString)
    assert(served.head("summary").toString.contains(s"dedup:$didx@seq="))
    assert(served(1)("summary").toString.contains("stream:redact_seq=2"))
    // user-keyed forget: the takedown arrives as "forget user X" — the
    // stream resolves the user's events itself, one commit
    val out3 = ok(post("/stream/forget",
      Map("id" -> sid, "users" -> Vector("u"))))
    assert(out3("redacted") == 12L && out3("audit_seq") == 3L,
      out3.toString)
    assert(store.open(sid).forgetAudit.last._3.contains("users=1"))
  }

  test("forget intent ledger (round 17, verdict r16 item 2): a forget " +
    "killed between legs leaves a PENDING intent discoverable over RPC; " +
    "re-running the same forget resumes the seq, rides the idempotent " +
    "legs, and completes with survivor-only answers") {
    import org.apache.spark.sql.functions._
    val cid = ok(post("/module/upload", Map("module" -> Map(
      "init_sql" -> "CREATE TABLE IF NOT EXISTS fc (idx BIGINT, t STRING) USING PARQUET",
      "materializer" ->
        "INSERT INTO fc SELECT idx, drisl_extract(payload, '.t') FROM event",
      "queries" -> Map("all" -> Map(
        "sql" -> "SELECT idx, t FROM fc ORDER BY idx"))))))(
      "cid").asInstanceOf[String]
    val sid = ok(post("/stream/create",
      Map("id" -> "did:graft:forget-crash", "module_cid" -> cid)))(
      "id").toString
    val evs = (1 to 8).map(i => Map("user" -> "u",
      "payload_b64" -> Base64.getEncoder.encodeToString(
        graft.drisl.Drisl.encode(graft.drisl.DValue.obj(
          "t" -> graft.drisl.DValue.text(s"v$i"))))))
    ok(post("/stream/event_batch", Map("id" -> sid, "events" -> evs.toVector)))

    val docsDf = spark.range(60).select(col("id").as("doc_id"),
      concat(lit("src"), (col("id") % 4).cast("string")).as("source"),
      concat_ws(" ", (0 until 10).map(i =>
        md5(concat(col("id"), lit(i)))): _*).as("text"))
    val didx = TempDirs.create("graft-fcrash-dedup").toString
    graft.queries.Dedup.buildDedupIndex(spark,
      docsDf.select("doc_id", "text"), didx)
    val midx = TempDirs.create("graft-fcrash-mix").toString
    graft.queries.Pipeline.buildMixtureStatsDf(spark,
      docsDf.select("source", "text"), midx)

    // the injected kill: hide the mixture family's meta so its leg
    // throws a clean refusal — exactly a crash AFTER the redact + dedup
    // legs committed and BEFORE the mixture commit (a family boundary)
    val mixMeta = java.nio.file.Paths.get(midx, "meta.json")
    val mixHidden = java.nio.file.Paths.get(midx, "meta.json.hidden")
    val deleted = docsDf.filter(col("doc_id").isin(5L, 10L))
    val h = store.open(sid)
    val t = graft.stream.Forget.Targets(idx = Seq(3L),
      docIds = Seq(5L, 10L), dedupDir = Some(didx),
      mixtureDir = Some(midx),
      mixtureDocs = Some(deleted.select("source", "text")))
    java.nio.file.Files.move(mixMeta, mixHidden)
    intercept[Throwable](graft.stream.Forget(spark, h, t))

    // REOPEN before discovery — the crashed process is gone; the open
    // intent must come off disk, not off any in-memory state
    h.close()
    val h2 = store.open(sid)
    assert(h2.forgetAudit.map(e => (e._1, e._2)) == Seq((1, "pending")),
      h2.forgetAudit.toString)

    // the prefix applied (redact + dedup committed, mixture did not) and
    // the ledger KNOWS: one open pending intent, served over RPC
    val pend = ok(post("/stream/forget_audit", Map("id" -> sid)))(
      "entries").asInstanceOf[Vector[Any]]
      .map(_.asInstanceOf[Map[String, Any]])
    assert(pend.size == 1 && pend.head("status") == "pending" &&
      pend.head("seq") == 1L, pend.toString)
    assert(pend.head("summary").toString.contains(s"mixture:$midx"),
      pend.toString)

    // a DIFFERENT takedown with identical counts and dirs must open its
    // OWN intent, not resume the crashed one (the resume key digests
    // the actual target values) — resuming would hand it the crashed
    // takedown's replay token and skip its own legs
    java.nio.file.Files.move(mixHidden, mixMeta)
    val other = docsDf.filter(col("doc_id").isin(20L, 21L))
    val outOther = graft.stream.Forget(spark, h2,
      graft.stream.Forget.Targets(idx = Seq(4L),
        docIds = Seq(20L, 21L), dedupDir = Some(didx),
        mixtureDir = Some(midx),
        mixtureDocs = Some(other.select("source", "text"))))
    assert(outOther("audit_seq") == 2L,
      s"a distinct takedown must not resume a crashed intent: $outOther")
    assert(outOther("mixture_deleted_docs") == 2L, outOther.toString)

    // the operator's documented recovery: re-run the SAME forget — it
    // resumes intent seq 1, the committed legs no-op, the mixture leg
    // commits once, and the intent closes
    val out = graft.stream.Forget(spark, h2, t)
    assert(out("audit_seq") == 1L, out.toString)
    assert(out("dedup_deleted") == 0L,
      s"the dedup leg committed before the kill and must no-op: $out")
    assert(out("mixture_deleted_docs") == 2L, out.toString)
    val done = ok(post("/stream/forget_audit", Map("id" -> sid)))(
      "entries").asInstanceOf[Vector[Any]]
      .map(_.asInstanceOf[Map[String, Any]])
    assert(done.size == 2 && done.forall(_("status") == "committed") &&
      done.head("summary").toString.contains(s"dedup:$didx@seq="),
      done.toString)

    // survivor-only on every touched surface: raw payload nulled, a
    // clone of a forgotten doc classifies NEW, and the mixture weights
    // equal a from-scratch survivor recompute (negated exactly ONCE)
    assert(h2.rawGetEvents(3, 3).head().isNullAt(2))
    import spark.implicits._
    val probe = docsDf.filter(col("doc_id") === 5L)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    assert(graft.queries.Dedup.incrementVsIndex(spark, probe, didx)
      .head().getString(1) == "new")
    val midx2 = TempDirs.create("graft-fcrash-mix2").toString
    graft.queries.Pipeline.buildMixtureStatsDf(spark,
      docsDf.filter(!col("doc_id").isin(5L, 10L, 20L, 21L))
        .select("source", "text"), midx2)
    def weights(d: String): Map[String, Any] =
      graft.queries.Pipeline.mixtureWeights(spark, d).collect()
        .map(r => r.getString(0) -> r.get(1)).toMap
    assert(weights(midx) == weights(midx2),
      "the resumed mixture leg must negate exactly once")

    // the replay token itself, unit-level: the OTHER crash window (the
    // mixture commit landed, the audit append did not) — a repeat
    // delete with the same token provably no-ops
    val more = docsDf.filter(col("doc_id").isin(22L, 23L))
      .select("source", "text")
    val tok = s"$sid#forget#99"
    val d1 = graft.queries.Pipeline.deleteMixtureStats(
      spark, more, midx, Some(tok))
    assert(d1("deleted_docs") == 2L && !d1.contains("replayed"))
    val w1 = weights(midx)
    val d2 = graft.queries.Pipeline.deleteMixtureStats(
      spark, more, midx, Some(tok))
    assert(d2("deleted_docs") == 0L && d2("replayed") == 1L, d2.toString)
    assert(weights(midx) == w1,
      "a token replay must not double-negate the monoid")
  }

  test("forget authority is owner-scoped, not attachment-scoped (r16 " +
    "ADVICE): a non-admin owner forgets only from indexes EXCLUSIVELY " +
    "attached to their stream — shared and unattached dirs refuse, and " +
    "the mixture src-path read stays admin-gated") {
    import org.apache.spark.sql.functions._
    // a VERIFIED (non-trusted) owner: ES256 JWT auth, the JwtAuthSpec
    // token construction
    val kpg = java.security.KeyPairGenerator.getInstance("EC")
    kpg.initialize(new java.security.spec.ECGenParameterSpec("secp256r1"))
    val ownerKey = kpg.generateKeyPair()
    val serverDid = "did:web:graft.test"
    val auth = new graft.server.JwtAuth(serverDid, did =>
      if (did == "did:plc:owner")
        Some(graft.server.JwtAuth.P256(ownerKey.getPublic)) else None)
    def b64url(b: Array[Byte]): String =
      Base64.getUrlEncoder.withoutPadding.encodeToString(b)
    def derToJose(der: Array[Byte]): Array[Byte] = {
      def readInt(at: Int): (Array[Byte], Int) = {
        val len = der(at + 1) & 0xff
        (der.slice(at + 2, at + 2 + len).dropWhile(_ == 0), at + 2 + len)
      }
      val (r, next) = readInt(2)
      val (s, _) = readInt(next)
      def pad(b: Array[Byte]) = Array.fill[Byte](32 - b.length)(0) ++ b
      pad(r) ++ pad(s)
    }
    def ownerJwt(): String = {
      val h = b64url(Json.render(
        Map("alg" -> "ES256", "typ" -> "JWT")).getBytes("UTF-8"))
      val c = b64url(Json.render(Map(
        "iss" -> "did:plc:owner", "aud" -> serverDid,
        "lxm" -> "town.muni.leaf.authenticate",
        "exp" -> (System.currentTimeMillis() / 1000 + 600))).getBytes("UTF-8"))
      val signer = java.security.Signature.getInstance("SHA256withECDSA")
      signer.initSign(ownerKey.getPrivate)
      signer.update(s"$h.$c".getBytes("UTF-8"))
      s"$h.$c.${b64url(derToJose(signer.sign()))}"
    }

    val store2 = new StreamStore(spark,
      TempDirs.create("graft-authz-store").toString)
    val jwtSrv = new LeafServer(store2, 0, jwt = Some(auth))
    jwtSrv.start()
    val admSrv = new LeafServer(store2, 0, authToken = Some("admtok"))
    admSrv.start()
    def postAs(srv: LeafServer, bearer: String, path: String,
        body: Map[String, Any], did: Option[String] = None): Map[String, Any] = {
      val b = HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${srv.boundPort}$path"))
        .POST(HttpRequest.BodyPublishers.ofString(Json.render(body)))
        .header("Authorization", s"Bearer $bearer")
      did.foreach(d => b.header("X-Graft-Did", d))
      Json.parse(client.send(b.build(),
        HttpResponse.BodyHandlers.ofString()).body())
        .asInstanceOf[Map[String, Any]]
    }
    try {
      // corpus + two vector indexes: one attached to BOTH streams (a
      // shared serving index), one exclusively to the owner's stream
      val src = TempDirs.create("graft-authz-src").toString
      spark.range(100)
        .select(col("id").as("vec_id"), (col("id") % 5).cast("int").as("label"))
        .select(col("vec_id"), expr(
          "transform(sequence(0, 15), i -> CAST(" +
            "(pmod(hash(label, i), 2001) - 1000) / 1000.0 AS FLOAT))")
          .as("embedding"), col("label"))
        .write.mode("overwrite").parquet(s"$src/embeddings.parquet")
      spark.range(100).select(col("id").as("doc_id"),
          concat(lit("src"), (col("id") % 4).cast("string")).as("source"),
          concat_ws(" ", (0 until 10).map(i =>
            md5(concat(col("id"), lit(i)))): _*).as("text"))
        .write.mode("overwrite").parquet(s"$src/documents.parquet")
      val vShared = TempDirs.create("graft-authz-vshared").toString
      val vOwn = TempDirs.create("graft-authz-vown").toString
      graft.queries.Similarity.buildVectorIndex(spark, src, vShared)
      graft.queries.Similarity.buildVectorIndex(spark, src, vOwn)
      val cid = ok(postAs(admSrv, "admtok", "/module/upload", Map(
        "module" -> Map(
          "init_sql" -> "CREATE TABLE IF NOT EXISTS az (idx BIGINT) USING PARQUET",
          "materializer" -> "INSERT INTO az SELECT idx FROM event"))))(
        "cid").asInstanceOf[String]
      def create(id: String, did: String): String = {
        val b = HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${admSrv.boundPort}/stream/create"))
          .POST(HttpRequest.BodyPublishers.ofString(Json.render(
            Map("id" -> id, "module_cid" -> cid))))
          .header("Authorization", "Bearer admtok")
          .header("X-Graft-Did", did)
        ok(Json.parse(client.send(b.build(),
          HttpResponse.BodyHandlers.ofString()).body())
          .asInstanceOf[Map[String, Any]])("id").toString
      }
      val sa = create("did:graft:authz-a", "did:plc:owner")
      val sb = create("did:graft:authz-b", "did:plc:other")
      ok(postAs(admSrv, "admtok", "/admin/vector_index_attach",
        Map("id" -> sa, "prefix" -> "sh", "dir" -> vShared)))
      ok(postAs(admSrv, "admtok", "/admin/vector_index_attach",
        Map("id" -> sb, "prefix" -> "sh", "dir" -> vShared)))
      ok(postAs(admSrv, "admtok", "/admin/vector_index_attach",
        Map("id" -> sa, "prefix" -> "own", "dir" -> vOwn)))

      // the VERIFIED owner of stream A:
      // 1. an unattached dir refuses (the r16 rule, still in force)
      val r1 = postAs(jwtSrv, ownerJwt(), "/stream/forget", Map(
        "id" -> sa, "vec_ids" -> Vector(1L),
        "vector_dir" -> TempDirs.create("graft-authz-foreign").toString))
      assert(r1.get("err").exists(_.toString.contains("not attached")),
        r1.toString)
      // 2. a SHARED attached dir refuses — attachment (a read grant) must
      //    not mint delete authority over rows other tenants serve
      val r2 = postAs(jwtSrv, ownerJwt(), "/stream/forget", Map(
        "id" -> sa, "vec_ids" -> Vector(1L), "vector_dir" -> vShared))
      assert(r2.get("err").exists(_.toString.contains(
        "attached to other streams")), r2.toString)
      assert(graft.queries.Similarity.vectorIndexInfo(spark, vShared)(
        "live") == 100L, "the refused forget must tombstone nothing")
      // 3. an EXCLUSIVELY attached dir is the owner's to forget from
      val r3 = ok(postAs(jwtSrv, ownerJwt(), "/stream/forget", Map(
        "id" -> sa, "vec_ids" -> Vector(1L), "vector_dir" -> vOwn)))
      assert(r3("vector_tombstones") == 1L, r3.toString)
      // 4. the mixture src-path read refuses non-admins explicitly even
      //    with an attached-dir bypass hypothetically gone — inline docs
      //    are the owner-keyed shape (today the dir check fires first;
      //    the admin gate is the defense in depth behind it)
      val midx = TempDirs.create("graft-authz-mix").toString
      graft.queries.Pipeline.buildMixtureStats(spark, src, midx)
      val r4 = postAs(jwtSrv, ownerJwt(), "/stream/forget", Map(
        "id" -> sa, "doc_ids" -> Vector(1L),
        "mixture_dir" -> midx, "src" -> s"$src/documents.parquet"))
      assert(r4.get("err").exists(e =>
        e.toString.contains("not attached") ||
          e.toString.contains("trusted/admin")), r4.toString)
      // ... while a TRUSTED caller (claiming the owner identity — the
      // user_override channel) may drive the src-path branch
      val r5 = ok(postAs(admSrv, "admtok", "/stream/forget", Map(
        "id" -> sa, "doc_ids" -> Vector(1L),
        "mixture_dir" -> midx, "src" -> s"$src/documents.parquet"),
        did = Some("did:plc:owner")))
      assert(r5("mixture_deleted_docs") == 100L, r5.toString)
    } finally { jwtSrv.stop(); admSrv.stop() }
  }
}
