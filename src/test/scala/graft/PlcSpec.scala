package graft

import java.util.Base64

import org.scalatest.funsuite.AnyFunSuite

import graft.drisl.DValue._
import graft.server.{Json, JwtAuth, LeafServer, LocalPlcDirectory, Plc, Secp256k1}
import graft.stream.StreamStore

/** did:plc identity from the public PLC spec: key encoding, operation
  * signing/verification, DID derivation, the local directory's chain
  * validation, and the full offline ATProto auth loop (mint a DID, sign
  * an ES256K service JWT with its key, resolve + verify through JwtAuth).
  * Behavioral spec: /root/reference/leaf-server/src/did.rs. */
class PlcSpec extends AnyFunSuite {

  test("base58btc round-trips, including leading zeros") {
    val cases = Vector(
      Array[Byte](0, 0, 1, 2, 3),
      Array[Byte](-1, -2, -3),
      Array[Byte](0),
      "hello world".getBytes("UTF-8"))
    cases.foreach { b =>
      assert(Plc.base58Decode(Plc.base58Encode(b)).toSeq == b.toSeq)
    }
    // the canonical public test vector
    assert(Plc.base58Encode("Hello World!".getBytes("UTF-8")) == "2NEpo7TZRRrLZSi2U")
  }

  test("did:key encodes the secp256k1 multicodec and round-trips") {
    val key = Plc.SigningKey.generate()
    val dk = key.didKey
    assert(dk.startsWith("did:key:z"))
    val parsed = Plc.keyFromDidKey(dk)
    assert(parsed == key.pub)
    // compressed SEC1 round-trip independently of did:key
    assert(Secp256k1.decodePoint(Secp256k1.compress(key.pub)) == key.pub)
  }

  test("deterministic signing: RFC 6979 nonce, low-S, verifiable") {
    val key = Plc.SigningKey.generate()
    val msg = java.security.MessageDigest.getInstance("SHA-256")
      .digest("leaf".getBytes("UTF-8"))
    val s1 = key.sign(msg)
    val s2 = key.sign(msg)
    assert(s1.toSeq == s2.toSeq, "deterministic k must reproduce the signature")
    val (r, s) = (BigInt(1, s1.take(32)), BigInt(1, s1.drop(32)))
    assert(s <= BigInt(Secp256k1.n) / 2, "s must be canonicalized low")
    assert(Secp256k1.verify(key.pub, msg, r.bigInteger, s.bigInteger))
    // a different message must not verify under the same signature
    val other = java.security.MessageDigest.getInstance("SHA-256")
      .digest("evil".getBytes("UTF-8"))
    assert(!Secp256k1.verify(key.pub, other, r.bigInteger, s.bigInteger))
  }

  test("genesis op: signs, verifies, hashes to a well-formed did:plc") {
    val key = Plc.SigningKey.generate()
    val signed = Plc.signOp(Plc.genesisOp(key, "http://leaf.test/"), key)
    assert(Plc.verifyOp(signed, Seq(key.didKey)))
    val did = Plc.didForOp(signed)
    assert(did.matches("did:plc:[a-z2-7]{24}"), did)
    // deterministic: the same op hashes to the same did
    assert(Plc.didForOp(signed) == did)
    // tampering with any field breaks the signature
    val tampered = DMap(signed.v + ("alsoKnownAs" -> arr(text("leaf://evil"))))
    assert(!Plc.verifyOp(tampered, Seq(key.didKey)))
    // a foreign key is not a valid signer
    val mallory = Plc.SigningKey.generate()
    assert(!Plc.verifyOp(signed, Seq(mallory.didKey)))
  }

  test("directory: handle updates chain by prev CID and rewrite the alias") {
    val dir = new LocalPlcDirectory
    val did = dir.createDid("http://leaf.test/")
    assert(did.startsWith("did:plc:"))
    assert(dir.alsoKnownAs(did) == Vector.empty)

    assert(dir.updateHandle(did, Some("my-stream")).isRight)
    assert(dir.alsoKnownAs(did) == Vector("leaf://my-stream"))
    assert(dir.auditLog(did).size == 2)

    // replacing rewrites (the reference retains non-leaf aliases only)
    assert(dir.updateHandle(did, Some("renamed")).isRight)
    assert(dir.alsoKnownAs(did) == Vector("leaf://renamed"))

    // clearing drops the alias
    assert(dir.updateHandle(did, None).isRight)
    assert(dir.alsoKnownAs(did) == Vector.empty)

    // a stale prev (replayed first update) is rejected
    val stale = dir.auditLog(did)(1)
    assert(dir.submit(did, stale).isLeft)

    // an update signed by a non-rotation key is rejected
    val latest = dir.auditLog(did).last
    val mallory = Plc.SigningKey.generate()
    val forged = Plc.signOp(
      Plc.updateHandleOp(latest, Plc.opCid(latest), Some("stolen")), mallory)
    assert(dir.submit(did, forged).isLeft)
    assert(dir.updateHandle("did:plc:unknown000000000000000000", Some("x")).isLeft)
  }

  test("offline ATProto auth loop: did:plc key signs an ES256K JWT that verifies") {
    val dir = new LocalPlcDirectory
    val userDid = dir.createDid("http://leaf.test/")
    val serverDid = "did:web:leaf.test"
    // the caller's key — normally the user's own; here the custody key the
    // directory minted, fetched via its audit log + resolveKey seam
    val auth = new JwtAuth(serverDid, dir.resolveKey)

    def b64(b: Array[Byte]) =
      Base64.getUrlEncoder.withoutPadding.encodeToString(b)
    val header = b64(Json.render(Map("alg" -> "ES256K", "typ" -> "JWT")).getBytes("UTF-8"))
    val claims = b64(Json.render(Map(
      "iss" -> userDid, "aud" -> serverDid,
      "lxm" -> "town.muni.leaf.authenticate",
      "exp" -> (System.currentTimeMillis() / 1000 + 600))).getBytes("UTF-8"))
    val signingInput = s"$header.$claims".getBytes("UTF-8")
    val hash = java.security.MessageDigest.getInstance("SHA-256").digest(signingInput)

    // sign with the did's custodied key (white-box: replay the audit log key)
    val keyField = dir.getClass.getDeclaredField("keys")
    keyField.setAccessible(true)
    val key = keyField.get(dir).asInstanceOf[
      scala.collection.mutable.Map[String, Plc.SigningKey]](userDid)
    val token = s"$header.$claims.${b64(key.sign(hash))}"

    assert(auth.verify(token) == Right(userDid))
    // resolution failure for unknown DIDs
    val bad = token.replace(claims, b64(Json.render(Map(
      "iss" -> "did:plc:aaaaaaaaaaaaaaaaaaaaaaaa", "aud" -> serverDid,
      "exp" -> (System.currentTimeMillis() / 1000 + 600))).getBytes("UTF-8")))
    assert(auth.verify(bad).left.exists(_.contains("signing key")))
  }

  test("server integration: streams mint did:plc ids; set_handle updates the directory") {
    val spark = SparkFixture.spark
    val store = new StreamStore(spark,
      graft.TempDirs.create("graft-plc").toString)
    val dir = new LocalPlcDirectory
    val server = new LeafServer(store, 0, authToken = Some("tok"), plc = Some(dir))
    server.start()
    try {
      val http = java.net.http.HttpClient.newHttpClient()
      def post(path: String, body: Map[String, Any]): Map[String, Any] = {
        val req = java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:${server.boundPort}$path"))
          .header("Authorization", "Bearer tok")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(Json.render(body)))
          .build()
        Json.parse(http.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofString()).body())
          .asInstanceOf[Map[String, Any]]
      }
      val cid = post("/module/upload", Map("module" -> Map(
        "init_sql" -> "CREATE TABLE IF NOT EXISTS t (idx BIGINT) USING PARQUET",
        "materializer" -> "INSERT INTO t SELECT idx FROM event")))("ok")
        .asInstanceOf[Map[String, Any]]("cid").toString
      val sid = post("/stream/create", Map("module_cid" -> cid))("ok")
        .asInstanceOf[Map[String, Any]]("id").toString
      assert(sid.matches("did:plc:[a-z2-7]{24}"), sid)
      assert(dir.auditLog(sid).size == 1)

      post("/stream/set_handle", Map("id" -> sid, "handle" -> "prod-stream"))
      assert(dir.alsoKnownAs(sid) == Vector("leaf://prod-stream"))
      val info = post("/stream/info", Map("id" -> sid))("ok")
        .asInstanceOf[Map[String, Any]]
      assert(info("handle") == "prod-stream")
    } finally server.stop()
  }

  /** A loopback plc.directory speaking the real wire protocol
    * (POST /{did}, GET /{did}/log/audit, GET /{did}/data), backed by
    * LocalPlcDirectory's validation — so HttpPlcDirectory exercises the
    * exact HTTP surface a deployment pointed at https://plc.directory
    * would, with zero egress. */
  private class StubDirectory {
    val backing = new LocalPlcDirectory
    private val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    // fault injection for the failure-mode cases: `fault` short-circuits
    // every request with a fixed (status, body); `nullifyLast` serves the
    // audit log with its head entry marked nullified (the rotation-race
    // state a live directory can produce, did.rs:58-66)
    @volatile var fault: Option[(Int, String)] = None
    @volatile var nullifyLast: Boolean = false
    srv.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val parts = ex.getRequestURI.getPath.stripPrefix("/").split("/").toList
      val (status, body): (Int, String) =
        try {
          fault match {
            case Some(f) => f
            case None =>
          (ex.getRequestMethod, parts) match {
            case ("POST", did :: Nil) =>
              val op = Plc.opFromJson(Json.parse(new String(
                ex.getRequestBody.readAllBytes(),
                java.nio.charset.StandardCharsets.UTF_8)))
                .asInstanceOf[graft.drisl.DValue.DMap]
              backing.submit(did, op) match {
                case Right(()) => (200, """{"ok":true}""")
                case Left(err) => (400, Json.render(Map("error" -> err)))
              }
            case ("GET", did :: "log" :: "audit" :: Nil) =>
              val log = backing.auditLog(did)
              if (log.isEmpty) (404, """{"error":"DID not registered"}""")
              else (200, Json.render(log.zipWithIndex.map { case (op, i) =>
                Map("did" -> did, "operation" -> Plc.opToJson(op),
                  "cid" -> Plc.opCid(op),
                  "nullified" -> (nullifyLast && i == log.size - 1),
                  "createdAt" -> s"2024-01-01T00:00:0$i.000Z")
              }))
            case ("GET", did :: "data" :: Nil) =>
              backing.auditLog(did).lastOption match {
                case None => (404, """{"error":"DID not registered"}""")
                case Some(op) =>
                  (200, Json.render(Map("did" -> did) ++
                    (Plc.opToJson(op).asInstanceOf[Map[String, Any]]
                      - "sig" - "prev" - "type")))
              }
            case _ => (404, """{"error":"not found"}""")
          }
          }
        } catch { case e: Exception =>
          (400, Json.render(Map("error" -> String.valueOf(e.getMessage))))
        }
      val bytes = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    srv.start()
    def url: String = s"http://127.0.0.1:${srv.getAddress.getPort}"
    def stop(): Unit = srv.stop(0)
  }

  test("HttpPlcDirectory: the reference's directory client over the real " +
      "wire protocol (loopback stub)") {
    // did.rs:11-147 — genesis POSTs as JSON, the handle update chains off
    // GET /log/audit's latest non-nullified entry, resolution reads
    // GET /data. The stub validates with LocalPlcDirectory's rules, so a
    // wire-shape mismatch on either side fails loudly.
    val stub = new StubDirectory
    try {
      val dir = new graft.server.HttpPlcDirectory(stub.url)
      val did = dir.createDid("http://127.0.0.1:9999/")
      assert(did.matches("did:plc:[a-z2-7]{24}"), did)
      // the op crossed the wire intact: the stub's backing log has it and
      // it still hashes to the DID after the JSON round-trip
      assert(stub.backing.auditLog(did).size == 1)
      assert(Plc.didForOp(stub.backing.auditLog(did).head) == did)
      assert(dir.auditLog(did).size == 1)

      // handle update: chains off the DIRECTORY's log, verifies there
      assert(dir.updateHandle(did, Some("wired")) == Right(()))
      assert(dir.alsoKnownAs(did) == Vector("leaf://wired"))
      assert(stub.backing.alsoKnownAs(did) == Vector("leaf://wired"))
      assert(dir.updateHandle(did, None) == Right(()))
      assert(dir.alsoKnownAs(did) == Vector.empty)
      assert(dir.auditLog(did).size == 3)

      // key resolution agrees between the HTTP view and the backing
      val k1 = dir.resolveKey(did)
      assert(k1.isDefined && k1 == stub.backing.resolveKey(did))

      // custody is local: the key never crossed the wire
      assert(dir.custodiedSecret(did).isDefined)
      assert(stub.backing.custodiedSecret(did).isEmpty)

      // a bad submit is refused BY THE DIRECTORY and surfaced verbatim
      // (did.rs:38-42): replaying the genesis breaks the prev chain
      val replay = stub.backing.auditLog(did).head
      dir.submit(did, replay) match {
        case Left(err) => assert(err.startsWith("PLC directory error: 400"), err)
        case Right(()) => fail("directory must refuse a prev-chain break")
      }

      // unknown DID resolves to nothing, loudly not wrongly
      assert(dir.resolveKey("did:plc:aaaaaaaaaaaaaaaaaaaaaaaa").isEmpty)
      assert(dir.auditLog("did:plc:aaaaaaaaaaaaaaaaaaaaaaaa").isEmpty)
    } finally stub.stop()
  }

  test("HttpPlcDirectory failure modes: 429/5xx surface status+body " +
      "verbatim, nullified head entries are skipped when chaining") {
    // the reference surfaces the directory's status + body with no retry
    // (did.rs:38-42) — pin that a throttling or failing directory makes
    // every write path fail LOUDLY with the directory's own words, and
    // that read paths degrade to absent, never to wrong.
    val stub = new StubDirectory
    try {
      val dir = new graft.server.HttpPlcDirectory(stub.url)
      val did = dir.createDid("http://127.0.0.1:9999/")
      assert(dir.updateHandle(did, Some("pre-fault")) == Right(()))

      // ---- 429 (rate limited): surfaced verbatim, no retry loop ----
      stub.fault = Some((429, """{"error":"rate limited, slow down"}"""))
      val e429 = intercept[IllegalStateException](
        dir.createDid("http://127.0.0.1:9999/"))
      assert(e429.getMessage.startsWith("PLC directory error: 429:") &&
        e429.getMessage.contains("rate limited"), e429.getMessage)
      dir.updateHandle(did, Some("throttled")) match {
        // the GET leg of the update hits the fault first: audit log reads
        // as absent → "no operation log"; surfaced as a Left either way
        case Left(err) => assert(err.contains("429") ||
          err.contains("no operation log"), err)
        case Right(()) => fail("update must not succeed under 429")
      }
      // reads degrade to absent, never wrong
      assert(dir.resolveKey(did).isEmpty)
      assert(dir.auditLog(did).isEmpty)
      assert(dir.alsoKnownAs(did).isEmpty)
      // custody is untouched by directory faults
      assert(dir.custodiedSecret(did).isDefined)

      // ---- 500: identical discipline, the body still rides along ----
      stub.fault = Some((500, """{"error":"upstream database on fire"}"""))
      val e500 = intercept[IllegalStateException](
        dir.createDid("http://127.0.0.1:9999/"))
      assert(e500.getMessage.startsWith("PLC directory error: 500:") &&
        e500.getMessage.contains("on fire"), e500.getMessage)

      // ---- recovery: clearing the fault restores every path ----
      stub.fault = None
      assert(dir.updateHandle(did, Some("recovered")) == Right(()))
      assert(dir.alsoKnownAs(did) == Vector("leaf://recovered"))

      // ---- nullified head: the update must chain off the latest
      // NON-nullified entry. The local backing store knows nothing of the
      // nullification, so an op correctly chained to the nullified
      // entry's PARENT breaks ITS prev check and is refused — while a
      // client that wrongly chained to the nullified head would be
      // accepted. A Left here is therefore proof of the skip. ----
      stub.nullifyLast = true
      dir.updateHandle(did, Some("post-nullify")) match {
        case Left(err) =>
          assert(err.startsWith("PLC directory error: 400"), err)
        case Right(()) =>
          fail("client chained off the nullified head entry")
      }
      stub.nullifyLast = false
      assert(dir.updateHandle(did, Some("chained-clean")) == Right(()))
      assert(dir.alsoKnownAs(did) == Vector("leaf://chained-clean"))
    } finally stub.stop()
  }

  test("server integration over the HTTP directory: mint + set_handle") {
    // the full deployment shape: LeafServer wired with HttpPlcDirectory
    // (ServerMain --plc-directory), streams minting DIDs and updating
    // handles through the HTTP hop
    val stub = new StubDirectory
    val spark = SparkFixture.spark
    val store = new StreamStore(spark,
      graft.TempDirs.create("graft-plc-http").toString)
    val dir = new graft.server.HttpPlcDirectory(stub.url)
    val server = new LeafServer(store, 0, authToken = Some("tok"),
      plc = Some(dir))
    server.start()
    try {
      val http = java.net.http.HttpClient.newHttpClient()
      def post(path: String, body: Map[String, Any]): Map[String, Any] = {
        val req = java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:${server.boundPort}$path"))
          .header("Authorization", "Bearer tok")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(Json.render(body)))
          .build()
        Json.parse(http.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofString()).body())
          .asInstanceOf[Map[String, Any]]
      }
      val cid = post("/module/upload", Map("module" -> Map(
        "init_sql" -> "CREATE TABLE IF NOT EXISTS t (idx BIGINT) USING PARQUET",
        "materializer" -> "INSERT INTO t SELECT idx FROM event")))("ok")
        .asInstanceOf[Map[String, Any]]("cid").toString
      val sid = post("/stream/create", Map("module_cid" -> cid))("ok")
        .asInstanceOf[Map[String, Any]]("id").toString
      assert(sid.matches("did:plc:[a-z2-7]{24}"), sid)
      assert(stub.backing.auditLog(sid).size == 1,
        "the mint must have reached the directory over HTTP")
      post("/stream/set_handle", Map("id" -> sid, "handle" -> "over-http"))
      assert(stub.backing.alsoKnownAs(sid) == Vector("leaf://over-http"))
    } finally { server.stop(); stub.stop() }
  }
}
