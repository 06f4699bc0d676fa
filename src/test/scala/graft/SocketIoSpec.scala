package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.security.{KeyPairGenerator, Signature}
import java.security.spec.ECGenParameterSpec
import java.util.Base64

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.drisl.{Cid, Drisl, DValue}
import graft.drisl.DValue._
import graft.server.{Json, JwtAuth, LeafServer, Msgpack}
import graft.stream.StreamStore

/** The reference's native wire protocol end-to-end: Socket.IO over
  * Engine.IO polling with msgpack packets and DRISL payloads — the exact
  * flow the shipped TypeScript client drives (clients/typescript/src/
  * index.ts): connect+auth → authenticated → module/upload →
  * stream/create → event_batch → query → subscribe → push notification →
  * unsubscribe. The mini client here performs the same protocol steps
  * socket.io-client + socket.io-msgpack-parser would. */
class SocketIoSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  private lazy val store = new StreamStore(spark,
    graft.TempDirs.create("graft-sio").toString)

  // ES256 JWT for the untrusted-caller tests (P-256: the JDK can sign)
  private val kpg = KeyPairGenerator.getInstance("EC")
  kpg.initialize(new ECGenParameterSpec("secp256r1"))
  private val alice = kpg.generateKeyPair()
  private val serverDid = "did:web:graft.test"

  private lazy val server = {
    val s = new LeafServer(store, 0, authToken = Some("testtoken"),
      jwt = Some(new JwtAuth(serverDid,
        did => if (did == "did:plc:alice") Some(JwtAuth.P256(alice.getPublic)) else None)),
      serverDid = serverDid)
    s.start(); s
  }

  private def aliceJwt(): String = {
    def b64(b: Array[Byte]) = Base64.getUrlEncoder.withoutPadding.encodeToString(b)
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
    val h = b64(Json.render(Map("alg" -> "ES256", "typ" -> "JWT")).getBytes("UTF-8"))
    val c = b64(Json.render(Map(
      "iss" -> "did:plc:alice", "aud" -> serverDid,
      "lxm" -> "town.muni.leaf.authenticate",
      "exp" -> (System.currentTimeMillis() / 1000 + 600))).getBytes("UTF-8"))
    val signer = Signature.getInstance("SHA256withECDSA")
    signer.initSign(alice.getPrivate)
    signer.update(s"$h.$c".getBytes("UTF-8"))
    s"$h.$c.${b64(derToJose(signer.sign()))}"
  }

  // ---------------- mini socket.io client ----------------

  private def dToAny(v: DValue): Any = v match {
    case DMap(m) => m.map { case (k, x) => k -> dToAny(x) }
    case DArray(a) => a.map(dToAny)
    case DInt(i) => i
    case DFloat(d) => d
    case DText(s) => s
    case DBool(b) => b
    case DNull => null
    case DBytes(b) => b
    case DCid(b) => "cid:" + Cid.render(b)
  }

  private class SioClient(port: => Int = server.boundPort) {
    private val http = HttpClient.newHttpClient()
    private def base = s"http://127.0.0.1:$port/socket.io/?EIO=4&transport=polling"
    var sid: String = _
    val events = mutable.Queue.empty[Vector[Any]] // EVENT packets' data arrays
    val acks = mutable.Map.empty[Long, Any] // ackId -> DRISL-decoded result
    var disconnected = false
    private var nextAck = 0L

    def open(): Map[String, Any] = {
      val body = getRaw(base)
      assert(body.startsWith("0"), s"expected open packet, got: $body")
      val hs = Json.parse(body.drop(1)).asInstanceOf[Map[String, Any]]
      sid = hs("sid").toString
      hs
    }

    private def getRaw(url: String): String =
      http.send(HttpRequest.newBuilder(URI.create(url)).GET().build(),
        HttpResponse.BodyHandlers.ofString()).body()

    def post(raw: String): Unit = {
      val resp = http.send(
        HttpRequest.newBuilder(URI.create(base + s"&sid=$sid"))
          .POST(HttpRequest.BodyPublishers.ofString(raw)).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(resp.body() == "ok", s"POST not acked: ${resp.body()}")
    }

    def sendSio(pkt: Map[String, Any]): Unit =
      post("b" + Base64.getEncoder.encodeToString(Msgpack.encode(pkt)))

    /** One GET; decode every packet into events/acks. Returns raw count. */
    def poll(): Int = {
      val body = getRaw(base + s"&sid=$sid")
      val packets = body.split('\u001e').toVector.filter(_.nonEmpty)
      packets.foreach { p =>
        p.head match {
          case 'b' =>
            val sio = Msgpack.decode(Base64.getDecoder.decode(p.tail))
              .asInstanceOf[Map[String, Any]]
            sio("type") match {
              case 0L => // CONNECT ack
              case 1L => disconnected = true
              case 2L =>
                events += sio("data").asInstanceOf[Vector[Any]]
              case 3L =>
                val data = sio("data").asInstanceOf[Vector[Any]]
                acks(sio("id").asInstanceOf[Long]) =
                  dToAny(Drisl.decode(data(0).asInstanceOf[Array[Byte]]))
              case _ =>
            }
          case '2' => post("3") // server ping → pong
          case _ =>
        }
      }
      packets.size
    }

    def connect(token: Option[String]): Unit = {
      open()
      sendSio(Map("type" -> 0L, "nsp" -> "/",
        "data" -> token.map(t => Map("token" -> t)).getOrElse(Map.empty[String, Any])))
      poll() // CONNECT ack + authenticated (or error+disconnect)
    }

    def emitWithAck(name: String, args: DValue): Any = {
      nextAck += 1
      val id = nextAck
      sendSio(Map("type" -> 2L, "nsp" -> "/", "id" -> id,
        "data" -> Vector(name, Drisl.encode(args))))
      poll()
      assert(acks.contains(id), s"no ack for $name (id $id)")
      acks.remove(id).get
    }

    def takeEvent(name: String): Option[Vector[Any]] =
      events.dequeueFirst(_.headOption.contains(name))

    /** Take an already-received event, or run one poll to fetch it —
      * never polls when the event is queued (a GET with an empty outbox
      * parks until the ping clock). */
    def awaitEvent(name: String): Option[Vector[Any]] =
      takeEvent(name).orElse { poll(); takeEvent(name) }
  }

  private def assertOk(result: Any): Any = {
    val m = result.asInstanceOf[Map[String, Any]]
    assert(!m.contains("Err"), s"wire Err: ${m.get("Err")}")
    m("Ok")
  }

  private val wireModule: DValue = obj(
    "$type" -> text("muni.town.leaf.module.basic.v0"),
    "initSql" -> text("CREATE TABLE IF NOT EXISTS notes (idx BIGINT, who STRING, content STRING, n BIGINT) USING PARQUET"),
    "authorizer" -> text(""),
    "materializer" -> text("INSERT INTO notes SELECT idx, user, drisl_extract(payload, '.content'), drisl_extract_long(payload, '.n') FROM event"),
    "stateInitSql" -> text(""),
    "stateMaterializer" -> text(""),
    "queries" -> arr(
      obj("name" -> text("list"),
        "sql" -> text("SELECT idx, who, content, n FROM notes WHERE idx BETWEEN $start AND $start + $limit - 1 ORDER BY idx"),
        "params" -> arr()),
      obj("name" -> text("over"),
        "sql" -> text("SELECT content FROM notes WHERE n > $min ORDER BY idx"),
        "params" -> arr(obj("name" -> text("min"), "kind" -> text("integer"),
          "optional" -> DBool(false))))))

  private def eventPayload(content: String, n: Long): DValue =
    DBytes(Drisl.encode(obj("content" -> text(content), "n" -> int(n))))

  test("engine.io handshake advertises the websocket upgrade") {
    val c = new SioClient
    val hs = c.open()
    assert(hs("upgrades") == Vector("websocket"))
    assert(hs("pingInterval") == 25000L && hs("pingTimeout") == 20000L)
  }

  // ---------------- mini websocket client (JDK java.net.http) ----------------
  // The JDK's RFC 6455 client implementation independently validates the
  // server's hand-rolled handshake + framing: any accept-key or frame
  // encoding bug fails the buildAsync/join, not just our own reader.

  private class WsClient(sid: Option[String]) {
    import java.util.concurrent.{LinkedBlockingQueue, TimeUnit}
    val texts = new LinkedBlockingQueue[String]
    val bins = new LinkedBlockingQueue[Array[Byte]]
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
        if (last) { bins.add(bb.toByteArray); bb.reset() }
        w.request(1); null
      }
    }
    val ws: java.net.http.WebSocket = HttpClient.newHttpClient()
      .newWebSocketBuilder()
      .buildAsync(URI.create(
        s"ws://127.0.0.1:${server.boundPort}/socket.io/?EIO=4&transport=websocket" +
          sid.map(s => s"&sid=$s").getOrElse("")), listener)
      .join()
    def sendText(s: String): Unit = ws.sendText(s, true).join()
    def sendSio(pkt: Map[String, Any]): Unit =
      ws.sendBinary(java.nio.ByteBuffer.wrap(Msgpack.encode(pkt)), true).join()
    def nextText(): String = {
      val t = texts.poll(15, TimeUnit.SECONDS)
      assert(t != null, "timed out waiting for a websocket text frame")
      t
    }
    def nextSio(): Map[String, Any] = {
      val b = bins.poll(15, TimeUnit.SECONDS)
      assert(b != null, "timed out waiting for a websocket binary frame")
      Msgpack.decode(b).asInstanceOf[Map[String, Any]]
    }
    val events = mutable.Queue.empty[Vector[Any]]
    /** EVENT-with-ack over the socket; buffers interleaved EVENT pushes. */
    def emitWithAck(name: String, args: DValue, id: Long): Any = {
      sendSio(Map("type" -> 2L, "nsp" -> "/", "id" -> id,
        "data" -> Vector(name, Drisl.encode(args))))
      while (true) {
        val pkt = nextSio()
        pkt("type") match {
          case 3L if pkt.get("id").contains(id) =>
            val data = pkt("data").asInstanceOf[Vector[Any]]
            return dToAny(Drisl.decode(data(0).asInstanceOf[Array[Byte]]))
          case 2L => events += pkt("data").asInstanceOf[Vector[Any]]
          case _ =>
        }
      }
      throw new IllegalStateException("unreachable")
    }
    def awaitEvent(name: String): Vector[Any] = {
      events.dequeueFirst(_.headOption.contains(name)).foreach(return _)
      while (true) {
        val pkt = nextSio()
        if (pkt("type") == 2L) {
          val data = pkt("data").asInstanceOf[Vector[Any]]
          if (data.headOption.contains(name)) return data
          events += data
        }
      }
      throw new IllegalStateException("unreachable")
    }
  }

  test("websocket upgrade: probe, switch, full journey, subscription push") {
    // start on polling, authenticate there (the TS client's default order)
    val c = new SioClient
    val hs = c.open()
    assert(hs("upgrades") == Vector("websocket"))
    c.sendSio(Map("type" -> 0L, "nsp" -> "/",
      "data" -> Map("token" -> "testtoken")))
    c.poll()
    // engine.io upgrade dance on the SAME session
    val w = new WsClient(Some(c.sid))
    w.sendText("2probe")
    assert(w.nextText() == "3probe", "probe must answer 3probe on the socket")
    w.sendText("5") // upgrade: delivery switches to this socket
    // the whole RPC journey now rides the websocket
    val cid = assertOk(w.emitWithAck("module/upload",
      obj("module" -> wireModule), 1L)).asInstanceOf[Map[String, Any]]("moduleCid")
    val sid2 = assertOk(w.emitWithAck("stream/create",
      obj("moduleCid" -> text(cid.toString.stripPrefix("cid:"))), 2L))
      .asInstanceOf[Map[String, Any]]("streamDid").toString
    assertOk(w.emitWithAck("stream/event_batch", obj(
      "streamDid" -> text(sid2),
      "events" -> arr(eventPayload("ws-one", 1))), 3L))
    val rows = assertOk(w.emitWithAck("stream/query", obj(
      "streamDid" -> text(sid2),
      "query" -> obj("name" -> text("list"))), 4L)).asInstanceOf[Vector[Any]]
    assert(rows.size == 1)
    val subId = assertOk(w.emitWithAck("stream/subscribe_events", obj(
      "streamDid" -> text(sid2),
      "query" -> obj("name" -> text("list"))), 5L))
      .asInstanceOf[Map[String, Any]]("subscriptionId").toString
    // a new event must be PUSHED over the websocket, unpolled
    assertOk(w.emitWithAck("stream/event_batch", obj(
      "streamDid" -> text(sid2),
      "events" -> arr(eventPayload("ws-two", 2))), 6L))
    val push = w.awaitEvent("stream/subscription_response")
    val resp = dToAny(Drisl.decode(push(1).asInstanceOf[Array[Byte]]))
      .asInstanceOf[Map[String, Any]]
    assert(resp("subscriptionId").toString == subId)
    val ok = resp("response").asInstanceOf[Map[String, Any]]("Ok")
      .asInstanceOf[Map[String, Any]]
    assert(ok("rows").asInstanceOf[Vector[Any]].nonEmpty)
    w.ws.sendClose(java.net.http.WebSocket.NORMAL_CLOSURE, "done").join()
  }

  test("an interloping second websocket cannot tear down the live session") {
    // owner: polling session upgraded to ws delivery
    val c = new SioClient
    c.open()
    c.sendSio(Map("type" -> 0L, "nsp" -> "/",
      "data" -> Map("token" -> "testtoken")))
    c.poll()
    val w = new WsClient(Some(c.sid))
    w.sendText("2probe")
    assert(w.nextText() == "3probe")
    w.sendText("5")
    val probe1 = assertOk(w.emitWithAck("module/exists",
      obj("moduleCid" -> text(Cid.render(Cid.ofValue(text("x"))))), 1L))
    assert(probe1.asInstanceOf[Map[String, Any]]("moduleExists") == false)
    // interloper: a SECOND websocket with the same sid that dies after a
    // failed probe dance, never sending '5'. Its cleanup must not destroy
    // the owning connection's session — teardown belongs to the socket
    // that actually transitioned delivery, not to anyone who can quote
    // the sid while sess.wsAttached happens to be true
    val w2 = new WsClient(Some(c.sid))
    w2.sendText("2probe")
    assert(w2.nextText() == "3probe")
    w2.ws.sendClose(java.net.http.WebSocket.NORMAL_CLOSURE, "bail").join()
    Thread.sleep(300) // let the server's reader loop run the dead socket's cleanup
    // the owner's session is still alive, still delivering over ITS socket
    val probe2 = assertOk(w.emitWithAck("module/exists",
      obj("moduleCid" -> text(Cid.render(Cid.ofValue(text("y"))))), 2L))
    assert(probe2.asInstanceOf[Map[String, Any]]("moduleExists") == false,
      "owner websocket died after an interloper's disconnect")
    w.ws.sendClose(java.net.http.WebSocket.NORMAL_CLOSURE, "done").join()
  }

  test("fresh websocket session: no polling round at all") {
    val w = new WsClient(None)
    val open = w.nextText()
    assert(open.startsWith("0"), s"expected open packet, got: $open")
    val hs = Json.parse(open.drop(1)).asInstanceOf[Map[String, Any]]
    assert(hs("upgrades") == Vector(), "already on websocket: nothing to upgrade to")
    w.sendSio(Map("type" -> 0L, "nsp" -> "/",
      "data" -> Map("token" -> "testtoken")))
    // CONNECT ack then the authenticated event, all over the socket
    assert(w.nextSio()("type") == 0L)
    val auth = w.awaitEvent("authenticated")
    assert(auth.lift(1).map(_.asInstanceOf[Map[String, Any]]("did").toString)
      .contains(serverDid))
    val exists = assertOk(w.emitWithAck("module/exists",
      obj("moduleCid" -> text(Cid.render(Cid.ofValue(text("nope"))))), 1L))
    assert(exists.asInstanceOf[Map[String, Any]]("moduleExists") == false)
    w.ws.sendClose(java.net.http.WebSocket.NORMAL_CLOSURE, "done").join()
  }

  test("full TypeScript-client journey over the wire protocol") {
    val c = new SioClient
    c.connect(Some("testtoken"))
    val auth = c.takeEvent("authenticated")
    assert(auth.isDefined, "expected authenticated event after connect")
    assert(auth.get(1).asInstanceOf[Map[String, Any]]("did") == serverDid)

    // module upload: the server's wire CID must equal the CID the client
    // computes over its own DRISL encoding (LeafClient.moduleCid)
    val up = assertOk(c.emitWithAck("module/upload", obj("module" -> wireModule)))
      .asInstanceOf[Map[String, Any]]
    val wireCid = up("moduleCid").toString.stripPrefix("cid:")
    assert(wireCid == Cid.render(Cid.of(Drisl.encode(wireModule))))

    val exists = assertOk(c.emitWithAck("module/exists",
      obj("moduleCid" -> DCid(Cid.parse(wireCid))))).asInstanceOf[Map[String, Any]]
    assert(exists("moduleExists") == true)

    // create + info
    val created = assertOk(c.emitWithAck("stream/create",
      obj("moduleCid" -> DCid(Cid.parse(wireCid))))).asInstanceOf[Map[String, Any]]
    val streamDid = created("streamDid").toString
    assert(streamDid.startsWith("did:"))
    val info = assertOk(c.emitWithAck("stream/info",
      obj("streamDid" -> text(streamDid)))).asInstanceOf[Map[String, Any]]
    assert(info("moduleCid").toString.stripPrefix("cid:") == wireCid)

    // event batch: raw DRISL byte payloads, unit Ok response
    assert(assertOk(c.emitWithAck("stream/event_batch", obj(
      "streamDid" -> text(streamDid),
      "events" -> arr(eventPayload("alpha", 1), eventPayload("beta", 5))))) == null)

    // one-shot query with $type-tagged rows
    val rows = assertOk(c.emitWithAck("stream/query", obj(
      "streamDid" -> text(streamDid),
      "query" -> obj("name" -> text("list"))))).asInstanceOf[Vector[Any]]
    assert(rows.size == 2)
    val row0 = rows(0).asInstanceOf[Map[String, Any]]
    assert(row0("content").asInstanceOf[Map[String, Any]]("value") == "alpha")
    assert(row0("idx").asInstanceOf[Map[String, Any]]("$type") ==
      "muni.town.sqliteValue.integer")

    // parameterized query: wire params are $type-tagged SqlValueRaw
    val over = assertOk(c.emitWithAck("stream/query", obj(
      "streamDid" -> text(streamDid),
      "query" -> obj("name" -> text("over"), "params" -> obj(
        "min" -> obj("$type" -> text("muni.town.sqliteValue.integer"),
          "value" -> int(2))))))).asInstanceOf[Vector[Any]]
    assert(over.size == 1)

    // subscribe: ack carries the subscriptionId; the backfill notification
    // arrives as a stream/subscription_response event AFTER the ack
    val sub = assertOk(c.emitWithAck("stream/subscribe_events", obj(
      "streamDid" -> text(streamDid),
      "query" -> obj("name" -> text("list"), "start" -> int(1)))))
      .asInstanceOf[Map[String, Any]]
    val subId = sub("subscriptionId").toString
    assert(subId.length == 26)
    val note1 = c.awaitEvent("stream/subscription_response")
    assert(note1.isDefined, "expected backfill notification")
    val n1 = dToAny(Drisl.decode(note1.get(1).asInstanceOf[Array[Byte]]))
      .asInstanceOf[Map[String, Any]]
    assert(n1("subscriptionId") == subId)
    val resp1 = n1("response").asInstanceOf[Map[String, Any]]("Ok")
      .asInstanceOf[Map[String, Any]]
    assert(resp1("rows").asInstanceOf[Vector[Any]].size == 2)
    assert(resp1("has_more") == false)

    // new events trigger an incremental notification with only the new row
    assert(assertOk(c.emitWithAck("stream/event_batch", obj(
      "streamDid" -> text(streamDid),
      "events" -> arr(eventPayload("gamma", 9))))) == null)
    val note2 = c.awaitEvent("stream/subscription_response")
    assert(note2.isDefined, "expected incremental notification")
    val n2rows = dToAny(Drisl.decode(note2.get(1).asInstanceOf[Array[Byte]]))
      .asInstanceOf[Map[String, Any]]("response")
      .asInstanceOf[Map[String, Any]]("Ok")
      .asInstanceOf[Map[String, Any]]("rows").asInstanceOf[Vector[Any]]
    assert(n2rows.size == 1)

    // unsubscribe is idempotent-with-report, like the reference
    val un1 = assertOk(c.emitWithAck("stream/unsubscribe",
      obj("subscriptionId" -> text(subId)))).asInstanceOf[Map[String, Any]]
    assert(un1("wasSubscribed") == true)
    val un2 = assertOk(c.emitWithAck("stream/unsubscribe",
      obj("subscriptionId" -> text(subId)))).asInstanceOf[Map[String, Any]]
    assert(un2("wasSubscribed") == false)

    // admin surface (trusted connection)
    val ls = assertOk(c.emitWithAck("admin/list_streams", obj()))
      .asInstanceOf[Map[String, Any]]("streams").asInstanceOf[Vector[Any]]
    assert(ls.exists(_.asInstanceOf[Map[String, Any]]("did") == streamDid))
  }

  test("bad token: error event then server disconnect, like the reference") {
    val c = new SioClient
    c.connect(Some("wrong-token"))
    val err = c.takeEvent("error")
    assert(err.isDefined)
    assert(err.get(1).toString.contains("Error validating auth token"))
    assert(c.disconnected)
  }

  test("anonymous connections are allowed but gated per-RPC") {
    val c = new SioClient
    c.connect(None)
    val auth = c.takeEvent("authenticated")
    assert(auth.isDefined)
    assert(auth.get(1).asInstanceOf[Map[String, Any]]("did") == null)
    val up = c.emitWithAck("module/upload", obj("module" -> wireModule))
      .asInstanceOf[Map[String, Any]]
    assert(up.get("Err").exists(_.toString.contains("Only authenticated users")))
  }

  test("JWT caller: authenticated as issuer; userOverride rejected") {
    val c = new SioClient
    c.connect(Some(aliceJwt()))
    val auth = c.takeEvent("authenticated")
    assert(auth.get(1).asInstanceOf[Map[String, Any]]("did") == "did:plc:alice")

    // bootstrap a stream via a trusted connection for alice to write to
    val t = new SioClient
    t.connect(Some("testtoken"))
    val cid = assertOk(t.emitWithAck("module/upload", obj("module" -> wireModule)))
      .asInstanceOf[Map[String, Any]]("moduleCid").toString.stripPrefix("cid:")
    val streamDid = assertOk(t.emitWithAck("stream/create",
      obj("moduleCid" -> DCid(Cid.parse(cid))))).asInstanceOf[Map[String, Any]]("streamDid").toString

    // ANY userOverride on an untrusted connection is rejected
    val denied = c.emitWithAck("stream/event_batch", obj(
      "streamDid" -> text(streamDid),
      "events" -> arr(eventPayload("x", 1)),
      "userOverride" -> text("did:plc:alice"))).asInstanceOf[Map[String, Any]]
    assert(denied.get("Err").exists(_.toString.contains("user_override")))

    // without override the batch lands as the verified caller
    assert(assertOk(c.emitWithAck("stream/event_batch", obj(
      "streamDid" -> text(streamDid),
      "events" -> arr(eventPayload("mine", 2))))) == null)
    val rows = assertOk(c.emitWithAck("stream/query", obj(
      "streamDid" -> text(streamDid),
      "query" -> obj("name" -> text("list"))))).asInstanceOf[Vector[Any]]
    assert(rows.size == 1)
    assert(rows(0).asInstanceOf[Map[String, Any]]("who")
      .asInstanceOf[Map[String, Any]]("value") == "did:plc:alice")
  }

  test("disconnect packet tears the session's subscriptions down") {
    val c = new SioClient
    c.connect(Some("testtoken"))
    val cid = assertOk(c.emitWithAck("module/upload", obj("module" -> wireModule)))
      .asInstanceOf[Map[String, Any]]("moduleCid").toString.stripPrefix("cid:")
    val streamDid = assertOk(c.emitWithAck("stream/create",
      obj("moduleCid" -> DCid(Cid.parse(cid))))).asInstanceOf[Map[String, Any]]("streamDid").toString
    assertOk(c.emitWithAck("stream/subscribe_events", obj(
      "streamDid" -> text(streamDid),
      "query" -> obj("name" -> text("list"), "start" -> int(1)))))
    c.post("1") // engine.io close
    // the session is gone: polling it reports an unknown sid
    val resp = HttpClient.newHttpClient().send(
      HttpRequest.newBuilder(URI.create(
        s"http://127.0.0.1:${server.boundPort}/socket.io/?EIO=4&transport=polling&sid=${c.sid}"))
        .GET().build(), HttpResponse.BodyHandlers.ofString())
    assert(resp.body().contains("Session ID unknown"))
  }

  test("cross-transport: an HTTP event_batch wakes a socket.io subscriber") {
    val c = new SioClient
    c.connect(Some("testtoken"))
    val cid = assertOk(c.emitWithAck("module/upload", obj("module" -> wireModule)))
      .asInstanceOf[Map[String, Any]]("moduleCid").toString.stripPrefix("cid:")
    val streamDid = assertOk(c.emitWithAck("stream/create",
      obj("moduleCid" -> DCid(Cid.parse(cid)))))
      .asInstanceOf[Map[String, Any]]("streamDid").toString
    // seed one event so the subscription has a backfill page (an empty
    // stream legitimately pushes nothing)
    assert(assertOk(c.emitWithAck("stream/event_batch", obj(
      "streamDid" -> text(streamDid),
      "events" -> arr(eventPayload("seed", 1))))) == null)
    val subId = assertOk(c.emitWithAck("stream/subscribe_events", obj(
      "streamDid" -> text(streamDid),
      "query" -> obj("name" -> text("list"), "start" -> int(1)))))
      .asInstanceOf[Map[String, Any]]("subscriptionId").toString
    // each poll's GET parks until a packet (or ping) arrives, so a couple
    // of rounds suffice — do NOT busy-loop long here
    def awaitNote(): Option[Vector[Any]] = {
      var note: Option[Vector[Any]] = None
      var tries = 0
      while (note.isEmpty && tries < 3) {
        note = c.awaitEvent("stream/subscription_response")
        tries += 1
      }
      note
    }
    assert(awaitNote().isDefined, "no backfill notification")

    // append over PLAIN HTTP/JSON — the other transport entirely
    val payload = Base64.getEncoder.encodeToString(
      Drisl.encode(obj("content" -> text("from-http"), "n" -> int(7))))
    val resp = HttpClient.newHttpClient().send(
      HttpRequest.newBuilder(URI.create(
        s"http://127.0.0.1:${server.boundPort}/stream/event_batch"))
        .header("Authorization", "Bearer testtoken")
        .POST(HttpRequest.BodyPublishers.ofString(Json.render(Map(
          "id" -> streamDid,
          "events" -> Vector(Map("user" -> "h", "payload_b64" -> payload))))))
        .build(), HttpResponse.BodyHandlers.ofString())
    assert(resp.body().contains("ok"), s"http append failed: ${resp.body()}")

    // the shared SubscriptionEngine pumps the socket.io side too
    val note = awaitNote()
    assert(note.isDefined, "no push after cross-transport append")
    val n = dToAny(Drisl.decode(note.get(1).asInstanceOf[Array[Byte]]))
      .asInstanceOf[Map[String, Any]]
    assert(n("subscriptionId") == subId)
    val rows = n("response").asInstanceOf[Map[String, Any]]("Ok")
      .asInstanceOf[Map[String, Any]]("rows").asInstanceOf[Vector[Any]]
    assert(rows.size == 1, s"expected the one new row, got $rows")
  }

  test("hostile wire bytes never crash the server (fuzz the transport)") {
    val http = HttpClient.newHttpClient()
    val rnd = new scala.util.Random(42) // deterministic fuzz corpus
    def post(sid: String, body: Array[Byte]): Int = http.send(
      HttpRequest.newBuilder(URI.create(
        s"http://127.0.0.1:${server.boundPort}/socket.io/?EIO=4&transport=polling&sid=$sid"))
        .POST(HttpRequest.BodyPublishers.ofByteArray(body)).build(),
      HttpResponse.BodyHandlers.ofString()).statusCode()
    // random garbage at a live session + at bogus sessions: every request
    // must come back as an orderly HTTP status, never a hung/killed server
    val c = new SioClient
    c.connect(Some("testtoken"))
    (1 to 60).foreach { i =>
      val len = rnd.nextInt(200)
      val garbage = Array.fill(len)(rnd.nextInt(256).toByte)
      val sid = if (i % 3 == 0) "nosuchsid" else c.sid
      val code = post(sid, garbage)
      assert(code >= 200 && code < 500, s"got $code on fuzz #$i")
      // b-prefixed base64 of random bytes exercises the msgpack decoder
      val b64 = "b" + Base64.getEncoder.encodeToString(garbage)
      val code2 = post(sid, b64.getBytes("UTF-8"))
      assert(code2 >= 200 && code2 < 500, s"got $code2 on b64 fuzz #$i")
    }
    // the server is still fully functional afterwards
    val c2 = new SioClient
    c2.connect(Some("testtoken"))
    assert(c2.takeEvent("authenticated").isDefined)
  }

  test("hostile websocket bytes never crash the server (fuzz the ws layer)") {
    val rnd = new scala.util.Random(1337) // deterministic fuzz corpus
    def rawSocket(): java.net.Socket =
      new java.net.Socket("127.0.0.1", server.boundPort)
    // 1. upgrade request with no Sec-WebSocket-Key: orderly 400, no hang
    locally {
      val s = rawSocket()
      s.getOutputStream.write(
        ("GET /socket.io/?EIO=4&transport=websocket HTTP/1.1\r\n" +
          "Host: x\r\nUpgrade: websocket\r\nConnection: Upgrade\r\n\r\n").getBytes("UTF-8"))
      val line = new String(s.getInputStream.readNBytes(12), "UTF-8")
      assert(line.contains("400"), s"want 400, got: $line")
      s.close()
    }
    // 2. valid handshake then garbage frame bytes (including UNMASKED
    // frames, which RFC 6455 requires the server to refuse): the
    // connection must die cleanly, the server must survive
    (1 to 10).foreach { i =>
      val s = rawSocket()
      s.setSoTimeout(5000)
      s.getOutputStream.write(
        ("GET /socket.io/?EIO=4&transport=websocket HTTP/1.1\r\n" +
          "Host: x\r\nUpgrade: websocket\r\nConnection: Upgrade\r\n" +
          "Sec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n\r\n").getBytes("UTF-8"))
      // swallow the 101 + open-packet frame, then write garbage
      Thread.sleep(50)
      s.getInputStream.skip(s.getInputStream.available())
      val garbage = Array.fill(20 + rnd.nextInt(100))(rnd.nextInt(256).toByte)
      if (i % 2 == 0) { garbage(0) = 0x81.toByte; garbage(1) = 0x05 } // unmasked text
      try {
        s.getOutputStream.write(garbage)
        s.getOutputStream.flush()
        // server either closes or keeps the socket; both are orderly
        s.getInputStream.read()
      } catch { case _: Exception => } // reset is an acceptable outcome
      finally s.close()
    }
    // 3. a frame claiming a 2GB payload must be refused, not buffered
    locally {
      val s = rawSocket()
      s.setSoTimeout(5000)
      s.getOutputStream.write(
        ("GET /socket.io/?EIO=4&transport=websocket HTTP/1.1\r\n" +
          "Host: x\r\nUpgrade: websocket\r\nConnection: Upgrade\r\n" +
          "Sec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n\r\n").getBytes("UTF-8"))
      Thread.sleep(50)
      s.getInputStream.skip(s.getInputStream.available())
      // FIN+binary, masked, 64-bit length = 2^31
      s.getOutputStream.write(Array[Byte](0x82.toByte, 0xff.toByte,
        0, 0, 0, 0, 0x80.toByte, 0, 0, 0, 1, 2, 3, 4))
      s.getOutputStream.flush()
      try s.getInputStream.read() catch { case _: Exception => }
      s.close()
    }
    // the server is still fully functional afterwards, on both transports
    val c = new SioClient
    c.connect(Some("testtoken"))
    assert(c.takeEvent("authenticated").isDefined)
    val w = new WsClient(None)
    assert(w.nextText().startsWith("0"))
    w.ws.sendClose(java.net.http.WebSocket.NORMAL_CLOSURE, "done").join()
  }

  test("module CID aliasing survives a server restart (persisted sidecar)") {
    val c1 = new SioClient
    c1.connect(Some("testtoken"))
    val wireCid = assertOk(c1.emitWithAck("module/upload", obj("module" -> wireModule)))
      .asInstanceOf[Map[String, Any]]("moduleCid").toString.stripPrefix("cid:")
    // a fresh server over the same store: no in-memory alias state — the
    // wire↔internal mapping must come back from the sidecar on disk
    val s2 = new LeafServer(store, 0, authToken = Some("testtoken"),
      serverDid = serverDid)
    s2.start()
    try {
      val c2 = new SioClient(s2.boundPort)
      c2.connect(Some("testtoken"))
      val exists = assertOk(c2.emitWithAck("module/exists",
        obj("moduleCid" -> DCid(Cid.parse(wireCid))))).asInstanceOf[Map[String, Any]]
      assert(exists("moduleExists") == true)
      val created = assertOk(c2.emitWithAck("stream/create",
        obj("moduleCid" -> DCid(Cid.parse(wireCid))))).asInstanceOf[Map[String, Any]]
      val info = assertOk(c2.emitWithAck("stream/info",
        obj("streamDid" -> text(created("streamDid").toString))))
        .asInstanceOf[Map[String, Any]]
      // the client still sees ITS OWN CID, not the internal encoding's
      assert(info("moduleCid").toString.stripPrefix("cid:") == wireCid)
    } finally s2.stop()
  }

  test("a session that never polls is disconnected at the outbox cap") {
    val c = new SioClient
    c.connect(Some("testtoken"))
    // fire ack-bearing requests WITHOUT ever polling: each queues an ack
    // packet; at the cap the server must drop the session rather than
    // buffer without bound — visible as POSTs no longer acking "ok"
    val http = HttpClient.newHttpClient()
    var i = 0
    var cut = false
    while (i < 400 && !cut) {
      val pkt = Map("type" -> 2L, "id" -> (1000L + i), "nsp" -> "/",
        "data" -> Vector("module/exists",
          Drisl.encode(obj("moduleCid" -> text("cid-not-there")))))
      val body = "b" + Base64.getEncoder.encodeToString(Msgpack.encode(pkt))
      val resp = http.send(
        HttpRequest.newBuilder(URI.create(
          s"http://127.0.0.1:${server.boundPort}/socket.io/?EIO=4&transport=polling&sid=${c.sid}"))
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
      cut = resp.body() != "ok"
      i += 1
    }
    assert(cut, s"outbox never hit the cap after $i requests")
  }
}
