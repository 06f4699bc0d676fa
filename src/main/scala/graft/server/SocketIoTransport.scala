package graft.server

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64
import java.util.concurrent.ThreadLocalRandom

import scala.collection.mutable

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.drisl.{Cid, Drisl, DValue}

/** The reference's native wire protocol: Socket.IO over Engine.IO
  * HTTP long-polling, msgpack packet framing, DRISL event payloads.
  *
  * The reference server mounts socketioxide with the msgpack parser at
  * `/socket.io` (/root/reference/leaf-server/src/http.rs:32-45) and the
  * shipped TypeScript client connects with `socket.io-client` +
  * `socket.io-msgpack-parser` (clients/typescript/src/index.ts:1-2,104).
  * This transport implements both protocol layers from their public
  * specifications so that client can speak to this server:
  *
  *   - Engine.IO v4 polling: `GET /socket.io/?EIO=4&transport=polling`
  *     handshakes an `0{json}` open packet with a session id; subsequent
  *     GETs long-poll for packets and POSTs deliver client packets. A
  *     payload is packets joined by 0x1e; a binary packet travels as
  *     `b<base64>`. The server pings (`2`), the client pongs (`3`) —
  *     the v4 direction. The handshake advertises
  *     `upgrades: ["websocket"]`; `handleWebSocket` serves both a fresh
  *     `?transport=websocket` connect and the 2probe/3probe/5 upgrade of
  *     an existing polling session over an RFC 6455 socket (`Ws.scala`).
  *   - Socket.IO v5 packets, each one msgpack map {type, nsp, data, id?}:
  *     CONNECT(0) carries the auth token, EVENT(2) carries
  *     [eventName, drislArgs] with an ack id, ACK(3) answers it with
  *     [drislResult]. Event names, argument shapes (camelCase, CID tags,
  *     `$type`-tagged SQL values) and `{Ok}/{Err}` result envelopes follow
  *     connection.rs:626-772 exactly.
  *
  * RPCs dispatch into the same route table the HTTP surface uses
  * (`LeafServer.routes`); subscriptions ride the shared per-stream
  * `SubscriptionEngine`s, delivered as `stream/subscription_response`
  * events. Each subscription's pump pauses while this connection's outbox
  * is full (the reference's engine.io-channel-full backoff,
  * connection.rs:444-475) and resumes when the client polls.
  */
class SocketIoTransport(srv: LeafServer,
    pingIntervalMs: Long = 25000,
    pingTimeoutMs: Long = 20000,
    maxOutbox: Int = 64) {

  import DValue._

  private val maxModuleBytes = 10 * 1024 * 1024

  /** One engine.io session = one socket.io connection (we serve the
    * default namespace only, like the reference: io.ns("/", ...)). */
  private final class Session(val sid: String) {
    val outbox = mutable.Queue.empty[Either[String, Array[Byte]]]
    var caller: Option[srv.Caller] = None
    var connected = false
    var closed = false
    // true once a websocket owns delivery (fresh ws connect, or a polling
    // session that completed the probe/upgrade); parked polls flush noop
    var wsAttached = false
    // wire subscriptionId (ULID) -> (stream id, engine sub id)
    val subs = mutable.LinkedHashMap.empty[String, (String, Long)]
    var lastSeen: Long = System.nanoTime
    var lastPing: Long = System.nanoTime
  }

  private val sessions = mutable.Map.empty[String, Session]
  // single monitor guards every session's outbox and parks pollers; wire
  // sessions are few and short-locked, contention is not a concern here
  private val monitor = new Object


  def mount(http: HttpServer): Unit =
    http.createContext("/socket.io", (ex: HttpExchange) => {
      try handleExchange(ex)
      catch {
        case t: Throwable =>
          respond(ex, 400, Json.render(Map(
            "code" -> 3L, "message" -> Option(t.getMessage).getOrElse("Bad request"))))
      }
    })

  def shutdown(): Unit = monitor.synchronized {
    sessions.values.foreach(teardown)
    sessions.clear()
    monitor.notifyAll()
  }

  /** Number of live engine.io sessions (test observability). */
  def liveSessions: Int = monitor.synchronized(sessions.size)

  // ---------------- engine.io layer ----------------

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "text/plain; charset=UTF-8")
    ex.getResponseHeaders.set("Access-Control-Allow-Origin", "*")
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def query(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).getOrElse("").split('&').iterator
      .map(_.split("=", 2)).collect {
        case Array(k, v) => k -> v
        case Array(k) => k -> ""
      }.toMap

  private def handleExchange(ex: HttpExchange): Unit = {
    val q = query(ex)
    if (ex.getRequestMethod == "OPTIONS") { // CORS preflight (reference: permissive)
      ex.getResponseHeaders.set("Access-Control-Allow-Origin", "*")
      ex.getResponseHeaders.set("Access-Control-Allow-Methods", "GET,POST,OPTIONS")
      ex.getResponseHeaders.set("Access-Control-Allow-Headers", "*")
      ex.sendResponseHeaders(204, -1); ex.close(); return
    }
    if (q.get("transport").exists(_ != "polling")) {
      respond(ex, 400, """{"code":0,"message":"Transport unknown"}"""); return
    }
    evictDeadSessions()
    (ex.getRequestMethod, q.get("sid")) match {
      case ("GET", None) => handshake(ex)
      case ("GET", Some(sid)) => withSession(ex, sid)(poll(ex, _))
      case ("POST", Some(sid)) => withSession(ex, sid) { sess =>
        val body = ex.getRequestBody.readAllBytes()
        decodePayload(body).foreach(handleEioPacket(sess, _))
        respond(ex, 200, "ok")
      }
      case _ => respond(ex, 400, """{"code":1,"message":"Session ID unknown"}""")
    }
  }

  private def withSession(ex: HttpExchange, sid: String)(f: Session => Unit): Unit =
    monitor.synchronized(sessions.get(sid)) match {
      case Some(sess) =>
        monitor.synchronized { sess.lastSeen = System.nanoTime }
        f(sess)
      case None => respond(ex, 400, """{"code":1,"message":"Session ID unknown"}""")
    }

  private def openPacket(sid: String, upgrades: Vector[String]): String =
    "0" + Json.render(Map(
      "sid" -> sid,
      "upgrades" -> upgrades,
      "pingInterval" -> pingIntervalMs,
      "pingTimeout" -> pingTimeoutMs,
      "maxPayload" -> 1000000L))

  private def handshake(ex: HttpExchange): Unit = {
    val sid = newUlid()
    monitor.synchronized { sessions(sid) = new Session(sid) }
    respond(ex, 200, openPacket(sid, Vector("websocket")))
  }

  /** Long-poll: park until the outbox has packets, the ping clock comes
    * due, or the session dies. Taking the packets frees outbox room, so
    * paused subscription pumps are resumed after the flush. */
  private def poll(ex: HttpExchange, sess: Session): Unit = {
    val taken: Vector[Either[String, Array[Byte]]] = monitor.synchronized {
      var out = Vector.empty[Either[String, Array[Byte]]]
      var done = false
      while (!done) {
        // flush queued packets even on a closed session (the error +
        // disconnect that closed it must still reach the client)
        if (sess.outbox.nonEmpty) {
          out = sess.outbox.dequeueAll(_ => true).toVector; done = true
        } else if (sess.closed) { sessions.remove(sess.sid); done = true }
        else if (sess.wsAttached) done = true // ws owns delivery: flush noop
        else {
          val pingDue = sess.lastPing + pingIntervalMs * 1000000L - System.nanoTime
          if (pingDue <= 0) {
            sess.lastPing = System.nanoTime
            out = Vector(Left("2")); done = true
          } else monitor.wait((pingDue / 1000000L).max(1L))
        }
      }
      out
    }
    if (taken.isEmpty) respond(ex, 200, "6") // closed session: noop packet
    else {
      respond(ex, 200, encodePayload(taken))
      refillSubs(sess)
    }
  }

  private def encodePayload(packets: Seq[Either[String, Array[Byte]]]): String =
    packets.map {
      case Left(text) => text
      case Right(bin) => "b" + Base64.getEncoder.encodeToString(bin)
    }.mkString("\u001e")

  private def decodePayload(body: Array[Byte]): Vector[String] =
    new String(body, UTF_8).split('\u001e').toVector.filter(_.nonEmpty)

  private def handleEioPacket(sess: Session, pkt: String): Unit = pkt.head match {
    case 'b' => // binary frame: a msgpack-encoded socket.io packet
      handleSioPacket(sess, Msgpack.decode(Base64.getDecoder.decode(pkt.tail)))
    case '3' => // pong — liveness only, lastSeen already touched
    case '1' => // engine.io close
      monitor.synchronized { teardown(sess); sessions.remove(sess.sid); monitor.notifyAll() }
    case '2' => push(sess, Left("3")) // a v3-style client probe: answer pong
    case '4' =>
      // a text socket.io packet means the default JSON parser — the
      // reference server is msgpack-only, so reject identically
      push(sess, Right(Msgpack.encode(Map(
        "type" -> 4L, "nsp" -> "/",
        "data" -> Map("message" -> "server requires the msgpack parser")))))
    case _ => // noop/upgrade chatter: ignore
  }

  // hasRoom bounds SUBSCRIPTION deliveries; this caps everything else
  // (acks, errors): a client that fires requests but never polls its
  // outbox is buffering server memory with no intent to read it —
  // disconnect it rather than grow without bound
  private val maxOutboxPackets = 256

  private def push(sess: Session, pkt: Either[String, Array[Byte]]): Unit =
    monitor.synchronized {
      if (!sess.closed) {
        if (sess.outbox.size >= maxOutboxPackets) {
          teardown(sess)
          sessions.remove(sess.sid)
        } else sess.outbox += pkt
        monitor.notifyAll()
      }
    }

  private def pushSio(sess: Session, pkt: Map[String, Any]): Unit =
    push(sess, Right(Msgpack.encode(pkt)))

  /** Sessions whose client went silent past ping+timeout die, and their
    * subscriptions with them (the reference's channels die with the
    * socket; polling needs the clock). */
  private def evictDeadSessions(): Unit = monitor.synchronized {
    val cutoff = System.nanoTime - (pingIntervalMs + pingTimeoutMs) * 1000000L
    val dead = sessions.values.filter(_.lastSeen < cutoff).toVector
    dead.foreach { s => teardown(s); sessions.remove(s.sid) }
    if (dead.nonEmpty) monitor.notifyAll()
  }

  private def teardown(sess: Session): Unit = {
    sess.closed = true
    sess.subs.foreach { case (_, (streamId, subId)) =>
      try srv.engineFor(streamId).unsubscribe(subId) catch { case _: Exception => }
    }
    sess.subs.clear()
  }

  /** After a flush freed outbox room, resume any subscription pumps that
    * paused on the full buffer. */
  private def refillSubs(sess: Session): Unit = {
    val entries = monitor.synchronized(sess.subs.values.toVector)
    entries.groupBy(_._1).foreach { case (streamId, subs) =>
      val engine = srv.engineFor(streamId)
      subs.foreach { case (_, subId) => engine.resume(subId) }
      try engine.drain() catch { case _: Exception => }
    }
  }

  // ---------------- engine.io websocket transport ----------------

  /** Serve one websocket connection (already routed here by the public
    * frontend with the 6455 upgrade request parsed, socket untouched past
    * the head). Two engine.io entry shapes:
    *   - `?transport=websocket` fresh: open a new session directly on ws;
    *   - `?transport=websocket&sid=...`: the probe/upgrade dance for an
    *     existing polling session — `2probe` → `3probe`, then `5` switches
    *     delivery to this socket and a parked poll flushes noop.
    * This thread runs the frame reader; a writer thread drains the same
    * outbox the poller used (identical backpressure + refill semantics).
    */
  def handleWebSocket(sock: java.net.Socket,
      head: PublicFrontend.RequestHead): Unit = {
    val out = sock.getOutputStream
    val in = sock.getInputStream
    val key = head.header("sec-websocket-key").getOrElse {
      out.write("HTTP/1.1 400 Bad Request\r\nContent-Length: 0\r\n\r\n".getBytes(UTF_8))
      sock.close(); return
    }
    out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      s"Sec-WebSocket-Accept: ${Ws.acceptKey(key)}\r\n\r\n").getBytes(UTF_8))
    out.flush()
    val wsLock = new Object // single writer lock: frames never interleave
    def send(pkt: Either[String, Array[Byte]]): Unit = wsLock.synchronized {
      pkt match {
        case Left(t) => Ws.writeText(out, t)
        case Right(b) => Ws.writeBinary(out, b)
      }
    }
    val q = head.query
    if (!q.get("transport").contains("websocket")) {
      wsLock.synchronized(Ws.writeClose(out, 1002)); sock.close(); return
    }
    evictDeadSessions()
    // ownership is PER CONNECTION: only the socket whose attachWs actually
    // transitioned the session to ws delivery may tear it down. A second
    // websocket that opens with the same sid and dies before (or after a
    // failed) upgrade must leave the owning connection's session alone —
    // checking sess.wsAttached here would let the interloper destroy it.
    var ownsDelivery = false
    val sess = q.get("sid") match {
      case Some(sid) => monitor.synchronized(sessions.get(sid)) match {
        case Some(s) => s
        case None =>
          send(Left("""{"code":1,"message":"Session ID unknown"}"""))
          wsLock.synchronized(Ws.writeClose(out, 1008)); sock.close(); return
      }
      case None =>
        val s = new Session(newUlid())
        monitor.synchronized { sessions(s.sid) = s }
        // fresh ws session: no further upgrade to offer
        send(Left(openPacket(s.sid, Vector.empty)))
        ownsDelivery = attachWs(s, send)
        s
    }
    try {
      var running = true
      while (running) {
        val msg = Ws.readMessage(in,
          ping => wsLock.synchronized(Ws.writePong(out, ping)))
        monitor.synchronized { sess.lastSeen = System.nanoTime }
        msg match {
          case Ws.Text("2probe") => send(Left("3probe"))
          case Ws.Text("5") => // upgrade complete: this socket owns delivery
            ownsDelivery ||= attachWs(sess, send)
          case Ws.Text(pkt) if pkt.nonEmpty => handleEioPacket(sess, pkt)
          case Ws.Text(_) => // empty frame: ignore
          case Ws.Binary(b) => handleSioPacket(sess, Msgpack.decode(b))
          case Ws.Close(_) => running = false
        }
        if (monitor.synchronized(sess.closed)) running = false
      }
    } catch { case _: Exception => } // broken socket: fall through to cleanup
    finally {
      // the channel dies with the socket (reference semantics) — but only
      // when THIS connection owned delivery; a failed probe or an
      // interloping second socket leaves the live session alone
      if (ownsDelivery) {
        monitor.synchronized {
          teardown(sess); sessions.remove(sess.sid); monitor.notifyAll()
        }
      }
      try wsLock.synchronized(Ws.writeClose(out, 1001)) catch { case _: Exception => }
      try sock.close() catch { case _: Exception => }
    }
  }

  /** Switch the session's delivery to the websocket: parked polls flush
    * noop, and a writer thread drains the outbox (ping clock included,
    * exactly the poller's contract — including refilling paused
    * subscription pumps after each flush). Returns true iff THIS call
    * transitioned the session to ws delivery — the caller that gets true
    * owns the session and is the only one allowed to tear it down. */
  private def attachWs(sess: Session,
      send: Either[String, Array[Byte]] => Unit): Boolean = {
    val already = monitor.synchronized {
      val was = sess.wsAttached
      sess.wsAttached = true
      monitor.notifyAll()
      was
    }
    if (already) return false
    val t = new Thread(() => wsWriterLoop(sess, send), s"graft-ws-${sess.sid}")
    t.setDaemon(true)
    t.start()
    true
  }

  private def wsWriterLoop(sess: Session,
      send: Either[String, Array[Byte]] => Unit): Unit = {
    var alive = true
    while (alive) {
      val taken: Vector[Either[String, Array[Byte]]] = monitor.synchronized {
        var outPkts = Vector.empty[Either[String, Array[Byte]]]
        var done = false
        while (!done) {
          if (sess.outbox.nonEmpty) {
            outPkts = sess.outbox.dequeueAll(_ => true).toVector
            done = true
            if (sess.closed) alive = false
          } else if (sess.closed) {
            sessions.remove(sess.sid); done = true; alive = false
          } else {
            val pingDue = sess.lastPing + pingIntervalMs * 1000000L - System.nanoTime
            if (pingDue <= 0) {
              sess.lastPing = System.nanoTime
              outPkts = Vector(Left("2")); done = true
            } else monitor.wait((pingDue / 1000000L).max(1L))
          }
        }
        outPkts
      }
      if (taken.nonEmpty) {
        try taken.foreach(send)
        catch {
          case _: Exception => // socket died: the session dies with it
            monitor.synchronized {
              teardown(sess); sessions.remove(sess.sid); monitor.notifyAll()
            }
            alive = false
        }
        if (alive) refillSubs(sess)
      }
    }
  }

  // ---------------- socket.io layer ----------------

  private def handleSioPacket(sess: Session, raw: Any): Unit = {
    val pkt = raw.asInstanceOf[Map[String, Any]]
    val tpe = pkt.get("type").collect { case l: Long => l }.getOrElse(-1L)
    val nsp = pkt.get("nsp").collect { case s: String => s }.getOrElse("/")
    if (nsp != "/") { // single-namespace server, like the reference
      pushSio(sess, Map("type" -> 4L, "nsp" -> nsp,
        "data" -> Map("message" -> "Invalid namespace")))
      return
    }
    tpe match {
      case 0 => connect(sess, pkt.get("data"))
      case 1 => monitor.synchronized { teardown(sess); monitor.notifyAll() }
      case 2 => event(sess, pkt)
      case _ => // client ACK/BINARY_*: the server never emits with ack
    }
  }

  /** CONNECT: authenticate the handshake token and mirror the reference's
    * observable behavior (http.rs:80-122) — accept the socket, then either
    * emit `authenticated {did}` or emit `error` and disconnect. Anonymous
    * connections (no token) are allowed; per-RPC gates apply. */
  private def connect(sess: Session, authData: Option[Any]): Unit = {
    val token = authData.collect { case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]].get("token")
    }.flatten.collect { case s: String => s }
    pushSio(sess, Map("type" -> 0L, "nsp" -> "/", "data" -> Map("sid" -> newUlid())))
    srv.tokenCaller(token) match {
      case Right(caller) =>
        monitor.synchronized { sess.caller = Some(caller); sess.connected = true }
        pushSio(sess, Map("type" -> 2L, "nsp" -> "/",
          "data" -> Vector("authenticated", Map("did" -> caller.did.orNull))))
      case Left(err) =>
        pushSio(sess, Map("type" -> 2L, "nsp" -> "/",
          "data" -> Vector("error", s"Error validating auth token: $err")))
        pushSio(sess, Map("type" -> 1L, "nsp" -> "/")) // server DISCONNECT
        monitor.synchronized(teardown(sess))
    }
  }

  private def event(sess: Session, pkt: Map[String, Any]): Unit = {
    if (!sess.connected) return
    val data = pkt.get("data").collect { case v: Seq[_] => v.toVector }.getOrElse(Vector.empty)
    val name = data.headOption.collect { case s: String => s }.getOrElse(return)
    val payload = data.lift(1).collect { case b: Array[Byte] => b }
      .getOrElse(Array.emptyByteArray)
    val (result, after) =
      try rpc(sess, name, payload)
      catch { case t: Throwable =>
        (obj("Err" -> text(Option(t.getMessage).getOrElse(t.toString))), None)
      }
    pkt.get("id").collect { case l: Long => l }.foreach { ackId =>
      pushSio(sess, Map("type" -> 3L, "nsp" -> "/", "id" -> ackId,
        "data" -> Vector(Drisl.encode(result))))
    }
    // deferred work that must observably happen after the ack (backfill
    // deliveries: the TS client registers its subscription callback only
    // once the ack resolves, index.ts:283-300)
    after.foreach(f => try f() catch { case _: Exception => })
  }

  // ---------------- RPC adapter (wire shapes ↔ internal routes) ----------------

  private def ok(v: DValue): DValue = obj("Ok" -> v)

  private def caller(sess: Session): srv.Caller =
    sess.caller.getOrElse(srv.Caller(None, trusted = false))

  private def requireDid(sess: Session, action: String): String =
    caller(sess).did.getOrElse(
      throw new IllegalArgumentException(s"Only authenticated users can $action"))

  private def route(sess: Session, path: String, args: Map[String, Any]): Map[String, Any] =
    srv.routes(path)(caller(sess), args)

  private def decodeArgs(payload: Array[Byte]): Map[String, Any] =
    if (payload.isEmpty) Map.empty
    else srv.dvalueToAny(Drisl.decode(payload)).asInstanceOf[Map[String, Any]]

  private def cidStr(v: Any): String = v match {
    case b: Array[Byte] => Cid.render(b)
    case s: String => s // tolerate a {$link}-style string
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]("$link").toString
    case other => throw new IllegalArgumentException(s"bad CID: $other")
  }

  /** Returns (Result DValue for the ack, deferred post-ack action). */
  private def rpc(sess: Session, name: String,
      payload: Array[Byte]): (DValue, Option[() => Unit]) = name match {

    case "module/upload" =>
      requireDid(sess, "upload module")
      if (payload.length > maxModuleBytes)
        throw new IllegalArgumentException("Module larger than 10MB maximum size.")
      val argsD = Drisl.decode(payload).asInstanceOf[DMap]
      val moduleD = argsD.v.getOrElse("module",
        throw new IllegalArgumentException("missing module"))
      // wire CID = content address of the module as the client encoded it
      val wireCid = Cid.of(Drisl.encode(moduleD))
      val internal = route(sess, "/module/upload",
        Map("module" -> moduleFromWire(srv.dvalueToAny(moduleD))))
      val internalCid = internal("cid").toString
      // module CID aliasing: the wire CID is content-addressed over the
      // client's DRISL encoding (what LeafClient.moduleCid computes,
      // index.ts:158-162); internally modules are addressed by the
      // engine's canonical encoding. The alias persists as a sidecar next
      // to the blob so client CID equality survives a server restart.
      srv.store.recordModuleAlias(Cid.render(wireCid), internalCid)
      // stash the client's own encoding: reference-format backup export
      // ships module blobs byte-identical to what was uploaded
      srv.store.recordWireModule(Cid.render(wireCid), Drisl.encode(moduleD))
      (ok(obj("moduleCid" -> DCid(wireCid))), None)

    case "module/exists" =>
      val args = decodeArgs(payload)
      val wire = cidStr(args("moduleCid"))
      val internal = srv.store.moduleAlias(wire).getOrElse(wire)
      val resp = route(sess, "/module/exists", Map("cid" -> internal))
      (ok(obj("moduleExists" -> DBool(resp("exists") == true))), None)

    case "stream/create" =>
      requireDid(sess, "create_streams")
      val args = decodeArgs(payload)
      val wire = cidStr(args("moduleCid"))
      val internal = srv.store.moduleAlias(wire).getOrElse(wire)
      val resp = route(sess, "/stream/create", Map("module_cid" -> internal))
      (ok(obj("streamDid" -> text(resp("id").toString))), None)

    case "stream/info" =>
      val args = decodeArgs(payload)
      val resp = route(sess, "/stream/info", Map("id" -> args("streamDid").toString))
      val cid = Option(resp.getOrElse("module_cid", null)).map(_.toString)
        .map(c => srv.store.wireAliasFor(c).getOrElse(c))
      (ok(obj("moduleCid" -> cid.map(c => DCid(Cid.parse(c))).getOrElse(DNull))), None)

    case "stream/update_module" =>
      requireDid(sess, "update modules")
      val args = decodeArgs(payload)
      val wire = cidStr(args("moduleCid"))
      val internal = srv.store.moduleAlias(wire).getOrElse(wire)
      route(sess, "/stream/update_module",
        Map("id" -> args("streamDid").toString, "module_cid" -> internal))
      (ok(DNull), None)

    case "stream/event_batch" | "stream/state_event_batch" =>
      val did = requireDid(sess, "send events")
      val args = decodeArgs(payload)
      // userOverride applies to the whole batch and is a trusted-connection
      // privilege (connection.rs:233-241): ANY override on a JWT connection
      // is rejected, even the caller's own DID
      val overrideUser = args.get("userOverride").collect { case s: String => s }
      if (overrideUser.isDefined && !caller(sess).trusted)
        throw new IllegalArgumentException(
          "user_override is only allowed for trusted (unsafe_auth_token) connections")
      val user = overrideUser.getOrElse(did)
      val events = args.get("events").collect { case evs: Seq[_] =>
        evs.toVector.map {
          case b: Array[Byte] => Map[String, Any]("user" -> user, "payload" -> b)
          case other => throw new IllegalArgumentException(s"bad event payload: $other")
        }
      }.getOrElse(Vector.empty)
      route(sess, s"/$name", Map("id" -> args("streamDid").toString, "events" -> events))
      (ok(DNull), None)

    case "stream/clear_state" =>
      requireDid(sess, "clear state")
      val args = decodeArgs(payload)
      route(sess, "/stream/clear_state", Map("id" -> args("streamDid").toString))
      (ok(DNull), None)

    case "stream/set_handle" =>
      requireDid(sess, "set handles")
      val args = decodeArgs(payload)
      route(sess, "/stream/set_handle", Map(
        "id" -> args("streamDid").toString,
        "handle" -> args.getOrElse("handle", null)))
      (ok(DNull), None)

    case "stream/query" =>
      val args = decodeArgs(payload)
      val id = args("streamDid").toString
      val q = queryFromWire(args("query").asInstanceOf[Map[String, Any]])
      val rows = srv.openExisting(id).queryTagged(caller(sess).did, q)
      (ok(DArray(rows.map(rowToWire))), None)

    case "stream/subscribe_events" =>
      val args = decodeArgs(payload)
      val streamId = args("streamDid").toString
      srv.openExisting(streamId)
      val q = queryFromWire(args("query").asInstanceOf[Map[String, Any]])
      val engine = srv.engineFor(streamId)
      val subUlid = newUlid()
      val user = caller(sess).did
      // pause the pump while this connection's outbox is full — the
      // reference's retry-on-full-channel backoff (connection.rs:444-475)
      val hasRoom = () => monitor.synchronized(!sess.closed && sess.outbox.size < maxOutbox)
      val subId = engine.subscribe(user, q, hasRoom) { d =>
        val resp = obj(
          "subscriptionId" -> text(subUlid),
          "response" -> obj("Ok" -> obj(
            "rows" -> DArray(d.rows.map(rowToWire)),
            "has_more" -> DBool(d.hasMore))))
        pushSio(sess, Map("type" -> 2L, "nsp" -> "/", "data" ->
          Vector("stream/subscription_response", Drisl.encode(resp))))
      }
      monitor.synchronized { sess.subs(subUlid) = (streamId, subId) }
      // backfill only after the ack: the client learns its subscriptionId
      // from the ack and would drop earlier notifications (index.ts:283-300)
      (ok(obj("subscriptionId" -> text(subUlid))),
        Some(() => { engine.drain(); () }))

    case "stream/unsubscribe" =>
      val args = decodeArgs(payload)
      val subUlid = args("subscriptionId").toString
      val removed = monitor.synchronized(sess.subs.remove(subUlid))
      removed.foreach { case (streamId, subId) =>
        srv.engineFor(streamId).unsubscribe(subId)
      }
      (ok(obj("wasSubscribed" -> DBool(removed.isDefined))), None)

    case "admin/list_streams" =>
      val resp = route(sess, "/admin/list_streams", Map.empty)
      val streams = resp("streams").asInstanceOf[Seq[Any]].toVector
      (ok(obj("streams" -> DArray(streams.map(s => obj("did" -> text(s.toString)))))), None)

    case other =>
      throw new IllegalArgumentException(s"unknown event: $other")
  }

  /** Wire module codec (camelCase, queries as a list; codec.ts:12-30) →
    * the internal snake_case shape `moduleFromJson` consumes. */
  private def moduleFromWire(m: Any): Map[String, Any] = {
    val mm = m.asInstanceOf[Map[String, Any]]
    val tpe = mm.getOrElse("$type", "muni.town.leaf.module.basic.v0")
    if (tpe != "muni.town.leaf.module.basic.v0")
      throw new IllegalArgumentException(s"unsupported module codec: $tpe")
    def s(k: String) = mm.get(k).collect { case v: String => v }.getOrElse("")
    val queries = mm.get("queries").collect { case qs: Seq[_] =>
      qs.map { q =>
        val qm = q.asInstanceOf[Map[String, Any]]
        qm("name").toString -> Map[String, Any](
          "sql" -> qm("sql"),
          "params" -> qm.get("params").collect { case ps: Seq[_] => ps.toVector }
            .getOrElse(Vector.empty))
      }.toMap
    }.getOrElse(Map.empty[String, Any])
    Map(
      "init_sql" -> s("initSql"),
      "authorizer" -> s("authorizer"),
      "materializer" -> s("materializer"),
      "state_init_sql" -> s("stateInitSql"),
      "state_materializer" -> s("stateMaterializer"),
      "queries" -> queries)
  }

  /** Wire LeafQuery ($type-tagged param values; codec.ts:32-51) → typed. */
  private def queryFromWire(qm: Map[String, Any]): graft.types.LeafQuery = {
    import graft.types.SqlValue
    val params = qm.get("params").collect { case pm: Map[_, _] =>
      pm.asInstanceOf[Map[String, Any]].map { case (k, v) =>
        val tag = v.asInstanceOf[Map[String, Any]]
        val value = tag.get("value")
        k -> (tag.getOrElse("$type", "").toString match {
          case "muni.town.sqliteValue.null" => SqlValue.SqlNull
          case "muni.town.sqliteValue.integer" => value match {
            case Some(l: Long) => SqlValue.SqlInteger(l)
            case Some(d: Double) => SqlValue.SqlInteger(d.toLong)
            case other => throw new IllegalArgumentException(s"bad integer: $other")
          }
          case "muni.town.sqliteValue.real" => value match {
            case Some(d: Double) => SqlValue.SqlReal(d)
            case Some(l: Long) => SqlValue.SqlReal(l.toDouble)
            case other => throw new IllegalArgumentException(s"bad real: $other")
          }
          case "muni.town.sqliteValue.text" => SqlValue.SqlText(value.orNull.toString)
          case "muni.town.sqliteValue.blob" => value match {
            case Some(b: Array[Byte]) => SqlValue.SqlBlob(b)
            case other => throw new IllegalArgumentException(s"bad blob: $other")
          }
          case other => throw new IllegalArgumentException(s"bad sql value type: $other")
        })
      }
    }.getOrElse(Map.empty[String, SqlValue])
    graft.types.LeafQuery(
      qm("name").toString, params,
      qm.get("start").collect { case l: Long => l },
      qm.get("limit").collect { case l: Long => l }.getOrElse(1000L))
  }

  /** A result row as the wire's `$type`-tagged SqlValueRaw map — blobs as
    * native DRISL bytes (the JSON surface base64s them instead). */
  private def rowToWire(row: Map[String, graft.types.SqlValue]): DValue = {
    import graft.types.SqlValue._
    DMap(row.map { case (k, v) =>
      k -> (v match {
        case SqlNull => obj("$type" -> text("muni.town.sqliteValue.null"))
        case SqlInteger(i) => obj(
          "$type" -> text("muni.town.sqliteValue.integer"), "value" -> DInt(i))
        case SqlReal(d) => obj(
          "$type" -> text("muni.town.sqliteValue.real"), "value" -> DFloat(d))
        case SqlText(s) => obj(
          "$type" -> text("muni.town.sqliteValue.text"), "value" -> text(s))
        case SqlBlob(b) => obj(
          "$type" -> text("muni.town.sqliteValue.blob"), "value" -> DBytes(b))
      })
    })
  }

  // ---------------- ULID (public Crockford-base32 spec) ----------------

  private val ulidChars = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"

  private def newUlid(): String = {
    val rnd = ThreadLocalRandom.current()
    val time = System.currentTimeMillis()
    val sb = new StringBuilder(26)
    var i = 9
    while (i >= 0) { sb.append(ulidChars(((time >>> (i * 5)) & 0x1f).toInt)); i -= 1 }
    var j = 0
    while (j < 16) { sb.append(ulidChars(rnd.nextInt(32))); j += 1 }
    sb.toString
  }
}
