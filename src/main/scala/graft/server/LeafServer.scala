package graft.server

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64
import java.util.concurrent.{Executors, TimeUnit}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.stream.{BackupService, StreamStore, SubscriptionEngine}
import graft.types._

/** HTTP/JSON server exposing the engine's RPC surface.
  *
  * The reference serves the same operations over socket.io + msgpack with
  * DRISL-encoded bodies (/root/reference/leaf-server/src/http/connection.rs;
  * RPC table in SURVEY.md §2.D). This re-expression keeps the operation
  * names, argument shapes, and Result-or-error ack contract, but serves
  * them over HTTP — the transport is an integration detail, the API shape
  * is the compatibility surface. Bodies are JSON by default (binary
  * payloads base64-encoded); a client sending `Content-Type:
  * application/drisl` gets the reference's native body encoding — DRISL
  * both ways (`Accept: application/drisl`), with event payloads as raw
  * bytes.
  *
  * Endpoints (POST JSON body → {"ok": ...} | {"err": "..."}):
  *   /module/upload         {module: {init_sql, authorizer, materializer,
  *                           state_init_sql, state_materializer, queries}}
  *                          → {cid}
  *   /module/exists         {cid} → {exists}
  *   /stream/create         {id?, module_cid} → {id}
  *   /stream/info           {id} → {id, module_cid, latest_idx}
  *   /stream/update_module  {id, module_cid} → {}
  *   /stream/event_batch    {id, events: [{user, payload_b64}]} → {latest_idx}
  *   /stream/state_event_batch {id, events: [...]} → {}
  *   /stream/clear_state    {id} → {}
  *   /stream/query          {id, user?, query: {name, params?, start?, limit?}}
  *                          → {rows: [{col: {t, v}}]}
  *   /stream/subscribe_events {id, user?, query} → {sub_id}
  *   /stream/poll           {id, sub_id} → {deliveries: [{rows, has_more}]}
  *   /stream/events_push    {id, sub_id, timeout_ms?} → {deliveries: [...]}
  *                          (long-poll: parks until a delivery exists)
  *   /stream/unsubscribe    {id, sub_id} → {}
  *   /stream/set_handle     {id, handle} → {}        (owner-gated)
  *   /admin/list_streams    {} → {streams: [...]}    (trusted only)
  *   /admin/compact         {id} → {files}           (trusted only)
  *
  * Auth: a shared bearer token (the reference's `--unsafe-auth-token`
  * bootstrap path, connection.rs:171-180) marks the connection *trusted* —
  * it may claim any identity via `X-Graft-Did` and override per-event
  * users (connection.rs:233-241). Alternatively an ATProto-shaped ES256
  * JWT (`JwtAuth`) authenticates an untrusted connection whose identity is
  * the verified issuer only: user overrides and admin RPCs are rejected.
  *
  * ACLs (connection.rs:189-200, 365-369, 604-608): the creating DID is
  * recorded as the stream's owner; update_module is owner-or-module-admin,
  * clear_state and set_handle are owner-only. A stream created with no
  * caller identity (pure bootstrap) has no owner and stays open — the
  * moment an owner exists, gating is enforced.
  *
  * Delivery: the reference pushes subscription responses over the socket
  * with an exponential-backoff retry when the client is overwhelmed
  * (connection.rs:447-485). Over HTTP the analog is long-poll
  * (/stream/events_push): deliveries buffer server-side and the client
  * consumes at its own pace — backpressure is inherent, nothing is dropped.
  */
class LeafServer(private[server] val store: StreamStore, port: Int,
    authToken: Option[String] = None, moduleAdmins: Set[String] = Set.empty,
    jwt: Option[JwtAuth] = None,
    maxBufferedDeliveries: Int = 12,
    subIdleTtlMs: Long = 10 * 60 * 1000L,
    maxParkedPolls: Int = 64,
    serverDid: String = "did:graft:server",
    plc: Option[PlcDirectory] = None,
    backupDest: Option[String] = None,
    backupReferenceFormat: Boolean = false,
    // opt-in: ship each stream's custodied signing key in the bucket's
    // metadata (the reference's did_key, storage.rs:1076-1081). Off by
    // default — no key material leaves the server unless the operator
    // explicitly accepts that a readable bucket can mint signatures.
    backupExportKeys: Boolean = false,
    backupSweepMs: Long = 60 * 1000L,
    blobGcMs: Long = 500 * 1000L,
    blobGcMinAgeMs: Long = 500 * 1000L,
    // operator-facing disaster recovery (the reference's `leaf-server
    // backup restore`, main.rs:52-56): restore every stream on this
    // bucket at boot, before the server starts serving traffic
    restoreFrom: Option[String] = None,
    // auto-maintenance of MANAGED vector indexes (every dir the
    // build/attach/append RPCs touched): a lifecycle tick compacts when
    // the small-files signal passes vectorCompactFilesThreshold; skew
    // past vectorRetrainSharePct is FLAGGED (warn log + the
    // /admin/vector_index_maint status), never auto-run — a retrain
    // changes cell geometry, which stays an operator decision. 0 = off.
    vectorMaintMs: Long = 0L,
    vectorCompactFilesThreshold: Long = 64L,
    vectorRetrainSharePct: Long = 50L,
    // opt-in dedup auto-reband: unlike compaction (purely physical), a
    // re-band CHANGES candidate volume, so staleness is only flagged by
    // default. An operator who accepts that trade (the re-band is the
    // derivation a fresh build would pick, and it reads only the index's
    // own shingle arrays) can let the tick run it.
    dedupRebandOnStale: Boolean = false,
    // tombstone pressure: targeted deletes are logical until a compaction
    // purges them — when the tombstone share of an index's physical rows
    // passes this, the tick compacts even below the files threshold (the
    // purge is content-preserving over the LIVE rows, safe to automate)
    tombstonePurgeSharePct: Long = 20L) {

  // the HTTP routes bind to an INTERNAL loopback port; the public port is
  // a JDK-socket frontend (PublicFrontend) that serves websocket upgrades
  // for /socket.io in-process and byte-relays everything else here —
  // com.sun.net.httpserver cannot hand a connection over after a 101
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  // long-polls park their handler thread; a fixed pool the size of the park
  // cap would let pollers starve every other RPC (including the event_batch
  // that would wake them), so the pool grows on demand and the park count is
  // capped separately below
  server.setExecutor(Executors.newCachedThreadPool())

  private val engines = mutable.Map.empty[String, SubscriptionEngine]
  private val pendingDeliveries =
    mutable.Map.empty[(String, Long), mutable.Buffer[Map[String, Any]]]
  // subscription registry: creating caller (poll/unsubscribe are bound to
  // the identity that subscribed — the reference scopes subscriptions to
  // the socket connection) and last client activity for idle eviction
  private val subOwners = mutable.Map.empty[(String, Long), Caller]
  private val subLastSeen = mutable.Map.empty[(String, Long), Long]
  private val parkedPolls = new java.util.concurrent.atomic.AtomicInteger(0)
  private val owners = mutable.Map.empty[String, Set[String]]
  private val handles = mutable.Map.empty[String, String]

  /** Module uploads are capped like the reference (connection.rs:55-57). */
  private val maxModuleBytes = 10 * 1024 * 1024

  def boundPort: Int = frontend.boundPort

  // ---------------- handlers ----------------

  /** Caller identity + whether the connection is trusted (unsafe-token /
    * open-dev). Only trusted connections may override event users or call
    * admin RPCs — the reference's unsafe_auth distinction. */
  case class Caller(did: Option[String], trusted: Boolean)

  /** RPC bodies by path, shared between the HTTP contexts and the
    * socket.io transport (which dispatches the same operations by their
    * reference event names — the path without the leading slash). */
  private[server] val routes =
    mutable.LinkedHashMap.empty[String, (Caller, Map[String, Any]) => Map[String, Any]]

  private[server] def streamStore: StreamStore = store

  /** Shared SubscriptionEngine per stream — socket.io subscriptions ride
    * the same engines, so an event_batch from either transport pumps both. */
  private[server] def engineFor(id: String): SubscriptionEngine =
    engines.synchronized(engines.getOrElseUpdate(id, new SubscriptionEngine(store, id)))

  /** Authenticate a connection-level token (the socket.io handshake path,
    * http.rs:165-180): the shared unsafe token marks a trusted connection
    * whose identity is the server's own DID (the reference's appserver-proxy
    * model); a JWT authenticates as its verified issuer; no token at all is
    * an anonymous untrusted connection (allowed — per-RPC gates apply). */
  private[server] def tokenCaller(token: Option[String]): Either[String, Caller] =
    token match {
      case None => Right(Caller(None, trusted = authToken.isEmpty && jwt.isEmpty))
      case Some(t) => (authToken, jwt) match {
        case (Some(tok), _) if t == tok => Right(Caller(Some(serverDid), trusted = true))
        case (_, Some(j)) => j.verify(t).map(d => Caller(Some(d), trusted = false))
        case _ => Left("unauthorized")
      }
    }

  private def handle(path: String, maxBody: Int = Int.MaxValue)(
      f: (Caller, Map[String, Any]) => Map[String, Any]): Unit = {
    routes(path) = f
    server.createContext(path, (ex: HttpExchange) => {
      val wantDrisl = Option(ex.getRequestHeaders.getFirst("Accept"))
        .exists(_.contains("application/drisl"))
      val resp =
        try authenticate(ex) match {
          case Left(reason) => Map("err" -> reason)
          case Right(caller) =>
            val raw = ex.getRequestBody.readAllBytes()
            if (raw.length > maxBody)
              Map("err" -> s"request larger than $maxBody byte maximum size")
            else {
              val isDrisl = Option(ex.getRequestHeaders.getFirst("Content-Type"))
                .exists(_.contains("application/drisl"))
              val args =
                if (raw.isEmpty) Map.empty[String, Any]
                else if (isDrisl)
                  dvalueToAny(graft.drisl.Drisl.decode(raw)).asInstanceOf[Map[String, Any]]
                else Json.parse(new String(raw, UTF_8)).asInstanceOf[Map[String, Any]]
              Map("ok" -> f(caller, args))
            }
        } catch {
          case t: Throwable => Map("err" -> Option(t.getMessage).getOrElse(t.toString))
        }
      val bytes =
        if (wantDrisl) graft.drisl.Drisl.encode(anyToDValue(resp))
        else Json.render(resp).getBytes(UTF_8)
      ex.getResponseHeaders.set("Content-Type",
        if (wantDrisl) "application/drisl" else "application/json")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
  }

  /** Authenticate the connection: Left(reason) to reject, Right(callerDid)
    * to proceed. Order mirrors the reference (http.rs:165-242): the unsafe
    * shared token short-circuits as a *trusted* connection (which may claim
    * any identity via X-Graft-Did — the user_override channel); otherwise a
    * JWT must verify, and the identity is the verified issuer only. */
  private def authenticate(ex: HttpExchange): Either[String, Caller] = {
    val bearer = Option(ex.getRequestHeaders.getFirst("Authorization"))
      .collect { case a if a.startsWith("Bearer ") => a.stripPrefix("Bearer ") }
    val claimed = Option(ex.getRequestHeaders.getFirst("X-Graft-Did")).filter(_.nonEmpty)
    (authToken, jwt) match {
      case (Some(tok), _) if bearer.contains(tok) => Right(Caller(claimed, trusted = true))
      case (_, Some(j)) => bearer match {
        case None => Left("unauthorized")
        case Some(token) => j.verify(token).map(did => Caller(Some(did), trusted = false))
      }
      case (Some(_), None) => Left("unauthorized")
      case (None, None) => Right(Caller(claimed, trusted = true)) // open dev server
    }
  }

  private[server] def dvalueToAny(v: graft.drisl.DValue): Any = {
    import graft.drisl.DValue._
    v match {
      case DMap(m) => m.map { case (k, x) => k -> dvalueToAny(x) }
      case DArray(a) => a.map(dvalueToAny)
      case DInt(i) => i
      case DFloat(d) => d
      case DText(s) => s
      case DBool(b) => b
      case DNull => null
      case DBytes(b) => b
      case DCid(b) => b
    }
  }

  private[server] def anyToDValue(v: Any): graft.drisl.DValue = {
    import graft.drisl.DValue._
    v match {
      case null => DNull
      case m: Map[_, _] =>
        DMap(m.asInstanceOf[Map[String, Any]].map { case (k, x) => k -> anyToDValue(x) })
      case s: Seq[_] => DArray(s.toVector.map(anyToDValue))
      case b: Array[Byte] => DBytes(b)
      case i: Long => DInt(i)
      case i: Int => DInt(i.toLong)
      case d: Double => DFloat(d)
      case b: Boolean => DBool(b)
      case s: String => DText(s)
      case other => DText(other.toString)
    }
  }

  /** Resolve an existing stream; unknown ids error instead of silently
    * creating an empty stream (the reference's STREAMS.load contract —
    * only stream/create mints streams). */
  private[server] def openExisting(id: String): graft.stream.StreamHandle = {
    if (!store.exists(id))
      throw new IllegalArgumentException(s"stream not found: $id")
    store.open(id)
  }

  /** Resolve-and-use under LRU churn: the shared retry discipline
    * ([[graft.stream.StreamStore.retryEvicted]]) over this server's
    * existing-stream resolution, so an eviction between resolve and use
    * never surfaces as a spurious RPC failure. */
  private[server] def withStream[A](id: String)(
      f: graft.stream.StreamHandle => A): A =
    graft.stream.StreamStore.retryEvicted(openExisting(id))(f)

  /** Owner gate for mutating RPCs. A stream with no recorded owner stays
    * open (bootstrap); otherwise the caller must be an owner — or, when
    * `admins` is true, one of the server's module admins. */
  private def requireOwner(did: Option[String], id: String, action: String,
      admins: Boolean = false): Unit = {
    val os = owners.synchronized(owners.getOrElse(id, Set.empty))
    if (os.nonEmpty) {
      val d = did.getOrElse(
        throw new LeafAuthException(s"Only the stream creator can $action"))
      if (!os.contains(d) && !(admins && moduleAdmins.contains(d)))
        throw new LeafAuthException(s"Only a stream owner can $action")
    }
  }

  private def str(m: Map[String, Any], k: String): String = m.get(k) match {
    case Some(s: String) => s
    case other => throw new IllegalArgumentException(s"missing/bad '$k': $other")
  }

  /** A JSON array of integral ids (the delete RPCs' shape). */
  private def longSeq(m: Map[String, Any], k: String): Seq[Long] =
    m.get(k) match {
      case Some(v: Vector[_]) => v.map {
        case l: Long => l
        case i: Int => i.toLong
        case d: Double if d.isWhole => d.toLong
        case x => throw new IllegalArgumentException(s"bad id in '$k': $x")
      }
      case other =>
        throw new IllegalArgumentException(s"missing/bad '$k': $other")
    }

  private[server] def moduleFromJson(m: Map[String, Any]): ModuleDef = {
    def s(k: String) = m.get(k).collect { case v: String => v }.getOrElse("")
    val queries = m.get("queries").collect { case q: Map[_, _] =>
      q.asInstanceOf[Map[String, Any]].map { case (name, defn) =>
        val dm = defn.asInstanceOf[Map[String, Any]]
        val params = dm.get("params").collect { case ps: Vector[_] =>
          ps.map { p =>
            val pm = p.asInstanceOf[Map[String, Any]]
            ParamDef(
              pm("name").toString,
              pm.getOrElse("kind", "any").toString.toLowerCase match {
                case "integer" => ParamKind.PInteger
                case "real" => ParamKind.PReal
                case "text" => ParamKind.PText
                case "blob" => ParamKind.PBlob
                case _ => ParamKind.PAny
              },
              pm.get("optional").contains(true))
          }
        }.getOrElse(Vector.empty)
        name -> QueryDef(dm("sql").toString, params)
      }
    }.getOrElse(Map.empty[String, QueryDef])
    ModuleDef(s("init_sql"), s("authorizer"), s("materializer"),
      s("state_init_sql"), s("state_materializer"), queries)
  }

  private[server] def eventsFromJson(args: Map[String, Any]): Seq[IncomingEvent] =
    args.get("events").collect { case evs: Vector[_] =>
      evs.map { e =>
        val em = e.asInstanceOf[Map[String, Any]]
        // DRISL bodies carry the payload as native bytes; JSON base64s it
        val payload = em.get("payload") match {
          case Some(b: Array[Byte]) => b
          case _ => Base64.getDecoder.decode(str(em, "payload_b64"))
        }
        IncomingEvent(em.get("user").map(_.toString).orNull, payload)
      }
    }.getOrElse(Seq.empty)

  /** Tagged wire values, keeping the reference's `$type` convention
    * (clients/typescript/src/codec.ts:32-44). */
  private[server] def tagValue(v: SqlValue): Map[String, Any] = v match {
    case SqlValue.SqlNull => Map("$type" -> "muni.town.sqliteValue.null")
    case SqlValue.SqlInteger(i) =>
      Map("$type" -> "muni.town.sqliteValue.integer", "value" -> i)
    case SqlValue.SqlReal(d) =>
      Map("$type" -> "muni.town.sqliteValue.real", "value" -> d)
    case SqlValue.SqlText(s) =>
      Map("$type" -> "muni.town.sqliteValue.text", "value" -> s)
    case SqlValue.SqlBlob(b) =>
      Map("$type" -> "muni.town.sqliteValue.blob",
        "value" -> Base64.getEncoder.encodeToString(b))
  }

  private[server] def queryFromJson(args: Map[String, Any]): LeafQuery = {
    val qm = args("query").asInstanceOf[Map[String, Any]]
    val params = qm.get("params").collect { case pm: Map[_, _] =>
      pm.asInstanceOf[Map[String, Any]].map { case (k, v) =>
        k -> (v match {
          case null => SqlValue.SqlNull
          case l: Long => SqlValue.SqlInteger(l)
          case d: Double => SqlValue.SqlReal(d)
          case b: Boolean => SqlValue.SqlInteger(if (b) 1 else 0)
          case s: String => SqlValue.SqlText(s)
          case other => SqlValue.SqlText(other.toString)
        })
      }
    }.getOrElse(Map.empty[String, SqlValue])
    LeafQuery(
      str(qm, "name"), params,
      qm.get("start").collect { case l: Long => l },
      qm.get("limit").collect { case l: Long => l }.getOrElse(1000L))
  }

  // ---------------- routes ----------------

  handle("/module/upload", maxBody = maxModuleBytes) { (_, args) =>
    val m = moduleFromJson(args("module").asInstanceOf[Map[String, Any]])
    Map("cid" -> store.registerModule(m))
  }

  handle("/module/exists") { (_, args) =>
    Map("exists" -> store.module(str(args, "cid")).isDefined)
  }

  handle("/stream/create") { (c, args) =>
    // caller-chosen ids are a trusted-connection privilege, and creating an
    // id that already exists is always an error: store.open would attach to
    // the EXISTING stream, so an attacker who knows a stream id could swap
    // its module (wiping its tables) and mint themselves owner rights. The
    // reference mints the DID server-side and its INSERT fails on a
    // duplicate (connection.rs:111-113, storage.rs create_stream).
    val requested = args.get("id").map(_.toString)
    if (requested.isDefined && !c.trusted)
      throw new LeafAuthException(
        "caller-chosen stream ids require a trusted connection")
    // with a PLC directory, mint a real did:plc backed by a signed genesis
    // op and a custodied secp256k1 key (did.rs:11-47); otherwise an opaque id
    val id = requested.getOrElse(plc match {
      case Some(dir) => dir.createDid(s"http://127.0.0.1:$boundPort/")
      case None => "did:graft:" + java.util.UUID.randomUUID().toString.take(12)
    })
    val m = store.module(str(args, "module_cid"))
      .getOrElse(throw new IllegalArgumentException("module not uploaded"))
    // the takeover guard lives in the store: `exists` is disk-backed (the
    // on-disk catalog), so a duplicate create is rejected even across a
    // server restart, and the per-id lock serializes racing creates
    val h = store.createStream(id, m)
    // the creating DID owns the stream (storage.rs:581: did_owners at create)
    c.did.foreach(d => owners.synchronized {
      owners(id) = owners.getOrElse(id, Set.empty) + d
    })
    Map("id" -> id)
  }

  handle("/stream/info") { (_, args) =>
    withStream(str(args, "id")) { h =>
    Map("id" -> str(args, "id"),
      "module_cid" -> h.currentModule.map(_.cid).orNull,
      "latest_idx" -> h.latest,
      // ingest-path telemetry: a non-batch-safe module replays events one
      // at a time on the driver (the reference's per-event model) — the
      // counters that make that visible to an operator BEFORE it dominates
      // a bulk ingest, the dedup_index_info discipline
      "per_event_replays" -> h.perEventReplays,
      "per_event_warnings" -> h.perEventWarnings,
      // redaction-exposure signal (round 16): true while module tables
      // still hold rows materialized from since-redacted payloads —
      // the rematerialize/swap/restore verbs converge it
      "module_tables_predate_redaction" -> h.moduleTablesPredateRedaction,
      "remat_seq" -> h.redactionExposure._1,
      "redact_seq" -> h.redactionExposure._2,
      "handle" -> handles.synchronized(handles.get(str(args, "id")).orNull))
    }
  }

  handle("/stream/update_module") { (c, args) =>
    requireOwner(c.did, str(args, "id"), "update its module", admins = true)
    val m = store.module(str(args, "module_cid"))
      .getOrElse(throw new IllegalArgumentException("module not uploaded"))
    withStream(str(args, "id"))(_.setModule(m))
    Map.empty
  }

  handle("/stream/event_batch") { (c, args) =>
    // per-event user fields are the unsafe-auth user_override — rejected on
    // non-trusted (JWT) connections; absent ones default to the caller's
    // DID (connection.rs:233-241)
    val raw = eventsFromJson(args)
    if (!c.trusted && raw.exists(e => e.user != null && !c.did.contains(e.user)))
      throw new LeafAuthException(
        "user_override is only allowed for trusted (unsafe_auth_token) connections")
    val evs = raw.map(e =>
      if (e.user == null) e.copy(user = c.did.orNull) else e)
    withStream(str(args, "id"))(_.addEvents(evs)) match {
      case Right(latest) =>
        // eager push: compute deliveries now so parked long-pollers wake;
        // a failing subscription query must not fail the append
        evictIdleSubs()
        engines.synchronized(engines.get(str(args, "id"))).foreach { e =>
          e.notifyNewEvents()
          try e.drain() catch { case _: Exception => }
        }
        Map("latest_idx" -> latest)
      case Left(err) => throw new LeafAuthException(err)
    }
  }

  handle("/stream/state_event_batch") { (c, args) =>
    val raw = eventsFromJson(args)
    if (!c.trusted && raw.exists(e => e.user != null && !c.did.contains(e.user)))
      throw new LeafAuthException(
        "user_override is only allowed for trusted (unsafe_auth_token) connections")
    val evs = raw.map(e =>
      if (e.user == null) e.copy(user = c.did.orNull) else e)
    withStream(str(args, "id"))(_.addStateEvents(evs)) match {
      case Right(_) => Map.empty
      case Left(err) => throw new LeafAuthException(err)
    }
  }

  handle("/stream/clear_state") { (c, args) =>
    requireOwner(c.did, str(args, "id"), "clear its state")
    withStream(str(args, "id"))(_.clearState()); Map.empty
  }

  handle("/stream/redact") { (c, args) =>
    // store-of-record forgetting (round 15): null the PAYLOADS of the
    // given idx set while preserving idx contiguity, batch signatures
    // and replay determinism — the takedown verb the four derived-index
    // delete RPCs complete. O(redacted) commit through the stream meta;
    // physical purge amortizes into log compaction. `rematerialize`
    // (default false) additionally replays the module tables over the
    // redacted log so derived rows forget too.
    requireOwner(c.did, str(args, "id"), "redact its events")
    val remat = args.get("rematerialize").contains(true)
    // idx-keyed, user-keyed ("forget user X" — the shape a takedown
    // request actually arrives in), or the union of both in one commit
    val idxs = if (args.contains("idx")) longSeq(args, "idx") else Seq.empty
    val users = args.get("users") match {
      case Some(v: Vector[_]) => v.map(_.toString)
      case _ => Seq.empty
    }
    withStream(str(args, "id"))(
      _.redactFor(idxs, users, rematerialize = remat))
  }

  handle("/stream/forget") { (c, args) =>
    // the COMPOSED takedown verb (round 16): one owner-gated call drives
    // /stream/redact + the four family deletes in order, writes ONE
    // audit line tying the five commits together (graft.stream.Forget),
    // and reports per-surface counts. Auth: stream owner always; family
    // dirs must be attached to THIS stream unless the caller also passes
    // the admin rule (index dirs are arbitrary paths into shared
    // storage — an owner-only caller must not reach other tenants'
    // artifacts through them, the individual delete RPCs' rule).
    val id = str(args, "id")
    requireOwner(c.did, id, "forget its data")
    def optStr(k: String): Option[String] =
      args.get(k).collect { case s: String if s.nonEmpty => s }
    def ids(k: String): Seq[Long] =
      if (args.contains(k)) longSeq(args, k) else Seq.empty
    val (vDir, lDir, dDir, mDir) = (optStr("vector_dir"),
      optStr("lexical_dir"), optStr("dedup_dir"), optStr("mixture_dir"))
    withStream(id) { h =>
      val attached = h.attachedIndexes.values.map(_._2).toSet
      val admin = c.trusted || c.did.exists(moduleAdmins.contains)
      for (d <- Seq(vDir, lDir, dDir, mDir).flatten if !admin) {
        if (!attached.contains(d))
          throw new LeafAuthException(s"index dir $d is not attached to " +
            s"stream $id — forgetting from arbitrary index dirs requires " +
            "a trusted/admin connection")
        // attachment is a READ grant an admin made — it must not mint
        // delete authority over a SHARED index (r16 ADVICE): if the same
        // dir is attached to any other stream, one tenant's owner could
        // tombstone rows other tenants serve. Exclusive attachment is
        // the owner-keyed boundary; shared corpora stay admin-only.
        if (store.indexAttachedElsewhere(id, d))
          throw new LeafAuthException(s"index dir $d is attached to " +
            "other streams — forgetting from a shared index requires a " +
            "trusted/admin connection (its rows may serve other tenants)")
      }
      // the same lifecycle-managed registration the individual RPCs do
      vDir.foreach(managedIndexes.add); lDir.foreach(managedLexical.add)
      dDir.foreach(managedDedup.add); mDir.foreach(managedMixture.add)
      val mixDocs = mDir.map { _ =>
        args.get("docs") match {
          case Some(v: Vector[_]) =>
            import store.spark.implicits._
            v.map { d =>
              val m = d.asInstanceOf[Map[String, Any]]
              (m("source").toString, m("text").toString)
            }.toDF("source", "text")
          case _ =>
            // the src-path branch reads an arbitrary server-side path —
            // the same read /admin/mixture_stats_delete confines to
            // admins. Gate it explicitly (r16 ADVICE): today no
            // 'mixture' attachment kind exists so the dir check above
            // already fails non-admins first, but the protection must
            // not depend on that accident staying true.
            if (!admin) throw new LeafAuthException(
              "mixture docs must be supplied inline (`docs`) — reading " +
                "a server-side `src` path requires a trusted/admin " +
                "connection")
            store.spark.read.parquet(str(args, "src"))
              .select(org.apache.spark.sql.functions.col("source"),
                org.apache.spark.sql.functions.col("text"))
        }
      }
      val users = args.get("users") match {
        case Some(v: Vector[_]) => v.map(_.toString)
        case _ => Seq.empty[String]
      }
      val out = graft.stream.Forget(store.spark, h, graft.stream.Forget.Targets(
        idx = ids("idx"), users = users,
        vecIds = ids("vec_ids"), docIds = ids("doc_ids"),
        vectorDir = vDir, lexicalDir = lDir, dedupDir = dDir,
        mixtureDir = mDir, mixtureDocs = mixDocs,
        rematerialize = args.get("rematerialize").contains(true)))
      // live handles leave the displaced generations now, not at the
      // next flip — the delete RPCs' re-attach discipline
      (vDir.toSeq ++ lDir.toSeq).foreach(store.refreshAttachedIndexes)
      out
    }
  }

  handle("/stream/forget_audit") { (c, args) =>
    // the takedown ledger, served: each line names one forget's five
    // commits (stream redact_seq + family history seqs) — the
    // family history RPCs hold the per-commit detail
    // status `pending` marks an INTERRUPTED (or in-flight) takedown —
    // the operator's cue to re-run it (the legs are idempotent and the
    // re-run resumes the same intent seq)
    requireOwner(c.did, str(args, "id"), "read its forget audit")
    withStream(str(args, "id")) { h =>
      Map("entries" -> h.forgetAudit.map { case (seq, status, summary) =>
        Map("seq" -> seq.toLong, "status" -> status, "summary" -> summary) })
    }
  }

  handle("/stream/set_handle") { (c, args) =>
    requireOwner(c.did, str(args, "id"), "set its handle")
    // the reference updates the stream's DID document via PLC
    // (did.rs:49-147). With a directory configured, append the signed
    // alsoKnownAs update op; the local record mirrors it either way and
    // surfaces through /stream/info. A null handle clears it (the wire
    // shape is `handle: string | null`, codec.ts:132-135).
    val id = str(args, "id")
    // only an EXPLICIT null clears; a missing key or a non-string value is
    // a malformed request, not a clear (a typo'd field must not append a
    // signed alsoKnownAs-clearing op to the permanent PLC log)
    val handle = args.get("handle") match {
      case Some(h: String) => Some(h)
      case Some(null) => None
      case Some(other) => throw new IllegalArgumentException(
        s"handle must be a string or null, got: $other")
      case None => throw new IllegalArgumentException("missing handle")
    }
    plc.filter(_ => id.startsWith("did:plc:")).foreach { dir =>
      dir.updateHandle(id, handle).left.foreach(err =>
        throw new IllegalStateException(err))
    }
    handle match {
      case Some(h) => handles.synchronized(handles(id) = h)
      case None => handles.synchronized(handles.remove(id))
    }
    Map.empty
  }

  handle("/stream/query") { (c, args) =>
    // a $requesting_user override is itself a user impersonation — trusted only
    val user = args.get("user").map(_.toString).filter(_ => c.trusted).orElse(c.did)
    val rows = withStream(str(args, "id"))(_.queryTagged(user, queryFromJson(args)))
    Map("rows" -> rows.map(_.map { case (k, v) => k -> tagValue(v) }))
  }

  handle("/stream/subscribe_events") { (c, args) =>
    val id = str(args, "id")
    // an untrusted caller with no DID could only mint an orphan: requireSub
    // binds poll/push/unsubscribe to the subscribing identity, so a did-less
    // subscription would be uncollectable until the idle TTL — reject the
    // subscribe instead of pinning dead buffers
    if (!c.trusted && c.did.isEmpty)
      throw new LeafAuthException("subscriptions require an authenticated identity")
    openExisting(id)
    evictIdleSubs()
    val engine = engines.synchronized(
      engines.getOrElseUpdate(id, new SubscriptionEngine(store, id)))
    val user = args.get("user").map(_.toString).filter(_ => c.trusted).orElse(c.did)
    var subId = 0L
    // backpressure valve: while this subscription already has
    // maxBufferedDeliveries (reference: 12, lib.rs:337,355) waiting for the
    // client, the engine stops pumping it — a subscriber that never polls
    // costs a bounded buffer, not the whole log materialized driver-side
    val hasRoom = () => pendingDeliveries.synchronized {
      pendingDeliveries.get((id, subId)).forall(_.size < maxBufferedDeliveries)
    }
    subId = engine.subscribe(user, queryFromJson(args), hasRoom) { d =>
      pendingDeliveries.synchronized {
        pendingDeliveries.getOrElseUpdate((id, subId), mutable.Buffer.empty) +=
          Map("rows" -> d.rows.map(_.map { case (k, v) => k -> tagValue(v) }),
            "has_more" -> d.hasMore)
        pendingDeliveries.notifyAll()
      }
    }
    subOwners.synchronized { subOwners((id, subId)) = c }
    touchSub(id, subId)
    engine.drain() // backfill deliveries are available immediately
    Map("sub_id" -> subId)
  }

  /** Poll/push/unsubscribe are bound to the identity that subscribed —
    * without this, any authenticated caller could consume another user's
    * buffered deliveries (rows computed under that user's $requesting_user
    * view) or kill their subscription. The reference scopes subscriptions
    * to the socket connection, making cross-client access impossible. */
  private def requireSub(c: Caller, id: String, subId: Long): Unit = {
    val owner = subOwners.synchronized(subOwners.get((id, subId))).getOrElse(
      throw new IllegalArgumentException(s"unknown subscription: $subId"))
    if (!c.trusted && (owner.did.isEmpty || c.did != owner.did))
      throw new LeafAuthException("subscription belongs to a different caller")
  }

  private def touchSub(id: String, subId: Long): Unit =
    subLastSeen.synchronized { subLastSeen((id, subId)) = System.nanoTime }

  /** Drop subscriptions whose client has not polled within the TTL — the
    * buffers they pin must not outlive a departed consumer (the reference's
    * channels die with their socket connection; long-poll needs a clock). */
  private def evictIdleSubs(): Unit = {
    val cutoff = System.nanoTime - subIdleTtlMs * 1000000L
    val stale = subLastSeen.synchronized {
      subLastSeen.filter(_._2 < cutoff).keys.toVector
    }
    stale.foreach { case (sid, subId) => dropSub(sid, subId) }
  }

  private def dropSub(id: String, subId: Long): Unit = {
    engines.synchronized(engines.get(id)).foreach(_.unsubscribe(subId))
    subOwners.synchronized(subOwners.remove((id, subId)))
    subLastSeen.synchronized(subLastSeen.remove((id, subId)))
    // drop anything buffered for the dead subscription and wake any parked
    // long-poll so it returns instead of waiting out its timeout
    pendingDeliveries.synchronized {
      pendingDeliveries.remove((id, subId))
      pendingDeliveries.notifyAll()
    }
  }

  /** Number of deliveries currently buffered for a subscription (test
    * observability for the backpressure cap). */
  def bufferedDeliveries(id: String, subId: Long): Int =
    pendingDeliveries.synchronized {
      pendingDeliveries.get((id, subId)).map(_.size).getOrElse(0)
    }

  private def takeDeliveries(key: (String, Long)): Vector[Map[String, Any]] =
    pendingDeliveries.synchronized {
      pendingDeliveries.remove(key).map(_.toVector).getOrElse(Vector.empty)
    }

  /** The consumer freed buffer space: resume the paused catch-up so the
    * next windows are computed and buffered for the following poll. */
  private def refill(id: String, subId: Long): Unit =
    engines.synchronized(engines.get(id)).foreach { e =>
      e.resume(subId)
      try e.drain() catch { case _: Exception => }
    }

  handle("/stream/poll") { (c, args) =>
    val id = str(args, "id")
    val subId = args("sub_id").asInstanceOf[Long]
    requireSub(c, id, subId)
    touchSub(id, subId)
    engines.synchronized(engines.get(id)).foreach(_.drain())
    val got = takeDeliveries((id, subId))
    if (got.nonEmpty) refill(id, subId)
    Map("deliveries" -> got)
  }

  /** Push-style delivery over HTTP: parks until a delivery is buffered for
    * the subscription (or the timeout passes), then returns everything
    * pending. Producers (event_batch) drain eagerly and notify. The number
    * of concurrently parked pollers is capped: each one pins a thread and a
    * buffer, so past the cap the call degrades to an immediate poll. */
  handle("/stream/events_push") { (c, args) =>
    val id = str(args, "id")
    val subId = args("sub_id").asInstanceOf[Long]
    val key = (id, subId)
    requireSub(c, id, subId)
    touchSub(id, subId)
    val timeoutMs = args.get("timeout_ms").collect { case l: Long => l }
      .getOrElse(25000L).min(60000L).max(1L)
    engines.synchronized(engines.get(id)).foreach(_.drain())
    val deadline = System.nanoTime + timeoutMs * 1000000L
    val mayPark = parkedPolls.incrementAndGet() <= maxParkedPolls
    // take and wait under ONE monitor hold: a delivery arriving between a
    // bare take and entering the monitor would otherwise sleep out the
    // full timeout (its notifyAll fires before this thread waits)
    val out =
      try pendingDeliveries.synchronized {
        var got = pendingDeliveries.remove(key).map(_.toVector).getOrElse(Vector.empty)
        while (mayPark && got.isEmpty && System.nanoTime < deadline) {
          val waitMs = ((deadline - System.nanoTime) / 1000000L).max(1L)
          pendingDeliveries.wait(waitMs)
          got = pendingDeliveries.remove(key).map(_.toVector).getOrElse(Vector.empty)
        }
        got
      } finally parkedPolls.decrementAndGet()
    if (out.nonEmpty) refill(id, subId)
    Map("deliveries" -> out)
  }

  handle("/stream/unsubscribe") { (c, args) =>
    val id = str(args, "id")
    val subId = args("sub_id").asInstanceOf[Long]
    requireSub(c, id, subId)
    dropSub(id, subId)
    Map.empty
  }

  handle("/admin/list_streams") { (c, _) =>
    // server-operator only (reference: server-DID gated, connection.rs:554-588)
    if (!c.trusted && !c.did.exists(moduleAdmins.contains))
      throw new LeafAuthException("admin RPCs require a trusted connection")
    Map("streams" -> store.listStreams())
  }

  handle("/admin/compact") { (c, args) =>
    if (!c.trusted && !c.did.exists(moduleAdmins.contains))
      throw new LeafAuthException("admin RPCs require a trusted connection")
    Map("files" -> withStream(str(args, "id"))(_.compactLog()))
  }

  handle("/admin/dedup_index_info") { (c, args) =>
    // Surfaces the persisted dedup index's derivation state — notably the
    // `stale` rebuild signal when appends cross a banding knee — the way
    // the reference surfaces per-stream storage state through its catalog
    // (leaf-server/src/storage.rs:254-290). Without this the signal only
    // exists as a log line nobody watches.
    if (!c.trusted && !c.did.exists(moduleAdmins.contains))
      throw new LeafAuthException("admin RPCs require a trusted connection")
    // read-only: does NOT enroll the dir in the maintenance work list —
    // enrollment is a side effect of the MUTATING dedup RPC (reband)
    graft.queries.Dedup.dedupIndexInfo(store.spark, str(args, "dir"))
  }

  handle("/admin/dedup_index_build") { (c, args) =>
    // Build the persisted dedup index from a corpus directory — the
    // family's enrollment point into auto-maintenance, symmetric with
    // vector_index_build / lexical_index_build / mixture_stats_build.
    if (!c.trusted && !c.did.exists(moduleAdmins.contains))
      throw new LeafAuthException("admin RPCs require a trusted connection")
    val r = graft.queries.Dedup.buildDedupIndex(store.spark,
      graft.queries.Dedup.corpus(store.spark, str(args, "src")),
      str(args, "dir"))
    managedDedup.add(str(args, "dir"))
    Map("r" -> r.toLong)
  }

  handle("/admin/dedup_index_reband") { (c, args) =>
    // The maintenance action the `stale` signal asks for: re-derive the
    // banding from the index's own persisted shingle arrays — one pass
    // over the artifacts, corpus text never re-read. Idempotent when the
    // derivation is current.
    if (!c.trusted && !c.did.exists(moduleAdmins.contains))
      throw new LeafAuthException("admin RPCs require a trusted connection")
    managedDedup.add(str(args, "dir"))
    val r = graft.queries.Dedup.rebandDedupIndex(store.spark, str(args, "dir"))
    Map("r" -> r.toLong)
  }

  handle("/admin/vector_index_build") { (c, args) =>
    // Build the persisted IVF index (centroids + cell-partitioned vectors)
    // an attached stream's named queries answer kNN from — the vector-side
    // sibling of dedup_index_build: an operator action producing external
    // artifacts, never per-query work.
    if (!c.trusted && !c.did.exists(moduleAdmins.contains))
      throw new LeafAuthException("admin RPCs require a trusted connection")
    val out = graft.queries.Similarity
      .buildVectorIndex(store.spark, str(args, "src"), str(args, "dir"))
    // a rebuild over a live index is a manifest flip like any other
    store.refreshAttachedIndexes(str(args, "dir"))
    managedIndexes.add(str(args, "dir"))
    out
  }

  handle("/admin/vector_index_attach") { (c, args) =>
    // Expose a built index inside one stream's database as
    // {prefix}_centroids / {prefix}_vectors views, so a module query can
    // bind a query vector as a $param (A7, basic.rs:189-216) and rank
    // against the index — the persisted-index twin of the q_knn_ivf gate.
    if (!c.trusted && !c.did.exists(moduleAdmins.contains))
      throw new LeafAuthException("admin RPCs require a trusted connection")
    val tables = withStream(str(args, "id"))(
      _.attachVectorIndex(str(args, "prefix"), str(args, "dir")))
    managedIndexes.add(str(args, "dir"))
    Map("tables" -> tables.toVector)
  }

  handle("/admin/lexical_index_build") { (c, args) =>
    // One corpus pass lands the BM25-sufficient statistics (postings,
    // doc lengths, document frequencies, corpus stats) as parquet
    // artifacts — the lexical sibling of vector_index_build.
    if (!c.trusted && !c.did.exists(moduleAdmins.contains))
      throw new LeafAuthException("admin RPCs require a trusted connection")
    managedLexical.add(str(args, "dir"))
    graft.queries.Retrieval
      .buildLexicalIndex(store.spark, str(args, "src"), str(args, "dir"))
  }

  handle("/admin/lexical_index_append") { (c, args) =>
    // O(increment): the fresh docs' postings land as a new batch, the
    // vocab-sized df and 1-row stats re-derive from (artifact + delta)
    // into fresh versioned dirs, and one atomic meta rewrite commits —
    // then attached views re-resolve the flipped pointers.
    if (!c.trusted && !c.did.exists(moduleAdmins.contains))
      throw new LeafAuthException("admin RPCs require a trusted connection")
    managedLexical.add(str(args, "dir"))
    val out = graft.queries.Retrieval.appendLexicalIndex(store.spark,
      store.spark.read.parquet(str(args, "src")), str(args, "dir"))
    store.refreshAttachedIndexes(str(args, "dir"))
    out
  }

  handle("/admin/lexical_index_compact") { (c, args) =>
    // answers the small-files signal: batches rewrite into one bounded
    // batch inside fresh versioned dirs, committed by the meta flip —
    // purely physical, answers unchanged.
    if (!c.trusted && !c.did.exists(moduleAdmins.contains))
      throw new LeafAuthException("admin RPCs require a trusted connection")
    val out = graft.queries.Retrieval
      .compactLexicalIndex(store.spark, str(args, "dir"))
    store.refreshAttachedIndexes(str(args, "dir"))
    out
  }

  handle("/admin/lexical_index_history") { (c, args) =>
    // the lexical commit log (build/append/compact/delete), with the
    // readability flag marking the one-cycle retention boundary an
    // as-of read can still resolve
    if (!c.trusted && !c.did.exists(moduleAdmins.contains))
      throw new LeafAuthException("admin RPCs require a trusted connection")
    Map("commits" -> graft.queries.Retrieval
      .lexicalIndexHistory(store.spark, str(args, "dir")).toVector)
  }

  handle("/admin/dedup_index_history") { (c, args) =>
    // the dedup commit log (build/append/reband/delete), with the
    // readability flag marking the retention boundary an as-of
    // increment can still resolve
    if (!c.trusted && !c.did.exists(moduleAdmins.contains))
      throw new LeafAuthException("admin RPCs require a trusted connection")
    Map("commits" -> graft.queries.Dedup
      .dedupIndexHistory(store.spark, str(args, "dir")).toVector)
  }

  handle("/admin/mixture_stats_history") { (c, args) =>
    // the mixture commit log (build/append/delete/compact), with the
    // readability flag marking the retention boundary an as-of weights
    // fold can still resolve
    if (!c.trusted && !c.did.exists(moduleAdmins.contains))
      throw new LeafAuthException("admin RPCs require a trusted connection")
    Map("commits" -> graft.queries.Pipeline
      .mixtureStatsHistory(store.spark, str(args, "dir")).toVector)
  }

  handle("/admin/lexical_index_info") { (c, args) =>
    // totals + the small-files signal (appends accumulate ≥1 file per
    // artifact per batch — the compaction cue, as for the event log and
    // the vector index)
    if (!c.trusted && !c.did.exists(moduleAdmins.contains))
      throw new LeafAuthException("admin RPCs require a trusted connection")
    graft.queries.Retrieval.lexicalIndexInfo(store.spark, str(args, "dir"))
  }

  handle("/admin/lexical_index_attach") { (c, args) =>
    // {prefix}_terms/_docs/_df/_stats views inside one stream's database,
    // so a module query can bind `$terms` (A7) and BM25-score against
    // the postings without touching the corpus text.
    if (!c.trusted && !c.did.exists(moduleAdmins.contains))
      throw new LeafAuthException("admin RPCs require a trusted connection")
    managedLexical.add(str(args, "dir"))
    val tables = withStream(str(args, "id"))(
      _.attachLexicalIndex(str(args, "prefix"), str(args, "dir")))
    Map("tables" -> tables.toVector)
  }

  handle("/admin/mixture_stats_build") { (c, args) =>
    // the DoReMi sufficient statistic as the fourth maintained artifact
    // family: one corpus pass lands the (source, tok, c) count frame.
    if (!c.trusted && !c.did.exists(moduleAdmins.contains))
      throw new LeafAuthException("admin RPCs require a trusted connection")
    managedMixture.add(str(args, "dir"))
    graft.queries.Pipeline
      .buildMixtureStats(store.spark, str(args, "src"), str(args, "dir"))
  }

  handle("/admin/mixture_stats_append") { (c, args) =>
    // counts are a monoid: the increment's own count frame lands as a
    // fresh batch, one atomic meta rewrite commits — no artifact
    // re-derivation at all.
    if (!c.trusted && !c.did.exists(moduleAdmins.contains))
      throw new LeafAuthException("admin RPCs require a trusted connection")
    managedMixture.add(str(args, "dir"))
    graft.queries.Pipeline.appendMixtureStats(store.spark,
      store.spark.read.parquet(str(args, "src")), str(args, "dir"))
  }

  handle("/admin/mixture_stats_compact") { (c, args) =>
    // fold the batches into one inside a fresh versioned counts dir —
    // the pointer-flip commit, purely physical.
    if (!c.trusted && !c.did.exists(moduleAdmins.contains))
      throw new LeafAuthException("admin RPCs require a trusted connection")
    graft.queries.Pipeline
      .compactMixtureStats(store.spark, str(args, "dir"))
  }

  handle("/admin/mixture_stats_info") { (c, args) =>
    if (!c.trusted && !c.did.exists(moduleAdmins.contains))
      throw new LeafAuthException("admin RPCs require a trusted connection")
    graft.queries.Pipeline.mixtureStatsInfo(store.spark, str(args, "dir"))
  }

  handle("/admin/mixture_weights") { (c, args) =>
    // the served mixture table — folded from the committed batches
    // through the ONE weight implementation the q_mixture_doremi gate
    // uses, so served weights can never drift from the gate. Output is
    // domains-bounded by construction.
    if (!c.trusted && !c.did.exists(moduleAdmins.contains))
      throw new LeafAuthException("admin RPCs require a trusted connection")
    val rows = graft.queries.Pipeline
      .mixtureWeights(store.spark, str(args, "dir"))
      .collect().map(r => Map(
        "source" -> r.getString(0), "l_micro" -> r.getLong(1),
        "excess_micro" -> r.getLong(2), "weight_nano" -> r.getLong(3)))
    Map("weights" -> rows.toVector)
  }

  handle("/admin/vector_index_append") { (c, args) =>
    // O(increment) growth: assign new vectors to the EXISTING centroids
    // and append into the cell-partitioned layout — the dedup-index
    // append discipline applied to the vector side.
    if (!c.trusted && !c.did.exists(moduleAdmins.contains))
      throw new LeafAuthException("admin RPCs require a trusted connection")
    managedIndexes.add(str(args, "dir"))
    Map("appended" -> graft.queries.Similarity
      .appendVectorIndex(store.spark, str(args, "src"), str(args, "dir")))
  }

  handle("/admin/vector_index_compact") { (c, args) =>
    // Every append adds ≥1 parquet file per touched cell, the same
    // small-files decay the event log's compactLog handles: rewrite
    // vectors/ and codes/ into ~128MB files (still cell-partitioned, so
    // the probe-one-cell read path is unchanged), staged and swapped.
    if (!c.trusted && !c.did.exists(moduleAdmins.contains))
      throw new LeafAuthException("admin RPCs require a trusted connection")
    val out = graft.queries.Similarity
      .compactVectorIndex(store.spark, str(args, "dir"))
    // the manifest flipped: open streams re-resolve their attached views
    // before the NEXT flip retires the generation they were reading
    store.refreshAttachedIndexes(str(args, "dir"))
    out
  }

  handle("/admin/vector_index_retrain") { (c, args) =>
    // The answer to the info RPC's cell-skew signal: re-cluster FROM the
    // index's own artifacts (one Lloyd step over the persisted
    // assignment, reassign, retrain codebooks, re-encode) — the vector
    // twin of dedup_index_reband: the source corpus is never re-read.
    if (!c.trusted && !c.did.exists(moduleAdmins.contains))
      throw new LeafAuthException("admin RPCs require a trusted connection")
    val out = graft.queries.Similarity
      .retrainVectorIndex(store.spark, str(args, "dir"))
    store.refreshAttachedIndexes(str(args, "dir"))
    out
  }

  handle("/admin/vector_index_maint") { (c, args) =>
    // Last auto-maintenance outcome for a managed index: what the
    // background policy saw (files, skew) and did (compacted) or
    // recommends (retrain). Empty until the first tick covers the dir.
    if (!c.trusted && !c.did.exists(moduleAdmins.contains))
      throw new LeafAuthException("admin RPCs require a trusted connection")
    // optional "family" arg disambiguates a dir enrolled in two families;
    // without it the first family with a recorded status answers
    val dir = str(args, "dir")
    args.get("family").collect { case f: String => f } match {
      case Some(f) => Option(maintStatus.get(maintKey(f, dir)))
        .getOrElse(Map("covered" -> false))
      case None => maintFamilies.iterator
        .flatMap(f => Option(maintStatus.get(maintKey(f, dir))))
        .nextOption().getOrElse(Map("covered" -> false))
    }
  }

  handle("/admin/vector_index_info") { (c, args) =>
    // Totals + the cell-skew signal (largest cell's share): a probe scans
    // one cell, so a hot cell IS the query cost — the operator watches
    // this the way dedup_index_info surfaces `stale`.
    if (!c.trusted && !c.did.exists(moduleAdmins.contains))
      throw new LeafAuthException("admin RPCs require a trusted connection")
    graft.queries.Similarity.vectorIndexInfo(store.spark, str(args, "dir"))
  }

  handle("/admin/vector_index_history") { (c, args) =>
    // the commit log: one row per manifest flip (build/append-free —
    // appends don't flip — compact/retrain/delete), with the
    // readability flag marking the one-cycle retention boundary an
    // as-of read can still resolve
    if (!c.trusted && !c.did.exists(moduleAdmins.contains))
      throw new LeafAuthException("admin RPCs require a trusted connection")
    Map("commits" -> graft.queries.Similarity
      .vectorIndexHistory(store.spark, str(args, "dir")).toVector)
  }

  // ---------------- targeted deletion (right-to-be-forgotten) ----------------
  // One verb, four families: an O(deleted) logical tombstone commit
  // through each family's atomic pointer flip — no data bytes move at
  // delete time, probes exclude the set immediately, and the physical
  // purge amortizes into the family's existing compaction/re-band (the
  // lifecycle tick also compacts on tombstone pressure). Attached views
  // re-resolve after the flip so live handles see the delete.

  handle("/admin/vector_index_delete") { (c, args) =>
    if (!c.trusted && !c.did.exists(moduleAdmins.contains))
      throw new LeafAuthException("admin RPCs require a trusted connection")
    managedIndexes.add(str(args, "dir"))
    val out = graft.queries.Similarity.deleteFromVectorIndex(
      store.spark, longSeq(args, "ids"), str(args, "dir"))
    store.refreshAttachedIndexes(str(args, "dir"))
    out
  }

  handle("/admin/lexical_index_delete") { (c, args) =>
    // also corrects df/stats incrementally in the same meta commit, so
    // post-delete BM25 scores equal a rebuild over the survivors
    if (!c.trusted && !c.did.exists(moduleAdmins.contains))
      throw new LeafAuthException("admin RPCs require a trusted connection")
    managedLexical.add(str(args, "dir"))
    import store.spark.implicits._
    val out = graft.queries.Retrieval.deleteFromLexicalIndex(
      store.spark, longSeq(args, "ids").toDF("doc_id"), str(args, "dir"))
    store.refreshAttachedIndexes(str(args, "dir"))
    out
  }

  handle("/admin/dedup_index_delete") { (c, args) =>
    if (!c.trusted && !c.did.exists(moduleAdmins.contains))
      throw new LeafAuthException("admin RPCs require a trusted connection")
    managedDedup.add(str(args, "dir"))
    import store.spark.implicits._
    graft.queries.Dedup.deleteFromDedupIndex(
      store.spark, longSeq(args, "ids").toDF("doc_id"), str(args, "dir"))
  }

  handle("/admin/mixture_stats_delete") { (c, args) =>
    // counts keep no per-doc state, so the caller ships the forgotten
    // docs' own (source, text) rows — the delete is the monoid's
    // negative batch. `docs` inline for small takedowns, or `src` (a
    // parquet dir of the deleted docs) for bulk.
    if (!c.trusted && !c.did.exists(moduleAdmins.contains))
      throw new LeafAuthException("admin RPCs require a trusted connection")
    managedMixture.add(str(args, "dir"))
    import store.spark.implicits._
    val deleted = args.get("docs") match {
      case Some(v: Vector[_]) => v.map { d =>
        val m = d.asInstanceOf[Map[String, Any]]
        (m("source").toString, m("text").toString)
      }.toDF("source", "text")
      case _ => store.spark.read.parquet(str(args, "src"))
        .select(org.apache.spark.sql.functions.col("source"),
          org.apache.spark.sql.functions.col("text"))
    }
    graft.queries.Pipeline.deleteMixtureStats(
      store.spark, deleted, str(args, "dir"))
  }

  // ---------------- wire-protocol surface ----------------

  /** The server's DID document (reference: .well-known/did.json endpoint,
    * http.rs:244-262) — how a client discovers the DID to use as the JWT
    * `aud` claim. */
  server.createContext("/.well-known/did.json", (ex: HttpExchange) => {
    val body = Json.render(Map(
      "@context" -> Vector("https://www.w3.org/ns/did/v1"),
      "id" -> serverDid,
      "service" -> Vector(Map(
        "id" -> "#leaf_server",
        "type" -> "LeafServer",
        "serviceEndpoint" -> s"http://127.0.0.1:$boundPort/")))).getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(200, body.length)
    ex.getResponseBody.write(body)
    ex.close()
  })

  /** The reference's native client transport: Socket.IO over Engine.IO
    * long-polling with msgpack packet framing and DRISL event payloads —
    * what the shipped TypeScript client actually speaks. Mounted last so
    * the route table above is complete when the dispatcher binds to it. */
  private[server] val socketIo = new SocketIoTransport(this)
  socketIo.mount(server)

  private val frontend = new PublicFrontend(
    port, server.getAddress.getPort, socketIo.handleWebSocket)

  // ---------------- lifecycle background tasks ----------------
  // The reference server starts its staged-blob GC and backup sweep at
  // boot (storage.rs:1123-1136) — an operator gets backups and bounded
  // blob staging without knowing to call anything. Mirrored here: one
  // daemon scheduler, started with the server, stopped with it.
  private var lifecycleExec: Option[java.util.concurrent.ScheduledExecutorService] = None
  private val lifecycleLog = org.slf4j.LoggerFactory.getLogger(getClass)

  // what the sweep last shipped per stream: the persisted (latestIdx,
  // stateVer, metaMtime) probe PLUS a fingerprint of the owner set and
  // key-custody state — the exported metadata.drisl carries owners and
  // (opt-in) did_key, so an owner or custody change must invalidate the
  // skip even though it moves none of the probe's counters. Accessed
  // from the sweep thread AND restoreFromBucket (a public operator entry
  // point), so every touch synchronizes on the map.
  private val sweepExported =
    mutable.Map.empty[String, ((Long, Long, Long), String)]

  private val sweepPasses = new java.util.concurrent.atomic.AtomicLong(0)

  // vector-index dirs this server has touched (build/attach/append RPCs)
  // — the auto-maintenance tick's work list, with the last outcome per
  // dir surfaced by /admin/vector_index_maint
  private val managedIndexes =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  // lexical and dedup siblings: lexical auto-compacts on the same
  // files signal (purely physical — safe to automate); dedup staleness
  // is only FLAGGED (a re-band changes candidate volume — the operator
  // schedules it, /admin/dedup_index_reband)
  private val managedLexical =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val managedDedup =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  // mixture-stats sibling: compaction is purely physical (folds the
  // count monoid), so it auto-compacts on the same files signal
  private val managedMixture =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  // status/counters key on (family, normalized dir): a directory enrolled
  // in two families (or reached via a path alias) must not have its
  // status clobbered each tick by whichever family runs last
  private val maintFamilies = Seq("vector", "lexical", "mixture", "dedup")
  private def maintKey(family: String, dir: String): String =
    s"$family|${graft.queries.WriterLocks.key(dir)}"
  private val maintStatus =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, Any]]()
  // cumulative auto-compactions per (family, dir) — a status consumer
  // polling between ticks can never miss one the way a per-tick flag would
  private val maintCompactions =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.atomic.AtomicLong]()
  private val maintPasses = new java.util.concurrent.atomic.AtomicLong(0)
  /** Completed auto-maintenance passes (test quiesce latch). */
  def maintPassesCompleted: Long = maintPasses.get

  /** Completed backup-sweep passes over the whole stream list. A
    * deterministic quiesce latch for tests: once a full pass has STARTED
    * after the last mutation, everything stale has been exported when it
    * completes — no wall-clock stability polling needed. */
  def sweepPassesCompleted: Long = sweepPasses.get

  /** Fingerprint of everything the exported `metadata.drisl` carries
    * beyond the event/state counters: the recorded owner set, and (only
    * when key export is enabled — otherwise custody never reaches the
    * bucket) a digest of the custodied signing key. */
  private def ownerKeyFp(id: String): String = {
    val os = owners.synchronized(owners.getOrElse(id, Set.empty))
      .toSeq.sorted.mkString(",")
    val k =
      if (backupExportKeys)
        plc.flatMap(_.custodiedSecret(id)).map(s =>
          java.security.MessageDigest.getInstance("SHA-256").digest(s)
            .map("%02x".format(_)).mkString).getOrElse("-")
      else "-"
    s"$os|$k"
  }

  /** Outcome of a full-bucket restore: stream DIDs restored, skipped
    * because already local, and failed (warned and continued). */
  case class BucketRestoreReport(restored: Vector[String],
      skipped: Vector[String], failed: Vector[String])

  /** Operator-facing full-bucket disaster recovery — the reference's
    * `leaf-server backup restore` entry point (main.rs:52-56 →
    * storage.rs:908-1056). Enumerates every stream DID under
    * `srcRoot/streams/`, imports each one this server does not already
    * have (already-local streams skip with a warning, storage.rs:911),
    * reinstates the bucket's recorded owners into the server ACL map and
    * its `did_key` into signing custody (storage.rs:933-951), and marks
    * the stream backed-up at its restored position so the sweep does not
    * re-archive what the bucket already holds (storage.rs:1045-1052).
    * Per-stream failures warn and continue, mirroring the reference's
    * skip paths — one corrupt stream must not abort a whole-bucket
    * recovery. Runs automatically at boot when `restoreFrom` is set. */
  def restoreFromBucket(srcRoot: String): BucketRestoreReport = {
    val root = new org.apache.hadoop.fs.Path(srcRoot)
    val fs = root.getFileSystem(store.spark.sparkContext.hadoopConfiguration)
    val streamsDir = new org.apache.hadoop.fs.Path(root, "streams")
    require(fs.exists(streamsDir),
      s"no streams/ directory on restore bucket $srcRoot")
    val dids = fs.listStatus(streamsDir).toVector
      .filter(_.isDirectory).map(_.getPath.getName).sorted
    val restored = Vector.newBuilder[String]
    val skipped = Vector.newBuilder[String]
    val failed = Vector.newBuilder[String]
    dids.foreach { did =>
      if (store.exists(did)) {
        lifecycleLog.warn(
          s"skipping restore of stream $did that we already have locally")
        skipped += did
      } else try {
        val (_, meta) = BackupService.importReference(store, did, srcRoot, did)
        // reinstate ownership: restored ACLs gate RPCs exactly as they
        // did on the server that exported the bucket
        if (meta.owners.nonEmpty) owners.synchronized {
          owners(did) = owners.getOrElse(did, Set.empty) ++ meta.owners
        }
        // reinstate key custody: the import already re-armed the stream's
        // append signing; custody here re-arms the PLC-side operations
        // (handle updates) and future key-bearing exports
        meta.didKey.foreach(k => plc.foreach(_.installKey(did, k.secret)))
        // mark backed-up AT the restored position (probe + owners/key
        // fingerprint recorded AFTER owners and custody are in place) —
        // but ONLY when the sweep targets the same bucket we restored
        // from: that bucket already holds everything just imported. A
        // different backupDest (restore from a salvaged copy, back up to
        // a fresh bucket) must still receive the restored streams'
        // first export. URI-normalized compare: "file:/b/" and "file:/b"
        // are the same bucket and must not silently disable the mark.
        val sameBucket = backupDest.exists { d =>
          try {
            val conf = store.spark.sparkContext.hadoopConfiguration
            def q(u: String) = {
              val hp = new org.apache.hadoop.fs.Path(u)
              hp.getFileSystem(conf).makeQualified(hp)
            }
            q(d) == q(srcRoot)
          } catch { case _: Exception => d == srcRoot }
        }
        if (sameBucket && backupReferenceFormat)
          store.persistedMeta(did).foreach(p => sweepExported.synchronized {
            sweepExported(did) = (p, ownerKeyFp(did))
          })
        restored += did
      } catch {
        // NonFatal only: a corrupt stream warns and continues, but a
        // fatal VM error (OOM, stack overflow) means the JVM can no
        // longer be trusted to restore the REMAINING streams correctly —
        // propagate and abort the whole-bucket recovery.
        case scala.util.control.NonFatal(t) =>
          lifecycleLog.warn(s"restore of stream $did failed: ${t.getMessage}")
          failed += did
      }
    }
    BucketRestoreReport(restored.result(), skipped.result(), failed.result())
  }

  private def startLifecycleTasks(): Unit = {
    val exec = Executors.newSingleThreadScheduledExecutor { r =>
      val t = new Thread(r, "graft-server-lifecycle"); t.setDaemon(true); t
    }
    exec.scheduleWithFixedDelay(() =>
      try store.gcModuleBlobs(blobGcMinAgeMs)
      catch { case t: Throwable =>
        lifecycleLog.warn(s"module blob GC failed: ${t.getMessage}") },
      blobGcMs, blobGcMs, TimeUnit.MILLISECONDS)
    if (vectorMaintMs > 0)
      exec.scheduleWithFixedDelay(() =>
        try {
          def bumpCount(family: String, d: String): Long =
            maintCompactions.computeIfAbsent(maintKey(family, d),
              _ => new java.util.concurrent.atomic.AtomicLong)
              .incrementAndGet()
          def countOf(family: String, d: String): Long =
            Option(maintCompactions.get(maintKey(family, d)))
              .map(_.get).getOrElse(0L)
          managedIndexes.forEach { d =>
            try {
              val info = graft.queries.Similarity
                .vectorIndexInfo(store.spark, d)
              // tombstone pressure counts like file decay: a logical
              // delete is only reclaimed when a compaction purges it
              val tombPressure = info("vectors") > 0 &&
                info("tombstones") * 100 >
                  tombstonePurgeSharePct * info("vectors")
              val needCompact =
                info("files") > vectorCompactFilesThreshold || tombPressure
              if (needCompact) {
                // content-preserving by contract — safe to automate; the
                // manifest flip means queries ride the retained
                // generation until the re-attach lands
                graft.queries.Similarity.compactVectorIndex(store.spark, d)
                store.refreshAttachedIndexes(d)
                bumpCount("vector", d)
              }
              val skewed = info("max_cell_share_pct") > vectorRetrainSharePct
              if (skewed)
                lifecycleLog.warn(s"vector index $d max cell holds " +
                  s"${info("max_cell_share_pct")}% of the corpus — " +
                  "retrain recommended (/admin/vector_index_retrain)")
              maintStatus.put(maintKey("vector", d), Map(
                "files_seen" -> info("files"),
                "tombstones_seen" -> info("tombstones"),
                "compacted" -> needCompact,
                "compactions" -> countOf("vector", d),
                "max_cell_share_pct" -> info("max_cell_share_pct"),
                "retrain_recommended" -> skewed))
            } catch { case t: Throwable =>
              lifecycleLog.warn(
                s"vector maintenance of $d failed: ${t.getMessage}") }
          }
          managedLexical.forEach { d =>
            try {
              val info = graft.queries.Retrieval
                .lexicalIndexInfo(store.spark, d)
              // physical rows = live docs + tombstoned docs
              val tombPressure = (info("docs") + info("tombstones")) > 0 &&
                info("tombstones") * 100 >
                  tombstonePurgeSharePct * (info("docs") + info("tombstones"))
              val needCompact =
                info("files") > vectorCompactFilesThreshold || tombPressure
              if (needCompact) {
                graft.queries.Retrieval.compactLexicalIndex(store.spark, d)
                store.refreshAttachedIndexes(d)
                bumpCount("lexical", d)
              }
              maintStatus.put(maintKey("lexical", d), Map(
                "files_seen" -> info("files"),
                "tombstones_seen" -> info("tombstones"),
                "compacted" -> needCompact,
                "compactions" -> countOf("lexical", d)))
            } catch { case t: Throwable =>
              lifecycleLog.warn(
                s"lexical maintenance of $d failed: ${t.getMessage}") }
          }
          managedMixture.forEach { d =>
            try {
              val info = graft.queries.Pipeline
                .mixtureStatsInfo(store.spark, d)
              val needCompact = info("files") > vectorCompactFilesThreshold
              if (needCompact) {
                graft.queries.Pipeline.compactMixtureStats(store.spark, d)
                bumpCount("mixture", d)
              }
              maintStatus.put(maintKey("mixture", d), Map(
                "files_seen" -> info("files"),
                "compacted" -> needCompact,
                "compactions" -> countOf("mixture", d)))
            } catch { case t: Throwable =>
              lifecycleLog.warn(
                s"mixture maintenance of $d failed: ${t.getMessage}") }
          }
          managedDedup.forEach { d =>
            try {
              val stale = graft.queries.Dedup.dedupIndexStale(store.spark, d)
              val rebanded = stale && dedupRebandOnStale
              if (rebanded) {
                // the operator opted in: run the re-band under the same
                // pointer-flip discipline the RPC uses — increments in
                // flight ride the retained generation
                graft.queries.Dedup.rebandDedupIndex(store.spark, d)
                bumpCount("dedup", d)
              } else if (stale)
                lifecycleLog.warn(s"dedup index $d is STALE — re-band " +
                  "recommended (/admin/dedup_index_reband)")
              maintStatus.put(maintKey("dedup", d), Map(
                "stale" -> (stale && !rebanded),
                "reband_recommended" -> (stale && !rebanded),
                "rebanded" -> rebanded,
                "rebands" -> countOf("dedup", d)))
            } catch { case t: Throwable =>
              lifecycleLog.warn(
                s"dedup staleness probe of $d failed: ${t.getMessage}") }
          }
        } finally maintPasses.incrementAndGet(),
        vectorMaintMs, vectorMaintMs, TimeUnit.MILLISECONDS)
    backupDest.foreach { dest =>
      // native = parquet ranges under dest/streams/{id} (restorable by
      // BackupService.restore); reference = the reference server's own
      // bucket layout (events.drisl.zstd chains + module blobs), so the
      // sweep target is a bucket the reference could restore from.
      //
      // Staleness probe before open: store.persistedMeta reads the
      // stream's (latestIdx, stateVer) off disk without constructing a
      // handle, and a stream already exported at that exact pair — AND
      // whose owner/key fingerprint is unchanged, since the exported
      // metadata.drisl carries both — is skipped; otherwise a sweep over
      // thousands of mostly-idle streams would reopen (and LRU-evict)
      // every hot handle every tick. The reference's sweep keeps the same
      // books server-side (events/state/metadata *_backed_up_at columns,
      // storage.rs:680-698).
      exec.scheduleWithFixedDelay(() =>
        try {
          store.listStreams().foreach { id =>
          try {
            val probe = store.persistedMeta(id).map((_, ownerKeyFp(id)))
            if (probe.isDefined &&
              sweepExported.synchronized(sweepExported.get(id)) == probe) ()
            else {
            val h = store.open(id)
            if (backupReferenceFormat)
              // ship the server's recorded owners — the reference records
              // did_owners in StreamMetadata (storage.rs:711-717), so an
              // ownerless export would make a reference-side restore
              // silently lose stream ownership. Sorted for deterministic
              // metadata bytes.
              BackupService.exportReference(h, dest,
                owners.synchronized(owners.getOrElse(id, Set.empty)).toSeq.sorted,
                didKey =
                  if (backupExportKeys)
                    plc.flatMap(_.custodiedSecret(id))
                      .map(BackupService.DidKey("K256", _))
                  else None)
            else BackupService.backup(h, s"$dest/streams/$id")
            // record what was on disk BEFORE the export: a concurrent
            // append (or owner/key change) between probe and export
            // re-sweeps next tick
            probe.foreach(p =>
              sweepExported.synchronized(sweepExported(id) = p))
            }
          } catch { case t: Throwable =>
            lifecycleLog.warn(s"backup sweep of $id failed: ${t.getMessage}") }
          }
        }
        catch { case t: Throwable =>
          lifecycleLog.warn(s"backup sweep failed: ${t.getMessage}") }
        // count every finished pass, clean or not: the quiesce latch
        // (sweepPassesCompleted) must advance even on a transient failure
        finally sweepPasses.incrementAndGet(),
        backupSweepMs, backupSweepMs, TimeUnit.MILLISECONDS)
    }
    lifecycleExec = Some(exec)
  }

  def start(): Unit = {
    // disaster recovery runs BEFORE the server serves traffic or the
    // sweep starts: restored streams must exist (with their ACLs and key
    // custody) when the first RPC lands, and be marked backed-up before
    // the first sweep tick
    restoreFrom.foreach(restoreFromBucket)
    server.start(); frontend.start(); startLifecycleTasks()
  }
  def stop(): Unit = {
    lifecycleExec.foreach(_.shutdownNow())
    lifecycleExec = None
    frontend.stop()
    socketIo.shutdown()
    server.stop(0)
  }
}
