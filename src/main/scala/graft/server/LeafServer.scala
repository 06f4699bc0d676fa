package graft.server

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64
import java.util.concurrent.Executors

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.stream.{StreamStore, SubscriptionEngine}
import graft.types._

/** HTTP/JSON server exposing the engine's RPC surface.
  *
  * The reference serves the same operations over socket.io + msgpack with
  * DRISL-encoded bodies (/root/reference/leaf-server/src/http/connection.rs;
  * RPC table in SURVEY.md §2.D). This re-expression keeps the operation
  * names, argument shapes, and Result-or-error ack contract, but uses
  * plain JSON over HTTP (binary payloads base64-encoded) — the transport
  * is an integration detail, the API shape is the compatibility surface.
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
  *   /stream/unsubscribe    {id, sub_id} → {}
  *   /admin/list_streams    {} → {streams: [...]}   (auth-gated)
  *
  * Auth: a bearer token configured at construction (the reference's
  * `--unsafe-auth-token` bootstrap path, connection.rs:171-180); ATProto
  * JWT verification would slot into `authenticate` without touching
  * handlers.
  */
class LeafServer(store: StreamStore, port: Int, authToken: Option[String] = None) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  server.setExecutor(Executors.newFixedThreadPool(8))

  private val engines = mutable.Map.empty[String, SubscriptionEngine]
  private val pendingDeliveries =
    mutable.Map.empty[(String, Long), mutable.Buffer[Map[String, Any]]]
  private val createdStreams = mutable.LinkedHashSet.empty[String]

  def boundPort: Int = server.getAddress.getPort

  // ---------------- handlers ----------------

  private def handle(path: String)(f: Map[String, Any] => Map[String, Any]): Unit =
    server.createContext(path, (ex: HttpExchange) => {
      val resp =
        try {
          if (!authenticate(ex)) Map("err" -> "unauthorized")
          else {
            val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
            val args = if (body.isBlank) Map.empty[String, Any]
              else Json.parse(body).asInstanceOf[Map[String, Any]]
            Map("ok" -> f(args))
          }
        } catch {
          case t: Throwable => Map("err" -> Option(t.getMessage).getOrElse(t.toString))
        }
      val bytes = Json.render(resp).getBytes(UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })

  private def authenticate(ex: HttpExchange): Boolean = authToken match {
    case None => true
    case Some(tok) =>
      Option(ex.getRequestHeaders.getFirst("Authorization"))
        .contains(s"Bearer $tok")
  }

  private def str(m: Map[String, Any], k: String): String = m.get(k) match {
    case Some(s: String) => s
    case other => throw new IllegalArgumentException(s"missing/bad '$k': $other")
  }

  private def moduleFromJson(m: Map[String, Any]): ModuleDef = {
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

  private def eventsFromJson(args: Map[String, Any]): Seq[IncomingEvent] =
    args.get("events").collect { case evs: Vector[_] =>
      evs.map { e =>
        val em = e.asInstanceOf[Map[String, Any]]
        IncomingEvent(
          em.get("user").map(_.toString).orNull,
          Base64.getDecoder.decode(str(em.asInstanceOf[Map[String, Any]], "payload_b64")))
      }
    }.getOrElse(Seq.empty)

  /** Tagged wire values, keeping the reference's `$type` convention
    * (clients/typescript/src/codec.ts:32-44). */
  private def tagValue(v: SqlValue): Map[String, Any] = v match {
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

  private def queryFromJson(args: Map[String, Any]): LeafQuery = {
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

  handle("/module/upload") { args =>
    val m = moduleFromJson(args("module").asInstanceOf[Map[String, Any]])
    Map("cid" -> store.registerModule(m))
  }

  handle("/module/exists") { args =>
    Map("exists" -> store.module(str(args, "cid")).isDefined)
  }

  handle("/stream/create") { args =>
    val id = args.get("id").map(_.toString)
      .getOrElse("did:graft:" + java.util.UUID.randomUUID().toString.take(12))
    val m = store.module(str(args, "module_cid"))
      .getOrElse(throw new IllegalArgumentException("module not uploaded"))
    val h = store.open(id)
    h.setModule(m)
    createdStreams.synchronized(createdStreams += id)
    Map("id" -> id)
  }

  handle("/stream/info") { args =>
    val h = store.open(str(args, "id"))
    Map("id" -> str(args, "id"),
      "module_cid" -> h.currentModule.map(_.cid).orNull,
      "latest_idx" -> h.latest)
  }

  handle("/stream/update_module") { args =>
    val m = store.module(str(args, "module_cid"))
      .getOrElse(throw new IllegalArgumentException("module not uploaded"))
    store.open(str(args, "id")).setModule(m)
    Map.empty
  }

  handle("/stream/event_batch") { args =>
    store.open(str(args, "id")).addEvents(eventsFromJson(args)) match {
      case Right(latest) =>
        engines.synchronized(engines.get(str(args, "id"))).foreach(_.notifyNewEvents())
        Map("latest_idx" -> latest)
      case Left(err) => throw new LeafAuthException(err)
    }
  }

  handle("/stream/state_event_batch") { args =>
    store.open(str(args, "id")).addStateEvents(eventsFromJson(args)) match {
      case Right(_) => Map.empty
      case Left(err) => throw new LeafAuthException(err)
    }
  }

  handle("/stream/clear_state") { args =>
    store.open(str(args, "id")).clearState(); Map.empty
  }

  handle("/stream/query") { args =>
    val rows = store.open(str(args, "id"))
      .queryTagged(args.get("user").map(_.toString), queryFromJson(args))
    Map("rows" -> rows.map(_.map { case (k, v) => k -> tagValue(v) }))
  }

  handle("/stream/subscribe_events") { args =>
    val id = str(args, "id")
    val h = store.open(id)
    val engine = engines.synchronized(
      engines.getOrElseUpdate(id, new SubscriptionEngine(h)))
    val user = args.get("user").map(_.toString)
    var subId = 0L
    subId = engine.subscribe(user, queryFromJson(args)) { d =>
      pendingDeliveries.synchronized {
        pendingDeliveries.getOrElseUpdate((id, subId), mutable.Buffer.empty) +=
          Map("rows" -> d.rows.map(_.map { case (k, v) => k -> tagValue(v) }),
            "has_more" -> d.hasMore)
      }
    }
    Map("sub_id" -> subId)
  }

  handle("/stream/poll") { args =>
    val id = str(args, "id")
    engines.synchronized(engines.get(id)).foreach(_.drain())
    val key = (id, args("sub_id").asInstanceOf[Long])
    val out = pendingDeliveries.synchronized {
      pendingDeliveries.remove(key).map(_.toVector).getOrElse(Vector.empty)
    }
    Map("deliveries" -> out)
  }

  handle("/stream/unsubscribe") { args =>
    engines.synchronized(engines.get(str(args, "id")))
      .foreach(_.unsubscribe(args("sub_id").asInstanceOf[Long]))
    Map.empty
  }

  handle("/admin/list_streams") { _ =>
    Map("streams" -> createdStreams.synchronized(createdStreams.toVector))
  }

  def start(): Unit = server.start()
  def stop(): Unit = server.stop(0)
}
