package graft.types

import graft.drisl.{Cid, DValue, Drisl}

/** Core wire/data types of the engine.
  *
  * Behavioral spec: /root/reference/leaf-stream-types/src/lib.rs (events
  * 164-179, module defs 81-117, queries 183-212, SqlValue 229-245, param
  * validation 268-320). Re-expressed as idiomatic Scala; events map onto a
  * Spark schema (idx LONG, user STRING, payload BINARY, signature BINARY).
  */

/** SQLite-style dynamic value (lib.rs:229-245). */
sealed trait SqlValue
object SqlValue {
  case object SqlNull extends SqlValue
  case class SqlInteger(v: Long) extends SqlValue
  case class SqlReal(v: Double) extends SqlValue
  case class SqlText(v: String) extends SqlValue
  case class SqlBlob(v: Array[Byte]) extends SqlValue

  /** Convert a JVM value surfaced by Spark Row into a tagged SqlValue. */
  def fromAny(v: Any): SqlValue = v match {
    case null => SqlNull
    case b: Boolean => SqlInteger(if (b) 1 else 0)
    case i: Int => SqlInteger(i.toLong)
    case l: Long => SqlInteger(l)
    case s: Short => SqlInteger(s.toLong)
    case b: Byte => SqlInteger(b.toLong)
    case f: Float => SqlReal(f.toDouble)
    case d: Double => SqlReal(d)
    case d: java.math.BigDecimal => SqlReal(d.doubleValue)
    case d: BigDecimal => SqlReal(d.doubleValue)
    case s: String => SqlText(s)
    case b: Array[Byte] => SqlBlob(b)
    case t: java.sql.Timestamp => SqlInteger(t.getTime / 1000L) // unixepoch convention
    case d: java.sql.Date => SqlText(d.toString)
    case other => SqlText(other.toString)
  }
}

/** Accepted, indexed event (lib.rs:164-172). */
case class Event(idx: Long, user: String, payload: Array[Byte], signature: Array[Byte])

/** Not-yet-accepted event (lib.rs:175-179). */
case class IncomingEvent(user: String, payload: Array[Byte])

/** Parameter kind for named-query params (lib.rs:247-266). */
sealed trait ParamKind
object ParamKind {
  case object PInteger extends ParamKind
  case object PReal extends ParamKind
  case object PText extends ParamKind
  case object PBlob extends ParamKind
  case object PAny extends ParamKind
}

case class ParamDef(name: String, kind: ParamKind, optional: Boolean = false)

/** Named parameterized query definition inside a module (lib.rs:104-117). */
case class QueryDef(sql: String, params: Seq[ParamDef] = Nil)

/** A module: the SQL program giving a stream its behavior (lib.rs:81-117).
  * `initSql` creates module tables; `authorizer` gates each event;
  * `materializer` folds each event into tables; state variants target the
  * ephemeral state namespace; `queries` is the only read surface. */
case class ModuleDef(
    initSql: String = "",
    authorizer: String = "",
    materializer: String = "",
    stateInitSql: String = "",
    stateMaterializer: String = "",
    queries: Map[String, QueryDef] = Map.empty) {

  /** Content address over the deterministic encoding of the definition. */
  lazy val cid: String = {
    import DValue._
    def q(d: QueryDef): DValue = obj(
      "sql" -> text(d.sql),
      "params" -> DArray(d.params.toVector.map(p => obj(
        "name" -> text(p.name),
        "kind" -> text(p.kind.toString),
        "optional" -> DBool(p.optional)))))
    val v = obj(
      "$type" -> text("graft.module.basic.v0"),
      "init_sql" -> text(initSql),
      "authorizer" -> text(authorizer),
      "materializer" -> text(materializer),
      "state_init_sql" -> text(stateInitSql),
      "state_materializer" -> text(stateMaterializer),
      "queries" -> DMap(queries.map { case (k, d) => k -> q(d) }))
    Cid.render(Cid.ofValue(v))
  }
}

/** A named-query invocation (lib.rs:183-192). `limit` defaults to 1000. */
case class LeafQuery(
    name: String,
    params: Map[String, SqlValue] = Map.empty,
    start: Option[Long] = None,
    limit: Long = 1000) {

  /** Index of the last event this query's window covers (lib.rs:195-197). */
  def lastEvent: Long = limit + start.getOrElse(1L) - 1

  /** Advance the window for a subscription re-run (lib.rs:201-212). */
  def updateForSubscription(newStart: Long): LeafQuery =
    copy(start = Some(newStart))
}

object QueryValidation {
  /** Validate params against a query def (lib.rs:268-320): unknown params
    * rejected; required params must be present and non-null; kind-checked. */
  def validate(defn: QueryDef, q: LeafQuery): Either[String, Unit] = {
    val known = defn.params.map(_.name).toSet
    val unknown = q.params.keySet.diff(known)
    if (unknown.nonEmpty)
      return Left(s"unknown parameter(s): ${unknown.toSeq.sorted.mkString(", ")}")
    defn.params.foldLeft[Either[String, Unit]](Right(())) {
      case (l @ Left(_), _) => l
      case (Right(()), p) =>
        q.params.get(p.name) match {
          case None | Some(SqlValue.SqlNull) =>
            if (p.optional) Right(())
            else Left(s"missing required parameter: ${p.name}")
          case Some(v) => if (valueIsValid(p.kind, v)) Right(())
            else Left(s"parameter ${p.name} has wrong type for ${p.kind}")
        }
    }
  }

  import SqlValue._
  private def valueIsValid(kind: ParamKind, v: SqlValue): Boolean = (kind, v) match {
    case (ParamKind.PAny, _) => true
    case (ParamKind.PInteger, SqlInteger(_)) => true
    case (ParamKind.PReal, SqlReal(_)) => true
    case (ParamKind.PReal, SqlInteger(_)) => true
    case (ParamKind.PText, SqlText(_)) => true
    case (ParamKind.PBlob, SqlBlob(_)) => true
    case _ => false
  }
}

/** Raised by throw()/unauthorized() UDFs to veto an event or query
  * (behavioral spec: module/basic.rs:255-309). */
class LeafAuthException(msg: String) extends RuntimeException(msg)
