package graft.stream

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{Command, InsertIntoDir, InsertIntoStatement, LogicalPlan}

/** Per-context statement gate — the engine's replacement for the
  * reference's SQL authorizer callback.
  *
  * The reference installs a per-action authorizer on each connection whose
  * whitelists document the INTENDED surface (read-only queries; module
  * tables writable from materializers; only state tables writable from
  * state materializers) even though every arm short-circuits to Allow
  * (/root/reference/leaf-stream/src/lib.rs:997-1121 — see SURVEY.md §2.B).
  * Spark has no authorizer hook, so the same contract is enforced by
  * classifying each parsed statement before execution.
  */
object SqlClassifier {

  sealed trait Ctx
  /** Named queries: read-only — no commands, no DML. */
  case object QueryCtx extends Ctx
  /** Materializer/init: DML + DDL on the module database. */
  case object MaterializerCtx extends Ctx
  /** State materializer: writes must target state_* tables only. */
  case object StateCtx extends Ctx

  /** First write/command node found anywhere in the plan tree, or None if
    * the statement is a pure query. Walks the whole tree (not just the
    * root) so write nodes that are plain UnaryNodes — e.g. InsertIntoDir,
    * which is neither a Command nor an InsertIntoStatement in Spark 4 —
    * cannot slip past a root-only match.
    */
  private def findWriteNode(plan: LogicalPlan): Option[String] = {
    var hit: Option[String] = None
    plan.foreach { p =>
      if (hit.isEmpty) p match {
        case _: InsertIntoStatement => hit = Some("INSERT")
        case _: InsertIntoDir      => hit = Some("INSERT OVERWRITE DIRECTORY")
        case _: Command            => hit = Some(p.getClass.getSimpleName)
        case c if c.getClass.getSimpleName.contains("Command") =>
          hit = Some(c.getClass.getSimpleName)
        case _ =>
      }
    }
    hit
  }

  /** Validate one statement for a context; Left(reason) to reject. */
  def check(spark: SparkSession, ctx: Ctx, stmt: String): Either[String, Unit] = {
    // the QueryCtx allowlist matches on TEXT before the bare parse: a
    // staged temp view may carry $-parameter markers, which the plain
    // parser rejects inside CREATE VIEW even though the parameterized
    // execution path (spark.sql(stmt, args)) substitutes them fine
    if (ctx == QueryCtx) {
      // multi-statement queries may stage TEMP VIEWS for the final SELECT
      // (A7 semantics: all statements run, last result returned)
      val tempView =
        "(?is)^\\s*CREATE\\s+(OR\\s+REPLACE\\s+)?TEMP(ORARY)?\\s+VIEW\\b".r
      // staged temp views may also be (un)cached: the indexed MMR
      // serving query materializes its bounded candidate pool once so
      // the unrolled greedy layers read a ≤256-row in-memory relation
      // instead of re-running the two-stage probe per layer. Only the
      // plain CACHE/UNCACHE of an existing name is allowed — the
      // `CACHE TABLE t AS SELECT` creating form stays rejected — and
      // the name must be a SINGLE-part identifier: a temp view staged
      // by this query, which is what the allowance exists for. A dotted
      // qualified name would reach other streams' databases in the
      // shared session catalog (cross-tenant cache eviction / memory
      // pressure from a context meant to be read-only).
      val cache =
        "(?is)^\\s*(UN)?CACHE\\s+(LAZY\\s+)?TABLE\\s+(IF\\s+EXISTS\\s+)?[A-Za-z_][A-Za-z0-9_]*\\s*$".r
      if (tempView.findFirstIn(stmt).isDefined ||
          cache.findFirstIn(stmt).isDefined) return Right(())
    }
    val plan: LogicalPlan =
      try spark.sessionState.sqlParser.parsePlan(stmt)
      catch { case e: Exception => return Left(s"unparseable statement: ${e.getMessage}") }
    ctx match {
      case QueryCtx =>
        findWriteNode(plan) match {
          case Some(what) => Left(s"queries are read-only: $what rejected")
          case None       => Right(())
        }
      case MaterializerCtx => Right(()) // full DML/DDL surface, as intended
      case StateCtx => plan match {
        case ins: InsertIntoStatement =>
          ins.table match {
            case UnresolvedRelation(parts, _, _) if parts.last.toLowerCase.startsWith("state_") =>
              Right(())
            case UnresolvedRelation(parts, _, _) =>
              Left(s"state materializer may only write state_* tables, not ${parts.mkString(".")}")
            case _ => Left("state materializer: unsupported insert target")
          }
        case _ => findWriteNode(plan) match {
          case Some(_) => Left("state materializer: only INSERT into state_* tables allowed")
          case None    => Right(()) // bare SELECTs are harmless
        }
      }
    }
  }

  /** Validate a whole statement list; first rejection wins. */
  def checkAll(spark: SparkSession, ctx: Ctx, stmts: Seq[String]): Either[String, Unit] =
    stmts.foldLeft[Either[String, Unit]](Right(())) {
      case (l @ Left(_), _) => l
      case (Right(()), s) => check(spark, ctx, s)
    }
}
