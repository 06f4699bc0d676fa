package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.drisl.{DValue, Drisl, DrislPath}

/** Native Catalyst expressions for DRISL path extraction.
  *
  * These replace Scala UDFs for the hot materializer path: a UDF pays
  * catalyst<->JVM round-trip conversion and closure-serialization per call,
  * while an Expression evaluates directly on internal rows (UTF8String /
  * byte[]), is null-safe by construction, and caches the parsed path when
  * the path argument is a literal/foldable — which it always is in module
  * SQL (`drisl_extract(payload, '.field')`).
  *
  * Semantics (behavioral spec: /root/reference/leaf-stream/src/
  * drisl_extract.rs and module/basic.rs:311-346): absent path and DRISL
  * null both yield SQL NULL for extract; exists returns 1/0 on presence.
  */
abstract class DrislPathExpression extends BinaryExpression {
  override def left: Expression = payload
  override def right: Expression = path
  def payload: Expression
  def path: Expression

  /** Codegen: emit a call on this expression instance (carried as a
    * reference object, so the literal-path cache survives) instead of
    * falling back to interpreted eval — the surrounding operators stay in
    * one whole-stage-codegen pipeline. */
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("drislExpr", this,
      classOf[DrislPathExpression].getName)
    val javaT = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      .javaType(dataType)
    val unbox = dataType match {
      case LongType => "((java.lang.Long) r).longValue()"
      case DoubleType => "((java.lang.Double) r).doubleValue()"
      case BinaryType => "(byte[]) r"
      case _ => "(org.apache.spark.unsafe.types.UTF8String) r"
    }
    nullSafeCodeGen(ctx, ev, (p, pa) =>
      s"""Object r = $ref.evalPath($p, $pa);
         |if (r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ($javaT) ($unbox);
         |}""".stripMargin)
  }

  /** Public bridge for generated code (nullSafeEval is protected). */
  def evalPath(p: Object, pa: Object): Object =
    nullSafeEval(p, pa).asInstanceOf[Object]

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (payload.dataType == BinaryType && path.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"expected (BINARY, STRING), got (${payload.dataType}, ${path.dataType})")
  }

  // parse the path once when it is foldable (module SQL always uses literals)
  @transient private lazy val staticPath: Option[List[DrislPath.Seg]] =
    if (path.foldable) {
      Option(path.eval(null)).map(p => DrislPath.parse(p.toString))
    } else None

  protected def segsFor(pathVal: Any): List[DrislPath.Seg] =
    staticPath.getOrElse(DrislPath.parse(pathVal.toString))

  protected def extract(payloadVal: Any, pathVal: Any): Option[DValue] = {
    val bytes = payloadVal.asInstanceOf[Array[Byte]]
    // an EMPTY payload reads as "no payload" (every path absent) rather
    // than a decode error: the reference bucket format carries a redacted
    // event's nulled payload as zero bytes (CBOR bytes(0)), and a restore
    // must replay it exactly like the source's SQL NULL — extract NULL,
    // never a materializer-killing throw
    if (bytes.isEmpty) None
    else DrislPath.extract(Drisl.decode(bytes), segsFor(pathVal))
  }
}

/** drisl_extract(payload, path) → STRING (SQLite text-affinity rendering;
  * Map/Array as JSON, matching the reference's serde_json conversion). */
case class DrislExtractExpr(payload: Expression, path: Expression)
    extends DrislPathExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(p: Any, pa: Any): Any =
    extract(p, pa).map {
      case DValue.DInt(i) => UTF8String.fromString(i.toString)
      case DValue.DFloat(f) => UTF8String.fromString(f.toString)
      case DValue.DText(s) => UTF8String.fromString(s)
      case DValue.DBool(b) => UTF8String.fromString(if (b) "1" else "0")
      case DValue.DNull => null
      case DValue.DBytes(b) => UTF8String.fromString(b.map("%02x".format(_)).mkString)
      case DValue.DCid(b) => UTF8String.fromString(b.map("%02x".format(_)).mkString)
      case v => UTF8String.fromString(Drisl.toJson(v))
    }.orNull

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(payload = l, path = r)
}

/** drisl_extract_long(payload, path) → BIGINT (Bool as 0/1, Real truncated,
  * numeric Text parsed). */
case class DrislExtractLongExpr(payload: Expression, path: Expression)
    extends DrislPathExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(p: Any, pa: Any): Any =
    extract(p, pa).flatMap {
      case DValue.DInt(i) => Some(i)
      case DValue.DBool(b) => Some(if (b) 1L else 0L)
      case DValue.DFloat(f) => Some(f.toLong)
      case DValue.DText(s) => s.toLongOption
      case _ => None
    }.map(Long.box).orNull

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(payload = l, path = r)
}

/** drisl_extract_double(payload, path) → DOUBLE. */
case class DrislExtractDoubleExpr(payload: Expression, path: Expression)
    extends DrislPathExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(p: Any, pa: Any): Any =
    extract(p, pa).flatMap {
      case DValue.DFloat(f) => Some(f)
      case DValue.DInt(i) => Some(i.toDouble)
      case DValue.DText(s) => s.toDoubleOption
      case _ => None
    }.map(Double.box).orNull

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(payload = l, path = r)
}

/** drisl_extract_blob(payload, path) → BINARY (Bytes and Cid values). */
case class DrislExtractBlobExpr(payload: Expression, path: Expression)
    extends DrislPathExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def nullSafeEval(p: Any, pa: Any): Any =
    extract(p, pa).flatMap {
      case DValue.DBytes(b) => Some(b)
      case DValue.DCid(b) => Some(b)
      case _ => None
    }.orNull

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(payload = l, path = r)
}

/** drisl_exists(payload, path) → BIGINT 1/0: present (even if DRISL null)
  * vs absent — the distinction extract collapses (basic.rs:343-345).
  *
  * Never null: a NULL payload or path means "nothing there" → 0. The
  * inherited BinaryExpression null propagation would instead return NULL
  * (contradicting nullable=false) and its nullSafeCodeGen would assign to
  * an undeclared ev.isNull in the non-nullable branch, so both eval and
  * doGenCode are overridden here.
  */
case class DrislExistsExpr(payload: Expression, path: Expression)
    extends DrislPathExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def nullSafeEval(p: Any, pa: Any): Any =
    Long.box(if (extract(p, pa).isDefined) 1L else 0L)

  override def eval(input: InternalRow): Any = {
    val p = payload.eval(input)
    val pa = path.eval(input)
    if (p == null || pa == null) 0L else nullSafeEval(p, pa)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("drislExpr", this,
      classOf[DrislPathExpression].getName)
    val l = payload.genCode(ctx)
    val r = path.genCode(ctx)
    val resultCode =
      code"""
         |${l.code}
         |${r.code}
         |long ${ev.value} = 0L;
         |if (!(${l.isNull}) && !(${r.isNull})) {
         |  ${ev.value} = ((java.lang.Long) $ref.evalPath(${l.value}, ${r.value})).longValue();
         |}
         |""".stripMargin
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(payload = l, path = r)
}

object DrislExpressions {
  /** Register the expressions under their SQL names on a session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def add(name: String, build: Seq[Expression] => Expression): Unit =
      reg.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.DrislExpressions", name),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 2, s"$name takes (payload, path)")
          build(exprs)
        })
    add("drisl_extract", e => DrislExtractExpr(e(0), e(1)))
    add("drisl_extract_long", e => DrislExtractLongExpr(e(0), e(1)))
    add("drisl_extract_double", e => DrislExtractDoubleExpr(e(0), e(1)))
    add("drisl_extract_blob", e => DrislExtractBlobExpr(e(0), e(1)))
    add("drisl_exists", e => DrislExistsExpr(e(0), e(1)))
  }
}
