package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the per-pair array math on the dedup /
  * similarity hot paths. A Scala UDF deserializes both arrays to
  * `Seq[_]` per call and breaks whole-stage codegen; these evaluate
  * directly on `ArrayData` (primitive `getLong`/`getFloat`, no boxing) and
  * emit real Java in `doGenCode`, so the verify stages stay inside one
  * generated loop. At 100 TB the per-pair function runs O(candidates)
  * times — this is exactly the place codegen pays.
  */
object VectorExpressions {

  /** sorted_intersect_count(a, b): |a ∩ b| for two SORTED ARRAY<BIGINT>
    * (one linear merge — the exact-Jaccard verify kernel). */
  case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (left.dataType == ArrayType(LongType, false) ||
          left.dataType == ArrayType(LongType, true)) {
        if (right.dataType.isInstanceOf[ArrayType] &&
            right.dataType.asInstanceOf[ArrayType].elementType == LongType)
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"expected ARRAY<BIGINT>, got ${right.dataType}")
      } else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"expected ARRAY<BIGINT>, got ${left.dataType}")

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      var i = 0; var j = 0; var n = 0L
      while (i < x.numElements() && j < y.numElements()) {
        val u = x.getLong(i); val v = y.getLong(j)
        if (u == v) { n += 1; i += 1; j += 1 }
        else if (u < v) i += 1
        else j += 1
      }
      n
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val n = ctx.freshName("n")
        val u = ctx.freshName("u"); val v = ctx.freshName("v")
        s"""int $i = 0; int $j = 0; long $n = 0L;
           |while ($i < $a.numElements() && $j < $b.numElements()) {
           |  long $u = $a.getLong($i); long $v = $b.getLong($j);
           |  if ($u == $v) { $n++; $i++; $j++; }
           |  else if ($u < $v) { $i++; } else { $j++; }
           |}
           |${ev.value} = $n;""".stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** cosine_sim(a, b): double-precision cosine of two ARRAY<FLOAT> — the
    * cheap prefilter kernel (the exact decimal fold stays separate for
    * oracle determinism). Accumulation order matches the scalar loop the
    * UDF it replaces used, so values are bit-identical. */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      def ok(t: DataType) = t.isInstanceOf[ArrayType] &&
        t.asInstanceOf[ArrayType].elementType == FloatType
      if (ok(left.dataType) && ok(right.dataType))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expected (ARRAY<FLOAT>, ARRAY<FLOAT>), got (${left.dataType}, ${right.dataType})")
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(x.numElements(), y.numElements())
      while (i < n) {
        val u = x.getFloat(i).toDouble; val v = y.getFloat(i).toDouble
        dot += u * v; na += u * u; nb += v * v; i += 1
      }
      dot / math.sqrt(na * nb)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
        val u = ctx.freshName("u"); val v = ctx.freshName("v")
        s"""double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |for (int $i = 0; $i < $n; $i++) {
           |  double $u = (double) $a.getFloat($i);
           |  double $v = (double) $b.getFloat($i);
           |  $dot += $u * $v; $na += $u * $u; $nb += $v * $v;
           |}
           |${ev.value} = $dot / java.lang.Math.sqrt($na * $nb);""".stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** md5_60(s): the first 60 bits of md5(s) as a non-negative BIGINT —
    * numerically identical to `conv(substring(md5(s), 1, 15), 16, 10)`
    * (the oracle's `('0x' || substr(md5(s), 1, 15))::BIGINT`), but one
    * thread-local digest call with no hex-string round-trip. Spark's
    * built-in md5() looks up a fresh MessageDigest per row and renders a
    * 32-char hex string that conv() then re-parses; on shingle/window
    * hash passes that run millions of times per partition this kernel is
    * the difference between the hash being free and being the stage. */
  case class Md5Prefix60(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"expected STRING, got ${child.dataType}")

    override def nullSafeEval(input: Any): Any =
      Md5Hash.h60(input.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hash.h60($c)")

    override protected def withNewChildInternal(newChild: Expression) =
      copy(child = newChild)
  }

  /** SQL names; DSL call sites go through expr("...") after register. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def add(name: String, build: (Expression, Expression) => Expression): Unit =
      reg.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.VectorExpressions", name),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 2, s"$name takes 2 arguments")
          build(exprs(0), exprs(1))
        })
    add("sorted_intersect_count", SortedIntersectCount(_, _))
    add("cosine_sim", CosineSim(_, _))
    reg.registerFunction(
      FunctionIdentifier("md5_60"),
      new ExpressionInfo("graft.functions.VectorExpressions", "md5_60"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "md5_60 takes 1 argument")
        Md5Prefix60(exprs.head)
      })
  }

  /** DSL shorthand: register on the session, return the md5_60 column. */
  def md5_60(s: SparkSession, c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    register(s)
    org.apache.spark.sql.functions.call_function("md5_60", c)
  }
}

/** Static home for the md5_60 kernel (generated Java calls it directly). */
object Md5Hash {
  private val mdTl: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(utf8 bytes) as a long (matches the hex-prefix
    * parse: 15 hex digits = top 60 bits of the big-endian first 8 bytes). */
  def h60(s: UTF8String): Long = {
    val d = mdTl.get()
    d.reset()
    val o = d.digest(s.getBytes)
    val top = ((o(0) & 0xffL) << 56) | ((o(1) & 0xffL) << 48) |
      ((o(2) & 0xffL) << 40) | ((o(3) & 0xffL) << 32) |
      ((o(4) & 0xffL) << 24) | ((o(5) & 0xffL) << 16) |
      ((o(6) & 0xffL) << 8) | (o(7) & 0xffL)
    top >>> 4
  }
}
