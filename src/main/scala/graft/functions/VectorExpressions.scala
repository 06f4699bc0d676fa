package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

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
  }
}
