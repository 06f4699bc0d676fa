package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions injection point: makes the engine's function
  * surface available to ANY session via configuration —
  *
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions
  *
  * — the standard way to ship the library onto a cluster without code
  * changes in the host application. Injects the native drisl_* expressions;
  * `LeafFunctions.register` remains for the imperative path (it adds the
  * UDF-based control-flow functions and SQL shims, which need a live
  * session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, build: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.DrislExpressions", name),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 2, s"$name takes (payload, path)")
          build(exprs)
        }))
    inject("drisl_extract", e => DrislExtractExpr(e(0), e(1)))
    inject("drisl_extract_long", e => DrislExtractLongExpr(e(0), e(1)))
    inject("drisl_extract_double", e => DrislExtractDoubleExpr(e(0), e(1)))
    inject("drisl_extract_blob", e => DrislExtractBlobExpr(e(0), e(1)))
    inject("drisl_exists", e => DrislExistsExpr(e(0), e(1)))
    inject("sorted_intersect_count",
      e => VectorExpressions.SortedIntersectCount(e(0), e(1)))
    inject("cosine_sim", e => VectorExpressions.CosineSim(e(0), e(1)))
    ext.injectFunction((
      FunctionIdentifier("md5_60"),
      new ExpressionInfo("graft.functions.VectorExpressions", "md5_60"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "md5_60 takes 1 argument")
        VectorExpressions.Md5Prefix60(exprs.head)
      }))
  }
}
