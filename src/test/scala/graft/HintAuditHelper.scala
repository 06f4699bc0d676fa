package graft

/** Dev helper for PlanAuditSpec: which registry queries carry broadcast
  * hints in their analyzed plans. */
object HintAuditHelper {
  def hinted(spark: org.apache.spark.sql.SparkSession, dir: String): Set[String] =
    SparkEntry.queries.keys.filterNot(_.startsWith("leaf_")).filter { name =>
      try SparkEntry.queries(name)(spark, dir)
        .queryExecution.analyzed.toString.contains("ResolvedHint")
      catch { case _: Throwable => false }
    }.toSet
}
