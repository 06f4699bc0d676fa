package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Prints the formatted physical plan of named queries, plus a quick scan
  * audit: pushed filters, read schema width, broadcast vs shuffle joins,
  * whole-stage codegen coverage (dev tool). */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val full = sys.env.contains("GRAFT_EXPLAIN_FULL")
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      // settle AQE with an action FIRST: the census must read the final
      // adaptive plan, where WholeStageCodegen stages exist (as `*(id)`
      // operator prefixes) and AQE's join/exchange re-plans have landed —
      // the pre-AQE string under-reports codegen as 0 and can show a
      // different join strategy than what actually ran
      df.collect()
      // unwrap the adaptive root: its toString prints the final AND the
      // initial plan, which would double-count every join/exchange
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case p => p.toString
      }
      if (full) println(plan)
      val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan).toSeq
      val schemas = "ReadSchema: [^\n]*".r.findAllIn(plan).toSeq
      val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).size
      val nSMJ = "SortMergeJoin".r.findAllIn(plan).size
      val nShuffle = "Exchange hashpartitioning".r.findAllIn(plan).size
      val nCodegen = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan)
        .map(_.group(1)).toSet.size
      println(s"==== $name ====")
      pushed.foreach(p => println(s"  $p"))
      schemas.foreach(s => println(s"  ${s.take(150)}"))
      println(s"  joins: broadcast=$nBroadcast smj=$nSMJ shuffles=$nShuffle codegenSpans=$nCodegen")
    }
    spark.stop()
  }
}
