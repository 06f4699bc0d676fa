package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: write each named query's `.explain("formatted")` output to
  * `<outDir>/<query>_<suffix>.txt` — the plan evidence the optimization
  * rounds commit under plans/. The query is EXECUTED first so the dumped
  * plan is the final adaptive one (isFinalPlan=true), not the initial
  * guess. Usage: runMain graft.tools.ExplainDump <outDir> <suffix> <q>...
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    java.nio.file.Files.createDirectories(outDir)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(2).foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect() // settle AQE so the dump is the executed plan
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[explain] wrote ${name}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
