package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev harness: per-query job/stage breakdown. Runs each named query
  * twice (cold then warm — the delta is codegen/JIT), printing every
  * Spark job's wall time, stage count and task time so gate-level cost
  * attributes to actions instead of guesswork. */
object ProfileBreakdown {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    sys.env.get("GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(";;")).map(_.split("=", 2))
      .foreach { case Array(k, v) => builder.config(k, v); case _ => }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    @volatile var taskTimeMs = 0L
    @volatile var stages = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.put(j.jobId, (j.time, Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(j.jobId)).foreach { case (t0, desc) =>
          done.add((j.jobId, (j.time - t0) / 1e3, desc))
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        taskTimeMs += s.stageInfo.taskMetrics.executorRunTime
      }
    })
    spark.range(100).count()
    Thread.sleep(200); done.clear(); taskTimeMs = 0L; stages = 0
    args.foreach { name =>
      for (round <- Seq("cold", "warm")) {
        done.clear(); taskTimeMs = 0L; stages = 0
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, dir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let listener drain
        val jl = done.toArray(Array.empty[(Int, Double, String)]).sortBy(_._1)
        println(f"[$name/$round] wall=$wall%.2fs jobs=${jl.length} stages=$stages taskTime=${taskTimeMs / 1e3}%.2fs rows=$n")
        if (round == "cold" && sys.env.contains("GRAFT_PROFILE_JOBS"))
          jl.foreach { case (id, s, d) =>
            println(f"    job $id%3d ${s}%7.2fs  ${d.take(90)}") }
        try { spark.catalog.clearCache(); System.gc() }
        catch { case _: Throwable => }
      }
    }
    spark.stop()
  }
}
