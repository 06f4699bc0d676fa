package graft.tools

import org.apache.spark.sql.SparkSession

/** Replicates the driver's t1 smoke: entry() on sf0.001 must return rows. */
object SmokeEntry {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows=$n")
    spark.stop()
  }
}
