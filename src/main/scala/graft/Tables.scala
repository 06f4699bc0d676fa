package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loads the driver-generated testdata tables (TESTDATA.md) and registers
  * them as temp views so both the DataFrame API and `spark.sql` can reach
  * them. Reading is a plain parquet scan — filters/projections push down.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def df(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // The events table carries TIMESTAMP(NANOS) which Spark 4 rejects;
      // read nanos as long and rebuild a micros-precision timestamp column.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      // integral DIV, not `/`: epoch nanos (~1.7e18) exceed double's 2^53
      // mantissa, so float division is off by +-1 microsecond
      raw.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register all tables as temp views for `dir` (idempotent). */
  def load(spark: SparkSession, dir: String): Unit = synchronized {
    // Re-register only when the sf dir changes, to keep per-query overhead ~0.
    val key = "graft.tables.dir"
    val cur = spark.conf.getOption(key)
    if (!cur.contains(dir)) {
      names.foreach { n => df(spark, dir, n).createOrReplaceTempView(n) }
      spark.conf.set(key, dir)
    }
  }
}
