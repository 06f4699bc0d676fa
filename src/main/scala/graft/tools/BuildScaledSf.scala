package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness: build an sf1-equivalent dataset by replicating the sf0.1
  * relational tables N× with FK-CONSISTENT key shifts (each replica's
  * customers reference its own orders, lineitems its own orders/parts/
  * suppliers), so every join/agg gate sees a corpus one decade up with the
  * same relational structure. region/nation are true fixed dims and stay
  * as-is; events replicate with shifted event/user ids (the
  * ProfilePipeline discipline); documents/embeddings pass through
  * unchanged (the corpus family has its own 30× profiler).
  *
  * The output is plain parquet the DuckDB oracle reads just like the
  * driver testdata, so `VerifyOne` + `check_oracle.py` give a full
  * correctness sweep at 10× the gate scale:
  *
  * GRAFT_REPLICATE=10 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.tools.BuildScaledSf /tmp/graft_sf1"
  */
object BuildScaledSf {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("GRAFT_REPLICATE", "10").toInt
    val out = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def raw(t: String): DataFrame = spark.read.parquet(s"$base/$t.parquet")
    def keyMax(df: DataFrame, k: String): Long =
      df.agg(max(col(k))).head().getLong(0) + 1
    val reps = spark.range(mult).select(col("id").as("r"))

    val custN = keyMax(raw("customer"), "c_custkey")
    val suppN = keyMax(raw("supplier"), "s_suppkey")
    val partN = keyMax(raw("part"), "p_partkey")
    val orderN = keyMax(raw("orders"), "o_orderkey")

    def shifted(t: String, shifts: Map[String, Long]): Unit = {
      val df = raw(t)
      val cols = df.columns.map { c =>
        shifts.get(c) match {
          case Some(n) => (col(c) + col("r") * n).as(c)
          case None => col(c)
        }
      }
      df.crossJoin(reps).select(cols.toIndexedSeq: _*)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }

    shifted("customer", Map("c_custkey" -> custN))
    shifted("supplier", Map("s_suppkey" -> suppN))
    shifted("part", Map("p_partkey" -> partN))
    shifted("orders", Map("o_orderkey" -> orderN, "o_custkey" -> custN))
    shifted("lineitem", Map("l_orderkey" -> orderN, "l_partkey" -> partN,
      "l_suppkey" -> suppN))
    val evN = keyMax(raw("events"), "event_id")
    val userN = keyMax(raw("events"), "user_id")
    shifted("events", Map("event_id" -> evN, "user_id" -> userN))
    // fixed dims + corpus tables pass through (single write keeps the
    // oracle's read_parquet path shape uniform)
    for (t <- Seq("region", "nation", "documents", "embeddings"))
      raw(t).write.mode("overwrite").parquet(s"$out/$t.parquet")

    val counts = Seq("customer", "orders", "lineitem", "events").map(t =>
      s"$t=${spark.read.parquet(s"$out/$t.parquet").count()}").mkString(" ")
    println(s"[buildsf] x$mult at $out: $counts")
    spark.stop()
  }
}
