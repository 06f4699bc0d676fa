package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loads the driver-generated testdata tables (TESTDATA.md) and registers
  * them as temp views so both the DataFrame API and `spark.sql` can reach
  * them. Reading is a plain parquet scan — filters/projections push down.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def df(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") events(spark, s"$dir/$name.parquet")
    else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Scale-adaptive parallelism guard for CPU-heavy in-row kernels
    * (tokenizing, shingle/feature hashing, codec encode/decode): a scan
    * whose file set yields fewer splits than the session's parallelism
    * runs every kernel above it nearly serially — the one-big-gzip
    * input-skew case of the optimization playbook, which a parquet file
    * with a single row group reproduces exactly (row groups are the
    * split unit, so `maxPartitionBytes` cannot help). When the scan is
    * under-parallel, spread rows round-robin across the cores BEFORE the
    * kernel; when the input already carries enough splits (any
    * production-sized table), this is the identity — no exchange enters
    * the plan, so the added shuffle can never tax at-scale runs. Only
    * wrap CPU-heavy producers: for scan-bound aggregates the exchange
    * costs more than the kernel.
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // structural guard (r18, per ADVICE): probing .rdd.getNumPartitions
    // on a shuffle-rooted plan under AQE EXECUTES its upstream stages —
    // the probe itself would double the work. spread's contract is
    // scan-rooted producers only; enforce it by inspecting the physical
    // plan for exchanges (planning only, nothing executes) instead of
    // trusting call-site comments: an exchange-bearing caller gets the
    // identity, never a double execution.
    val shuffleRooted = df.queryExecution.sparkPlan.find(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange]).isDefined
    if (shuffleRooted) df
    else if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target)
  }

  /** Schema-tolerant events reader. Testdata regenerations have shipped
    * `ts` under different parquet encodings — TIMESTAMP(NANOS) (which
    * Spark 4 only reads as long via `nanosAsLong`), TIMESTAMP(MICROS)
    * with isAdjustedToUTC=false (reads as TIMESTAMP_NTZ), and
    * UTC-adjusted micros (reads as TIMESTAMP). Branch on the footer
    * schema actually present instead of assuming one encoding, and
    * normalize to session-zone TIMESTAMP (sessions run UTC) so every
    * downstream query and the DuckDB oracle see identical instants.
    */
  private def events(spark: SparkSession, path: String): DataFrame = {
    // Harmless for non-nano files; required to even read the footer of a
    // TIMESTAMP(NANOS) file (Spark 4 rejects the type otherwise).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path)
    raw.schema("ts").dataType match {
      case LongType =>
        // nanosAsLong path: integral DIV, not `/` — epoch nanos (~1.7e18)
        // exceed double's 2^53 mantissa, so float division is off by ±1µs.
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        // Wall-clock micros; session TZ is UTC so the cast is instant-preserving.
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other =>
        throw new IllegalStateException(
          s"events.ts: unsupported parquet type $other in $path " +
            "(expected INT64 nanos, TIMESTAMP_NTZ, or TIMESTAMP)")
    }
  }

  /** Register all tables as temp views for `dir` (idempotent).
    *
    * Error scoping is per table: one unreadable parquet must only fail the
    * queries that actually reference its view, not the other nine. Failed
    * tables are recorded and re-attempted on the next load call.
    */
  def load(spark: SparkSession, dir: String): Unit = synchronized {
    val dirKey = "graft.tables.dir"
    val failKey = "graft.tables.failed"
    val sameDir = spark.conf.getOption(dirKey).contains(dir)
    val previouslyFailed =
      spark.conf.getOption(failKey).toSeq.flatMap(_.split(",")).filter(_.nonEmpty).toSet
    val todo =
      if (!sameDir) names
      else names.filter(previouslyFailed) // re-attempt only what failed
    if (todo.nonEmpty) {
      val failed = todo.filterNot { n =>
        try { df(spark, dir, n).createOrReplaceTempView(n); true }
        catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(
              s"[graft] table '$n' failed to load from $dir: ${e.getMessage}")
            false
        }
      }
      spark.conf.set(dirKey, dir)
      spark.conf.set(failKey, failed.mkString(","))
    }
  }
}
