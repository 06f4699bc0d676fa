package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.drisl.{DValue, Drisl}
import graft.stream.StreamHandle

/** File-format ingestion into stream logs.
  *
  * The reference's only ingest path is the event RPC; at pipeline scale the
  * practical entry points are files. These readers normalize external data
  * to the log's import schema (idx/user/payload/signature) so a whole
  * dataset lands with ONE distributed `bulkImport` (a single write + one
  * set-based materializer pass — no per-event anything):
  *
  *  - parquet/json/csv sources with a (user, <fields...>) shape; every
  *    non-user column is folded into the DRISL payload map.
  *  - idx assignment is `row_number` over a caller-provided ordering,
  *    offset by the stream's current latest — dense and deterministic.
  *
  * Export is the mirror image: a query result or the raw log to
  * parquet/csv/json, partitioned however the caller asks.
  */
object EventSource {

  /** Read a file of events into the import schema, assigning idx after
    * `startIdx` in `orderBy` order. String/numeric/bool columns become
    * DRISL map entries keyed by column name. */
  def fromFile(spark: SparkSession, path: String, format: String,
      userCol: String, orderBy: Seq[String], startIdx: Long): DataFrame = {
    val raw = format match {
      case "parquet" => spark.read.parquet(path)
      case "json" => spark.read.json(path)
      case "csv" => spark.read.option("header", "true").option("inferSchema", "true").csv(path)
      case other => throw new IllegalArgumentException(s"unsupported format $other")
    }
    val payloadCols = raw.columns.filterNot(_ == userCol).toSeq
    val enc = udf((user: String, keys: Seq[String], vals: Seq[String], kinds: Seq[String]) => {
      val entries = keys.lazyZip(vals).lazyZip(kinds).flatMap {
        case (_, null, _) => None
        case (k, v, "long") => Some(k -> DValue.DInt(v.toLong))
        case (k, v, "double") => Some(k -> DValue.DFloat(v.toDouble))
        case (k, v, "boolean") => Some(k -> DValue.DBool(v.toBoolean))
        case (k, v, _) => Some(k -> DValue.DText(v))
      }
      Drisl.encode(DValue.DMap(entries.toMap))
    })
    val kinds = payloadCols.map(c => raw.schema(c).dataType.typeName match {
      case "long" | "integer" | "short" => "long"
      case "double" | "float" => "double"
      case "boolean" => "boolean"
      case _ => "string"
    })
    // dense idx needs a total order, but an unpartitioned row_number window
    // funnels the whole import through ONE reducer. Instead: range-partition
    // on the ordering key (global order across partitions, parallel sort
    // within), persist the sorted batch (both the sizing pass and the final
    // write must see identical partitions), and assign idx as per-partition
    // offsets + local position — the zipWithIndex pattern. Dense, exact,
    // and every stage is parallel.
    // persisted OUTSIDE the GateCache discipline on purpose: this is not a
    // reusable gate artifact but a correctness pin — zipWithIndex reads the
    // RDD twice (count + map), and the returned import frame consumes it
    // lazily, so a recompute after an unpersist could re-sample the range
    // partitioner and assign DIFFERENT idx values between the sizing pass
    // and the write. An import is one-shot; the ContextCleaner releases
    // the blocks once the import's frames are unreachable.
    val sorted = sortedStage(raw, userCol, orderBy, payloadCols, kinds, enc)
      .persist()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("idx", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.BinaryType),
      org.apache.spark.sql.types.StructField("signature", org.apache.spark.sql.types.BinaryType)))
    val rows = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row(
        i + 1 + startIdx, r.getString(0), r.getAs[Array[Byte]](1), Array.empty[Byte])
    }
    spark.createDataFrame(rows, schema)
  }

  private def sortedStage(raw: DataFrame, userCol: String, orderBy: Seq[String],
      payloadCols: Seq[String], kinds: Seq[String],
      enc: org.apache.spark.sql.expressions.UserDefinedFunction): DataFrame =
    raw.select(
        (orderBy.map(col) :+
          col(userCol).cast("string").as("user") :+
          enc(col(userCol).cast("string"),
            array(payloadCols.map(lit(_)): _*),
            array(payloadCols.map(c => col(c).cast("string")): _*),
            array(kinds.map(lit(_)): _*)).as("payload")): _*)
      .repartitionByRange(orderBy.map(col): _*)
      .sortWithinPartitions(orderBy.map(col): _*)
      .select(col("user"), col("payload"))

  /** The distributed stage of `fromFile` BEFORE the zipWithIndex idx
    * assignment — exposed so tests and profiling can assert its physical
    * plan (range partitioning, no single-reducer window): the final
    * DataFrame is an ExistingRDD scan whose plan hides the upstream. */
  private[graft] def sortedStagePlan(spark: SparkSession, path: String,
      format: String, userCol: String, orderBy: Seq[String]): String = {
    val raw = format match {
      case "parquet" => spark.read.parquet(path)
      case "json" => spark.read.json(path)
      case other => throw new IllegalArgumentException(s"unsupported format $other")
    }
    val payloadCols = raw.columns.filterNot(_ == userCol).toSeq
    val enc = udf((user: String, keys: Seq[String], vals: Seq[String], kinds: Seq[String]) =>
      Array.empty[Byte])
    sortedStage(raw, userCol, orderBy, payloadCols, payloadCols.map(_ => "string"), enc)
      .queryExecution.executedPlan.toString
  }

  /** Ingest a file into a stream: one distributed import + materialize. */
  def ingest(h: StreamHandle, path: String, format: String,
      userCol: String, orderBy: Seq[String]): Long =
    h.bulkImport(fromFile(h.eventsDF.sparkSession, path, format, userCol, orderBy, h.latest))

  /** Export a DataFrame (query result or raw log) to a file sink. */
  def export(df: DataFrame, path: String, format: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    val wp = if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w
    format match {
      case "parquet" => wp.parquet(path)
      case "json" => wp.json(path)
      case "csv" => wp.option("header", "true").csv(path)
      case other => throw new IllegalArgumentException(s"unsupported format $other")
    }
  }
}
