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
    // dense idx needs a total order; an unpartitioned window is exact but
    // single-reducer. For huge one-shot imports, switch to per-partition
    // counts + offset (zipWithIndex pattern) — idx stays dense, no global
    // sort. The window form is kept here because ingest batches are
    // incremental, not whole-corpus.
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(orderBy.map(col): _*)
    raw.select(
        col(userCol).cast("string").as("user"),
        enc(col(userCol).cast("string"),
          array(payloadCols.map(lit(_)): _*),
          array(payloadCols.map(c => col(c).cast("string")): _*),
          array(kinds.map(lit(_)): _*)).as("payload"),
        row_number().over(w).cast("long").as("rn"))
      .select((col("rn") + startIdx).as("idx"), col("user"), col("payload"),
        lit(Array.empty[Byte]).as("signature"))
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
