package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Relational.Q

/** Multimodal-column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, processed by per-partition batch operators.
  *
  * The container has no codec libraries, so the *decode* step is a
  * clearly-marked deterministic STUB (`FakeCodec`) — the Spark-side shape
  * is the real thing: a BINARY payload column, a typed metadata struct,
  * `mapPartitions` batch processing with case-class Encoders (the Scala
  * analog of mapInPandas batches: one iterator per partition, vectorizable
  * per-batch work, no per-row driver involvement), and frame sampling as a
  * pure codegen expression pipeline. Swapping `FakeCodec` for a real
  * decoder changes no schema, partitioning, or operator structure.
  *
  * These entries have no SQL oracle (byte-level ops aren't expressible in
  * the oracle dialect) — the driver records rows-only checks; exact-value
  * assertions live in MultimodalSpec.
  */
object Multimodal {

  case class Media(media_id: Long, fmt: String, data: Array[Byte])
  case class Decoded(media_id: Long, fmt: String, width: Int, height: Int,
      n_bytes: Long, ok: Boolean)
  case class Features(media_id: Long, mean_byte: Double, h0: Long, h1: Long,
      h2: Long, h3: Long)
  case class Resized(media_id: Long, fmt: String, orig_bytes: Long,
      new_bytes: Long, data: Array[Byte])

  /** STUB decoder: deterministic pseudo-metadata from the payload bytes.
    * A real implementation calls an image/audio library here, per batch. */
  object FakeCodec {
    def decode(m: Media): Decoded = {
      val b = m.data
      if (b == null || b.isEmpty) Decoded(m.media_id, m.fmt, 0, 0, 0L, ok = false)
      else Decoded(m.media_id, m.fmt,
        width = 64 + ((b(0) & 0xff) % 192),
        height = 64 + ((b(b.length - 1) & 0xff) % 192),
        n_bytes = b.length.toLong, ok = true)
    }

    /** STUB resize: deterministic downsample to <= targetBytes by keeping
      * every ceil(n/target)-th byte — a real codec scales pixels here; the
      * operator contract (binary in, smaller binary + size metadata out,
      * per-partition batches) is what the pipeline depends on. */
    def resize(m: Media, targetBytes: Int): Resized = {
      val b = if (m.data == null) Array.empty[Byte] else m.data
      val step = math.max(1, math.ceil(b.length.toDouble / targetBytes).toInt)
      val out = b.indices.collect { case i if i % step == 0 => b(i) }.toArray
      Resized(m.media_id, m.fmt, b.length.toLong, out.length.toLong, out)
    }

    def features(m: Media): Features = {
      val b = m.data
      if (b == null || b.isEmpty) return Features(m.media_id, 0.0, 0L, 0L, 0L, 0L)
      var sum = 0L
      val hist = new Array[Long](4)
      var i = 0
      while (i < b.length) {
        val v = b(i) & 0xff
        sum += v
        hist(v >> 6) += 1
        i += 1
      }
      Features(m.media_id, sum.toDouble / b.length, hist(0), hist(1), hist(2), hist(3))
    }
  }

  /** Synthesize a media table from `documents`: payload = utf-8 bytes of
    * the text (an opaque blob as far as the pipeline is concerned). */
  private def media(s: SparkSession, dir: String): DataFrame =
    Tables.df(s, dir, "documents").select(
      col("doc_id").as("media_id"),
      element_at(lit(Array("jpeg", "png", "webp")), (col("doc_id") % 3 + 1).cast("int")).as("fmt"),
      encode(col("text"), "utf-8").as("data"))

  val all: Map[String, Q] = Map(

    // ---- byte-level media stats: the ORACLE-CHECKED member of the
    // multimodal family. Payload sizes/grouping are pure byte arithmetic
    // both engines express (octet_length over the same utf-8 encoding),
    // so unlike the codec-stub gates this one hash-checks end to end —
    // it pins the media mapping (id/fmt/payload) the rows-only gates
    // build on ----
    "q_mm_stats" -> Q(
      (s, dir) => media(s, dir)
        .groupBy(col("fmt"))
        .agg(count(lit(1)).as("n"),
          sum(length(col("data"))).cast("long").as("total_bytes"),
          max(length(col("data"))).cast("long").as("max_bytes"),
          min(col("media_id")).as("first_id"))
        .orderBy(col("fmt")),
      Some("""SELECT CASE CAST(doc_id % 3 AS INT)
             |    WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS fmt,
             |  count(*) AS n,
             |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
             |  CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes,
             |  min(doc_id) AS first_id
             |FROM documents GROUP BY 1 ORDER BY fmt""".stripMargin)),

    // ---- decode: per-partition batch metadata extraction (STUB codec) ----
    "q_mm_decode" -> Q(
      (s, dir) => {
        import s.implicits._
        media(s, dir).as[Media]
          .mapPartitions(_.map(FakeCodec.decode))
          .toDF()
          .orderBy(col("media_id"))
      }, None),

    // ---- feature extraction: byte histogram + mean per media blob ----
    "q_mm_features" -> Q(
      (s, dir) => {
        import s.implicits._
        media(s, dir).as[Media]
          .mapPartitions(_.map(FakeCodec.features))
          .toDF()
          .orderBy(col("media_id"))
      }, None),

    // ---- resize: per-partition batch downsample to a target byte budget ----
    "q_mm_resize" -> Q(
      (s, dir) => {
        import s.implicits._
        media(s, dir).as[Media]
          .mapPartitions(_.map(FakeCodec.resize(_, targetBytes = 64)))
          .toDF()
          .select(col("media_id"), col("fmt"), col("orig_bytes"),
            col("new_bytes"), md5(col("data")).as("data_md5"))
          .orderBy(col("media_id"))
      }, None),

    // ---- frame sampling: every 4th 16-byte window, pure codegen ----
    // the payload column rides through the explode — re-joining media to
    // re-fetch `data` would add a whole shuffle join for nothing
    "q_mm_frames" -> Q(
      (s, dir) =>
        media(s, dir)
          // integer DIV for the frame count, and an empty payload yields
          // ZERO frames (explode of an empty array drops the row) instead
          // of a phantom frame 0 from truncated double division
          .select(col("media_id"), col("data"),
            explode(when(length(col("data")) > 0,
              sequence(lit(0), expr("CAST((length(data) - 1) DIV 64 AS INT)")))
              .otherwise(array().cast("array<int>"))).as("frame_no"))
          .select(col("media_id"), col("frame_no"),
            md5(col("data").substr(col("frame_no") * 64 + 1, lit(16))).as("frame_md5"))
          .orderBy(col("media_id"), col("frame_no")), None)
  )
}
