package graft.queries

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Relational.Q

/** Multimodal-column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, processed by per-partition batch operators.
  *
  * The codec is REAL: `ImageCodec` encodes and decodes PNG/JPEG/BMP via the
  * JDK's `javax.imageio` (no external deps). The media table synthesizes a
  * deterministic image per document — dimensions and pixels derived from the
  * payload bytes — encodes it in the row's container format, and the
  * decode/feature/resize operators run on those actual compressed bytes:
  * real container parsing, real pixel access, real rescale + re-encode.
  * The Spark shape is `mapPartitions` batches over case-class Encoders (the
  * Scala analog of mapInPandas: one iterator per partition, batch-friendly
  * per-row work, no driver involvement); a GPU/native decoder would slot
  * into the same batch seam without touching schema or partitioning.
  *
  * The decode/feature/resize entries have no SQL oracle (image codecs
  * aren't expressible in the oracle dialect) — the driver records rows-only
  * checks; exact-value assertions (a hand-authored spec-pinned PNG decoded
  * to known RGB, golden digests of full outputs) live in MultimodalSpec.
  * `q_mm_stats` is the oracle-checked member pinning the id/fmt/payload
  * mapping the family builds on.
  */
object Multimodal {

  case class Media(media_id: Long, fmt: String, data: Array[Byte])
  case class Decoded(media_id: Long, fmt: String, width: Int, height: Int,
      n_bytes: Long, ok: Boolean)
  case class Features(media_id: Long, mean_byte: Double, h0: Long, h1: Long,
      h2: Long, h3: Long)
  case class Resized(media_id: Long, fmt: String, orig_bytes: Long,
      new_bytes: Long, width: Int, height: Int, data: Array[Byte])

  /** Real JDK image codec. Every op is total: undecodable payloads yield
    * `ok = false` / zero metadata instead of a task failure, so one corrupt
    * blob in a 100 TB scan cannot kill the stage. */
  object ImageCodec {
    // stream decode without ImageIO's default temp-FILE cache: a 1000-task
    // executor hammering /tmp for every blob is a silent IO tax
    ImageIO.setUseCache(false)

    private def read(b: Array[Byte]): BufferedImage =
      if (b == null || b.isEmpty) null
      else try ImageIO.read(new ByteArrayInputStream(b))
      catch { case _: Exception => null }

    /** Integer BT.601 luminance in [0,255] — exact, no float rounding. */
    @inline private def lum(rgb: Int): Int =
      (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
        (rgb & 0xff) * 114) / 1000

    /** Deterministic synthetic image encoded in `fmt`: dimensions and
      * pixels are pure functions of the seed bytes (the document text), so
      * the media column is stable across runs/partitionings while being a
      * genuine compressed container ImageIO must really parse back. */
    def encode(fmt: String, seed: Array[Byte]): Array[Byte] = {
      val b = if (seed == null || seed.isEmpty) Array[Byte](0) else seed
      val w = 16 + ((b(0) & 0xff) % 24)
      val h = 16 + ((b(b.length - 1) & 0xff) % 24)
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = b((y * w + x) % b.length) & 0xff
          // spread the byte across channels with positional variation so
          // histograms aren't degenerate single-bucket spikes
          val r = v
          val g = (v + 5 * x) & 0xff
          val bl = (v + 11 * y) & 0xff
          img.setRGB(x, y, (r << 16) | (g << 8) | bl)
          x += 1
        }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }

    def decode(m: Media): Decoded = {
      val n = if (m.data == null) 0L else m.data.length.toLong
      val img = read(m.data)
      if (img == null) Decoded(m.media_id, m.fmt, 0, 0, n, ok = false)
      else Decoded(m.media_id, m.fmt, img.getWidth, img.getHeight, n, ok = true)
    }

    /** Pixel-level features: mean luminance + 4-bucket luminance histogram
      * over the DECODED pixels (not the compressed bytes). */
    def features(m: Media): Features = {
      val img = read(m.data)
      if (img == null) return Features(m.media_id, 0.0, 0L, 0L, 0L, 0L)
      val (w, h) = (img.getWidth, img.getHeight)
      var sum = 0L
      val hist = new Array[Long](4)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val l = lum(img.getRGB(x, y))
          sum += l
          hist(l >> 6) += 1
          x += 1
        }
        y += 1
      }
      Features(m.media_id, sum.toDouble / (w.toLong * h),
        hist(0), hist(1), hist(2), hist(3))
    }

    /** Real thumbnail: rescale to <= targetPixels total (aspect preserved,
      * nearest-neighbor — deterministic across JVMs, unlike area-averaging)
      * and re-encode as PNG (lossless, deterministic bytes). */
    def resize(m: Media, targetPixels: Int): Resized = {
      val n = if (m.data == null) 0L else m.data.length.toLong
      val img = read(m.data)
      if (img == null) return Resized(m.media_id, m.fmt, n, 0L, 0, 0, Array.empty)
      val (w, h) = (img.getWidth, img.getHeight)
      val scale = math.min(1.0, math.sqrt(targetPixels.toDouble / (w.toLong * h)))
      val nw = math.max(1, (w * scale).toInt)
      val nh = math.max(1, (h * scale).toInt)
      val out = new BufferedImage(nw, nh, BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
        RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
      g.drawImage(img, 0, 0, nw, nh, null)
      g.dispose()
      val bos = new ByteArrayOutputStream()
      ImageIO.write(out, "png", bos)
      val bytes = bos.toByteArray
      Resized(m.media_id, m.fmt, n, bytes.length.toLong, nw, nh, bytes)
    }
  }

  /** Opaque-blob media table from `documents`: payload = utf-8 bytes of the
    * text. The stats + frame-sampling gates treat media as uninterpreted
    * bytes (the video case), and this mapping is byte-expressible in the
    * oracle dialect, so `q_mm_stats` hash-checks it end to end. */
  private def media(s: SparkSession, dir: String): DataFrame =
    Tables.df(s, dir, "documents").select(
      col("doc_id").as("media_id"),
      element_at(lit(Array("jpeg", "png", "webp")), (col("doc_id") % 3 + 1).cast("int")).as("fmt"),
      encode(col("text"), "utf-8").as("data"))

  /** Real-image media table: one genuine PNG/JPEG/BMP container per
    * document (all three formats the JDK both writes and reads), encoded
    * per-partition. The decode-family gates consume THESE bytes. */
  private def mediaImages(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.df(s, dir, "documents")
      .select(col("doc_id").as("media_id"),
        element_at(lit(Array("jpeg", "png", "bmp")), (col("doc_id") % 3 + 1).cast("int")).as("fmt"),
        encode(col("text"), "utf-8").as("seed"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, fmt, seed) =>
        Media(id, fmt, ImageCodec.encode(fmt, seed)) })
      .toDF()
  }

  val all: Map[String, Q] = Map(

    // ---- byte-level media stats: the ORACLE-CHECKED member of the
    // multimodal family. Payload sizes/grouping are pure byte arithmetic
    // both engines express (octet_length over the same utf-8 encoding),
    // so unlike the codec gates this one hash-checks end to end — it pins
    // the media mapping (id/fmt/payload) the rows-only gates build on ----
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

    // ---- decode geometry: the ORACLE-CHECKED slice of the decode gate.
    // The encoder derives width/height from the seed text's first/last
    // byte (ImageCodec.encode: 16 + b(0)%24, 16 + b(last)%24) — pure byte
    // arithmetic the oracle dialect can replicate, even though pixel
    // decode itself can't be. The Spark side still runs the REAL ImageIO
    // container parse, so a hash match pins that a genuine PNG/JPEG/BMP
    // round-trips exactly the geometry the encoder wrote ----
    "q_mm_decode_dims" -> Q(
      (s, dir) => {
        import s.implicits._
        mediaImages(s, dir).as[Media]
          .mapPartitions(_.map(ImageCodec.decode))
          .toDF()
          .select(col("media_id"), col("fmt"),
            col("width").cast("int").as("width"),
            col("height").cast("int").as("height"),
            col("ok").cast("int").as("ok"))
          .orderBy(col("media_id"))
      },
      // first/last BYTE of the utf-8 encoding (hex-sliced from the blob),
      // not the first/last CHARACTER: ascii() would read the code point,
      // which diverges from the encoder's seed bytes the moment a
      // non-ASCII character appears; NULL text encodes from the [0]
      // fallback seed → 16×16
      Some("""SELECT doc_id AS media_id,
             |  CASE CAST(doc_id % 3 AS INT)
             |    WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'bmp' END AS fmt,
             |  CAST(16 + (CASE WHEN text IS NULL OR octet_length(encode(text)) = 0 THEN 0
             |    ELSE ('0x' || substr(hex(encode(text)), 1, 2))::INT END % 24) AS INT) AS width,
             |  CAST(16 + (CASE WHEN text IS NULL OR octet_length(encode(text)) = 0 THEN 0
             |    ELSE ('0x' || substr(hex(encode(text)), octet_length(encode(text)) * 2 - 1, 2))::INT END % 24) AS INT) AS height,
             |  CAST(1 AS INT) AS ok
             |FROM documents ORDER BY media_id""".stripMargin)),

    // ---- decode: per-partition batch container parse (real ImageIO) ----
    "q_mm_decode" -> Q(
      (s, dir) => {
        import s.implicits._
        mediaImages(s, dir).as[Media]
          .mapPartitions(_.map(ImageCodec.decode))
          .toDF()
          .orderBy(col("media_id"))
      }, None),

    // ---- feature extraction: luminance mean + histogram per image ----
    "q_mm_features" -> Q(
      (s, dir) => {
        import s.implicits._
        mediaImages(s, dir).as[Media]
          .mapPartitions(_.map(ImageCodec.features))
          .toDF()
          .orderBy(col("media_id"))
      }, None),

    // ---- resize: per-partition batch thumbnail to a pixel budget ----
    "q_mm_resize" -> Q(
      (s, dir) => {
        import s.implicits._
        mediaImages(s, dir).as[Media]
          .mapPartitions(_.map(ImageCodec.resize(_, targetPixels = 64)))
          .toDF()
          .select(col("media_id"), col("fmt"), col("orig_bytes"),
            col("new_bytes"), col("width"), col("height"),
            md5(col("data")).as("data_md5"))
          .orderBy(col("media_id"))
      }, None),

    // ---- frame sampling: every 64-byte window's 16-byte head, pure
    // codegen over the opaque payload (the video-keyframe shape — no
    // decode needed to segment a container into fixed-offset samples).
    // The payload column rides through the explode — re-joining media to
    // re-fetch `data` would add a whole shuffle join for nothing ----
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
