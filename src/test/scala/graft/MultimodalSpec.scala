package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Multimodal
import graft.queries.Multimodal.{ImageCodec, Media}

/** Exact-value checks for the multimodal operators (no SQL oracle exists
  * for image codecs, so assertions live here instead of the driver gate).
  * The codec itself is pinned against a hand-authored PNG with known RGB
  * values — bytes built from the PNG spec, not by ImageIO — so a decoder
  * regression cannot hide behind an encode/decode round-trip. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  /** 2x2 RGB PNG, hand-assembled from the spec (IHDR/IDAT/IEND + CRCs):
    * pixels (255,0,0) (0,255,0) / (0,0,255) (255,255,255). */
  private val pinnedPng: Array[Byte] = Array(
    0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, 0x00, 0x00, 0x00, 0x0d,
    0x49, 0x48, 0x44, 0x52, 0x00, 0x00, 0x00, 0x02, 0x00, 0x00, 0x00, 0x02,
    0x08, 0x02, 0x00, 0x00, 0x00, 0xfd, 0xd4, 0x9a, 0x73, 0x00, 0x00, 0x00,
    0x12, 0x49, 0x44, 0x41, 0x54, 0x78, 0x9c, 0x63, 0xf8, 0xcf, 0xc0, 0xc0,
    0x00, 0xc2, 0x0c, 0xff, 0x81, 0x00, 0x00, 0x1f, 0xee, 0x05, 0xfb, 0x0b,
    0xd9, 0x68, 0x8b, 0x00, 0x00, 0x00, 0x00, 0x49, 0x45, 0x4e, 0x44, 0xae,
    0x42, 0x60, 0x82).map(_.toByte)

  test("codec decodes a spec-pinned PNG to known dimensions and RGB values") {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(pinnedPng))
    assert(img != null && img.getWidth == 2 && img.getHeight == 2)
    assert((img.getRGB(0, 0) & 0xffffff) == 0xff0000)
    assert((img.getRGB(1, 0) & 0xffffff) == 0x00ff00)
    assert((img.getRGB(0, 1) & 0xffffff) == 0x0000ff)
    assert((img.getRGB(1, 1) & 0xffffff) == 0xffffff)
    val d = ImageCodec.decode(Media(7L, "png", pinnedPng))
    assert(d == Multimodal.Decoded(7L, "png", 2, 2, pinnedPng.length.toLong, ok = true))
  }

  test("codec features on the pinned PNG: exact luminance histogram") {
    // BT.601 integer luminance: red=76, green=149, blue=29, white=255
    // buckets (lum >> 6): 29->0, 76->1, 149->2, 255->3; mean=(76+149+29+255)/4
    val f = ImageCodec.features(Media(7L, "png", pinnedPng))
    assert(f == Multimodal.Features(7L, (76 + 149 + 29 + 255) / 4.0, 1L, 1L, 1L, 1L))
  }

  test("codec is total: garbage and empty payloads decode to ok=false") {
    assert(!ImageCodec.decode(Media(1L, "png", Array[Byte](1, 2, 3))).ok)
    assert(!ImageCodec.decode(Media(2L, "png", Array.empty[Byte])).ok)
    assert(!ImageCodec.decode(Media(3L, "png", null)).ok)
    assert(ImageCodec.features(Media(4L, "png", Array[Byte](9))) ==
      Multimodal.Features(4L, 0.0, 0L, 0L, 0L, 0L))
    val r = ImageCodec.resize(Media(5L, "png", Array[Byte](9)), 64)
    assert(r.new_bytes == 0L && r.width == 0 && r.height == 0)
  }

  test("encode/decode round-trip across all three container formats") {
    val seed = "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")
    for (fmt <- Seq("png", "jpeg", "bmp")) {
      val bytes = ImageCodec.encode(fmt, seed)
      assert(bytes.nonEmpty)
      val d = ImageCodec.decode(Media(1L, fmt, bytes))
      assert(d.ok, s"$fmt payload failed to decode")
      // dimensions are a pure function of the seed, independent of format
      assert(d.width == 16 + (seed(0) & 0xff) % 24)
      assert(d.height == 16 + (seed(seed.length - 1) & 0xff) % 24)
      // PNG is lossless: decoded pixels must equal the synthesized pattern
      if (fmt == "png") {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        val v = seed((1 * d.width + 2) % seed.length) & 0xff
        val expected = (v << 16) | (((v + 5 * 2) & 0xff) << 8) | ((v + 11 * 1) & 0xff)
        assert((img.getRGB(2, 1) & 0xffffff) == expected)
      }
    }
  }

  test("decode gate: real container metadata for every document") {
    val df = Multimodal.all("q_mm_decode").fn(spark, dir)
    assert(df.columns.toSeq ==
      Seq("media_id", "fmt", "width", "height", "container_bytes", "ok"))
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getInt(5) == 1), "every synthesized image must decode")
    rows.foreach { r =>
      // dimensions come from the real decoder and stay in the synth range
      assert(r.getInt(2) >= 16 && r.getInt(2) < 40)
      assert(r.getInt(3) >= 16 && r.getInt(3) < 40)
      // the bmp leg reports its REAL container size (oracle-predicted);
      // png/jpeg sizes are codec output, digest-pinned below
      if (r.getString(1) == "bmp") assert(r.getLong(4) > 54L)
      else assert(r.isNullAt(4))
    }
  }

  test("features gate: histogram buckets partition the pixel count") {
    val dec = Multimodal.all("q_mm_decode").fn(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getInt(2).toLong * r.getInt(3))).toMap
    val rows = Multimodal.all("q_mm_features").fn(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { row =>
      val total = row.getLong(3) + row.getLong(4) + row.getLong(5) + row.getLong(6)
      assert(total == row.getLong(1), "histogram must cover every pixel exactly once")
      assert(total == dec(row.getLong(0)), "n_px must equal the decoded w*h")
      assert(row.getLong(2) <= 255L * row.getLong(1), "sum_lum bounded by 255 per pixel")
    }
  }

  /** Stable digest of a deterministic-ordered result (nulls and floats
    * rendered explicitly). */
  private def digest(df: org.apache.spark.sql.DataFrame): String = {
    val s = df.collect().map(_.toSeq.map {
      case null => ""
      case other => other.toString
    }.mkString("|")).mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("resize gate: pixel budget respected, real re-encoded thumbnails") {
    val df = Multimodal.all("q_mm_resize").fn(spark, dir)
    assert(df.columns.toSeq ==
      Seq("media_id", "fmt", "orig_w", "orig_h", "width", "height", "thumb_ok"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getInt(4).toLong * r.getInt(5) <= 64L, "thumbnail exceeds the pixel budget")
      assert(r.getInt(4) > 0 && r.getInt(5) > 0)
      assert(r.getInt(6) == 1, "thumbnail is a real PNG payload")
    }
    // the thumbnail itself decodes, at the declared dimensions
    val seed = "round trip".getBytes("UTF-8")
    val rz = ImageCodec.resize(Media(1L, "png", ImageCodec.encode("png", seed)), 64)
    val back = ImageCodec.decode(Media(1L, "png", rz.data))
    assert(back.ok && back.width == rz.width && back.height == rz.height)
  }

  test("thumbnail payloads are byte-stable (digest over real re-encodes)") {
    // the gate's oracle pins geometry; the PNG payload bytes themselves
    // are codec output, so pin them here with a digest over the same
    // encode→resize pipeline the gate runs
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, element_at, encode => enc, lit, md5}
    val thumbs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("media_id"),
        element_at(lit(Array("jpeg", "png", "bmp")), (col("doc_id") % 3 + 1).cast("int")).as("fmt"),
        enc(col("text"), "utf-8").as("seed"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, fmt, seed) =>
        Media(id, fmt, ImageCodec.encode(fmt, seed)) })
      .mapPartitions(_.map(ImageCodec.resize(_, targetPixels = 64)))
      .toDF()
      .select(col("media_id"), md5(col("data")).as("m"))
      .orderBy(col("media_id"))
    assert(digest(thumbs) == "0f678030fd69fad663bfea149cf12173",
      s"thumbnail digest drifted: ${digest(thumbs)}")
  }

  test("all-format features digest pins the lossy JPEG pixel path") {
    // the q_mm_features GATE filters to the lossless legs (those are
    // oracle-checked); the JPEG DCT-decode feature path must stay pinned
    // somewhere, so digest featuresEx over ALL formats here
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, element_at, encode => enc, lit}
    val feats = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("media_id"),
        element_at(lit(Array("jpeg", "png", "bmp")), (col("doc_id") % 3 + 1).cast("int")).as("fmt"),
        enc(col("text"), "utf-8").as("seed"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, fmt, seed) =>
        Media(id, fmt, ImageCodec.encode(fmt, seed)) })
      .mapPartitions(_.map(ImageCodec.featuresEx))
      .toDF()
      .orderBy(col("media_id"))
    assert(digest(feats) == "d103b4abd194f895afd4439e13207976",
      s"all-format features digest drifted: ${digest(feats)}")
  }

  test("golden hashes: full 500-row outputs are byte-stable") {
    // the driver gate has no oracle for image codecs; these digests pin
    // the exact output of every multimodal operator at sf0.001
    val d = digest(Multimodal.all("q_mm_decode").fn(spark, dir))
    val f = digest(Multimodal.all("q_mm_features").fn(spark, dir))
    val fr = digest(Multimodal.all("q_mm_frames").fn(spark, dir))
    val rz = digest(Multimodal.all("q_mm_resize").fn(spark, dir))
    assert((d, f, fr, rz) == (
      "0ae0a2eb71b68c04beff26c3fb95a7cc",
      "1a4d551d907b2dffd79a9e80cb44da72",
      "7bf1b2d8fbbf9339aaac3e4206d0945d",
      "e030def2f54e2e1a51020a14ee314445"),
      s"digests: decode=$d features=$f frames=$fr resize=$rz")
  }

  test("frame sampling: frame count tracks payload length") {
    val media = spark.read.parquet(s"$dir/documents.parquet")
    val expected = media.selectExpr("sum(cast((length(text) - 1) / 64 as bigint) + 1)")
      .head().getLong(0)
    val df = Multimodal.all("q_mm_frames").fn(spark, dir)
    assert(df.count() == expected)
    assert(df.columns.toSeq == Seq("media_id", "frame_no", "frame_head"))
  }

  test("audio codec: hand-derived WAV round-trips header and samples") {
    import graft.queries.Multimodal.AudioCodec
    val seed = "ab".getBytes("utf-8") // b(0)=97 -> n = 256 + 388 = 644
    val bytes = AudioCodec.encode(seed)
    // canonical header: RIFF size = 36 + data, PCM mono 8kHz 16-bit
    assert(new String(bytes.slice(0, 4)) == "RIFF")
    assert(new String(bytes.slice(8, 12)) == "WAVE")
    assert(bytes.length == 44 + 644 * 2)
    val info = AudioCodec.decode(7L, bytes)
    assert(info.ok && info.channels == 1 && info.sample_rate == 8000 &&
      info.bits == 16 && info.n_samples == 644 &&
      info.duration_us == 644L * 1000000 / 8000)
    // first two samples by hand: (97*211 + 0) % 65536 - 32768, then
    // seed byte 'b'=98: (98*211 + 97) % 65536 - 32768
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bb.getShort(44).toInt == (97 * 211) % 65536 - 32768)
    assert(bb.getShort(46).toInt == (98 * 211 + 97) % 65536 - 32768)
  }

  test("audio codec is total: truncated and wrong-magic payloads reject") {
    import graft.queries.Multimodal.AudioCodec
    assert(!AudioCodec.decode(1L, null).ok)
    assert(!AudioCodec.decode(1L, Array.fill[Byte](10)(1)).ok)
    val good = AudioCodec.encode("xyz".getBytes)
    val corrupt = good.clone(); corrupt(0) = 'X'.toByte
    assert(!AudioCodec.decode(1L, corrupt).ok)
    // features on a rejected payload are zeroed, not thrown
    val f = AudioCodec.features(1L, corrupt)
    assert(f.n_samples == 0L && f.sumsq == 0L)
  }

  test("crafted chunk length near 2^31 cannot wrap the bounds check") {
    import graft.queries.Multimodal.{AudioCodec, VideoCodec}
    // a positive len close to Int.MaxValue makes pos+8+len wrap negative
    // in Int arithmetic; the walk must reject it (Long-arithmetic guard),
    // not advance to a negative offset and throw out of the next read
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val evil = "RIFF".getBytes ++ le32(Int.MaxValue - 3) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(Int.MaxValue - 20) ++ Array.fill[Byte](64)(0)
    assert(!AudioCodec.decode(1L, evil).ok)
    val f = AudioCodec.features(1L, evil)
    assert(f.n_samples == 0L && f.sumsq == 0L)
    val evilAvi = "RIFF".getBytes ++ le32(Int.MaxValue - 3) ++ "AVI ".getBytes ++
      "LIST".getBytes ++ le32(Int.MaxValue - 20) ++ Array.fill[Byte](64)(0)
    assert(!VideoCodec.decode(1L, evilAvi).ok)
    assert(VideoCodec.frames(1L, evilAvi).forall(!_.ok))
  }

  test("stereo WAV rejects: decode's domain matches features' mono math") {
    import graft.queries.Multimodal.AudioCodec
    val good = AudioCodec.encode("mono".getBytes)
    assert(AudioCodec.decode(1L, good).ok)
    // patch the fmt chunk's channel count (offset 22) to 2: features
    // would misread interleaved samples as a mono run, so decode must
    // reject multi-channel input outright
    val stereo = good.clone(); stereo(22) = 2
    assert(!AudioCodec.decode(1L, stereo).ok)
    assert(AudioCodec.features(1L, stereo).n_samples == 0L)
  }

  test("video codec: AVI header fields and frame chunks round-trip") {
    import graft.queries.Multimodal.VideoCodec
    val seed = "hello".getBytes("utf-8") // len 5 -> 2 + 5%5 = 2 frames
    val bytes = VideoCodec.encode(seed)
    assert(new String(bytes.slice(0, 4)) == "RIFF")
    assert(new String(bytes.slice(8, 12)) == "AVI ")
    val info = VideoCodec.decode(9L, bytes)
    // dims from ImageCodec's formulas: 'h'=104 -> 16+104%24=16+8=24;
    // 'o'=111 -> 16+111%24=16+15=31
    assert(info.ok && info.width == 24 && info.height == 31)
    assert(info.declared_frames == 2 && info.actual_frames == 2)
    // every frame is a REAL JPEG the image codec can parse, at the
    // stream dims, and frames differ (per-frame pixel variation)
    val fs = VideoCodec.frames(9L, bytes)
    assert(fs.length == 2 && fs.forall(f => f.ok && f.width == 24 && f.height == 31))
  }

  test("video codec is total: wrong magic and declared/actual mismatch reject") {
    import graft.queries.Multimodal.VideoCodec
    assert(!VideoCodec.decode(1L, null).ok)
    assert(!VideoCodec.decode(1L, "RIFFxxxxWAVE".getBytes).ok)
    val good = VideoCodec.encode("abcdefgh".getBytes)
    val corrupt = good.clone(); corrupt(9) = 'X'.toByte // break 'AVI '
    assert(!VideoCodec.decode(1L, corrupt).ok)
  }

  test("audio features: energy and crossings match a scala re-derivation") {
    import graft.queries.Multimodal.AudioCodec
    val seed = "hello world".getBytes("utf-8")
    val f = AudioCodec.features(3L, AudioCodec.encode(seed))
    val n = AudioCodec.nSamples(seed)
    val samples = (0 until n).map(AudioCodec.sample(seed, _))
    assert(f.n_samples == n.toLong)
    assert(f.peak == samples.map(s => math.abs(s.toLong)).max)
    assert(f.sumsq == samples.map(s => s.toLong * s).sum)
    assert(f.zero_cross == samples.sliding(2)
      .count(p => p(0).toLong * p(1) < 0))
  }
}
