package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Multimodal

/** Exact-value checks for the multimodal plumbing (no SQL oracle exists for
  * byte-level ops, so assertions live here instead of the driver gate). */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("decode stub: typed metadata from binary payloads, deterministic") {
    val df = Multimodal.all("q_mm_decode").fn(spark, dir)
    assert(df.columns.toSeq == Seq("media_id", "fmt", "width", "height", "n_bytes", "ok"))
    val rows = df.limit(3).collect()
    assert(rows.nonEmpty && rows.forall(_.getBoolean(5)))
    // deterministic: same input -> same metadata on re-run
    val again = Multimodal.all("q_mm_decode").fn(spark, dir).limit(3).collect()
    assert(rows.map(_.toSeq.toList).toSeq == again.map(_.toSeq.toList).toSeq)
    // width/height derived from payload bytes stay in the declared range
    rows.foreach { r =>
      assert(r.getInt(2) >= 64 && r.getInt(2) < 256)
      assert(r.getInt(3) >= 64 && r.getInt(3) < 256)
    }
  }

  test("features: histogram buckets partition the byte count") {
    val df = Multimodal.all("q_mm_features").fn(spark, dir)
    val r = df.limit(5).collect()
    r.foreach { row =>
      val total = row.getLong(2) + row.getLong(3) + row.getLong(4) + row.getLong(5)
      assert(total > 0)
      assert(row.getDouble(1) > 0 && row.getDouble(1) < 256)
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

  test("resize stub: byte budget respected, deterministic, shrinking") {
    val df = Multimodal.all("q_mm_resize").fn(spark, dir)
    assert(df.columns.toSeq ==
      Seq("media_id", "fmt", "orig_bytes", "new_bytes", "data_md5"))
    val rows = df.limit(10).collect()
    rows.foreach { r =>
      assert(r.getLong(3) <= 64L, "resized payload exceeds the byte budget")
      assert(r.getLong(3) <= r.getLong(2))
    }
  }

  test("golden hashes: full 500-row outputs are byte-stable") {
    // the driver gate has no oracle for byte-level ops; these digests pin
    // the exact output of every multimodal operator at sf0.001
    val d = digest(Multimodal.all("q_mm_decode").fn(spark, dir))
    val f = digest(Multimodal.all("q_mm_features").fn(spark, dir))
    val fr = digest(Multimodal.all("q_mm_frames").fn(spark, dir))
    val rz = digest(Multimodal.all("q_mm_resize").fn(spark, dir))
    assert((d, f, fr, rz) == (
      "32aa279214cf5f14b3ff5d8cf0452295",
      "0c5afa4398105b4b8829df18fbd7ce57",
      "b415d8d6e8d38428da6cb79b930a5b9a",
      "cdbab9c2bd7de8392b9be921235218a9"),
      s"digests: decode=$d features=$f frames=$fr resize=$rz")
  }

  test("frame sampling: frame count tracks payload length") {
    val media = spark.read.parquet(s"$dir/documents.parquet")
    val expected = media.selectExpr("sum(cast((length(text) - 1) / 64 as bigint) + 1)")
      .head().getLong(0)
    val df = Multimodal.all("q_mm_frames").fn(spark, dir)
    assert(df.count() == expected)
    assert(df.columns.toSeq == Seq("media_id", "frame_no", "frame_md5"))
  }
}
