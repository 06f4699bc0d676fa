package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.drisl.DValue
import graft.drisl.DValue._
import graft.drisl.Drisl
import graft.stream._
import graft.types._

/** Hostile-input tests for the reference-archive import path — the same
  * discipline the ws/msgpack/drisl wire decoders already have. Every case
  * must fail with a clean error (no hang, no OOM, no zero-padded decode)
  * and leave NO partially-created stream behind. */
class ArchiveFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private lazy val store = new StreamStore(spark,
    graft.TempDirs.create("graft-afz").toString)

  private def zstd(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new com.github.luben.zstd.ZstdOutputStream(bos)
    try z.write(b) finally z.close()
    bos.toByteArray
  }

  private def metaBytes(did: String): Array[Byte] = Drisl.encode(obj(
    "did" -> text(did), "did_key" -> DNull,
    "owners" -> DArray(Vector.empty), "module_cid" -> DNull))

  private def eventObj(i: Long, user: String = "u"): DMap = obj(
    "idx" -> int(i), "user" -> text(user),
    "payload" -> DBytes(Array[Byte](1)), "signature" -> DBytes(Array.empty[Byte]))

  private def archiveOf(events: DValue*): Array[Byte] =
    zstd(Drisl.encode(obj("events" -> DArray(events.toVector))))

  /** Build a bucket dir with the given archive files + metadata. */
  private def bucket(did: String, files: (String, Array[Byte])*): java.nio.file.Path = {
    val dirP = graft.TempDirs.create("graft-afz-bkt")
    val sdir = dirP.resolve(s"streams/$did")
    java.nio.file.Files.createDirectories(sdir)
    java.nio.file.Files.write(sdir.resolve("metadata.drisl"), metaBytes(did))
    files.foreach { case (n, b) => java.nio.file.Files.write(sdir.resolve(n), b) }
    dirP
  }

  private def importOf(dirP: java.nio.file.Path, did: String,
      batchRows: Int = 100000, maxDecompressed: Long = 8L << 30,
      maxValue: Int = 64 << 20, maxObject: Long = 1L << 30) =
    BackupService.importReference(store, s"$did-local", "file:" + dirP, did,
      batchRows, maxDecompressed, maxValue, maxObject)

  private def assertClean(did: String): Unit =
    assert(!store.exists(s"$did-local"),
      s"failed import must not leave stream $did-local behind")

  test("malformed range names are ignored; a valid chain still imports") {
    val did = "did:fz:names"
    val dirP = bucket(did,
      "1-2.events.drisl.zstd" -> archiveOf(eventObj(1), eventObj(2)),
      "junk.events.drisl.zstd" -> Array[Byte](1, 2, 3),
      "5-x.events.drisl.zstd" -> Array[Byte](1),
      "1-2-3.events.drisl.zstd" -> Array[Byte](1),
      "notanarchive.txt" -> Array[Byte](1))
    val (r, _) = importOf(dirP, did)
    assert(r.latest == 2L, "junk names must be skipped, not break the chain")
  }

  test("an inverted range name ([10,5]) is rejected") {
    val did = "did:fz:inv"
    val dirP = bucket(did, "10-5.events.drisl.zstd" -> archiveOf(eventObj(10)))
    val e = intercept[IllegalArgumentException](importOf(dirP, did))
    assert(e.getMessage.contains("invalid backup range"), e.getMessage)
    assertClean(did)
  }

  test("truncated zstd fails cleanly after partial import, stream cleaned up") {
    val did = "did:fz:trunc"
    val whole = archiveOf(eventObj(3), eventObj(4))
    val dirP = bucket(did,
      "1-2.events.drisl.zstd" -> archiveOf(eventObj(1), eventObj(2)),
      "3-4.events.drisl.zstd" -> whole.take(whole.length / 2))
    intercept[Exception](importOf(dirP, did))
    assertClean(did)
  }

  test("idx gap inside an object is rejected with a precise message") {
    val did = "did:fz:gap"
    val dirP = bucket(did,
      "1-3.events.drisl.zstd" -> archiveOf(eventObj(1), eventObj(3), eventObj(3)))
    val e = intercept[IllegalArgumentException](importOf(dirP, did))
    assert(e.getMessage.contains("gap or duplicate inside the object"), e.getMessage)
    assertClean(did)
  }

  test("an object whose event count disagrees with its name is rejected") {
    val did = "did:fz:count"
    val dirP = bucket(did,
      "1-3.events.drisl.zstd" -> archiveOf(eventObj(1), eventObj(2)))
    val e = intercept[IllegalArgumentException](importOf(dirP, did))
    assert(e.getMessage.contains("claims 2 events for 3 idx slots"), e.getMessage)
    assertClean(did)
  }

  test("an event without idx is rejected") {
    val did = "did:fz:noidx"
    val dirP = bucket(did, "1-1.events.drisl.zstd" -> zstd(Drisl.encode(
      obj("events" -> DArray(Vector(obj("user" -> text("u"))))))))
    val e = intercept[IllegalArgumentException](importOf(dirP, did))
    assert(e.getMessage.contains("event without idx"), e.getMessage)
    assertClean(did)
  }

  test("an archive without an events array is rejected") {
    val did = "did:fz:noev"
    val dirP = bucket(did,
      "1-1.events.drisl.zstd" -> zstd(Drisl.encode(obj("other" -> int(1)))))
    val e = intercept[IllegalArgumentException](importOf(dirP, did))
    assert(e.getMessage.contains("no events array"), e.getMessage)
    assertClean(did)
    // and a non-map envelope
    val did2 = "did:fz:notmap"
    val dirP2 = bucket(did2, "1-1.events.drisl.zstd" -> zstd(Drisl.encode(int(7))))
    intercept[Exception](importOf(dirP2, did2))
    assertClean(did2)
  }

  test("zstd bomb: decompressed-size cap stops a tiny object that expands huge") {
    val did = "did:fz:bomb"
    // 4 MB of zeros zstd-compresses to ~300 bytes; cap at 1 MB
    val bomb = zstd(Drisl.encode(obj("events" -> DArray(Vector(obj(
      "idx" -> int(1), "user" -> text("u"),
      "payload" -> DBytes(new Array[Byte](4 << 20)),
      "signature" -> DBytes(Array.empty[Byte])))))))
    assert(bomb.length < 10000, "fixture should be a genuinely tiny bomb")
    val dirP = bucket(did, "1-1.events.drisl.zstd" -> bomb)
    val e = intercept[IllegalArgumentException](
      importOf(dirP, did, maxDecompressed = 1 << 20))
    assert(e.getMessage.contains("decompresses past"), e.getMessage)
    assertClean(did)
  }

  test("forged state.db.zstd hits the whole-object cap, never an OOM") {
    // the whole-object paths (state.db.zstd, module blobs, metadata)
    // materialize ONE driver array, so their cap is separate from (and far
    // below) the streamed event path's: the cap exception must fire during
    // bounded decompression, before any array near the claimed size exists
    val did = "did:fz:statebomb"
    val dirP = bucket(did, "1-1.events.drisl.zstd" -> archiveOf(eventObj(1)))
    val bomb = zstd(new Array[Byte](4 << 20)) // 4 MB of zeros, ~300 B packed
    assert(bomb.length < 10000, "fixture should be a genuinely tiny bomb")
    java.nio.file.Files.write(
      dirP.resolve(s"streams/$did").resolve("state.db.zstd"), bomb)
    val e = intercept[IllegalArgumentException](
      importOf(dirP, did, maxObject = 1 << 20))
    assert(e.getMessage.contains("decompresses past"), e.getMessage)
    assertClean(did)
    // a cap past the JVM array ceiling is refused up front — it could
    // never fail cleanly, readAllBytes would OOM first
    val e2 = intercept[IllegalArgumentException](
      importOf(dirP, did, maxObject = 4L << 30))
    assert(e2.getMessage.contains("array"), e2.getMessage)
    assertClean(did)
  }

  test("a single oversized value is capped independently of the total") {
    val did = "did:fz:bigval"
    val dirP = bucket(did, "1-1.events.drisl.zstd" -> archiveOf(obj(
      "idx" -> int(1), "user" -> text("u"),
      "payload" -> DBytes(new Array[Byte](4096)),
      "signature" -> DBytes(Array.empty[Byte]))))
    val e = intercept[IllegalArgumentException](
      importOf(dirP, did, maxValue = 1024))
    assert(e.getMessage.contains("exceeds the 1024-byte cap"), e.getMessage)
    assertClean(did)
  }

  test("malformed metadata is rejected before any stream state exists") {
    // non-map metadata
    val dirP = graft.TempDirs.create("graft-afz-meta")
    val sdir = dirP.resolve("streams/did:fz:meta")
    java.nio.file.Files.createDirectories(sdir)
    java.nio.file.Files.write(sdir.resolve("metadata.drisl"), Drisl.encode(int(3)))
    java.nio.file.Files.write(sdir.resolve("1-1.events.drisl.zstd"),
      archiveOf(eventObj(1)))
    val e = intercept[IllegalArgumentException](
      importOf(dirP, "did:fz:meta"))
    assert(e.getMessage.contains("not a map"), e.getMessage)
    assertClean("did:fz:meta")
    // malformed did_key shapes
    for ((bad, label) <- Seq(
        (obj("did" -> text("did:fz:key"), "did_key" -> int(5),
          "owners" -> DArray(Vector.empty)), "int"),
        (obj("did" -> text("did:fz:key"),
          "did_key" -> obj("P256" -> DBytes(Array[Byte](1, 2)),
            "K256" -> DBytes(Array[Byte](3))),
          "owners" -> DArray(Vector.empty)), "two-variant"),
        (obj("did" -> text("did:fz:key"),
          "did_key" -> obj("X999" -> DBytes(new Array[Byte](32))),
          "owners" -> DArray(Vector.empty)), "unknown kind"))) {
      val dp = graft.TempDirs.create("graft-afz-key")
      val sd = dp.resolve("streams/did:fz:key")
      java.nio.file.Files.createDirectories(sd)
      java.nio.file.Files.write(sd.resolve("metadata.drisl"), Drisl.encode(bad))
      java.nio.file.Files.write(sd.resolve("1-1.events.drisl.zstd"),
        archiveOf(eventObj(1)))
      val err = intercept[IllegalArgumentException](importOf(dp, "did:fz:key"))
      assert(err.getMessage.toLowerCase.contains("did_key") ||
        err.getMessage.contains("32 bytes"), s"$label: ${err.getMessage}")
      assertClean("did:fz:key")
    }
  }
}
