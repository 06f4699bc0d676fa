package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.drisl.DValue._
import graft.drisl.Drisl
import graft.stream.StreamStore
import graft.types._

/** Batch signing: one HMAC per accepted batch, stamped on every event;
  * empty signature without a key (reference: lib.rs:621-632). */
class SigningSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private lazy val store = new StreamStore(spark,
    graft.TempDirs.create("graft-sign").toString)

  private val module = ModuleDef(
    initSql = "CREATE TABLE IF NOT EXISTS noop (x BIGINT) USING PARQUET",
    queries = Map("all" -> QueryDef("SELECT idx FROM events ORDER BY idx")))

  private def payload(s: String): Array[Byte] = Drisl.encode(obj("v" -> text(s)))

  test("signed batches stamp one signature per batch; unsigned are empty") {
    val h = store.open("did:test:signing")
    h.setModule(module)
    h.addEvents(Seq(IncomingEvent("a", payload("unsigned"))))
    h.setSigningKey("secret-key".getBytes)
    h.addEvents(Seq(
      IncomingEvent("a", payload("s1")), IncomingEvent("b", payload("s2"))))
    h.addEvents(Seq(IncomingEvent("c", payload("s3"))))

    val rows = h.eventsDF.orderBy("idx").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]]("signature"))).toSeq
    assert(rows.map(_._1) == Seq(1L, 2L, 3L, 4L))
    assert(rows(0)._2.isEmpty, "pre-key event has empty signature")
    assert(rows(1)._2.length == 32 && rows(2)._2.length == 32)
    assert(rows(1)._2.sameElements(rows(2)._2),
      "events of one batch share the batch signature")
    assert(!rows(1)._2.sameElements(rows(3)._2),
      "different batches sign differently")
  }

  test("did_key round-trips a key-bearing bucket: restored stream signs again") {
    import graft.stream.BackupService
    val secret = java.security.MessageDigest.getInstance("SHA-256")
      .digest("stream-key-fixture".getBytes)
    val h = store.open("did:test:keyring")
    h.setModule(module)
    h.setSigningKey(secret)
    assert(h.addEvents(Seq(IncomingEvent("a", payload("k1")))).isRight)
    val dir = "file:" + graft.TempDirs.create("graft-keyring")
    // default export keeps custody: did_key is null in the bucket
    BackupService.exportReference(h, dir)
    val metaPath = java.nio.file.Paths.get(dir.stripPrefix("file:"))
      .resolve(s"streams/${h.id}/metadata.drisl")
    def metaDidKey(): graft.drisl.DValue = Drisl.decode(
      java.nio.file.Files.readAllBytes(metaPath)) match {
      case DMap(m) => m("did_key")
      case other => fail(s"metadata not a map: $other")
    }
    assert(metaDidKey() == DNull, "default export must not ship key material")
    // opt-in export ships it in the reference's enum shape (compare via
    // canonical encoding — DBytes holds an Array, which != by reference)
    BackupService.exportReference(h, dir,
      didKey = Some(BackupService.DidKey("K256", secret)))
    assert(Drisl.encode(metaDidKey()).toSeq ==
      Drisl.encode(obj("K256" -> DBytes(secret))).toSeq)
    // a LATER keyless export must preserve the shipped key, exactly like
    // the ownerless sweep preserves owners — not clobber it back to null
    BackupService.exportReference(h, dir)
    assert(Drisl.encode(metaDidKey()).toSeq ==
      Drisl.encode(obj("K256" -> DBytes(secret))).toSeq,
      "keyless re-export clobbered the bucket's key custody")
    val store2 = new StreamStore(spark,
      graft.TempDirs.create("graft-keyring-restore").toString)
    val (r, meta) = BackupService.importReference(
      store2, "did:test:keyring-local", dir, h.id)
    assert(meta.didKey.map(k => (k.kind, k.secret.toSeq)) ==
      Some(("K256", secret.toSeq)))
    // the restored stream signs appends with the bucket key — the batch
    // HMAC matches one computed with the same secret over the same body
    assert(r.addEvents(Seq(IncomingEvent("b", payload("k2")))).isRight)
    val sig = r.eventsDF.orderBy("idx").collect().last.getAs[Array[Byte]]("signature")
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(secret, "HmacSHA256"))
    val expected = mac.doFinal(Drisl.encode(DArray(Vector(obj(
      "user" -> text("b"), "payload" -> DBytes(payload("k2")))))))
    assert(sig.sameElements(expected),
      "restored stream must sign with the imported key")
    // PLC custody round-trip: a 32-byte scalar survives install/export
    val plc = new graft.server.LocalPlcDirectory
    plc.installKey("did:test:keyring", secret)
    assert(plc.custodiedSecret("did:test:keyring").map(_.toSeq) == Some(secret.toSeq))
  }
}
