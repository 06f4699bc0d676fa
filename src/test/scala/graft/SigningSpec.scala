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
}
