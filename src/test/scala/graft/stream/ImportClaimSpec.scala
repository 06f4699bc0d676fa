package graft.stream

import org.scalatest.funsuite.AnyFunSuite

import graft.types.ModuleDef

/** The store-level import claim (beginImport/endImport): the atomic
  * exists-check + create that makes the failed-import cleanup safe. While
  * a claim is held, client opens and creates of the id must fail loudly —
  * so the only stream state dropStream can ever delete under a claimed id
  * is state the import itself created (ADVICE round 6: without this, the
  * catch-all cleanup could destroy a concurrently created/appended
  * stream). */
class ImportClaimSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkFixture.spark
  private lazy val store = new StreamStore(spark,
    graft.TempDirs.create("graft-claim").toString)

  test("claimed id blocks client open and createStream until endImport") {
    val id = "did:claim:blocked"
    val h = store.beginImport(id)
    try {
      val e = intercept[IllegalStateException](store.open(id))
      assert(e.getMessage.contains("being restored"), e.getMessage)
      // createStream sees the import's cached handle through exists() and
      // rejects as a duplicate — loud either way, never an attach
      val e2 = intercept[Exception](store.createStream(id, ModuleDef()))
      assert(e2.getMessage.contains("being restored") ||
        e2.getMessage.contains("already exists"), e2.getMessage)
      // the import's own handle keeps working while the claim is held
      h.setModule(ModuleDef())
      assert(h.latest == 0L)
    } finally store.endImport(id)
    // after release the stream is an ordinary (created) stream again
    assert(store.open(id).latest == 0L)
    store.dropStream(id)
  }

  test("a second concurrent import of the same id fails fast") {
    val id = "did:claim:second"
    store.beginImport(id)
    try {
      val e = intercept[IllegalArgumentException](store.beginImport(id))
      assert(e.getMessage.contains("already in progress"), e.getMessage)
    } finally store.endImport(id)
    store.dropStream(id)
  }

  test("beginImport rejects an existing stream and leaves no claim behind") {
    val id = "did:claim:exists"
    store.createStream(id, ModuleDef())
    val e = intercept[IllegalArgumentException](store.beginImport(id))
    assert(e.getMessage.contains("not empty"), e.getMessage)
    // the failed claim must have been released: the stream stays usable
    assert(store.open(id).latest == 0L)
    store.dropStream(id)
  }
}
