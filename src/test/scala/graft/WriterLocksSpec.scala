package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.WriterLocks

/** The shared writer-lock registry (verdict r13 item 2): path aliases of
  * one index directory must resolve to ONE lock object, or two writers
  * could silently interleave their read-meta → stage → commit sequences.
  */
class WriterLocksSpec extends AnyFunSuite {

  test("file:-prefixed, relative, and trailing-slash aliases share one lock") {
    val base = java.nio.file.Files.createTempDirectory("wl").toAbsolutePath
    val canonical = s"$base/idx"
    val aliases = Seq(
      canonical,
      s"file:$canonical",
      s"$base/./idx",
      s"$base/idx/",
      s"$base/../${base.getFileName}/idx")
    val locks = aliases.map(WriterLocks.lockFor)
    aliases.zip(locks).foreach { case (a, l) =>
      assert(l eq locks.head, s"alias minted a distinct lock: $a") }
    assert(aliases.map(WriterLocks.key).distinct.size == 1)
  }

  test("distinct directories get distinct locks") {
    val base = java.nio.file.Files.createTempDirectory("wl").toAbsolutePath
    assert(WriterLocks.lockFor(s"$base/a") ne WriterLocks.lockFor(s"$base/b"))
  }

  test("mutual exclusion holds across aliases") {
    val base = java.nio.file.Files.createTempDirectory("wl").toAbsolutePath
    val dir = s"$base/idx"
    val inside = new java.util.concurrent.atomic.AtomicBoolean(false)
    val entered = new java.util.concurrent.CountDownLatch(1)
    val overlap = new java.util.concurrent.atomic.AtomicBoolean(false)
    val a = new Thread(() =>
      WriterLocks.lockFor(dir).synchronized {
        inside.set(true); entered.countDown()
        Thread.sleep(300L)
        inside.set(false)
      })
    val b = new Thread(() => {
      entered.await()
      WriterLocks.lockFor(s"file:$dir").synchronized {
        if (inside.get()) overlap.set(true)
      }
    })
    a.start(); b.start(); a.join(5000L); b.join(5000L)
    assert(!overlap.get(),
      "writer under the file: alias entered while the plain-path writer held the lock")
  }
}
