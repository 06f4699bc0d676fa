package graft

import java.nio.file.{Files, Path}

import scala.collection.mutable

/** Temp directories that clean themselves up at JVM exit.
  *
  * The correctness/bench harnesses build real stream stores, backups and
  * checkpoints under /tmp on every run; leaving them behind compounds
  * across runs (hundreds of MB of parquet) and measurably skews later
  * benchmark numbers on this machine. Every engine- or test-created temp
  * dir goes through here so one shutdown hook sweeps them all. */
object TempDirs {

  private val created = mutable.ArrayBuffer.empty[Path]

  Runtime.getRuntime.addShutdownHook(new Thread(() => sweep(), "graft-tempdir-sweep"))

  def create(prefix: String): Path = synchronized {
    val p = Files.createTempDirectory(prefix)
    created += p
    p
  }

  /** Eagerly delete one registered dir (best-effort) and drop it from the
    * exit sweep. For artifacts a long-lived session re-creates per call
    * (e.g. a gate query's throwaway dedup index) waiting for JVM exit
    * accumulates disk — release them as soon as their consumers have
    * materialized. */
  def release(root: Path): Unit = synchronized {
    try {
      import scala.jdk.CollectionConverters._
      Files.walk(root).iterator().asScala.toVector.reverseIterator
        .foreach(p => try Files.deleteIfExists(p) catch { case _: Exception => })
    } catch { case _: Exception => }
    created -= root
  }

  /** Best-effort recursive delete of everything created so far. */
  def sweep(): Unit = synchronized {
    created.foreach { root =>
      try {
        import scala.jdk.CollectionConverters._
        Files.walk(root).iterator().asScala.toVector.reverseIterator
          .foreach(p => try Files.deleteIfExists(p) catch { case _: Exception => })
      } catch { case _: Exception => }
    }
    created.clear()
  }
}
