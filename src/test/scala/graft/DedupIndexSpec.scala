package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Dedup

/** The persisted dedup index's durability contract: an append that dies
  * between artifact writes must be DETECTED at the next load (not
  * silently miss near-dups), and an index grown past a derivation knee
  * must SIGNAL that a rebuild would now derive a different banding r.
  */
class DedupIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  /** n synthetic docs with ids starting at `base`: ~400 chars each so the
    * 5-gram/stride-2 shingler has real material. */
  private def docs(n: Int, base: Long = 0L): DataFrame =
    spark.range(n).select(
      (col("id") + base).as("doc_id"),
      concat_ws(" ", (0 until 12).map(i =>
        md5(concat(col("id") + base, lit(i)))): _*).as("text"))

  private def hfs(dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  test("an append that died between artifact writes is refused at load") {
    val idxDir = TempDirs.create("graft-idx-torn").toString
    Dedup.buildDedupIndex(spark, docs(200), idxDir)
    // a committed index round-trips
    assert(Dedup.readIndexMeta(spark, idxDir).batches == 1)
    // simulate the kill: an appendDedupIndex writes fp/batch=1 then
    // shingles/batch=1 then bands/batch=1 then commits meta — die after
    // the SHINGLES write. The on-disk state is exactly two artifacts
    // holding an uncommitted batch=1 while bands and meta never saw it.
    val (fs, root) = hfs(idxDir)
    for (art <- Seq("fp", "shingles")) {
      org.apache.hadoop.fs.FileUtil.copy(
        fs, new org.apache.hadoop.fs.Path(root, s"$art/batch=0"),
        fs, new org.apache.hadoop.fs.Path(root, s"$art/batch=1"),
        false, spark.sparkContext.hadoopConfiguration)
    }
    val e1 = intercept[IllegalArgumentException] {
      Dedup.readIndexMeta(spark, idxDir)
    }
    assert(e1.getMessage.contains("TORN"))
    // every READ path refuses, not just the raw meta read
    intercept[IllegalArgumentException] {
      Dedup.incrementVsIndex(spark, docs(10, base = 5000), idxDir)
    }
    // recovery path 1 (the r13 ADVICE fix): RE-RUNNING the append sweeps
    // the dead attempt's partial batch at entry and commits cleanly —
    // previously the strict refusal deadlocked the retry forever
    Dedup.appendDedupIndex(spark, docs(10, base = 5000), idxDir)
    val recovered = Dedup.readIndexMeta(spark, idxDir)
    assert(recovered.batches == 2 && recovered.count == 210)
    // the recommitted batch=1 is the RETRY's 10 docs, not the dead
    // attempt's copied 200
    assert(spark.read.parquet(s"$idxDir/shingles/batch=1").count() == 10)
    // recovery path 2: a rebuild sweeps everything and loads clean
    Dedup.buildDedupIndex(spark, docs(200), idxDir)
    assert(Dedup.readIndexMeta(spark, idxDir).batches == 1)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "fp/batch=1")))
    TempDirs.release(java.nio.file.Paths.get(idxDir))
  }

  test("a committed append is visible and the increment sees its docs") {
    val idxDir = TempDirs.create("graft-idx-append").toString
    Dedup.buildDedupIndex(spark, docs(200), idxDir)
    Dedup.appendDedupIndex(spark, docs(50, base = 1000), idxDir)
    val m = Dedup.readIndexMeta(spark, idxDir)
    assert(m.batches == 2 && m.count == 250)
    // a fresh doc duplicating an APPENDED doc's text must classify exact
    val fresh = docs(50, base = 1000)
      .select((col("doc_id") + 9000).as("doc_id"), col("text"))
    val v = Dedup.incrementVsIndex(spark, fresh, idxDir).collect()
    assert(v.forall(_.getString(1) == "exact"))
    TempDirs.release(java.nio.file.Paths.get(idxDir))
  }

  test("reband answers the stale signal from index artifacts alone") {
    val idxDir = TempDirs.create("graft-idx-reband").toString
    Dedup.buildDedupIndex(spark, docs(3000), idxDir)
    Dedup.appendDedupIndex(spark, docs(1500, base = 100000), idxDir)
    assert(Dedup.dedupIndexStale(spark, idxDir))
    // the r-independent artifacts must survive the re-band byte-untouched
    val (fs, root) = hfs(idxDir)
    def treeBytes(art: String): Long = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(root, art), true)
      var sum = 0L
      while (it.hasNext) { val f = it.next(); if (!f.getPath.getName.startsWith("_")) sum += f.getLen }
      sum
    }
    val (fpBefore, shBefore) = (treeBytes("fp"), treeBytes("shingles"))
    assert(Dedup.rebandDedupIndex(spark, idxDir) == 4)
    val m = Dedup.readIndexMeta(spark, idxDir)
    assert(m.r == 4 && !m.stale && m.batches == 2 && m.count == 4500)
    assert(treeBytes("fp") == fpBefore && treeBytes("shingles") == shBefore,
      "re-band must not rewrite the r-independent artifacts")
    // idempotent once the derivation is current
    assert(Dedup.rebandDedupIndex(spark, idxDir) == 4)
    // the rebanded bands/ must carry EXACTLY the banding a full rebuild
    // at the same count derives — proving the stored shingle arrays are
    // a sufficient derivation input (the corpus text added nothing)
    // the re-band committed a new VERSIONED generation via the meta
    // pointer; the displaced flat tree is retained for in-flight readers
    val bandsDir = Dedup.readIndexMeta(spark, idxDir).bandsDir
    assert(bandsDir == "bands.v1", s"pointer did not flip: $bandsDir")
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(idxDir, "bands")),
      "displaced generation must be retained one cycle")
    val rebandBands = spark.read.parquet(s"$idxDir/$bandsDir")
      .select("doc_id", "band_id", "bh").collect().map(_.toString).sorted
    val refDir = TempDirs.create("graft-idx-reband-ref").toString
    Dedup.buildDedupIndex(
      spark, docs(3000).unionAll(docs(1500, base = 100000)), refDir)
    val rebuildBands = spark.read.parquet(s"$refDir/bands")
      .select("doc_id", "band_id", "bh").collect().map(_.toString).sorted
    assert(rebandBands.sameElements(rebuildBands),
      "re-banded bands differ from a fresh rebuild's banding")
    // end-to-end: the rebanded index still classifies exact AND near dups
    // against both the original and the appended batch
    val exactDups = docs(20, base = 2000).unionAll(docs(20, base = 100500))
      .select((col("doc_id") + 500000).as("doc_id"), col("text"))
    assert(Dedup.incrementVsIndex(spark, exactDups, idxDir)
      .collect().forall(_.getString(1) == "exact"))
    val nearDups = docs(20, base = 2500).unionAll(docs(20, base = 101000))
      .select((col("doc_id") + 600000).as("doc_id"),
        concat(col("text"), lit(" tail")).as("text"))
    assert(Dedup.incrementVsIndex(spark, nearDups, idxDir)
      .collect().forall(_.getString(1) == "near"))
    TempDirs.release(java.nio.file.Paths.get(idxDir))
    TempDirs.release(java.nio.file.Paths.get(refDir))
  }

  test("a re-band that crashed before its meta commit leaves the live " +
    "index fully serviceable — no refuse-window, debris swept on retry") {
    // the round-13 pointer-flip property: the staged bands tree is
    // unreferenced until the atomic meta rewrite, so a crash mid-staging
    // changes NOTHING for readers (the old protocol's crash state made
    // every load refuse until an operator intervened)
    val idxDir = TempDirs.create("graft-idx-rebandcrash").toString
    Dedup.buildDedupIndex(spark, docs(3000), idxDir)
    Dedup.appendDedupIndex(spark, docs(1500, base = 100000), idxDir)
    assert(Dedup.dedupIndexStale(spark, idxDir))
    // manufacture the crash: a half-written staged generation on disk,
    // meta untouched
    val staged = java.nio.file.Paths.get(idxDir, "bands.v1")
    java.nio.file.Files.createDirectories(staged)
    java.nio.file.Files.write(staged.resolve("junk.parquet"),
      Array[Byte](1, 2, 3))
    // the live index still loads and still classifies — zero impact
    val m = Dedup.readIndexMeta(spark, idxDir)
    assert(m.bandsDir == "bands" && m.r == 3)
    val probe = docs(10, base = 2000)
      .select((col("doc_id") + 700000).as("doc_id"), col("text"))
    assert(Dedup.incrementVsIndex(spark, probe, idxDir)
      .collect().forall(_.getString(1) == "exact"))
    // retrying the re-band sweeps the debris and commits the real tree
    assert(Dedup.rebandDedupIndex(spark, idxDir) == 4)
    val m2 = Dedup.readIndexMeta(spark, idxDir)
    assert(m2.r == 4 && m2.bandsDir == "bands.v1" && !m2.stale)
    assert(Dedup.incrementVsIndex(spark, probe, idxDir)
      .collect().forall(_.getString(1) == "exact"))
    TempDirs.release(java.nio.file.Paths.get(idxDir))
  }

  test("growing past the 4096-doc derivation knee raises the stale signal") {
    val idxDir = TempDirs.create("graft-idx-stale").toString
    // build below the knee: r derives to 3
    Dedup.buildDedupIndex(spark, docs(3000), idxDir)
    assert(Dedup.readIndexMeta(spark, idxDir).r == 3)
    assert(!Dedup.dedupIndexStale(spark, idxDir))
    // append across the knee: count 4500 wants r=4, pinned r stays 3
    Dedup.appendDedupIndex(spark, docs(1500, base = 100000), idxDir)
    val grown = Dedup.readIndexMeta(spark, idxDir)
    assert(grown.count == 4500 && grown.r == 3)
    assert(Dedup.dedupIndexStale(spark, idxDir))
    // a stale index still answers CORRECTLY (banding stayed consistent):
    // dups of both the original build and the appended batch classify
    val fresh = docs(20, base = 2000)                 // dup of build batch
      .unionAll(docs(20, base = 100500)               // dup of appended batch
        .select(col("doc_id"), col("text")))
      .select((col("doc_id") + 500000).as("doc_id"), col("text"))
    assert(Dedup.incrementVsIndex(spark, fresh, idxDir)
      .collect().forall(_.getString(1) == "exact"))
    // the rebuild the signal asks for re-derives r at the grown count
    Dedup.buildDedupIndex(
      spark, docs(3000).unionAll(docs(1500, base = 100000)), idxDir)
    val rebuilt = Dedup.readIndexMeta(spark, idxDir)
    assert(rebuilt.r == 4 && !rebuilt.stale && rebuilt.count == 4500)
    assert(Dedup.incrementVsIndex(spark, fresh, idxDir)
      .collect().forall(_.getString(1) == "exact"))
    TempDirs.release(java.nio.file.Paths.get(idxDir))
  }

  test("format gate: a pre-format-key meta over the per-doc (fp, doc_id) " +
    "layout loads; a genuine (fp, dup_of) layout refuses with the rebuild " +
    "message") {
    val idxDir = TempDirs.create("graft-idx-fmt").toString
    Dedup.buildDedupIndex(spark, docs(120), idxDir)
    // strip the format key — exactly what a meta written before the key
    // existed looks like for an index ALREADY in the per-doc layout (the
    // layout predates the key); such an index must not be forced into an
    // O(corpus) rebuild by a misleading format-1 refusal
    val metaP = java.nio.file.Paths.get(idxDir, "meta.json")
    val body = new String(java.nio.file.Files.readAllBytes(metaP),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(body.contains("\"format\": 2"))
    java.nio.file.Files.write(metaP,
      body.replace("\"format\": 2, ", "")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // the rewrite bypassed Hadoop's ChecksumFileSystem — drop the stale
    // .crc sidecar so the read sees the edited meta, not a checksum error
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(idxDir, ".meta.json.crc"))
    assert(Dedup.readIndexMeta(spark, idxDir).batches == 1,
      "a missing format key resolves by the fp artifact's own schema")
    // a GENUINE format-1 index: fp rows are (fp, dup_of) — the loud
    // refusal stays for the layout increment probes cannot resolve
    val (fs, root) = hfs(idxDir)
    fs.delete(new org.apache.hadoop.fs.Path(root, "fp"), true)
    spark.range(5).select(col("id").as("fp"), col("id").as("dup_of"))
      .write.parquet(s"$idxDir/fp/batch=0")
    val e = intercept[IllegalArgumentException](
      Dedup.readIndexMeta(spark, idxDir))
    assert(e.getMessage.contains("rebuild required"))
    TempDirs.release(java.nio.file.Paths.get(idxDir))
  }

  test("format gate honesty (verdict r16 finding 2): a transient storage " +
    "failure during the missing-key schema probe surfaces as the IO error " +
    "it is, never as a misleading format-1 rebuild prescription") {
    val idxDir = TempDirs.create("graft-idx-fmtio").toString
    Dedup.buildDedupIndex(spark, docs(120), idxDir)
    // pre-format-key meta: the gate must fall back to the fp schema probe
    val metaP = java.nio.file.Paths.get(idxDir, "meta.json")
    val body = new String(java.nio.file.Files.readAllBytes(metaP),
      java.nio.charset.StandardCharsets.UTF_8)
    java.nio.file.Files.write(metaP,
      body.replace("\"format\": 2, ", "")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(idxDir, ".meta.json.crc"))
    // inject the storage failure INSIDE the probe: corrupt every fp
    // parquet footer (truncated garbage under the same file names — what
    // a torn disk or a mid-flight FS error presents to the reader). The
    // stale .crc sidecars go too, so the failure is the footer read, not
    // a local-FS checksum artifact of the test's own rewrite.
    val fpDir = java.nio.file.Paths.get(idxDir, "fp", "batch=0")
    val files = java.nio.file.Files.list(fpDir)
    try {
      import scala.jdk.CollectionConverters._
      files.iterator().asScala.toList.foreach { p =>
        val n = p.getFileName.toString
        if (n.endsWith(".crc")) java.nio.file.Files.delete(p)
        else if (n.endsWith(".parquet"))
          java.nio.file.Files.write(p, Array[Byte](0x50, 0x41, 0x52))
      }
    } finally files.close()
    def messages(t: Throwable): String =
      if (t == null) "" else t.toString + "\n" + messages(t.getCause)
    val e = intercept[Throwable](Dedup.readIndexMeta(spark, idxDir))
    assert(!messages(e).contains("rebuild required"),
      s"an IO failure must not be prescribed an O(corpus) rebuild:\n" +
        messages(e))
    assert(!e.isInstanceOf[IllegalArgumentException],
      s"the probe failure must propagate, not refuse: ${messages(e)}")
    TempDirs.release(java.nio.file.Paths.get(idxDir))
  }
}
