package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.fs.{Path => HPath}
import graft.stream.{PointerCommit, PosixRenameCommit, VersionedPutCommit}

/** The pluggable pointer-commit primitive (verdict r13 item 3): the
  * manifest/meta flip must be atomic to readers under BOTH POSIX-rename
  * semantics and object-store semantics where rename is copy+delete (and
  * an interrupted PUT leaves a torn object). This spec turns SCALE.md's
  * "the protocol carries over unchanged to a conditional put" claim into
  * tested code: the versioned primitive never renames at all, and
  * readers provably never observe a torn pointer across all four
  * artifact families.
  */
class CommitPrimitiveSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def io(dir: String, name: String = "meta.json") = {
    val p = new HPath(dir, name)
    (p.getFileSystem(new org.apache.hadoop.conf.Configuration()), p)
  }

  private def utf8(b: Array[Byte]) =
    new String(b, java.nio.charset.StandardCharsets.UTF_8)

  test("versioned put: round-trip, monotone versions, one retained " +
    "generation, migration from a posix-layout pointer") {
    val dir = TempDirs.create("graft-vput").toString
    val (fs, p) = io(dir)
    // migration: a pointer last committed by the posix impl still reads
    PosixRenameCommit.publish(fs, p, "posix-gen".getBytes)
    assert(VersionedPutCommit.readCurrent(fs, p).map(utf8).contains("posix-gen"))
    VersionedPutCommit.publish(fs, p, "v1".getBytes)
    // the plain file is retired once a versioned commit exists
    assert(!fs.exists(p), "legacy plain pointer must retire at first versioned commit")
    assert(VersionedPutCommit.readCurrent(fs, p).map(utf8).contains("v1"))
    VersionedPutCommit.publish(fs, p, "v2".getBytes)
    VersionedPutCommit.publish(fs, p, "v3".getBytes)
    assert(VersionedPutCommit.readCurrent(fs, p).map(utf8).contains("v3"))
    // retention: current + one displaced, older swept
    val gens = fs.listStatus(new HPath(dir)).map(_.getPath.getName)
      .filter(_.startsWith("meta.json.g")).sorted
    assert(gens.length == 2, s"retention should keep exactly 2: ${gens.toSeq}")
    VersionedPutCommit.delete(fs, p)
    assert(VersionedPutCommit.readCurrent(fs, p).isEmpty)
  }

  test("a torn higher version (interrupted PUT / the copy phase of a " +
    "copy+delete rename) is fallen past, then lapped by the next commit") {
    val dir = TempDirs.create("graft-vput-torn").toString
    val (fs, p) = io(dir)
    VersionedPutCommit.publish(fs, p, "good-1".getBytes)
    // hand-write the torn states a non-atomic rename can leave behind:
    // (a) a truncated envelope — the copy died mid-payload
    val goodEnvelope = {
      val body = "good-2-never-committed".getBytes
      val crc = new java.util.zip.CRC32(); crc.update(body)
      s"ptrv1 ${crc.getValue} ${body.length}\n".getBytes ++ body
    }
    val torn = goodEnvelope.take(goodEnvelope.length - 7)
    val t1 = new HPath(dir, "meta.json.g000777")
    val o1 = fs.create(t1, false); o1.write(torn); o1.close()
    // (b) garbage bytes with no envelope at an even higher version
    val t2 = new HPath(dir, "meta.json.g000778")
    val o2 = fs.create(t2, false); o2.write("not-an-envelope".getBytes); o2.close()
    // readers fall past both to the last complete version
    assert(VersionedPutCommit.readCurrent(fs, p).map(utf8).contains("good-1"),
      "reader observed a torn pointer")
    // the next commit versions PAST the torn debris and wins
    VersionedPutCommit.publish(fs, p, "good-3".getBytes)
    assert(VersionedPutCommit.readCurrent(fs, p).map(utf8).contains("good-3"))
  }

  test("concurrent publisher + readers: every read is a complete " +
    "committed value, versions never run backwards") {
    val dir = TempDirs.create("graft-vput-conc").toString
    val (fs, p) = io(dir)
    VersionedPutCommit.publish(fs, p, "n=0".getBytes)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val bad = new java.util.concurrent.atomic.AtomicReference[String](null)
    val readers = (1 to 4).map { _ =>
      new Thread(() => {
        var last = -1L
        while (!stop.get() && bad.get() == null) {
          VersionedPutCommit.readCurrent(fs, p).map(utf8) match {
            case Some(s) if s.startsWith("n=") =>
              val n = s.stripPrefix("n=").toLong
              if (n < last) bad.set(s"version ran backwards: $last -> $n")
              last = n
            case Some(other) => bad.set(s"torn/alien read: $other")
            case None => bad.set("pointer vanished mid-run")
          }
        }
      })
    }
    readers.foreach(_.start())
    (1 to 40).foreach(n => VersionedPutCommit.publish(fs, p, s"n=$n".getBytes))
    stop.set(true)
    readers.foreach(_.join(10000L))
    assert(bad.get() == null, String.valueOf(bad.get()))
    assert(VersionedPutCommit.readCurrent(fs, p).map(utf8).contains("n=40"))
  }

  test("all four artifact families commit and read through the versioned " +
    "primitive: build/append/maintain under object-store semantics, torn " +
    "debris never observed") {
    import org.apache.spark.sql.functions._
    val src = "/root/testdata/sf0.001"
    sys.props("graft.commit.primitive") = "versioned"
    try {
      // ---- vector family: MANIFEST as versioned objects ----
      val vidx = TempDirs.create("graft-os-vec").toString
      graft.queries.Similarity.buildVectorIndex(spark, src, vidx)
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(vidx, "MANIFEST")),
        "versioned mode must not write a plain MANIFEST")
      val (vfs, vmf) = io(vidx, "MANIFEST")
      assert(vfs.listStatus(new HPath(vidx)).map(_.getPath.getName)
        .exists(_.startsWith("MANIFEST.g")), "no versioned manifest object")
      val info0 = graft.queries.Similarity.vectorIndexInfo(spark, vidx)
      assert(info0("vectors").asInstanceOf[Long] > 0)
      // torn manifest debris (crashed copy) above the live version
      val tornV = new HPath(vidx, "MANIFEST.g999999")
      val ov = vfs.create(tornV, false); ov.write("vector-index-man".getBytes); ov.close()
      val snap = graft.queries.Similarity.resolveAll(vidx)
      assert(spark.read.parquet(snap("vectors")).count() ==
        info0("vectors").asInstanceOf[Long], "torn manifest changed resolution")
      // the next maintenance commit flips PAST the torn object
      graft.queries.Similarity.compactVectorIndex(spark, vidx)
      assert(graft.queries.Similarity.vectorIndexInfo(spark, vidx)("vectors") ==
        info0("vectors"))
      // the DELETE verb commits through the versioned primitive too:
      // tombstone flip, then the purge compaction — all conditional puts
      graft.queries.Similarity.deleteFromVectorIndex(spark, Seq(1L, 2L, 3L), vidx)
      val vDel = graft.queries.Similarity.vectorIndexInfo(spark, vidx)
      assert(vDel("tombstones") == 3L &&
        vDel("live") == info0("vectors").asInstanceOf[Long] - 3L)
      val vPurged = graft.queries.Similarity.compactVectorIndex(spark, vidx)
      assert(vPurged("tombstones") == 0L &&
        vPurged("vectors") == info0("vectors").asInstanceOf[Long] - 3L)

      // ---- lexical family ----
      val lidx = TempDirs.create("graft-os-lex").toString
      val built = graft.queries.Retrieval.buildLexicalIndex(spark, src, lidx)
      import spark.implicits._
      val inc = (0 until 15).map(i => (800000L + i, s"osput doc $i"))
        .toDF("doc_id", "text")
      val app = graft.queries.Retrieval.appendLexicalIndex(spark, inc, lidx)
      assert(app("docs") == built("docs") + 15)
      val (lfs, lmp) = io(lidx)
      val tornL = new HPath(lidx, "meta.json.g999999")
      val ol = lfs.create(tornL, false); ol.write("{\"batches\":".getBytes); ol.close()
      assert(graft.queries.Retrieval.lexicalIndexInfo(spark, lidx)("docs") ==
        built("docs") + 15, "lexical reader observed torn meta")
      graft.queries.Retrieval.compactLexicalIndex(spark, lidx)
      assert(graft.queries.Retrieval.lexicalIndexInfo(spark, lidx)("docs") ==
        built("docs") + 15)
      // lexical delete under the versioned primitive: the corrected
      // df/stats + tombstones all land through conditional puts
      val lDel = graft.queries.Retrieval.deleteFromLexicalIndex(spark,
        (0 until 5).map(i => 800000L + i).toDF("doc_id"), lidx)
      assert(lDel("deleted") == 5L && lDel("docs") == built("docs") + 10)
      assert(graft.queries.Retrieval.lexicalIndexInfo(spark, lidx)(
        "tombstones") == 5L)

      // ---- mixture family ----
      val midx = TempDirs.create("graft-os-mix").toString
      val mb = graft.queries.Pipeline.buildMixtureStats(spark, src, midx)
      val w0 = graft.queries.Pipeline.mixtureWeights(spark, midx).collect()
      val minc = (0 until 10).map(i => ("src0", s"osmix tok$i"))
        .toDF("source", "text")
      graft.queries.Pipeline.appendMixtureStats(spark, minc, midx)
      val w = graft.queries.Pipeline.mixtureWeights(spark, midx).collect()
      assert(w.nonEmpty && w.toSeq != w0.toSeq)
      val (mfs, _) = io(midx)
      val tornM = new HPath(midx, "meta.json.g999999")
      val om = mfs.create(tornM, false); om.write("ptrv1 1 99\n{".getBytes); om.close()
      assert(graft.queries.Pipeline.mixtureWeights(spark, midx).collect()
        .toSeq == w.toSeq, "mixture reader observed torn meta")
      // delete the exact increment under the versioned primitive: the
      // negative batch cancels it EXACTLY — served weights return to
      // the pre-append table bit for bit
      graft.queries.Pipeline.deleteMixtureStats(spark, minc, midx)
      assert(graft.queries.Pipeline.mixtureWeights(spark, midx).collect()
        .toSeq == w0.toSeq,
        "negative-batch delete did not cancel the append exactly")

      // ---- dedup family ----
      val didx = TempDirs.create("graft-os-dedup").toString
      val docs = spark.range(300).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 12).map(i =>
          md5(concat(col("id"), lit(i)))): _*).as("text"))
      graft.queries.Dedup.buildDedupIndex(spark, docs, didx)
      graft.queries.Dedup.appendDedupIndex(spark,
        spark.range(20).select((col("id") + 5000).as("doc_id"),
          concat_ws(" ", (0 until 12).map(i =>
            md5(concat(col("id") + 5000, lit(i)))): _*).as("text")), didx)
      val dm = graft.queries.Dedup.readIndexMeta(spark, didx)
      assert(dm.batches == 2 && dm.count == 320)
      val (dfs, _) = io(didx)
      val tornD = new HPath(didx, "meta.json.g999999")
      val od = dfs.create(tornD, false); od.write("ptrv1".getBytes); od.close()
      assert(graft.queries.Dedup.readIndexMeta(spark, didx).count == 320,
        "dedup reader observed torn meta")
      // dedup delete under the versioned primitive: live count and the
      // del pointer flip together through the conditional put
      val dDel = graft.queries.Dedup.deleteFromDedupIndex(spark,
        spark.range(10).select(col("id").as("doc_id")), didx)
      assert(dDel("deleted") == 10L && dDel("count") == 310L)
      assert(graft.queries.Dedup.readIndexMeta(spark, didx).count == 310)
    } finally sys.props.remove("graft.commit.primitive")
  }

  // ---------------- versioned claim takeover (round 16) ----------------

  /** An EXPIRED foreign claim — a crashed holder from another process. */
  private def expiredForeignClaim(idx: String, batch: Int): Unit = {
    val dir = java.nio.file.Paths.get(idx, "claims")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(dir.resolve(s"batch-$batch"),
      (java.util.UUID.randomUUID().toString + " " +
        (System.currentTimeMillis() - 16L * 60 * 1000))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  test("expired-claim takeover is ATOMIC: two simulated processes race " +
    "the takeover of one expired claim; exactly one holds, the loser " +
    "aborts loudly (no delete-then-create window)") {
    val idx = TempDirs.create("graft-claim-race").toString
    expiredForeignClaim(idx, batch = 1)
    // process B is simulated INSIDE process A's create call: the moment
    // A attempts create-if-absent of version g1, B's create lands first
    // — the exact interleaving the old delete-then-create takeover got
    // wrong (both would have believed they held the batch)
    val bToken = java.util.UUID.randomUUID().toString
    val injected = new java.util.concurrent.atomic.AtomicBoolean(false)
    def injectB(f: org.apache.hadoop.fs.Path): Unit =
      if (f.getName == "batch-1.g1" &&
          injected.compareAndSet(false, true))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(idx, "claims", "batch-1.g1"),
          s"$bToken ${System.currentTimeMillis()}"
            .getBytes(java.nio.charset.StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE_NEW)
    val racingFs = new org.apache.hadoop.fs.RawLocalFileSystem() {
      override def create(f: org.apache.hadoop.fs.Path,
          permission: org.apache.hadoop.fs.permission.FsPermission,
          overwrite: Boolean, bufferSize: Int, replication: Short,
          blockSize: Long, progress: org.apache.hadoop.util.Progressable)
          : org.apache.hadoop.fs.FSDataOutputStream = {
        injectB(f)
        super.create(f, permission, overwrite, bufferSize, replication,
          blockSize, progress)
      }
      override def create(f: org.apache.hadoop.fs.Path,
          overwrite: Boolean, bufferSize: Int, replication: Short,
          blockSize: Long, progress: org.apache.hadoop.util.Progressable)
          : org.apache.hadoop.fs.FSDataOutputStream = {
        injectB(f)
        super.create(f, overwrite, bufferSize, replication, blockSize,
          progress)
      }
    }
    racingFs.initialize(java.net.URI.create("file:///"),
      new org.apache.hadoop.conf.Configuration())
    val root = new HPath(idx)
    val e = intercept[IllegalStateException](
      PointerCommit.claimBatch(racingFs, root, 1))
    assert(e.getMessage.contains("claimed by another writer"),
      e.getMessage)
    // exactly one holder on disk: B's version g1, nothing above it
    val names = java.nio.file.Files.list(
      java.nio.file.Paths.get(idx, "claims")).toArray.map(_.toString)
      .map(p => p.substring(p.lastIndexOf('/') + 1)).sorted.toSeq
    assert(names == Seq("batch-1", "batch-1.g1"), names.toString)
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(idx, "claims", "batch-1.g1")),
      java.nio.charset.StandardCharsets.UTF_8).startsWith(bToken),
      "the winner's claim must be intact — never deleted by the loser")
  }

  test("fence: a claim superseded between staging and publish makes the " +
    "paused writer abort instead of absorbing the new holder's batch; " +
    "release prunes the token so the map stays bounded") {
    val idx = TempDirs.create("graft-claim-fence").toString
    val (fs, _) = io(idx)
    val root = new HPath(idx)
    PointerCommit.claimBatch(fs, root, 3)
    PointerCommit.verifyClaim(fs, root, 3) // live holder passes
    // another process's takeover (our lease expired while we paused):
    // a HIGHER version with a foreign token appears
    java.nio.file.Files.write(
      java.nio.file.Paths.get(idx, "claims", "batch-3.g2"),
      s"${java.util.UUID.randomUUID()} ${System.currentTimeMillis()}"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val e = intercept[IllegalStateException](
      PointerCommit.verifyClaim(fs, root, 3))
    assert(e.getMessage.contains("lost before the meta publish"),
      e.getMessage)
    // a released claim's token is pruned — verify refuses thereafter
    val idx2 = TempDirs.create("graft-claim-release").toString
    val root2 = new HPath(idx2)
    PointerCommit.claimBatch(fs, root2, 0)
    PointerCommit.verifyClaim(fs, root2, 0)
    PointerCommit.releaseClaim(root2, 0)
    val e2 = intercept[IllegalStateException](
      PointerCommit.verifyClaim(fs, root2, 0))
    assert(e2.getMessage.contains("no claim held"), e2.getMessage)
  }

  test("own-retake across versions: a failed in-process append's stale " +
    "claim is superseded immediately; the append then commits through " +
    "the fence") {
    val idx = TempDirs.create("graft-claim-retake").toString
    val (fs, _) = io(idx)
    val root = new HPath(idx)
    PointerCommit.claimBatch(fs, root, 2) // attempt 1, then "crash"
    PointerCommit.claimBatch(fs, root, 2) // the retry re-takes at g2
    PointerCommit.verifyClaim(fs, root, 2) // retry's token is the holder
    // committed numbers sweep every version and the token map entry
    PointerCommit.sweepClaims(fs, root, committedBatches = 3)
    assert(!java.nio.file.Files.list(
        java.nio.file.Paths.get(idx, "claims")).findAny().isPresent,
      "all versions of a committed batch's claim are debris")
    val e = intercept[IllegalStateException](
      PointerCommit.verifyClaim(fs, root, 2))
    assert(e.getMessage.contains("no claim held"), e.getMessage)
  }
}
