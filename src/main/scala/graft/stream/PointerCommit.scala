package graft.stream

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** The ONE pointer-commit primitive behind every maintained artifact
  * family's manifest/meta flip (vector MANIFEST, lexical/mixture/dedup
  * meta.json). A family commits by publishing a small pointer object
  * whose content names the complete artifact generation set; this trait
  * is the contract that publish must be ATOMIC TO READERS — a concurrent
  * reader sees either the complete previous pointer or the complete new
  * one, never torn bytes and never a missing object.
  *
  * Two implementations, selected by `-Dgraft.commit.primitive`:
  *
  *  - [[PosixRenameCommit]] (default): write-to-tmp + POSIX `rename(2)`,
  *    which is an atomic replace on every local/NFS/HDFS-style
  *    filesystem. What this engine has always done.
  *
  *  - [[VersionedPutCommit]]: for object stores where rename is
  *    COPY + DELETE (S3 and friends) and therefore NOT atomic — a crash
  *    mid-copy leaves a torn destination object. The protocol never
  *    rewrites in place: each commit is a conditional CREATE-IF-ABSENT
  *    put of an immutable, monotonically versioned object
  *    (`meta.json.g000007`) wrapped in a CRC32+length envelope; readers
  *    list the versions and resolve the HIGHEST one whose envelope
  *    verifies, falling past any torn partial. Create-if-absent is
  *    exactly S3's `If-None-Match: *` conditional PUT, so two racing
  *    committers can never both win one version number. The previous
  *    version is retained one cycle for in-flight readers (the same
  *    snapshot-isolation rule the artifact directories follow).
  *
  * This makes SCALE.md's "on a cluster object store the manifest rename
  * becomes a conditional put — the protocol carries over unchanged" a
  * tested code path instead of a claim: CommitPrimitiveSpec drives all
  * four families through [[VersionedPutCommit]] under simulated
  * torn-rename states.
  */
private[graft] trait PointerCommit {
  /** Atomically (to readers) publish `bytes` as the current pointer. */
  def publish(fs: FileSystem, p: HPath, bytes: Array[Byte]): Unit
  /** The current pointer's complete bytes, or None if never committed.
    * MUST never return torn bytes. */
  def readCurrent(fs: FileSystem, p: HPath): Option[Array[Byte]]
  /** Does a committed pointer exist? */
  def exists(fs: FileSystem, p: HPath): Boolean
  /** Remove the pointer entirely (a family rebuild's sweep). */
  def delete(fs: FileSystem, p: HPath): Unit
}

private[graft] object PointerCommit {
  /** The configured primitive. A system property rather than a
    * per-callsite parameter: the commit discipline is a deployment
    * property of the storage layer, not of any one index. */
  def default: PointerCommit =
    sys.props.get("graft.commit.primitive") match {
      case Some("versioned") => VersionedPutCommit
      case _ => PosixRenameCommit
    }

  /** How many DISPLACED generations every artifact family retains after
    * a commit flip (`-Dgraft.retain.generations`, default 1 — the
    * historical one-cycle snapshot isolation). Depth N makes the last N
    * history snapshots readable via the families' as-of reads — the
    * takedown-audit window ("what did this index answer before each of
    * the last N deletes?") — at the storage cost of N retained
    * generations per artifact. A deployment property of the storage
    * layer, like the commit primitive itself. */
  def retainGenerations: Int =
    math.max(1, sys.props.get("graft.retain.generations")
      .flatMap(_.toIntOption).getOrElse(1))

  // ---------------- cross-process writer lease (batch claims) ----------------
  //
  // The append-vs-append twin of the maintenance fileset re-list: the
  // pointer primitive makes the META flip safe across processes, but two
  // appends from DIFFERENT processes could both stage `batch=N`
  // (Overwrite-scoped) and the later meta publish would silently absorb
  // the earlier one's batch dir as its own — one append's rows lost. The
  // fix is to CLAIM the batch number through the same create-if-absent
  // primitive before staging a byte: exactly one writer can create the
  // immutable claim object `claims/batch-N`, so the loser aborts loudly
  // instead of silently losing rows. In-process writers still serialize
  // on WriterLocks first; the claim is the cross-process backstop.
  //
  // Liveness: a claim whose holder crashed before committing would
  // otherwise wedge the batch number forever. A claim older than the
  // lease TTL (`-Dgraft.commit.claim.ttl.ms`, default 15 min — far past
  // any append's staging time) is treated as dead and replaced; this is
  // the standard lease assumption (the holder of an expired lease must
  // not commit), and committed batch numbers never come up for claim
  // again, so expiry can only ever release a crashed append's number.

  private def claimTtlMs: Long =
    sys.props.get("graft.commit.claim.ttl.ms").map(_.toLong)
      .getOrElse(15L * 60 * 1000)

  // every claim this PROCESS ever issued: an append that failed after
  // claiming (materializer error, staging crash caught in-process) is
  // retried under the same WriterLocks mutex, so its own stale claim is
  // provably dead and re-takeable without waiting out the lease
  private val issuedClaims =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def claimPath(indexDir: HPath, batch: Int): HPath =
    new HPath(new HPath(indexDir, "claims"), s"batch-$batch")

  /** Claim `batch` of the index at `indexDir` for this writer. Throws
    * IllegalStateException when another LIVE writer holds the claim —
    * the caller must abort its append rather than stage over the
    * winner's batch. Idempotent-per-process-crash: an expired claim
    * (holder dead past the TTL) is swept and re-taken. */
  def claimBatch(fs: FileSystem, indexDir: HPath, batch: Int): Unit = {
    val p = claimPath(indexDir, batch)
    fs.mkdirs(p.getParent)
    val token = java.util.UUID.randomUUID().toString
    val body = s"$token ${System.currentTimeMillis()}"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var attempts = 0
    while (true) {
      try {
        val out = fs.create(p, false) // create-if-absent: one winner
        try { out.write(body) } finally out.close()
        issuedClaims.add(token)
        return
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
            _: java.nio.file.FileAlreadyExistsException =>
          val (holder, ageMs) = try {
            val in = fs.open(p)
            val raw = try in.readAllBytes() finally in.close()
            val parts = new String(raw,
              java.nio.charset.StandardCharsets.UTF_8).split(" ")
            (parts.headOption.getOrElse(""),
              System.currentTimeMillis() -
                parts.lastOption.flatMap(_.toLongOption).getOrElse(0L))
          } catch {
            case _: java.io.FileNotFoundException => ("", Long.MaxValue)
          }
          // our own earlier claim (a failed in-process attempt, provably
          // dead under WriterLocks) re-takes immediately; a FOREIGN
          // claim inside its lease aborts this append loudly
          if (!issuedClaims.contains(holder) && ageMs <= claimTtlMs)
            throw new IllegalStateException(
              s"batch $batch of $indexDir is claimed by another writer " +
                s"(claim age ${ageMs / 1000}s < lease " +
                s"${claimTtlMs / 1000}s) — a concurrent append from " +
                "another process is staging it; retry after it commits")
          // expired (or our own): the holder is dead — sweep and re-claim
          attempts += 1
          require(attempts <= 5,
            s"could not take over expired claim for batch $batch at $indexDir")
          try fs.delete(p, false)
          catch { case _: java.io.IOException => }
      }
    }
  }

  /** Drop the whole claims dir — a REBUILD resets batch numbering, so
    * every claim of the previous index is debris that would otherwise
    * block the new index's appends until the lease expired. */
  def clearClaims(fs: FileSystem, indexDir: HPath): Unit = {
    val dir = new HPath(indexDir, "claims")
    if (fs.exists(dir)) fs.delete(dir, true)
  }

  /** Drop claims for batch numbers the meta has already committed —
    * nobody claims a number below `committedBatches` again, so they are
    * pure debris. Called at append entry under the writer lock. */
  def sweepClaims(fs: FileSystem, indexDir: HPath,
      committedBatches: Int): Unit = {
    val dir = new HPath(indexDir, "claims")
    if (!fs.exists(dir)) return
    fs.listStatus(dir).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("batch-") &&
          n.stripPrefix("batch-").toIntOption.exists(_ < committedBatches))
        try fs.delete(st.getPath, false)
        catch { case _: java.io.IOException => }
    }
  }
}

/** tmp + atomic rename — POSIX semantics (the historical layout: the
  * pointer lives at its plain path). */
private[graft] object PosixRenameCommit extends PointerCommit {
  def publish(fs: FileSystem, p: HPath, bytes: Array[Byte]): Unit =
    BackupService.atomicWrite(fs, p, bytes)
  def readCurrent(fs: FileSystem, p: HPath): Option[Array[Byte]] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(in.readAllBytes()) finally in.close()
    }
  def exists(fs: FileSystem, p: HPath): Boolean = fs.exists(p)
  def delete(fs: FileSystem, p: HPath): Unit =
    if (fs.exists(p)) fs.delete(p, false)
}

/** Immutable versioned objects + create-if-absent — object-store
  * semantics. Never relies on rename at all. */
private[graft] object VersionedPutCommit extends PointerCommit {
  private val header = "ptrv1"

  private def envelope(bytes: Array[Byte]): Array[Byte] = {
    val crc = new java.util.zip.CRC32()
    crc.update(bytes)
    (s"$header ${crc.getValue} ${bytes.length}\n"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)) ++ bytes
  }

  /** Parse + verify an envelope; None for torn/foreign bytes. */
  private def unwrap(raw: Array[Byte]): Option[Array[Byte]] = {
    val nl = raw.indexOf('\n'.toByte)
    if (nl < 0) return None
    val head = new String(raw, 0, nl,
      java.nio.charset.StandardCharsets.UTF_8).split(" ")
    if (head.length != 3 || head(0) != header) return None
    for {
      crcWant <- head(1).toLongOption
      len <- head(2).toIntOption
      if raw.length - nl - 1 == len // a torn copy truncates the payload
      body = java.util.Arrays.copyOfRange(raw, nl + 1, raw.length)
      crc = { val c = new java.util.zip.CRC32(); c.update(body); c }
      if crc.getValue == crcWant
    } yield body
  }

  private def gens(fs: FileSystem, p: HPath): Seq[(Long, HPath)] = {
    val dir = p.getParent
    val prefix = s"${p.getName}.g"
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath)
      .filter(_.getName.startsWith(prefix))
      .flatMap(q => q.getName.stripPrefix(prefix).toLongOption.map(_ -> q))
      .sortBy(_._1)
  }

  def publish(fs: FileSystem, p: HPath, bytes: Array[Byte]): Unit = {
    fs.mkdirs(p.getParent)
    val payload = envelope(bytes)
    var g = gens(fs, p).lastOption.map(_._1).getOrElse(0L) + 1
    var committed = false
    // only version-taken (already-exists) means "retry the next number";
    // any other IOException is a real storage failure (permissions,
    // quota, FS down) and must propagate instead of spinning forever —
    // a bounded tolerance of a few listed-stale collisions is all a
    // racing committer can legitimately cause
    var collisions = 0
    while (!committed) {
      val target = new HPath(p.getParent, f"${p.getName}.g$g%06d")
      try {
        // the conditional put: create-if-absent (overwrite = false) is
        // S3's If-None-Match PUT — a racing committer loses this version
        // number and retries the next, so versions are never rewritten
        val out = fs.create(target, false)
        try { out.write(payload) } finally out.close()
        committed = true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
            _: java.nio.file.FileAlreadyExistsException =>
          collisions += 1
          if (collisions > 1000) throw new java.io.IOException(
            s"pointer commit at $p lost $collisions straight version " +
              "races — a runaway committer is monopolizing the pointer")
          g += 1
      }
    }
    // retention: the displaced version survives one cycle for in-flight
    // readers; everything older has had its cycle. The plain legacy
    // pointer (a posix-layout migration source) is retired once a
    // versioned commit exists — readers prefer versions.
    gens(fs, p).filter(_._1 < g - 1).foreach(x => fs.delete(x._2, false))
    if (fs.exists(p)) fs.delete(p, false)
  }

  def readCurrent(fs: FileSystem, p: HPath): Option[Array[Byte]] =
    readCurrent(fs, p, retry = true)

  private def readCurrent(fs: FileSystem, p: HPath,
      retry: Boolean): Option[Array[Byte]] = {
    // highest COMPLETE version wins: a torn object (interrupted PUT, or
    // the copy phase of a copy+delete rename) fails its envelope and the
    // reader falls past it to the retained previous version. A version
    // that vanished between the list and the open (the writer's retention
    // sweep lapped this reader) is skipped the same way — by then a newer
    // complete version exists and was already tried first.
    val listed = gens(fs, p)
    val fromVersions = listed.reverseIterator.flatMap { case (_, q) =>
      try {
        val in = fs.open(q)
        val raw = try in.readAllBytes() finally in.close()
        unwrap(raw)
      } catch { case _: java.io.FileNotFoundException => None }
    }.nextOption()
    // versions existed but none resolved: either every one was torn, or a
    // publish cycle lapped this reader (listed the old version, the sweep
    // removed it, the new complete one was never in our list). One
    // re-list distinguishes the two.
    if (fromVersions.isEmpty && listed.nonEmpty && retry)
      return readCurrent(fs, p, retry = false)
    fromVersions.orElse {
      // migration: a pointer last committed under posix layout
      try {
        if (!fs.exists(p)) None
        else {
          val in = fs.open(p)
          try Some(in.readAllBytes()) finally in.close()
        }
      } catch { case _: java.io.FileNotFoundException => None }
    }
  }

  def exists(fs: FileSystem, p: HPath): Boolean =
    readCurrent(fs, p).nonEmpty

  def delete(fs: FileSystem, p: HPath): Unit = {
    gens(fs, p).foreach(x => fs.delete(x._2, false))
    if (fs.exists(p)) fs.delete(p, false)
  }
}
