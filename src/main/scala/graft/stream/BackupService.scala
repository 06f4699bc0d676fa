package graft.stream

import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{Executors, TimeUnit}

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.{coalesce, col, length, lit}

import graft.server.Json
import graft.types.{ModuleDef, ParamDef, ParamKind, QueryDef}

/** Stream backup/restore (the A17 capability, re-based on the log).
  *
  * The reference archives event RANGES — `{start}-{end}` objects appended
  * by a 60s background sweep that only uploads events past the last
  * archived idx — and restores by validating that the collected ranges form
  * one contiguous chain before replaying
  * (/root/reference/leaf-server/src/storage.rs:635-825, continuity check
  * 986-996, sweep 1131-1136). This implementation keeps that shape: a
  * backup destination holds `events/{lo}-{hi}/` parquet range archives, a
  * snapshot of each `state_*` table (state events bypass the log, so replay
  * cannot rebuild them), the module definition, and a manifest listing the
  * chain. Each `backup()` call archives ONLY `idx > last backed up` — cost
  * is O(new events), not O(corpus): the idx range filter prunes the log's
  * parquet files by their min/max stats, so a 100 TB stream with a fresh
  * gigabyte of events reads a gigabyte. No global sort is paid either — the
  * archive keeps the log's existing idx-disjoint file layout
  * (`sortWithinPartitions` only), and restore validates contiguity from
  * min/max/count, which is order-independent.
  *
  * Restore sorts the manifest's ranges, rejects a chain that does not start
  * at idx 1 or has a gap/overlap, replays the union of the archives through
  * the module to rebuild every derived table, then reinstates the state
  * snapshots.
  *
  * All paths go through the Hadoop FileSystem API, so the destination can
  * be `file:/...`, `hdfs://...`, or `s3a://bucket/...` — object-store
  * backup is a URI (plus the usual credentials config), not new code, and
  * the parquet copy itself is a distributed write.
  */
object BackupService {

  private def fsFor(h: StreamHandle, uri: String): (FileSystem, HPath) = {
    val p = new HPath(uri)
    (p.getFileSystem(
      h.eventsDF.sparkSession.sparkContext.hadoopConfiguration), p)
  }

  private def writeText(fs: FileSystem, p: HPath, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes(UTF_8)) finally out.close()
  }

  private def readText(fs: FileSystem, p: HPath): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), UTF_8) finally in.close()
  }

  private def parseMeta(s: String): Map[String, Any] =
    Json.parse(s).asInstanceOf[Map[String, Any]]

  private def rangesOf(meta: Map[String, Any]): Vector[(Long, Long)] =
    meta.get("ranges").collect { case rs: Vector[_] =>
      rs.map { r =>
        val p = r.asInstanceOf[Vector[Any]]
        (p(0).asInstanceOf[Long], p(1).asInstanceOf[Long])
      }
    }.getOrElse(Vector.empty)

  /** Reject a range set that is not one contiguous chain from idx 1 — the
    * reference's continuity check (storage.rs:986-996). */
  private def validateChain(ranges: Seq[(Long, Long)]): Vector[(Long, Long)] = {
    val sorted = ranges.sortBy(_._1).toVector
    sorted.foreach { case (lo, hi) =>
      require(lo <= hi, s"invalid backup range [$lo,$hi]") }
    sorted.headOption.foreach { case (lo, _) =>
      require(lo == 1, s"backup chain must start at idx 1, starts at $lo") }
    sorted.iterator.sliding(2).withPartial(false).foreach { w =>
      require(w(1)._1 == w(0)._2 + 1,
        s"backup chain has a gap or overlap: [..,${w(0)._2}] then [${w(1)._1},..]")
    }
    sorted
  }

  private def rangeDir(root: HPath, r: (Long, Long)): HPath =
    new HPath(root, s"events/${r._1}-${r._2}")

  /** Incrementally back up a stream to `destDir`: archive events past the
    * destination's last backed-up idx as one new `{lo}-{hi}` range, refresh
    * the state snapshots and module def, and extend the manifest. Returns
    * the newly archived range, or None when the destination was already
    * current (a cheap no-op apart from the state snapshots). */
  def backup(h: StreamHandle, destDir: String): Option[(Long, Long)] = {
    val (fs, root) = fsFor(h, destDir)
    fs.mkdirs(root)
    val metaPath = new HPath(root, "meta.json")
    val priorMeta: Map[String, Any] =
      if (fs.exists(metaPath)) parseMeta(readText(fs, metaPath))
      else Map.empty
    val prior = validateChain(rangesOf(priorMeta))
    val lastBacked = prior.lastOption.map(_._2).getOrElse(0L)
    val latest = h.latest
    require(latest >= lastBacked,
      s"backup destination is ahead of the stream ($lastBacked > $latest) — " +
        "it belongs to a different or rolled-back stream")
    def exportRange(r: (Long, Long)): Unit =
      // the idx filter prunes the log's parquet files by min/max stats:
      // only files overlapping the range are read. Reads the events VIEW,
      // so redacted payloads archive as NULL.
      h.eventsDF.filter(col("idx").between(r._1, r._2))
        .sortWithinPartitions("idx")
        .write.mode(SaveMode.Overwrite).parquet(rangeDir(root, r).toString)
    val appended =
      if (latest > lastBacked) {
        val r = (lastBacked + 1, latest)
        exportRange(r)
        Some(r)
      } else None
    // Redaction must reach the ARCHIVE (round 16): ranges exported
    // before a redaction commit still hold the forgotten payloads — the
    // takedown loop is not closed while a restorable copy exists. The
    // manifest records the redactSeq it reflects; when the stream's has
    // advanced, every PRIOR range re-exports through the events view
    // (payload-nulled), same file names, same chain. O(archive) per
    // takedown-with-existing-backup — takedown-rate work; the ordinary
    // sweep tick stays incremental.
    val curRedact = h.redactionExposure._2
    val archivedRedact =
      priorMeta.get("redact_seq").collect { case l: Long => l }.getOrElse(0L)
    if (curRedact > archivedRedact) prior.foreach(exportRange)
    val stateTables = h.stateTableNames
    stateTables.foreach(t =>
      h.tableDF(t).write.mode(SaveMode.Overwrite)
        .parquet(new HPath(root, s"state/$t").toString))
    val m = h.currentModule.getOrElse(ModuleDef())
    writeText(fs, new HPath(root, "module.json"), moduleToJson(m))
    writeText(fs, metaPath, Json.render(Map(
      "latest_idx" -> latest,
      "state_tables" -> stateTables,
      "redact_seq" -> curRedact,
      "ranges" -> (prior ++ appended).map(r => Vector(r._1, r._2)))))
    appended
  }

  /** Run `backup` on a fixed delay (the reference's 60s background archive
    * sweep, storage.rs:1131-1136). Each tick is incremental, so an idle
    * stream costs a manifest read. Close the returned handle to stop. */
  def scheduleSweep(h: StreamHandle, destDir: String,
      intervalMs: Long = 60 * 1000L): AutoCloseable = {
    val exec = Executors.newSingleThreadScheduledExecutor { r =>
      val t = new Thread(r, s"graft-backup-sweep"); t.setDaemon(true); t
    }
    exec.scheduleWithFixedDelay(() =>
      try backup(h, destDir)
      catch {
        case t: Throwable => org.slf4j.LoggerFactory.getLogger(getClass)
          .warn(s"backup sweep of ${h.id} failed: ${t.getMessage}")
      }, intervalMs, intervalMs, TimeUnit.MILLISECONDS)
    new AutoCloseable { def close(): Unit = exec.shutdownNow() }
  }

  /** Restore a backup into a fresh stream id: validate the manifest's range
    * chain, replay the archived ranges through the module (contiguity
    * re-validated row-wise by the import path), then reinstate the archived
    * state tables. */
  def restore(store: StreamStore, newId: String, srcDir: String): StreamHandle = {
    val h = store.open(newId)
    val (fs, root) = fsFor(h, srcDir)
    require(h.latest == 0, s"restore target $newId is not empty")
    val m = moduleFromJson(readText(fs, new HPath(root, "module.json")))
    h.setModule(m)
    val meta = parseMeta(readText(fs, new HPath(root, "meta.json")))
    val expected = meta.get("latest_idx").collect { case l: Long => l }.getOrElse(0L)
    val ranges = validateChain(rangesOf(meta))
    if (ranges.nonEmpty) {
      require(ranges.last._2 == expected,
        s"manifest chain ends at ${ranges.last._2} but latest_idx is $expected")
      val paths = ranges.map(r => rangeDir(root, r).toString)
      h.bulkImport(store.spark.read.parquet(paths: _*))
    } else {
      // legacy layout (pre-incremental): one flat events dir
      val flat = new HPath(root, "events")
      if (fs.exists(flat)) {
        val events = store.spark.read.parquet(flat.toString)
        if (!events.isEmpty) h.bulkImport(events)
      }
    }
    require(h.latest == expected,
      s"restore incomplete: expected latest_idx=$expected, got ${h.latest}")
    val stateTables = meta.get("state_tables").collect { case ts: Vector[_] =>
      ts.map(_.toString)
    }.getOrElse(Vector.empty)
    stateTables.foreach(t => h.restoreStateTable(t,
      store.spark.read.parquet(new HPath(root, s"state/$t").toString)))
    h
  }

  // ---------------- reference-format archive interop ----------------
  //
  // The reference's bucket layout (leaf-server/src/storage.rs:640-825):
  //   streams/{did}/{start}-{end}.events.drisl.zstd   event range archives
  //   streams/{did}/metadata.drisl                    stream metadata
  // where an event archive is zstd-compressed DRISL of
  //   {"events": [{"idx": i, "user": s, "payload": bytes, "signature": bytes}, ...]}
  // (EventArchive/Event, storage.rs:1071-1073 + leaf-stream-types/src/
  // lib.rs:165-172) and metadata is {"did", "did_key", "owners",
  // "module_cid"} (storage.rs:1076-1081). Restore validates that the
  // collected ranges form one contiguous chain from idx 1
  // (storage.rs:986-996) — mirrored here by `validateChain`.
  //
  // Export is incremental like the reference sweep: only events past the
  // highest archived idx are written, split into <= `chunkEvents` archives
  // so the per-object driver materialization stays bounded no matter how
  // far behind the destination is (each object is a single compressed blob,
  // so SOME single-process encode is inherent to the format — the chunk cap
  // is what makes it scale-safe). zstd codec is the zstd-jni already on
  // Spark's classpath; DRISL bytes come from the existing codec.

  private val EventsArchiveExt = ".events.drisl.zstd"

  /** RFC 8949 shortest-form head for an array (major type 4) — matches the
    * codec's canonical encoding so hand-assembled containers are
    * byte-identical to whole-tree encodes. */
  private def writeCborArrayHead(o: java.io.OutputStream, n: Long): Unit = {
    val m = 4 << 5
    if (n < 24) o.write(m | n.toInt)
    else if (n < 0x100) { o.write(m | 24); o.write(n.toInt) }
    else if (n < 0x10000) { o.write(m | 25); o.write((n >> 8).toInt); o.write((n & 0xff).toInt) }
    else if (n < 0x100000000L) {
      o.write(m | 26)
      var i = 3
      while (i >= 0) { o.write(((n >> (i * 8)) & 0xff).toInt); i -= 1 }
    } else {
      o.write(m | 27)
      var i = 7
      while (i >= 0) { o.write(((n >> (i * 8)) & 0xff).toInt); i -= 1 }
    }
  }

  private def referenceStreamDir(root: HPath, id: String): HPath =
    new HPath(root, s"streams/$id")

  private def listReferenceRanges(fs: FileSystem, dir: HPath): Vector[(Long, Long)] =
    if (!fs.exists(dir)) Vector.empty
    else fs.listStatus(dir).toVector.flatMap { st =>
      val n = st.getPath.getName
      if (!n.endsWith(EventsArchiveExt)) None
      else n.stripSuffix(EventsArchiveExt).split("-") match {
        case Array(a, b) =>
          for (lo <- a.toLongOption; hi <- b.toLongOption) yield (lo, hi)
        case _ => None
      }
    }.sortBy(_._1)

  /** A concurrent bucket reader (another server restoring, a
    * sweep-watcher) must never see a torn object. Per-scheme atomic
    * primitive: object stores get the single PUT (a tmp+rename there
    * would double the transfer AND introduce a missing-object window —
    * rename is copy + delete); local files get write-to-tmp + rename,
    * which POSIX renameTo makes an atomic replace. HDFS is grouped with
    * the PUT branch: FileSystem.rename refuses an existing destination
    * there, so the only overwrite is delete-then-rename — a WORSE window
    * than the plain overwrite, plus a failure mode that loses the old
    * object after the delete. */
  private[graft] def atomicWrite(fs: FileSystem, p: HPath,
      b: Array[Byte]): Unit = {
    // RawLocalFileSystem leaves getScheme unimplemented — fall back to
    // the URI's scheme (file:/// there)
    val scheme = try fs.getScheme
      catch { case _: UnsupportedOperationException => fs.getUri.getScheme }
    if (scheme != "file") {
      val out = fs.create(p, true)
      try out.write(b) finally out.close()
    } else {
      val tmp = new HPath(p.getParent, s".${p.getName}.tmp")
      val out = fs.create(tmp, true)
      try out.write(b) finally out.close()
      // POSIX rename(2) is an atomic replace even when the destination
      // exists; Hadoop's LocalFileSystem rename can still refuse an
      // existing destination, so fall through to java.nio ATOMIC_MOVE
      // rather than a delete-then-rename (whose crash window loses the
      // old object and reintroduces the missing-object gap this function
      // exists to close).
      if (!fs.rename(tmp, p)) {
        import java.nio.file.{Files => NF, Paths, StandardCopyOption => CO}
        def local(h: HPath) = Paths.get(h.toUri.getPath)
        // the checksummed local fs keeps a .crc sidecar that cannot ride
        // one atomic move with its data file. Delete the stale dest
        // sidecar FIRST (a sidecar-less file reads unverified), move the
        // data (the atomic replace), then install the tmp's sidecar —
        // no crash point ever pairs the new data with the old crc.
        fs match {
          case cfs: org.apache.hadoop.fs.ChecksumFileSystem =>
            NF.deleteIfExists(local(cfs.getChecksumFile(p)))
          case _ =>
        }
        NF.move(local(tmp), local(p), CO.ATOMIC_MOVE, CO.REPLACE_EXISTING)
        fs match {
          case cfs: org.apache.hadoop.fs.ChecksumFileSystem =>
            val tcrc = local(cfs.getChecksumFile(tmp))
            if (NF.exists(tcrc))
              NF.move(tcrc, local(cfs.getChecksumFile(p)),
                CO.ATOMIC_MOVE, CO.REPLACE_EXISTING)
          case _ =>
        }
      }
    }
  }

  private def writeBytes(fs: FileSystem, p: HPath, b: Array[Byte]): Unit =
    atomicWrite(fs, p, b)

  private def readBytes(fs: FileSystem, p: HPath): Array[Byte] = {
    val in = fs.open(p)
    try in.readAllBytes() finally in.close()
  }

  private def zstdCompress(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new com.github.luben.zstd.ZstdOutputStream(bos)
    try z.write(b) finally z.close()
    bos.toByteArray
  }

  /** zstd-bomb guard for whole-object decompression (small objects only —
    * metadata, module blobs, state snapshots). The event archives never
    * come through here; they stream through a BoundedInputStream. The cap
    * must stay well under the JVM's ~2 GiB array ceiling: these paths
    * materialize ONE `Array[Byte]`, so a larger cap would die as an
    * `OutOfMemoryError` in `readAllBytes` before the cap exception could
    * fire — the clean-failure discipline requires cap < array ceiling. */
  private def zstdDecompressBounded(b: Array[Byte], cap: Long): Array[Byte] = {
    val bounded = new BoundedInputStream(
      new com.github.luben.zstd.ZstdInputStream(
        new java.io.ByteArrayInputStream(b)), cap)
    try bounded.readAllBytes() finally bounded.close()
  }

  /** Throws once more than `cap` bytes have been read — the guard that
    * keeps a forged archive (1 KB of zstd claiming a terabyte) from
    * expanding without limit. */
  private final class BoundedInputStream(in: java.io.InputStream, cap: Long)
      extends java.io.InputStream {
    private var count = 0L
    private def note(n: Int): Int = {
      if (n > 0) {
        count += n
        if (count > cap) throw new IllegalArgumentException(
          s"archive decompresses past the $cap-byte cap")
      }
      n
    }
    override def read(): Int = { val b = in.read(); if (b >= 0) note(1); b }
    override def read(b: Array[Byte], off: Int, len: Int): Int =
      note(in.read(b, off, len))
    // close() failures must not mask the original error on the unwind
    // path; the underlying FS stream is also closed by the zstd wrapper
    override def close(): Unit =
      try in.close() catch { case _: java.io.IOException => }
  }

  import graft.drisl.{Cid, Drisl, DValue}
  import DValue._

  private val ModuleArchiveExt = ".module.drisl.zstd"

  /** The wire module encoding (camelCase, queries as a list) — what the
    * shipped TypeScript client uploads and content-addresses
    * (clients/typescript/src/codec.ts:12-30); reference buckets store
    * module blobs in exactly this shape. */
  def moduleToWire(m: ModuleDef): DValue = obj(
    "$type" -> DText("muni.town.leaf.module.basic.v0"),
    "initSql" -> DText(m.initSql),
    "authorizer" -> DText(m.authorizer),
    "materializer" -> DText(m.materializer),
    "stateInitSql" -> DText(m.stateInitSql),
    "stateMaterializer" -> DText(m.stateMaterializer),
    "queries" -> DArray(m.queries.toVector.sortBy(_._1).map { case (name, q) =>
      obj("name" -> DText(name), "sql" -> DText(q.sql),
        "params" -> DArray(q.params.toVector.map(p => obj(
          "name" -> DText(p.name),
          "kind" -> DText(p.kind.toString.stripPrefix("P").toLowerCase),
          "optional" -> DBool(p.optional)))))
    }))

  def moduleFromWire(d: DValue): ModuleDef = d match {
    case DMap(m) =>
      def s(k: String) = m.get(k).collect { case DText(t) => t }.getOrElse("")
      val tpe = m.get("$type").collect { case DText(t) => t }
        .getOrElse("muni.town.leaf.module.basic.v0")
      require(tpe == "muni.town.leaf.module.basic.v0",
        s"unsupported module codec: $tpe")
      val queries = m.get("queries").collect { case DArray(qs) =>
        qs.collect { case DMap(qm) =>
          val params = qm.get("params").collect { case DArray(ps) =>
            ps.collect { case DMap(pm) =>
              ParamDef(
                pm.get("name").collect { case DText(t) => t }.getOrElse(""),
                pm.get("kind").collect { case DText(t) => t }.getOrElse("any") match {
                  case "integer" => ParamKind.PInteger
                  case "real" => ParamKind.PReal
                  case "text" => ParamKind.PText
                  case "blob" => ParamKind.PBlob
                  case _ => ParamKind.PAny
                },
                pm.get("optional").contains(DBool(true)))
            }
          }.getOrElse(Vector.empty)
          qm.get("name").collect { case DText(t) => t }.getOrElse("") ->
            QueryDef(qm.get("sql").collect { case DText(t) => t }.getOrElse(""),
              params)
        }.toMap
      }.getOrElse(Map.empty[String, QueryDef])
      ModuleDef(s("initSql"), s("authorizer"), s("materializer"),
        s("stateInitSql"), s("stateMaterializer"), queries)
    case other => throw new IllegalArgumentException(s"module blob is not a map: $other")
  }

  /** A stream signing key riding a reference bucket: the reference's
    * `StreamMetadataDidKey` enum (storage.rs:1083-1090), which serde
    * serializes externally tagged — `{"P256": <32 bytes>}` or
    * `{"K256": <32 bytes>}`. */
  case class DidKey(kind: String, secret: Array[Byte]) {
    require(kind == "P256" || kind == "K256",
      s"unsupported did_key kind '$kind' (P256 or K256)")
    require(secret.length == 32,
      s"did_key secret must be 32 bytes, got ${secret.length}")
  }

  /** Incrementally export the stream's events as reference-format
    * `{start}-{end}.events.drisl.zstd` archives plus `metadata.drisl`
    * under `destRoot/streams/{id}/`. Returns the newly written ranges.
    *
    * `didKey` opts key material INTO the bucket the way the reference's
    * metadata carries it (storage.rs:1076-1081) so a reference server (or
    * this one) restoring the bucket signs events again afterwards. The
    * default None is a deliberate custody stance — backups routinely land
    * on third-party object stores, and a bucket that can be read must not
    * mint valid signatures — so a keyless restore imports history but
    * writes `did_key: null`, exactly the reference's no-key warning path
    * (storage.rs:936-942). */
  def exportReference(h: StreamHandle, destRoot: String,
      owners: Seq[String] = Nil, chunkEvents: Int = 100000,
      didKey: Option[DidKey] = None,
      maxChunkBytes: Long = 256L << 20): Vector[(Long, Long)] = {
    require(chunkEvents > 0, "chunkEvents must be positive")
    require(maxChunkBytes > 0, "maxChunkBytes must be positive")
    val (fs, root) = fsFor(h, destRoot)
    val dir = referenceStreamDir(root, h.id)
    fs.mkdirs(dir)
    val prior = validateChain(listReferenceRanges(fs, dir))
    val lastBacked = prior.lastOption.map(_._2).getOrElse(0L)
    val latest = h.latest
    require(latest >= lastBacked,
      s"archive destination is ahead of the stream ($lastBacked > $latest)")
    // the chunk cap is what bounds the driver's per-object materialization,
    // but an event-COUNT cap alone is blind to payload size: 100k events of
    // 1 MB each would stage 100 GB. Derive a byte-aware chunk size from the
    // pending range's mean encoded event size (one cheap columnar agg over
    // the pruned range) and take the tighter of the two caps.
    val effChunk: Int =
      if (latest <= lastBacked) chunkEvents
      else {
        val avgRow = h.eventsDF
          .filter(col("idx") > lastBacked && col("idx") <= latest)
          .agg(org.apache.spark.sql.functions.avg(
            length(coalesce(col("payload"), lit(Array.empty[Byte]))) +
              length(coalesce(col("signature"), lit(Array.empty[Byte]))) + 64))
          .head()
        val avg = if (avgRow.isNullAt(0)) 64.0 else math.max(64.0, avgRow.getDouble(0))
        val byBytes = math.max(1L, (maxChunkBytes / avg).toLong)
        math.min(chunkEvents.toLong, byBytes).toInt
      }
    val written = Vector.newBuilder[(Long, Long)]
    def writeChunk(lo: Long, hi: Long): Unit = {
      // min/max parquet stats prune the log read to the chunk's files.
      // Per-event DRISL encoding runs ON THE EXECUTORS — a CBOR array is
      // just a head + concatenated element encodings, so the driver's
      // single-threaded share of each archive object is a header write
      // plus memcpys, not 100k tree encodes. Order is the sort order:
      // map() preserves it and collect() concatenates partitions in order.
      import org.apache.spark.sql.Encoders
      val elems: Array[(Long, Array[Byte])] = h.eventsDF
        .filter(col("idx").between(lo, hi))
        .select(col("idx"), col("user"), col("payload"), col("signature"))
        .orderBy("idx")
        .as[(Long, String, Array[Byte], Array[Byte])](Encoders.tuple(
          Encoders.scalaLong, Encoders.STRING, Encoders.BINARY, Encoders.BINARY))
        .map { case (i, u, p, sg) => (i, Drisl.encode(obj(
          "idx" -> DInt(i),
          "user" -> DText(Option(u).getOrElse("")),
          "payload" -> DBytes(Option(p).getOrElse(Array.empty[Byte])),
          "signature" -> DBytes(Option(sg).getOrElse(Array.empty[Byte])))))
        }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
        .collect()
      require(elems.length == (hi - lo + 1).toInt,
        s"log range [$lo,$hi] is not contiguous (${elems.length} rows)")
      // positional check: a count match alone passes a duplicate-plus-gap
      // log (e.g. idx 1,1,3 for [1,3]) and writes a corrupt archive
      var ei = 0
      while (ei < elems.length) {
        require(elems(ei)._1 == lo + ei,
          s"log range [$lo,$hi] has idx ${elems(ei)._1} at position $ei " +
            s"(expected ${lo + ei}): duplicate or gap in the log")
        ei += 1
      }
      // hand-assemble {"events": [...]} — byte-identical to encoding the
      // whole tree (single map key, so canonical order is trivial)
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(0xa1) // map(1)
      bos.write(0x66) // text(6)
      bos.write("events".getBytes(UTF_8))
      writeCborArrayHead(bos, elems.length.toLong)
      elems.foreach(e => bos.write(e._2))
      val bytes = zstdCompress(bos.toByteArray)
      writeBytes(fs, new HPath(dir, s"$lo-$hi$EventsArchiveExt"), bytes)
    }
    var lo = lastBacked + 1
    while (lo <= latest) {
      val hi = math.min(lo + effChunk - 1, latest)
      writeChunk(lo, hi)
      written += ((lo, hi))
      lo = hi + 1
    }
    // module blob: reference buckets carry modules/{cid}.module.drisl.zstd
    // in the WIRE encoding (storage.rs:660-673). Ship the client's stashed
    // upload bytes when the module arrived over the wire (byte-identical,
    // so the client's content address still verifies), else wire-encode
    // the module here — either way metadata.module_cid names the blob and
    // a restore installs it. No key material leaves the server. An
    // ownerless call preserves the owners already archived — the sweep
    // path passes no owners and must not clobber what the server recorded.
    val moduleCid = h.currentModule.map { m =>
      val (wireCid, bytes) = h.currentModuleCid
        .flatMap(c => h.store.wireAliasFor(c))
        .flatMap(wc => h.store.wireModuleBytes(wc).map(wc -> _))
        .getOrElse {
          val b = Drisl.encode(moduleToWire(m))
          (Cid.render(Cid.of(b)), b)
        }
      val modDir = new HPath(root, "modules")
      fs.mkdirs(modDir)
      val blobPath = new HPath(modDir, s"$wireCid$ModuleArchiveExt")
      if (!fs.exists(blobPath)) writeBytes(fs, blobPath, zstdCompress(bytes))
      DCid(Cid.parse(wireCid))
    }
    // state snapshots: state events bypass the log, so replay cannot
    // rebuild state_* tables. The reference ships a vacuumed sqlite
    // `state.db.zstd` (engine-specific); this engine ships parquet
    // snapshots under `state/` and lists them via an EXTRA metadata key —
    // serde ignores unknown struct fields, so a reference restore still
    // reads the archive chain and metadata untouched.
    val stateTables = h.stateTableNames.toVector
    stateTables.foreach(t =>
      h.tableDF(t).write.mode(SaveMode.Overwrite)
        .parquet(new HPath(dir, s"state/$t").toString))
    val metaPath = new HPath(dir, "metadata.drisl")
    // a parameterless call must PRESERVE what the bucket already records —
    // owners (the sweep path passes none) and, symmetrically, a
    // previously-shipped did_key: a later keyless export must not clobber
    // the bucket's only copy of key custody back to null
    val priorMeta: Option[DMap] =
      if (!fs.exists(metaPath)) None
      else Drisl.decode(readBytes(fs, metaPath)) match {
        case m: DMap => Some(m)
        case _ => None
      }
    val effOwners =
      if (owners.nonEmpty) owners.toVector
      else priorMeta.flatMap(_.v.get("owners")).collect { case DArray(os) =>
        os.collect { case DText(o) => o } }.getOrElse(Vector.empty)
    val effDidKey: DValue = didKey
      .map(k => obj(k.kind -> DBytes(k.secret)): DValue)
      .orElse(priorMeta.flatMap(_.v.get("did_key")).collect {
        case k: DMap => k: DValue
      })
      .getOrElse(DNull)
    // Redaction must reach the BUCKET (round 16, the native-format rule):
    // chunks exported before a redaction commit still hold the forgotten
    // payloads. The metadata records the redactSeq it reflects (an extra
    // key a reference-side restore ignores — serde skips unknown fields);
    // when the stream's has advanced, every PRIOR chunk re-exports
    // through the events view at its EXISTING boundaries (nulled payload
    // = zero bytes in the wire encoding, the replay-identical form).
    val curRedact = h.redactionExposure._2
    val archivedRedact = priorMeta.flatMap(_.v.get("graft_redact_seq"))
      .collect { case DInt(n) => n }.getOrElse(0L)
    if (curRedact > archivedRedact)
      prior.foreach { case (plo, phi) => writeChunk(plo, phi) }
    writeBytes(fs, metaPath, Drisl.encode(obj(
      "did" -> DText(h.id),
      "did_key" -> effDidKey,
      "owners" -> DArray(effOwners.map(DText(_))),
      "module_cid" -> moduleCid.getOrElse(DNull),
      "graft_redact_seq" -> DInt(curRedact),
      "state_tables" -> DArray(stateTables.map(DText(_))))))
    written.result()
  }

  case class ReferenceMeta(did: String, owners: Vector[String],
      moduleCid: Option[String], stateTables: Vector[String] = Vector.empty,
      didKey: Option[DidKey] = None, importBatches: Int = 0)

  /** Restore a reference-format archive chain from
    * `srcRoot/streams/{srcId}/` into the fresh stream `newId`. The chain
    * must be contiguous from idx 1 (the reference's continuity rule);
    * returns the handle plus the decoded stream metadata so the server
    * layer can reinstate owners (and key custody, when the bucket carries
    * a `did_key`).
    *
    * Memory discipline: the reference's sweep writes ONE archive object
    * per interval regardless of size (storage.rs:660-760), so a genuine
    * foreign bucket can hold a multi-million-event object. Each object is
    * therefore STREAM-decoded — zstd → incremental CBOR reader — and
    * imported in `batchRows`-event batches; driver allocation is bounded
    * by one batch, never by the object. `maxDecompressedBytes` caps what
    * one object may expand to (zstd-bomb guard) and `maxValueBytes` caps
    * any single decoded value, matching the hardened wire decoders.
    *
    * Validation (metadata DID, chain contiguity) runs BEFORE the target
    * stream is created, and any failure during replay deletes the
    * partially-created stream — a failed import never leaves an empty or
    * half-filled stream behind. */
  def importReference(store: StreamStore, newId: String, srcRoot: String,
      srcId: String, batchRows: Int = 100000,
      maxDecompressedBytes: Long = 8L << 30,
      maxValueBytes: Int = 64 << 20,
      // whole-object paths (metadata, module blobs, state.db.zstd)
      // decompress into ONE driver array, so their cap must sit under the
      // JVM's ~2 GiB array ceiling for the cap exception to fire before
      // an OutOfMemoryError can — 1 GiB is generous for vacuumed state
      // DBs and 10 MB-capped modules. The 8 GiB maxDecompressedBytes
      // applies only to the STREAMED event path, which never materializes
      // an object-sized array.
      maxObjectBytes: Long = 1L << 30): (StreamHandle, ReferenceMeta) = {
    require(batchRows > 0, "batchRows must be positive")
    require(maxObjectBytes > 0 && maxObjectBytes < Int.MaxValue.toLong - 8,
      "maxObjectBytes must fit a single JVM array (cap < ~2 GiB) so the " +
        "cap exception fires before an OutOfMemoryError can")
    val root = new HPath(srcRoot)
    val fs = root.getFileSystem(store.spark.sparkContext.hadoopConfiguration)
    val dir = referenceStreamDir(root, srcId)
    require(fs.exists(dir), s"no reference archive at $dir")
    require(!store.exists(newId), s"restore target $newId is not empty")
    // validate BEFORE creating any stream state (a failed import must not
    // leave a partially-created stream): metadata decodes, DID matches the
    // folder, and the range chain is contiguous from idx 1
    val meta0 = Drisl.decode(zstdIfNeeded(
      readBytes(fs, new HPath(dir, "metadata.drisl")), maxObjectBytes)) match {
      case DMap(m) =>
        val did = m.get("did").collect { case DText(t) => t }.getOrElse(srcId)
        require(did == srcId,
          s"stream metadata DID '$did' does not match its folder '$srcId'")
        val didKey = m.get("did_key") match {
          case Some(DMap(k)) =>
            require(k.size == 1, s"malformed did_key: ${k.keys.mkString(",")}")
            k.head match {
              case (kind, DBytes(secret)) => Some(DidKey(kind, secret))
              case (kind, other) => throw new IllegalArgumentException(
                s"did_key $kind payload is not bytes: $other")
            }
          case Some(DNull) | None => None
          case Some(other) => throw new IllegalArgumentException(
            s"malformed did_key: $other")
        }
        ReferenceMeta(
          did,
          m.get("owners").collect { case DArray(os) =>
            os.collect { case DText(o) => o } }.getOrElse(Vector.empty),
          m.get("module_cid").collect { case DCid(b) => Cid.render(b) },
          m.get("state_tables").collect { case DArray(ts) =>
            ts.collect { case DText(t) => t } }.getOrElse(Vector.empty),
          didKey)
      case other => throw new IllegalArgumentException(
        s"metadata.drisl is not a map: $other")
    }
    val ranges = validateChain(listReferenceRanges(fs, dir))
    require(ranges.nonEmpty, s"reference archive at $dir has no event ranges")
    // install the bucket's module blobs (the reference's restore order,
    // storage.rs:867-878): wire-decode → register → alias, so the stream
    // metadata's wire CID resolves locally before replay. Store-level,
    // content-addressed, GC-collected if unreferenced — safe before open.
    val modDir = new HPath(root, "modules")
    if (fs.exists(modDir)) fs.listStatus(modDir).foreach { st =>
      val n = st.getPath.getName
      if (n.endsWith(ModuleArchiveExt)) {
        val wireCid = n.stripSuffix(ModuleArchiveExt)
        try {
          val bytes = zstdDecompressBounded(
            readBytes(fs, st.getPath), maxObjectBytes)
          val internal = store.registerModule(moduleFromWire(Drisl.decode(bytes)))
          store.recordModuleAlias(wireCid, internal)
          store.recordWireModule(wireCid, bytes)
        } catch {
          case e: Exception => org.slf4j.LoggerFactory.getLogger(getClass)
            .warn(s"skipping undecodable module blob $n: ${e.getMessage}")
        }
      }
    }
    // atomic claim + create under the store's per-id lock: no concurrent
    // create can slip between the exists-check and the creation, and while
    // the claim is held client opens of the id fail — so the destructive
    // cleanup below can only ever delete state THIS import created
    val h = store.beginImport(newId)
    var batches = 0
    try {
      // install the module BEFORE replay when its CID resolves in this
      // store's registry (the reference restores the module blob by CID
      // first for the same reason: import must materialize as it goes)
      meta0.moduleCid.foreach { c =>
        store.module(c).orElse(store.moduleAlias(c).flatMap(store.module))
          .foreach(h.setModule)
      }
      ranges.foreach { case (lo, hi) =>
        batches += importArchiveObject(store, h, fs,
          new HPath(dir, s"$lo-$hi$EventsArchiveExt"), lo, hi,
          batchRows, maxDecompressedBytes, maxValueBytes)
      }
      restoreState(store, h, fs, dir, meta0, maxObjectBytes)
      // reinstate append-signing with the bucket's key: our engine's
      // signing discipline is the per-batch HMAC (A2'), keyed by the
      // stream key — a key-bearing bucket restores to a stream whose
      // appends verify again, the reference's create_did-on-restore path
      meta0.didKey.foreach(k => h.setSigningKey(k.secret))
    } catch {
      case t: Throwable =>
        // undo the partial creation — an import that failed validation
        // mid-replay must not leave an empty/half-filled stream behind.
        // Safe to be destructive: beginImport proved the stream did not
        // exist before this import and blocked concurrent opens since.
        try store.dropStream(newId) catch {
          case e: Exception => org.slf4j.LoggerFactory.getLogger(getClass)
            .warn(s"cleanup of failed import $newId failed: ${e.getMessage}")
        }
        throw t
    } finally store.endImport(newId)
    (h, meta0.copy(importBatches = batches))
  }

  /** Accept both raw and zstd-wrapped metadata bytes: the reference writes
    * `metadata.drisl` uncompressed, but tolerate a compressed variant —
    * bounded like every other whole-object decompress. */
  private def zstdIfNeeded(b: Array[Byte], cap: Long): Array[Byte] =
    if (b.length >= 4 && (b(0) & 0xff) == 0x28 && (b(1) & 0xff) == 0xb5 &&
      (b(2) & 0xff) == 0x2f && (b(3) & 0xff) == 0xfd)
      zstdDecompressBounded(b, cap)
    else b

  /** Stream one `{start}-{end}.events.drisl.zstd` object into the stream
    * in bounded batches. Returns the number of batches applied. Validates
    * per-event idx against the expected position — a gap or duplicate
    * INSIDE the object fails here with a precise message rather than a
    * generic contiguity error after a partial batch. */
  private def importArchiveObject(store: StreamStore, h: StreamHandle,
      fs: FileSystem, path: HPath, lo: Long, hi: Long, batchRows: Int,
      maxDecompressedBytes: Long, maxValueBytes: Int): Int = {
    val raw = fs.open(path)
    // close the OUTERMOST stream: ZstdInputStream holds native zstd
    // buffers that only a close releases promptly — closing just `raw`
    // would leak one native context per archive object until finalization
    val bounded = new BoundedInputStream(
      new com.github.luben.zstd.ZstdInputStream(
        new java.io.BufferedInputStream(raw, 1 << 16)),
      maxDecompressedBytes)
    try {
      val dec = new Drisl.StreamDecoder(bounded, maxValueBytes)
      val entries = dec.readMapHead()
      var batches = 0
      var seenEvents = false
      val batch = new scala.collection.mutable.ArrayBuffer[
        org.apache.spark.sql.Row](math.min(batchRows, 1 << 16))
      def flush(): Unit = if (batch.nonEmpty) {
        // parallelize so the staging parquet write is distributed instead
        // of a single local task; bulkImport re-validates contiguity and
        // replays the module over the new events before the next batch
        // is decoded — driver holds at most one batch of rows at a time
        val rows = batch.toVector
        batch.clear()
        val rdd = store.spark.sparkContext.parallelize(
          rows, math.max(1, math.min(32, rows.size / 8192)))
        h.bulkImport(store.spark.createDataFrame(rdd, StreamStore.eventSchema))
        batches += 1
      }
      var entry = 0
      while (entry < entries) {
        val key = dec.readTextKey()
        if (key == "events") {
          seenEvents = true
          val n = dec.readArrayHead()
          require(n == hi - lo + 1,
            s"archive $lo-$hi claims $n events for ${hi - lo + 1} idx slots")
          var expect = lo
          var i = 0L
          while (i < n) {
            dec.readValue() match {
              case DMap(e) =>
                val idx = e.get("idx").collect { case DInt(x) => x }.getOrElse(
                  throw new IllegalArgumentException(
                    s"archive $lo-$hi: event without idx"))
                require(idx == expect,
                  s"archive $lo-$hi has idx $idx where $expect was expected " +
                    "(gap or duplicate inside the object)")
                expect += 1
                batch += org.apache.spark.sql.Row(
                  idx,
                  e.get("user").collect { case DText(u) => u }.getOrElse(""),
                  e.get("payload").collect { case DBytes(b) => b }
                    .getOrElse(Array.empty[Byte]),
                  e.get("signature").collect { case DBytes(b) => b }
                    .getOrElse(Array.empty[Byte]))
                if (batch.size >= batchRows) flush()
              case other => throw new IllegalArgumentException(
                s"archive $lo-$hi: non-map event: $other")
            }
            i += 1
          }
        } else dec.readValue() // tolerate unknown envelope keys
        entry += 1
      }
      require(seenEvents, s"archive $lo-$hi has no events array")
      flush()
      batches
    } finally bounded.close()
  }

  /** Reinstate stream state from the bucket. Two formats: this engine's
    * parquet snapshots (listed in the metadata's `state_tables` key), or
    * the reference's `state.db.zstd` — a vacuumed SQLite file
    * (storage.rs:781-815) parsed by [[SqliteFile]] into the module's
    * `state_*` tables. Restore-or-reject: a state snapshot that cannot be
    * fully mapped onto the module's state DDL raises, which unwinds the
    * whole import — never a silent partial restore. */
  private def restoreState(store: StreamStore, h: StreamHandle,
      fs: FileSystem, dir: HPath, meta: ReferenceMeta,
      maxObjectBytes: Long): Unit = {
    import scala.jdk.CollectionConverters._
    if (meta.stateTables.nonEmpty) {
      meta.stateTables.foreach(t => h.restoreStateTable(t,
        store.spark.read.parquet(new HPath(dir, s"state/$t").toString)))
      return
    }
    val stateDb = new HPath(dir, "state.db.zstd")
    if (!fs.exists(stateDb)) return
    val tables = SqliteFile.parse(zstdDecompressBounded(
      readBytes(fs, stateDb), maxObjectBytes))
    val stateNames = h.stateTableNames.toSet
    tables.foreach { t =>
      require(stateNames.contains(t.name),
        s"state.db.zstd contains table '${t.name}' that the module's state " +
          s"DDL does not declare (module state tables: " +
          s"${if (stateNames.isEmpty) "<none — is a module installed?>"
            else stateNames.mkString(", ")}) — refusing a partial state restore")
    }
    tables.foreach { t =>
      val target = h.tableDF(t.name).schema
      val byName = t.columns.map(_.name.toLowerCase).zipWithIndex.toMap
      target.fields.foreach(f => require(byName.contains(f.name.toLowerCase),
        s"state.db.zstd table '${t.name}' lacks column '${f.name}' that the " +
          "module's state DDL declares — refusing a partial state restore"))
      val rows = t.rows.map { r =>
        org.apache.spark.sql.Row.fromSeq(target.fields.toSeq.map { f =>
          coerceSqlite(r(byName(f.name.toLowerCase)), f.dataType, t.name, f.name)
        })
      }
      h.restoreStateTable(t.name,
        store.spark.createDataFrame(rows.asJava, target))
    }
  }

  /** SQLite storage classes → the Spark state-table schema. SQLite columns
    * are dynamically typed, so integer-vs-real coercions are routine; a
    * genuinely unmappable value (text in a numeric column) raises. */
  private def coerceSqlite(v: Any, dt: org.apache.spark.sql.types.DataType,
      table: String, col: String): Any = {
    import org.apache.spark.sql.types._
    (v, dt) match {
      case (null, _) => null
      case (l: java.lang.Long, LongType) => l
      case (l: java.lang.Long, IntegerType) => java.lang.Integer.valueOf(l.intValue)
      case (l: java.lang.Long, ShortType) => java.lang.Short.valueOf(l.shortValue)
      case (l: java.lang.Long, ByteType) => java.lang.Byte.valueOf(l.byteValue)
      case (l: java.lang.Long, DoubleType) => java.lang.Double.valueOf(l.doubleValue)
      case (l: java.lang.Long, FloatType) => java.lang.Float.valueOf(l.floatValue)
      case (l: java.lang.Long, BooleanType) => java.lang.Boolean.valueOf(l != 0L)
      case (l: java.lang.Long, StringType) => l.toString
      case (l: java.lang.Long, _: DecimalType) => new java.math.BigDecimal(l)
      // SQLite NUMERIC affinity keeps non-integral values as REAL: 2 in a
      // DECIMAL column arrives as Long, 2.5 as Double — both must restore
      case (d: java.lang.Double, _: DecimalType) => java.math.BigDecimal.valueOf(d)
      case (d: java.lang.Double, DoubleType) => d
      case (d: java.lang.Double, FloatType) => java.lang.Float.valueOf(d.floatValue)
      case (d: java.lang.Double, StringType) => d.toString
      case (s: String, StringType) => s
      case (b: Array[Byte], BinaryType) => b
      case (other, t) => throw new IllegalArgumentException(
        s"state.db.zstd: cannot restore $table.$col value of type " +
          s"${other.getClass.getSimpleName} into $t")
    }
  }

  // ---------------- module (de)serialization ----------------

  def moduleToJson(m: ModuleDef): String = Json.render(Map(
    "init_sql" -> m.initSql,
    "authorizer" -> m.authorizer,
    "materializer" -> m.materializer,
    "state_init_sql" -> m.stateInitSql,
    "state_materializer" -> m.stateMaterializer,
    "queries" -> m.queries.map { case (name, q) =>
      name -> Map(
        "sql" -> q.sql,
        "params" -> q.params.map(p => Map(
          "name" -> p.name,
          "kind" -> p.kind.toString.stripPrefix("P").toLowerCase,
          "optional" -> p.optional)))
    }))

  def moduleFromJson(json: String): ModuleDef = {
    val m = Json.parse(json).asInstanceOf[Map[String, Any]]
    def s(k: String) = m.get(k).collect { case v: String => v }.getOrElse("")
    val queries = m.get("queries").collect { case q: Map[_, _] =>
      q.asInstanceOf[Map[String, Any]].map { case (name, defn) =>
        val dm = defn.asInstanceOf[Map[String, Any]]
        val params = dm.get("params").collect { case ps: Vector[_] =>
          ps.map { p =>
            val pm = p.asInstanceOf[Map[String, Any]]
            ParamDef(
              pm("name").toString,
              pm.getOrElse("kind", "any").toString match {
                case "integer" => ParamKind.PInteger
                case "real" => ParamKind.PReal
                case "text" => ParamKind.PText
                case "blob" => ParamKind.PBlob
                case _ => ParamKind.PAny
              },
              pm.get("optional").contains(true))
          }
        }.getOrElse(Vector.empty)
        name -> QueryDef(dm("sql").toString, params)
      }
    }.getOrElse(Map.empty[String, QueryDef])
    ModuleDef(s("init_sql"), s("authorizer"), s("materializer"),
      s("state_init_sql"), s("state_materializer"), queries)
  }
}
