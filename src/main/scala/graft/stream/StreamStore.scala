package graft.stream

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.LeafFunctions
import graft.types._

/** Per-stream append-only event log + materialized tables on Spark.
  *
  * Capability map (reference behavior, Spark-first design):
  *  - open/attach      A1  (lib.rs:239-330)   → `StreamStore.open`
  *  - append batch     A2  (lib.rs:597-719)   → `StreamHandle.addEvents`
  *  - authorize        A3  (module/basic.rs:134-158) → set-based authorizer run
  *  - materialize      A4  (module/basic.rs:76-105)  → batch or per-event SQL
  *  - state events     A5  (lib.rs:729-773)   → `addStateEvents`
  *  - catch-up/replay  A6  (lib.rs:476-590)   → `catchUp`
  *  - named query      A7  (module/basic.rs:160-246) → `query`
  *  - raw range scan   A10 (lib.rs:782-817)   → `rawGetEvents`
  *  - raw import       A11 (lib.rs:823-840)   → `rawImportEvents` / `bulkImport`
  *  - clear state      A12 (lib.rs:176-217)   → `clearState`
  *  - module swap      A13 (lib.rs:222-235)   → `setModule`
  *
  * Scale design: the log is a directory of parquet files whose `idx` column
  * carries per-file min/max stats, so `idx`-range queries prune files; the
  * materialized tables are ordinary catalog parquet tables, so everything
  * downstream gets Catalyst + AQE untouched. Bulk ingest (`bulkImport`) is
  * one distributed write plus one set-based materializer pass — no
  * driver-side per-event loop on the hot path. Per-event materialization
  * exists only as the semantic fallback for modules whose SQL is not
  * provably batch-safe (cross-event reads of their own output).
  *
  * Atomicity: the reference wraps {authorize, append, materialize, cursor}
  * in one SQLite transaction (lib.rs:617-705). Spark has no multi-table
  * transaction, so appends are staged: authorizers run first (reject =
  * nothing written), and on materializer failure the files added to the log
  * and to each table during the batch are deleted (file-level snapshot
  * rollback) before the error is rethrown.
  */
class StreamStore(val spark: SparkSession, val root: String,
    maxOpenHandles: Int = 256) {
  LeafFunctions.register(spark)
  Files.createDirectories(Paths.get(root))

  // access-ordered LRU: open() refreshes a stream's position, overflow
  // evicts the least-recently-used handle (each pins a SparkSession child
  // with its own session state — at many thousands of streams a forever-map
  // accumulates driver memory without bound; the reference caches streams
  // by weak ref and lets idle ones drop, leaf-server/src/streams.rs:19-84)
  private val handles =
    new java.util.LinkedHashMap[String, StreamHandle](16, 0.75f, true)
  private val modules = mutable.Map.empty[String, ModuleDef]

  // per-stream write locks live on the STORE, not the handle: an evicted
  // handle still referenced somewhere shares the lock with its replacement,
  // so two handle instances for one stream can never write concurrently
  private val streamLocks =
    scala.collection.concurrent.TrieMap.empty[String, Object]
  private[stream] def lockFor(id: String): Object =
    streamLocks.getOrElseUpdate(id, new Object)

  private val openTallies =
    scala.collection.concurrent.TrieMap.empty[String, Long]

  // Content-addressed module blob store (the staging/GC analog of the
  // reference's module upload path, storage.rs:492-546): every registered
  // module is staged to disk under its cid (tmp file + atomic move), so a
  // fresh process can resolve any previously-uploaded cid, and unreferenced
  // blobs can be collected.
  private val modulesDir = Paths.get(root, "modules")

  def registerModule(m: ModuleDef): String = synchronized {
    modules(m.cid) = m
    Files.createDirectories(modulesDir)
    val blob = modulesDir.resolve(m.cid + ".json")
    if (!Files.exists(blob)) {
      val tmp = modulesDir.resolve(m.cid + ".json.tmp")
      Files.write(tmp, BackupService.moduleToJson(m).getBytes(UTF_8))
      Files.move(tmp, blob, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
    m.cid
  }

  /** Wire-CID alias sidecars: a native-transport client addresses a module
    * by the CID of ITS OWN encoding; the wire→internal mapping persists
    * next to the blob so client CID equality survives a server restart
    * (an in-memory map alone breaks stream/info equality after a bounce). */
  def recordModuleAlias(wireCid: String, internalCid: String): Unit = synchronized {
    Files.createDirectories(modulesDir)
    val f = modulesDir.resolve(wireCid + ".alias")
    if (!Files.exists(f)) {
      val tmp = modulesDir.resolve(wireCid + ".alias.tmp")
      Files.write(tmp, internalCid.getBytes(UTF_8))
      Files.move(tmp, f, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
  }

  def moduleAlias(wireCid: String): Option[String] = synchronized {
    val f = modulesDir.resolve(wireCid + ".alias")
    if (Files.exists(f)) Some(new String(Files.readAllBytes(f), UTF_8)) else None
  }

  /** Stash the client's own DRISL encoding of an uploaded module next to
    * its alias — reference backup buckets carry module blobs in exactly
    * this encoding (`modules/{cid}.module.drisl.zstd`), so export can ship
    * the byte-identical blob the client content-addressed. */
  def recordWireModule(wireCid: String, bytes: Array[Byte]): Unit = synchronized {
    Files.createDirectories(modulesDir)
    val f = modulesDir.resolve(wireCid + ".wire")
    if (!Files.exists(f)) {
      val tmp = modulesDir.resolve(wireCid + ".wire.tmp")
      Files.write(tmp, bytes)
      Files.move(tmp, f, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
  }

  def wireModuleBytes(wireCid: String): Option[Array[Byte]] = synchronized {
    val f = modulesDir.resolve(wireCid + ".wire")
    if (Files.exists(f)) Some(Files.readAllBytes(f)) else None
  }

  /** Reverse lookup (internal → wire) for surfacing the client's own CID
    * in stream/info; a directory scan, fine at module-count scale. */
  def wireAliasFor(internalCid: String): Option[String] = synchronized {
    if (!Files.exists(modulesDir)) return None
    val l = Files.list(modulesDir)
    try l.iterator().asScala
      .filter(_.toString.endsWith(".alias"))
      .find(p => new String(Files.readAllBytes(p), UTF_8) == internalCid)
      .map(_.getFileName.toString.stripSuffix(".alias"))
    finally l.close()
  }

  def module(cid: String): Option[ModuleDef] = synchronized {
    modules.get(cid).orElse {
      val blob = modulesDir.resolve(cid + ".json")
      if (!Files.exists(blob)) None
      else {
        val m = BackupService.moduleFromJson(
          new String(Files.readAllBytes(blob), UTF_8))
        if (m.cid != cid) None else { modules(cid) = m; Some(m) }
      }
    }
  }

  /** Delete module blobs referenced by no stream in this store root
    * (each stream's meta.json names its current module). Only blobs staged
    * longer than `minAgeMs` ago are eligible — a freshly-uploaded module is
    * typically unreferenced for the window between upload and stream
    * create, and must not be swept out from under that create (the
    * reference GCs staged-but-unreferenced blobs after 500s,
    * storage.rs:492-546). Returns the number of blobs collected. */
  def gcModuleBlobs(minAgeMs: Long = 500 * 1000L): Int = synchronized {
    if (!Files.exists(modulesDir)) return 0
    val staleBefore = System.currentTimeMillis() - minAgeMs
    val referenced: Set[String] = {
      val rootDir = Paths.get(root)
      val dirs = Files.list(rootDir)
      try dirs.iterator().asScala
        .filter(p => Files.isDirectory(p) && Files.exists(p.resolve("meta.json")))
        .flatMap { p =>
          val meta = new String(Files.readAllBytes(p.resolve("meta.json")), UTF_8)
          "\"moduleCid\":\"([^\"]+)\"".r.findFirstMatchIn(meta).map(_.group(1))
        }.toSet
      finally dirs.close()
    }
    val blobs = Files.list(modulesDir)
    val dead =
      try blobs.iterator().asScala
        .filter(_.toString.endsWith(".json"))
        .filter(p => Files.getLastModifiedTime(p).toMillis < staleBefore)
        .filterNot(p => referenced.contains(
          p.getFileName.toString.stripSuffix(".json"))).toList
      finally blobs.close()
    dead.foreach { p =>
      modules.remove(p.getFileName.toString.stripSuffix(".json"))
      Files.deleteIfExists(p)
    }
    // alias sidecars follow their blob: collect any (stale) alias whose
    // internal module no longer exists
    val aliases = Files.list(modulesDir)
    val orphaned =
      try aliases.iterator().asScala
        .filter(_.toString.endsWith(".alias"))
        .filter(p => Files.getLastModifiedTime(p).toMillis < staleBefore)
        .filterNot(p => Files.exists(modulesDir.resolve(
          new String(Files.readAllBytes(p), UTF_8) + ".json"))).toList
      finally aliases.close()
    orphaned.foreach(Files.deleteIfExists(_))
    // wire-encoding stashes follow their alias (one tick behind)
    val wires = Files.list(modulesDir)
    val wireOrphans =
      try wires.iterator().asScala
        .filter(_.toString.endsWith(".wire"))
        .filter(p => Files.getLastModifiedTime(p).toMillis < staleBefore)
        .filterNot(p => Files.exists(modulesDir.resolve(
          p.getFileName.toString.stripSuffix(".wire") + ".alias"))).toList
      finally wires.close()
    wireOrphans.foreach(Files.deleteIfExists(_))
    dead.size
  }

  // streams currently being restored by an import: while claimed, client
  // opens and creates of the id fail loudly. This is what makes the
  // failed-import cleanup (dropStream) provably safe — the only stream
  // state that can exist under a claimed id is state the import itself
  // created, never a concurrent caller's racing create or append.
  private val importOwned =
    scala.collection.concurrent.TrieMap.empty[String, Unit]

  /** Atomically claim `id` for an import and create its handle: the claim
    * is taken FIRST, and every client open/create re-checks it inside the
    * per-id lock, so no concurrent create can slip in after the
    * exists-check — the only state that can appear under a claimed id is
    * the import's own. One import per id at a time — a second concurrent
    * import fails fast instead of racing the first and then deleting its
    * work. The handle creation itself runs OUTSIDE lockFor(id): the claim
    * already excludes racing client opens, and holding this stream's lock
    * across openUnguarded would run LRU-eviction closes of OTHER streams
    * (which take their own write locks) while holding it — the ABBA
    * hold-and-wait the deferred-close design exists to prevent. */
  private[stream] def beginImport(id: String): StreamHandle = {
    require(importOwned.putIfAbsent(id, ()).isEmpty,
      s"an import into $id is already in progress")
    try {
      lockFor(id).synchronized {
        require(!exists(id), s"restore target $id is not empty")
      }
      openUnguarded(id)
    } catch { case t: Throwable => importOwned.remove(id); throw t }
  }

  /** Release an import claim (success or after cleanup). */
  private[stream] def endImport(id: String): Unit = importOwned.remove(id)

  /** A1: open or create the stream with the given id. A previously evicted
    * stream transparently reopens from its on-disk meta. Construction and
    * eviction happen OUTSIDE the store monitor: handle init and close both
    * take the stream's write lock, and a lock holder may call back into
    * synchronized store methods (module resolution) — nesting the two
    * orders would deadlock. */
  def open(id: String): StreamHandle = openUnguarded(id, guardImport = true)

  /** `guardImport = true` (every client path) refuses an id currently
    * claimed by an import. The claim is re-checked INSIDE the per-id
    * lock — beginImport publishes the claim BEFORE it creates the
    * handle — so a racing open can never attach to the import's
    * half-built stream; the
    * fast path reads the cached handle FIRST and then the claim, because
    * a claim can only be taken on an id with no existing stream (a
    * handle cached before the check either belongs to a finished import
    * or the check sees the claim and falls through to the locked path).
    * The eviction closes still run OUTSIDE the lock — wrapping this
    * whole call in lockFor(id) would re-create the ABBA deadlock the
    * deferred-close dance exists to prevent. */
  private def openUnguarded(id: String,
      guardImport: Boolean = false): StreamHandle = {
    def claimed: Boolean = guardImport && importOwned.contains(id)
    def refuse(): Nothing = throw new IllegalStateException(
      s"stream $id is being restored by an import — retry when it completes")
    val cached = synchronized(Option(handles.get(id)))
    cached match {
      case Some(h) if !h.isClosed && !claimed => h
      case _ =>
        // evicted handles close AFTER this stream's lock is released:
        // close() takes the EVICTED stream's write lock, so closing
        // while holding lockFor(id) orders two different stream locks —
        // two concurrent opens evicting each other's streams would
        // deadlock ABBA. Deferring the close breaks hold-and-wait.
        var toClose: List[StreamHandle] = Nil
        val opened = lockFor(id).synchronized {
          if (claimed) refuse()
          synchronized(Option(handles.get(id))) match {
            case Some(h) if !h.isClosed => h
            case _ =>
              val h = new StreamHandle(this, id)
              openTallies.updateWith(id)(c => Some(c.getOrElse(0L) + 1))
              toClose = synchronized {
                handles.put(id, h)
                val out = mutable.ListBuffer.empty[StreamHandle]
                val it = handles.entrySet().iterator()
                while (handles.size > maxOpenHandles && it.hasNext) {
                  out += it.next().getValue
                  it.remove()
                }
                out.toList
              }
              h
          }
        }
        toClose.foreach(_.close())
        opened
    }
  }

  /** Number of handles currently cached (test observability for the LRU). */
  def openHandleCount: Int = synchronized(handles.size)

  /** After a vector-index maintenance flip: every OPEN handle
    * re-resolves its attached views of `indexDir` against the new
    * manifest generation. Closed streams heal on their next open
    * (initialize re-attaches); in between, readers drain on the
    * retained previous generation. */
  def refreshAttachedIndexes(indexDir: String): Unit = {
    val open = synchronized {
      import scala.jdk.CollectionConverters._
      handles.values().asScala.toVector
    }
    open.filterNot(_.isClosed).foreach { h =>
      try h.reattachVectorIndexes(indexDir)
      catch { case _: IllegalStateException => /* evicted mid-iteration */ }
    }
  }

  /** Times a handle was CONSTRUCTED for this id (test observability: a
    * backup sweep that thrashes the LRU shows up as this count growing
    * tick over tick with no new work). */
  def handleOpens(id: String): Long = openTallies.getOrElse(id, 0L)
  def totalHandleOpens: Long = openTallies.values.sum

  /** The persisted (latestIdx, stateVer, metaMtimeMs) of a stream, read
    * straight from its meta.json WITHOUT opening a handle (no session
    * init, no LRU promotion, no eviction). This is the backup sweep's
    * staleness probe: at thousands of streams with a small handle LRU,
    * opening every cataloged stream each tick would evict every hot
    * handle every sweep interval — the probe lets the sweep touch only
    * streams with new events or state. The mtime is part of the identity:
    * a stream dropped and recreated can reach the same (latestIdx,
    * stateVer) pair as its predecessor, and a module swap changes neither
    * — the fresh meta.json write is what distinguishes both. */
  def persistedMeta(id: String): Option[(Long, Long, Long)] = {
    val p = Paths.get(root, dbNameFor(id), "meta.json")
    if (!Files.exists(p)) None
    else {
      val s = new String(Files.readAllBytes(p), UTF_8)
      def num(k: String): Long = ("\"" + k + "\":(-?\\d+)").r
        .findFirstMatchIn(s).map(_.group(1).toLong).getOrElse(0L)
      Some((num("latestIdx"), num("stateVer"),
        Files.getLastModifiedTime(p).toMillis))
    }
  }

  /** True iff the stream exists — open in this process or persisted on
    * disk (every created stream saves meta.json at module install). */
  def exists(id: String): Boolean = synchronized {
    handles.containsKey(id) ||
      Files.exists(Paths.get(root, dbNameFor(id), "meta.json"))
  }

  /** Create a stream that must not already exist: the store-level takeover
    * guard. The per-id lock serializes racing creates, and `exists` is
    * disk-backed, so the guard holds across server restarts — no
    * driver-resident registry of every stream ever created is needed. */
  def createStream(id: String, m: ModuleDef): StreamHandle =
    lockFor(id).synchronized {
      if (exists(id))
        throw new IllegalArgumentException(s"stream already exists: $id")
      val h = open(id)
      h.setModule(m)
      h
    }

  /** Remove a stream entirely: evict and close its handle, drop its
    * database from the catalog, and delete its directory. Used to undo a
    * partially-created stream when an import fails partway — a failed
    * restore must not leave an empty stream squatting on the id. */
  def dropStream(id: String): Unit = lockFor(id).synchronized {
    val h = synchronized(Option(handles.remove(id)))
    h.foreach(_.close())
    val dbName = dbNameFor(id)
    // external `events` table: DROP leaves the log files, the directory
    // delete below removes them; managed state tables live under the
    // stream dir's warehouse and go with CASCADE + the delete
    try spark.sql(s"DROP DATABASE IF EXISTS $dbName CASCADE")
    catch { case e: Exception =>
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"dropping database $dbName failed: ${e.getMessage}") }
    def rm(p: Path): Unit = {
      if (Files.isDirectory(p)) {
        val l = Files.list(p)
        try l.iterator().asScala.toList.foreach(rm) finally l.close()
      }
      Files.deleteIfExists(p)
    }
    rm(Paths.get(root, dbName))
  }

  /** The on-disk stream catalog: every persisted stream's id, recovered
    * from the meta.json each stream writes at module install (dir names
    * are id digests, so the id itself rides in the meta). O(streams)
    * directory scan — an admin/background-sweep operation, not a hot
    * path. Sorted for deterministic listings. */
  def listStreams(): Vector[String] = synchronized {
    val rootDir = Paths.get(root)
    if (!Files.exists(rootDir)) return Vector.empty
    val dirs = Files.list(rootDir)
    try dirs.iterator().asScala
      .filter(p => Files.isDirectory(p) && Files.exists(p.resolve("meta.json")))
      .flatMap { p =>
        val meta = new String(Files.readAllBytes(p.resolve("meta.json")), UTF_8)
        val id = "\"id\":\"((?:[^\"\\\\]|\\\\.)*)\"".r.findFirstMatchIn(meta)
          .map(m => StreamStore.unescapeJson(m.group(1)))
        // a pre-id meta self-heals on its next open (loadMeta rewrites);
        // until then the stream is invisible here — say so rather than
        // silently skipping it
        if (id.isEmpty) org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"stream dir ${p.getFileName} has a legacy meta.json without an " +
            "id field; it is skipped from listings until next open")
        id
      }.toVector.sorted
    finally dirs.close()
  }

  /** Is `indexDir` attached (under any prefix) to a stream OTHER than
    * `exceptId`? The /stream/forget exclusivity check (r16 ADVICE): an
    * owner-keyed takedown may delete from an attached index only when
    * no other tenant serves it. Normalized-path comparison (the
    * WriterLocks key — `file:` prefixes, `..`, trailing slashes cannot
    * alias past it); reads each stream's persisted attachment table
    * directly, no handle opens. O(streams) directory scan at takedown
    * rate, not a hot path. */
  def indexAttachedElsewhere(exceptId: String, indexDir: String): Boolean =
      synchronized {
    val want = graft.queries.WriterLocks.key(indexDir)
    listStreams().filterNot(_ == exceptId).exists { sid =>
      val p = Paths.get(root, dbNameFor(sid), "vector_attachments.tsv")
      Files.exists(p) && new String(Files.readAllBytes(p), UTF_8)
        .linesIterator.filter(_.nonEmpty).exists { l =>
          l.split("\t") match {
            case Array(_, _, d) => graft.queries.WriterLocks.key(d) == want
            case Array(_, d) => graft.queries.WriterLocks.key(d) == want
            case _ => false
          }
        }
    }
  }

  def dbNameFor(id: String): String = {
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(id.getBytes(UTF_8)).take(8).map("%02x".format(_)).mkString
    s"graft_$digest"
  }
}

object StreamStore {
  /** Resolve-and-use under LRU churn — the ONE retry loop behind
    * LeafServer RPC handlers and SubscriptionEngine pumps. A concurrent
    * `store.open` of another stream can evict a handle between a caller's
    * resolution and use; the eviction IllegalStateException is thrown
    * only at operation ENTRY (`ensureOpen`, whose "evicted" message this
    * probe matches — keep them in sync; `close()` holds the stream's
    * write lock, so it cannot interleave with an op in flight and no
    * partial effect precedes the throw), making a retry through a fresh
    * resolution side-effect-safe. Bounded; everything else propagates. */
  private[graft] def retryEvicted[H, A](resolve: => H)(use: H => A): A = {
    var attempts = 0
    while (true) {
      try return use(resolve)
      catch {
        case e: IllegalStateException
            if attempts < 20 &&
              String.valueOf(e.getMessage).contains("evicted") =>
          attempts += 1
      }
    }
    sys.error("unreachable")
  }

  /** Minimal JSON string escaping for stream ids in meta.json (ids are
    * DIDs/opaque tokens; quote and backslash are the only metacharacters
    * the regex-based meta reader must survive). */
  def escapeJson(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
  def unescapeJson(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")

  val eventSchema: StructType = StructType(Seq(
    StructField("idx", LongType, nullable = false),
    StructField("user", StringType, nullable = true),
    StructField("payload", BinaryType, nullable = true),
    StructField("signature", BinaryType, nullable = true)))
}

class StreamHandle(val store: StreamStore, val id: String) {
  import StreamStore.eventSchema
  // Per-stream session: shares the SparkContext and external catalog with
  // the store's session (cheap), but owns its session state — current
  // database, temp views ("event"), registered functions. This is what lets
  // every stream execute concurrently: no global lock, no USE flip-flop on
  // a shared session (SURVEY §7.4.6).
  private val spark = store.spark.newSession()
  LeafFunctions.register(spark)
  val dbName: String = store.dbNameFor(id)
  private val dir: Path = Paths.get(store.root, dbName)
  private val metaPath: Path = dir.resolve("meta.json")

  // single writer per stream, mirroring the reference's write lock
  // (lib.rs:607) — owned by the STORE so a stale handle instance and its
  // replacement serialize against each other
  private val lock = store.lockFor(id)

  // The log directory is versioned: compaction writes the rewritten file
  // set into the NEXT version dir and flips the table location, so a reader
  // mid-scan (or holding a cached plan on another session) keeps a complete
  // file set — never the half-swapped view a move-out/move-in would show.
  // Version 0 is the unversioned "log" dir (original layout, still the
  // default until the first compaction).
  @volatile private var logVersion: Long = 0L
  private def logDir: Path =
    if (logVersion == 0) dir.resolve("log") else dir.resolve(s"log_v$logVersion")

  @volatile private var closedFlag = false
  def isClosed: Boolean = closedFlag
  private def ensureOpen(): Unit =
    if (closedFlag) throw new IllegalStateException(
      s"stream handle for $id is closed (evicted) — reopen via store.open")

  /** Release this handle: waits for any in-flight operation (shared write
    * lock), then marks the handle unusable. All durable state is already on
    * disk (meta.json is saved on every mutation), so close drops only
    * driver-side session state; store.open(id) reopens from disk. */
  def close(): Unit = lock.synchronized {
    closedFlag = true
  }

  @volatile private var latestIdx: Long = 0L
  @volatile private var cursor: Long = 0L
  // current redaction-set generation dir name ("" = none); declared with
  // the other meta fields BEFORE init() runs — init builds the events
  // view from it
  @volatile private var redactionsDir: String = ""
  // redaction-exposure bookkeeping (round 16, verdict r15 item 6):
  // redactSeq counts redaction COMMITS monotonically (the generation-dir
  // version resets when compaction drains the set, so it can't carry
  // this); rematSeq is the redactSeq value the module tables last
  // converged with (rematerialize, module swap — both replay the
  // redacted log). rematSeq < redactSeq means module tables still hold
  // rows materialized from pre-redaction payloads — the exposure window
  // an operator must be able to SEE instead of remember.
  @volatile private var redactSeq: Long = 0L
  @volatile private var rematSeq: Long = 0L
  @volatile private var moduleCid: Option[String] = None
  @volatile private var signingKey: Option[Array[Byte]] = None
  // monotone counter bumped on every state-DB mutation (state events
  // bypass the log, so latestIdx alone can't tell a backup sweep whether
  // anything changed — the reference tracks the same thing as
  // state_db_updated_at, storage.rs:89-90/281)
  @volatile private var stateVer: Long = 0L

  /** Install a batch-signing key: every accepted batch is HMAC-SHA256
    * signed over the deterministic encoding of its (user, payload) pairs,
    * and the one batch signature is stamped on every event of the batch —
    * the reference's signing discipline (lib.rs:621-632; empty signature
    * when no key, 628-632). */
  def setSigningKey(key: Array[Byte]): Unit = { signingKey = Some(key) }

  private def signBatch(batch: Seq[IncomingEvent]): Array[Byte] =
    signingKey match {
      case None => Array.empty[Byte]
      case Some(key) =>
        import graft.drisl.{DValue, Drisl}
        val body = Drisl.encode(DValue.DArray(batch.toVector.map(e =>
          DValue.obj(
            "user" -> DValue.text(if (e.user == null) "" else e.user),
            "payload" -> DValue.DBytes(e.payload)))))
        val mac = javax.crypto.Mac.getInstance("HmacSHA256")
        mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
        mac.doFinal(body)
    }

  init()

  private def init(): Unit = lock.synchronized {
    // resolve the current log version left by a previous process or an
    // evicted predecessor handle
    if (Files.exists(dir)) {
      val vre = "log_v(\\d+)".r
      logVersion = withList(dir)(_.flatMap(p =>
        p.getFileName.toString match {
          case vre(v) => Some(v.toLong)
          case _ => None
        }).maxOption).getOrElse(0L)
    }
    Files.createDirectories(logDir)
    // anchor the database (and thus every managed table) inside the store
    // root — otherwise tables land in the session-global warehouse dir,
    // where stale files from a previous run collide with CREATE TABLE
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $dbName " +
      s"LOCATION '${dir.resolve("warehouse").toUri}'")
    // the stream's database is this session's resolution context for its
    // whole lifetime — module SQL uses unqualified names
    spark.sql(s"USE $dbName")
    if (Files.exists(metaPath)) loadMeta()
    loadAttachments()
    // re-resolve recorded index attachments against the index's CURRENT
    // manifest generation — views created before a maintenance flip
    // would otherwise point at a directory the next flip retires. A
    // since-deleted index only drops its own views (loudly logged).
    attachments.foreach { case (p, (k, d)) =>
      try attachViewsFor(p, k, d)
      catch {
        case e: Exception =>
          System.err.println(s"[graft] stale $k-index attachment " +
            s"$p -> $d failed to re-resolve: ${e.getMessage}")
      }
    }
    // no seed file needed: the raw table declares its schema explicitly,
    // and scanning an empty log dir yields zero rows. `events_raw` is the
    // physical log table; `events` is the REDACTION VIEW every consumer
    // (modules, raw scans, replay, backup, compaction) reads through —
    // see refreshEventsView. The legacy layout had `events` as the
    // physical table: drop it (as table or view) before recreating.
    try spark.sql(s"DROP TABLE IF EXISTS $dbName.events")
    catch { case _: Exception => /* a view under the legacy table name */ }
    spark.sql(s"DROP TABLE IF EXISTS $dbName.events_raw")
    spark.sql(
      s"""CREATE TABLE $dbName.events_raw (idx BIGINT, user STRING, payload BINARY, signature BINARY)
         |USING PARQUET LOCATION '${logDir.toUri}'""".stripMargin)
    refreshEventsView()
  }

  // ---------------- redaction (store-of-record forgetting) ----------------
  //
  // The right-to-be-forgotten verb AT the corpus of record — the round-14
  // delete verbs cover the four DERIVED index families; this one makes
  // the per-stream event log itself forget. Designed as REDACTION, not
  // row deletion, to preserve the event-sourcing invariants: idx stays
  // contiguous (replay windows, has_more math, batch signatures all keyed
  // on it), the row survives, only its PAYLOAD renders NULL. The redacted
  // idx set is an O(redacted) parquet artifact committed by the stream's
  // atomic meta rewrite (the family pointer-flip discipline), and the
  // `events` view — the ONE seam every reader resolves through — renders
  // a payload-nulling broadcast join only while the set is non-empty.
  // The physical purge amortizes into compactLog: the rewrite reads the
  // view, so nulls bake into the new log version and the set drains in
  // the same commit.

  /** `rematSeq < redactSeq`: module tables still hold rows materialized
    * from payloads redacted SINCE their last full replay — the exposure
    * window `redactEvents(rematerialize = false)` leaves open on
    * purpose (a cost choice). Surfaced through `/stream/info` (the
    * dedupIndexStale discipline) so an operator sees it instead of
    * remembering it; rematerialize, a module swap, or a restore
    * converges it. */
  def moduleTablesPredateRedaction: Boolean = rematSeq < redactSeq

  /** (redaction commit the module tables last converged with, latest
    * redaction commit) — the exposure window's endpoints. */
  def redactionExposure: (Long, Long) = (rematSeq, redactSeq)

  /** Number of redacted events (meta-committed set size). */
  def redactedCount: Long =
    if (redactionsDir.isEmpty) 0L
    else spark.read.parquet(dir.resolve(redactionsDir).toString).count()

  private def currentRedactions(): DataFrame =
    if (redactionsDir.isEmpty) {
      spark.createDataFrame(java.util.List.of[Row](),
        StructType(Seq(StructField("idx", LongType, nullable = false))))
    } else spark.read.parquet(dir.resolve(redactionsDir).toString)
      .select(col("idx"))

  /** (Re-)create the `events` view over the raw log: a pass-through
    * SELECT while no redactions exist (zero plan cost — no join renders),
    * a payload-nulling LEFT JOIN against the bounded redaction set while
    * they do. Recreated on every redaction commit and every compaction
    * flip; in-flight readers hold the previous view text over RETAINED
    * generations (one-cycle rule), so no read ever breaks mid-flip. */
  private def refreshEventsView(): Unit = {
    val body =
      if (redactionsDir.isEmpty)
        s"SELECT idx, user, payload, signature FROM $dbName.events_raw"
      else
        s"""SELECT e.idx, e.user,
           |  CASE WHEN r.idx IS NULL THEN e.payload
           |       ELSE CAST(NULL AS BINARY) END AS payload,
           |  e.signature
           |FROM $dbName.events_raw e
           |LEFT JOIN parquet.`${dir.resolve(redactionsDir).toUri}` r
           |  ON e.idx = r.idx""".stripMargin
    spark.sql(s"CREATE OR REPLACE VIEW $dbName.events AS $body")
    refreshBoth("events")
  }

  private def nextRedactionsDir(): String = {
    val v = if (redactionsDir.isEmpty) 0
      else redactionsDir.stripPrefix("redactions.v").toInt
    s"redactions.v${v + 1}"
  }

  /** Sweep redaction generations past the retention window (live + one
    * displaced for in-flight readers — the compactLog rule). */
  private def sweepRedactions(keep: Set[String]): Unit = {
    val re = "redactions\\.v\\d+".r
    withList(dir)(_.filter { p =>
      val n = p.getFileName.toString
      re.pattern.matcher(n).matches() && !keep.contains(n)
    }.toList).foreach(deleteRecursively)
  }

  /** Redact events by idx (RPC shape). See [[redactEventsDf]]. */
  def redactEvents(idxs: Seq[Long],
      rematerialize: Boolean = false): Map[String, Long] =
    redactFor(idxs, Seq.empty, rematerialize)

  /** Redact every event AUTHORED BY one of `users` — the shape a real
    * right-to-be-forgotten request arrives in (user-keyed, not
    * idx-keyed). See [[redactFor]]. */
  def redactEventsByUser(users: Seq[String],
      rematerialize: Boolean = false): Map[String, Long] =
    redactFor(Seq.empty, users, rematerialize)

  /** Redact the union of an explicit idx set and every event authored
    * by one of `users`, in ONE commit. The user resolution is one
    * pushdown-filtered scan of the raw log (`user` is a first-class
    * parquet column, so dictionary/stats pruning applies) — a
    * takedown-rate operation, amortized over the same O(redacted)
    * commit as the idx path. The `user` column itself SURVIVES
    * redaction (idx contiguity and authorship stay auditable; only the
    * payload forgets), so re-running the same user takedown is a
    * provable no-op. */
  def redactFor(idxs: Seq[Long], users: Seq[String],
      rematerialize: Boolean = false): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    val byIdx = spark.createDataFrame(idxs.map(i => Row(i)).asJava,
      StructType(Seq(StructField("idx", LongType, nullable = false))))
    val ids =
      if (users.isEmpty) byIdx
      else byIdx.union(spark.table(s"$dbName.events_raw")
        .filter(col("user").isin(users: _*)).select(col("idx")))
    redactEventsDf(ids, rematerialize)
  }

  /** Redact the events whose idx is in `ids` (a 1-column `idx` frame):
    * bounded to the log's range and to not-already-redacted (retries
    * idempotent, absent idx a no-op), merged into a fresh redactions
    * generation, committed by ONE atomic meta rewrite, and the `events`
    * view re-rendered — every reader from that moment sees NULL payloads
    * for the set. O(redacted) work; nothing in the log moves.
    *
    * Derived MODULE tables keep rows materialized from the payload
    * before it was redacted — replay determinism means re-deriving them
    * is always possible: pass `rematerialize = true` to drop and replay
    * the module tables over the redacted log in the same call (O(log),
    * the module-swap path), or leave the default and let the next
    * module swap / restore converge them. The four index families have
    * their own delete verbs for the same reason. */
  def redactEventsDf(ids: DataFrame,
      rematerialize: Boolean = false): Map[String, Long] = lock.synchronized {
    ensureOpen()
    val cur = currentRedactions()
    val before = cur.count()
    val merged = cur.union(
        ids.select(col("idx").cast("long").as("idx")).distinct()
          .filter(col("idx").between(1L, latestIdx))
          .join(cur, Seq("idx"), "left_anti"))
    val next = nextRedactionsDir()
    merged.coalesce(1).write
      .mode(SaveMode.Overwrite).parquet(dir.resolve(next).toString)
    val total = spark.read.parquet(dir.resolve(next).toString).count()
    val displaced = redactionsDir
    redactionsDir = next
    // an idempotent retry / out-of-range no-op widens no exposure —
    // only a commit that actually redacted new rows bumps the counter
    if (total > before) redactSeq += 1
    saveMeta() // THE commit: the meta rewrite is the pointer flip
    refreshEventsView()
    sweepRedactions(keep = Set(next, displaced))
    if (rematerialize) currentModule.foreach { m =>
      // the module-swap replay path minus the module change: drop the
      // module's tables (never the events/attached-index views),
      // re-init, replay the (now redacted) log
      listTables().filterNot(t => t == "events" || t == "events_raw" ||
          t.startsWith("state_") || isCatalogView(t))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $dbName.$t"))
      cursor = 0L
      runStatements(m.initSql, Map.empty)
      rematSeq = redactSeq // tables about to converge with this commit
      saveMeta()
      catchUp()
      listTables().foreach(refreshBoth)
    }
    Map("redacted" -> total)
  }

  // ---------------- composed-forget audit log ----------------
  //
  // TWO lines per Forget invocation (round 17, verdict r16 item 2 — the
  // ledger records INTENTS, not just completions):
  //
  //   `<seq> pending <targets> crc=<crc32>`   BEFORE the first leg,
  //   `<seq> committed <summary> crc=<crc32>` after the last leg,
  //
  // where the committed summary names every surface's commit (stream
  // redact_seq + each family's history seq). A crash mid-forget leaves
  // the pending line with no committed twin — DISCOVERABLE from the
  // ledger itself (an operator reads "pending" and re-runs; the legs are
  // idempotent), where the round-16 completions-only ledger recorded
  // nothing for an interrupted takedown. The per-family META_HISTORY /
  // HISTORY logs stay the source of DETAIL; these lines are the
  // stream-level index tying one takedown's five commits together. Same
  // torn-tail discipline as the family histories: newline-prefixed
  // appends, crc-verified parse, seq contiguity asserted. Legacy lines
  // without a status token read as committed (they were only ever
  // written after every leg).

  private def forgetAuditFile: Path = dir.resolve("FORGET_AUDIT")

  private def writeForgetAuditLine(seq: Int, status: String,
      text: String): Unit = {
    require(!text.contains("\n"), "audit text must be one line")
    val body = s"$seq $status $text"
    val crc = new java.util.zip.CRC32()
    crc.update(body.getBytes(UTF_8))
    Files.write(forgetAuditFile,
      ("\n" + body + " crc=" + crc.getValue).getBytes(UTF_8),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
  }

  /** Open a takedown INTENT: append the pending line BEFORE the first
    * leg commits, so an interrupted forget is discoverable from the
    * ledger. Returns the intent's seq — [[completeForgetAudit]] closes
    * it after the last leg. */
  def beginForgetAudit(targets: String): Int = lock.synchronized {
    val seq = forgetAudit.size + 1
    writeForgetAuditLine(seq, "pending", targets)
    seq
  }

  /** Close intent `seq`: append its committed line naming every
    * surface's commit. Called by [[Forget]] after every requested leg
    * committed — observability metadata written OUTSIDE the legs'
    * atomic commits on purpose (a crash between the last leg and this
    * append leaves a re-runnable pending intent, never a lost commit). */
  def completeForgetAudit(seq: Int, summary: String): Unit =
      lock.synchronized {
    require(forgetAudit.exists(e => e._1 == seq && e._2 == "pending"),
      s"forget intent $seq is not pending — either it was never begun, " +
        "or a concurrent recovery of the same takedown already " +
        "completed it (every leg is committed in that case; nothing " +
        "was lost)")
    writeForgetAuditLine(seq, "committed", summary)
  }

  /** The stream's takedown audit: (seq, status, text) oldest first,
    * one entry per intent — status `committed` once the closing line
    * landed (its text is then the commit summary), `pending` for an
    * intent still open (interrupted or in flight; its text is the
    * targets). A torn final line drops; a gap refuses loudly. */
  def forgetAudit: Seq[(Int, String, String)] = {
    if (!Files.exists(forgetAuditFile)) return Seq.empty
    import scala.jdk.CollectionConverters._
    val lines = Files.readAllLines(forgetAuditFile).asScala.toSeq
      .filter(_.nonEmpty).flatMap { l =>
        l.lastIndexOf(" crc=") match {
          case -1 => None // torn (every line ships with a crc)
          case i =>
            val body = l.substring(0, i)
            val want = l.substring(i + 5).toLongOption
            val c = new java.util.zip.CRC32()
            c.update(body.getBytes(UTF_8))
            if (!want.contains(c.getValue)) None
            else body.split(" ", 3) match {
              case Array(seq, st, rest) if seq.toIntOption.isDefined &&
                  (st == "pending" || st == "committed") =>
                Some((seq.toInt, st, rest))
              case _ => body.split(" ", 2) match {
                // legacy completions-only line: no status token
                case Array(seq, rest) if seq.toIntOption.isDefined =>
                  Some((seq.toInt, "committed", rest))
                case _ => None
              }
            }
        }
      }
    // fold pending/committed pairs into one entry per seq (committed
    // wins — it is the intent's terminal state and carries the summary)
    val parsed = lines.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (seq, ls) =>
        ls.find(_._2 == "committed").getOrElse(ls.head) match {
          case (_, st, text) => (seq, st, text)
        }
    }
    require(parsed.map(_._1) == parsed.indices.map(_ + 1),
      s"FORGET_AUDIT of $id is corrupted: seqs " +
        s"${parsed.map(_._1).mkString(",")} are not contiguous from 1")
    parsed
  }

  /** (prefix -> (kind, indexDir)) of this stream's attached indexes —
    * what the composed forget RPC validates family dirs against. */
  def attachedIndexes: Map[String, (String, String)] =
    lock.synchronized(attachments.toMap)

  // ---------------- metadata ----------------

  private def saveMeta(): Unit = {
    val json = s"""{"id":"${StreamStore.escapeJson(id)}","latestIdx":$latestIdx,"cursor":$cursor,"stateVer":$stateVer,"redactionsDir":"$redactionsDir","redactSeq":$redactSeq,"rematSeq":$rematSeq,"moduleCid":${
      moduleCid.map("\"" + _ + "\"").getOrElse("null")}}"""
    val tmp = dir.resolve("meta.json.tmp")
    Files.write(tmp, json.getBytes(UTF_8))
    Files.move(tmp, metaPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def loadMeta(): Unit = {
    val s = new String(Files.readAllBytes(metaPath), UTF_8)
    def num(k: String): Long =
      ("\"" + k + "\":(-?\\d+)").r.findFirstMatchIn(s).map(_.group(1).toLong).getOrElse(0L)
    latestIdx = num("latestIdx"); cursor = num("cursor")
    stateVer = num("stateVer")
    redactionsDir = "\"redactionsDir\":\"([^\"]*)\"".r.findFirstMatchIn(s)
      .map(_.group(1)).getOrElse("")
    redactSeq = num("redactSeq"); rematSeq = num("rematSeq")
    // legacy metas (pre-exposure-counter) load as (0, 0) — truthful only
    // when NO redaction ever committed. A pre-upgrade stream that DID
    // redact carries a non-empty redactionsDir: loading it as redactSeq=0
    // would tell BackupService's re-export gate (curRedact >
    // archivedRedact, 0 > 0 never fires) that archives exported before
    // that redaction may keep the forgotten payloads forever, and
    // module_tables_predate_redaction would report converged when it
    // is not (r16 ADVICE). Seed redactSeq to 1 (rematSeq stays 0 — the
    // conservative "tables may predate it" reading); the next backup
    // tick re-exports once and the exposure signal turns truthful.
    if (redactSeq == 0L && !s.contains("\"redactSeq\":") &&
        redactionsDir.nonEmpty) {
      redactSeq = 1L
      saveMeta()
    }
    moduleCid = "\"moduleCid\":\"([^\"]+)\"".r.findFirstMatchIn(s).map(_.group(1))
    // self-heal metas written before the id field existed: the catalog
    // (listStreams) recovers ids from meta.json, so a legacy stream would
    // otherwise vanish from admin listings and the backup sweep even
    // though exists(id) still returns true. The handle knows its id —
    // rewrite once on open and the stream is cataloged forever after.
    if (!s.contains("\"id\":")) saveMeta()
    // re-register the persisted module definition so a fresh process can
    // serve queries without a new setModule call
    val modPath = dir.resolve("module.json")
    if (moduleCid.isDefined && Files.exists(modPath)) {
      val m = BackupService.moduleFromJson(new String(Files.readAllBytes(modPath), UTF_8))
      if (moduleCid.contains(m.cid)) store.registerModule(m)
    }
  }

  def latest: Long = latestIdx
  def moduleCursor: Long = cursor
  /** State-DB mutation counter (see `stateVer`) — with `latest`, the pair
    * a backup sweep compares to skip streams with nothing new. */
  def stateVersion: Long = stateVer
  /** The stream's module. Resolution falls back to the dir-local
    * module.json copy written at install: a stream OWNS its module (the
    * reference keeps it in the stream's own DB row), so the staged-blob
    * GC collecting the store-level copy — e.g. a tick racing an in-flight
    * create before the stream's meta records the reference — can never
    * orphan a stream. The fallback re-registers the blob. */
  def currentModule: Option[ModuleDef] = moduleCid.flatMap { c =>
    store.module(c).orElse {
      val modPath = dir.resolve("module.json")
      if (!Files.exists(modPath)) None
      else {
        val m = BackupService.moduleFromJson(
          new String(Files.readAllBytes(modPath), UTF_8))
        if (m.cid != c) None else { store.registerModule(m); Some(m) }
      }
    }
  }
  def currentModuleCid: Option[String] = moduleCid

  def eventsDF: DataFrame = spark.table(s"$dbName.events")

  /** Current log directory (versioned after the first compaction). */
  def logDirectory: Path = logDir

  /** Invalidate a table's cached file listing on this stream's session AND
    * the store's public session. Relation caches are per-session; with the
    * handle running on its own session, a drop/recreate or overwrite here
    * would otherwise leave readers on the store session pointing at files
    * that no longer exist. */
  private def refreshBoth(t: String): Unit =
    Seq(spark, store.spark).foreach(s =>
      try s.sql(s"REFRESH TABLE $dbName.$t") catch { case _: Exception => })

  private def refreshEvents(): Unit = {
    refreshBoth("events_raw"); refreshBoth("events")
  }

  // ---------------- module lifecycle (A13 + A6) ----------------

  /** Point the stream at a module; cursor resets to 0 and the whole log is
    * replayed through the new module's materializer (reference semantics:
    * lib.rs:222-235 + streams.rs:86-98 + lib.rs:499-590). */
  def setModule(m: ModuleDef): Unit = lock.synchronized {
    ensureOpen()
    store.registerModule(m)
    // persist the definition next to the log so a fresh process can reload
    // the stream (the reference content-addresses module blobs server-side)
    Files.write(dir.resolve("module.json"),
      BackupService.moduleToJson(m).getBytes(UTF_8))
    // drop previous module tables (everything except the events view,
    // its raw table, and attached index VIEWS); state tables survive
    // module swaps (separate state DB in the reference)
    listTables().filterNot(t => t == "events" || t == "events_raw" ||
        t.startsWith("state_") || isCatalogView(t))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $dbName.$t"))
    // purge orphaned table directories (left by a previous process or a
    // dropped table) so CREATE TABLE never trips over a stale location
    val live = listTables().toSet
    val wh = dir.resolve("warehouse")
    if (Files.exists(wh)) {
      withList(wh)(_.filter(p =>
          Files.isDirectory(p) && !live.contains(p.getFileName.toString))
        .toList).foreach(deleteRecursively)
    }
    moduleCid = Some(m.cid)
    cursor = 0L
    runStatements(m.initSql, Map.empty)
    if (stateTables().isEmpty) runStatements(m.stateInitSql, Map.empty)
    // the swap replays over the redacted log — module tables converge
    // with every redaction committed so far
    rematSeq = redactSeq
    saveMeta()
    catchUp()
    listTables().foreach(refreshBoth)
  }

  private def listTables(): Seq[String] =
    // filter out session temp views — SHOW TABLES includes them, but they
    // are not part of the stream's database
    spark.sql(s"SHOW TABLES IN $dbName").collect()
      .filterNot(_.getBoolean(2)).map(_.getString(1)).toSeq

  /** Catalog VIEWs in the stream's database — the `events` redaction
    * seam plus any attached index views (fg_vectors, fl_terms, …).
    * Module-table drops (swap, rematerialize) must skip them: they are
    * not derived from the module, and Spark 4's DROP TABLE refuses a
    * VIEW outright. */
  private def isCatalogView(t: String): Boolean =
    try spark.catalog.getTable(dbName, t).tableType == "VIEW"
    catch { case _: Exception => false }
  private def stateTables(): Seq[String] = listTables().filter(_.startsWith("state_"))

  /** Names of the stream's state tables (for backup snapshots). */
  def stateTableNames: Seq[String] = stateTables()

  /** Read one of the stream's tables through the stream's own session. */
  def tableDF(t: String): DataFrame = spark.table(s"$dbName.$t")

  /** Attach a persisted vector index (Similarity.buildVectorIndex layout)
    * as module-visible relations `{prefix}_centroids` / `{prefix}_vectors`
    * — plus `{prefix}_codebooks` / `{prefix}_codes` when the index carries
    * the PQ artifacts — so a named query can answer kNN from the index
    * with the query vector arriving as an A7 $-bound param: coarse probe
    * over centroids, ADC candidate scan over the codes-only fileset, exact
    * re-rank over vectors behind the bounded candidate set. Views, not
    * managed tables: the index stays external, rebuildable, and shared
    * across streams; the partition-column cell is normalized to BIGINT so
    * module SQL never sees partition-inference drift. */
  def attachVectorIndex(prefix: String, indexDir: String): Seq[String] =
    lock.synchronized {
      ensureOpen()
      require(prefix.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"bad index prefix: $prefix")
      require(!indexDir.contains("`") && !indexDir.contains("'"),
        s"bad index dir: $indexDir")
      val tables = attachViews(prefix, indexDir)
      // record the attachment beside the meta so (a) reopening the
      // stream re-resolves the views against the index's CURRENT
      // manifest generation, and (b) maintenance RPCs can refresh live
      // handles after a manifest flip (the retained-previous-generation
      // window covers readers in between)
      attachments(prefix) = ("vector", indexDir)
      saveAttachments()
      tables
    }

  /** (Re-)create the index views against the CURRENT manifest
    * generation. Callers hold the lock. */
  private def attachViews(prefix: String, indexDir: String): Seq[String] = {
    // one manifest snapshot for paths AND relation text — the vectors
    // and codes views render tombstone-filtered ("live") when the index
    // carries a delete set, so module SQL never sees deleted rows
    val (snap, rel) = graft.queries.Similarity.attachSnapshot(indexDir)
    spark.sql(s"CREATE OR REPLACE VIEW $dbName.${prefix}_centroids AS " +
      s"SELECT cell, c FROM ${rel("centroids")}")
    spark.sql(s"CREATE OR REPLACE VIEW $dbName.${prefix}_vectors AS " +
      s"SELECT vec_id, v, CAST(cell AS BIGINT) AS cell " +
      s"FROM ${rel("vectors")}")
    val base = Seq(s"${prefix}_centroids", s"${prefix}_vectors")
    val hasPq = Files.isDirectory(Paths.get(
      snap("codes").stripPrefix("file:")))
    if (!hasPq) base
    else {
      // code columns derive from THIS index's codebooks artifact
      // (Similarity.codeColsAt) — an index built at a larger corpus rung
      // attaches with its own geometry, not the session default
      val codeList = graft.queries.Similarity.codeColsAt(spark,
        snap("codebooks").stripPrefix("file:"))
        .mkString(", ")
      spark.sql(s"CREATE OR REPLACE VIEW $dbName.${prefix}_codebooks AS " +
        s"SELECT m, j, c FROM ${rel("codebooks")}")
      spark.sql(s"CREATE OR REPLACE VIEW $dbName.${prefix}_codes AS " +
        s"SELECT vec_id, $codeList, CAST(cell AS BIGINT) AS cell " +
        s"FROM ${rel("codes")}")
      base ++ Seq(s"${prefix}_codebooks", s"${prefix}_codes")
    }
  }

  // prefix -> (kind, indexDir), persisted as vector_attachments.tsv
  // beside the meta (tab-separated; attach() validates every field
  // against injection, so the format is unambiguous; two-field legacy
  // lines load as kind=vector). Lazy: initialize() runs from the
  // constructor BEFORE this declaration site and reads it.
  private lazy val attachments =
    mutable.LinkedHashMap.empty[String, (String, String)]

  private def attachmentsPath: Path = dir.resolve("vector_attachments.tsv")

  private def saveAttachments(): Unit = {
    val body = attachments
      .map { case (p, (k, d)) => s"$p\t$k\t$d" }.mkString("\n")
    val tmp = dir.resolve("vector_attachments.tsv.tmp")
    Files.write(tmp, body.getBytes(UTF_8))
    Files.move(tmp, attachmentsPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def loadAttachments(): Unit =
    if (Files.exists(attachmentsPath)) {
      new String(Files.readAllBytes(attachmentsPath), UTF_8)
        .split("\n").filter(_.contains("\t")).foreach { l =>
          l.split("\t", 3) match {
            case Array(p, k, d) => attachments(p) = (k, d)
            case Array(p, d) => attachments(p) = ("vector", d)
            case _ =>
          }
        }
    }

  private def attachViewsFor(prefix: String, kind: String,
      indexDir: String): Seq[String] = kind match {
    case "lexical" => lexicalViews(prefix, indexDir)
    case _ => attachViews(prefix, indexDir)
  }

  /** Re-resolve every attached view of `indexDir` (or all attachments
    * when `indexDir` is empty) against the index's current
    * manifest/meta pointer — what a maintenance or append RPC calls
    * after a commit flip so live handles leave the retained previous
    * generation before it is retired at the NEXT flip. */
  def reattachVectorIndexes(indexDir: String = ""): Unit =
    lock.synchronized {
      ensureOpen()
      attachments.foreach { case (p, (k, d)) =>
        if (indexDir.isEmpty || d == indexDir) attachViewsFor(p, k, d)
      }
    }

  /** Expose a built lexical (BM25) index inside this stream's database
    * as {prefix}_terms / {prefix}_docs / {prefix}_df / {prefix}_stats
    * views, so a module query can bind `$terms` as an A7 param and score
    * against the postings — the lexical twin of [[attachVectorIndex]].
    * The df/stats views resolve through the index's meta pointer, so an
    * append's commit flip needs the same re-attach the vector index
    * gets (the append RPC refreshes, stream open re-attaches). */
  def attachLexicalIndex(prefix: String, indexDir: String): Seq[String] =
    lock.synchronized {
      ensureOpen()
      require(prefix.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"bad index prefix: $prefix")
      require(!indexDir.contains("`") && !indexDir.contains("'"),
        s"bad index dir: $indexDir")
      val tables = lexicalViews(prefix, indexDir)
      attachments(prefix) = ("lexical", indexDir)
      saveAttachments()
      tables
    }

  private def lexicalViews(prefix: String, indexDir: String): Seq[String] = {
    val cols = Map(
      "terms" -> "term, doc_id, tf",
      "docs" -> "doc_id, dl",
      "df" -> "term, df",
      "stats" -> "n, avgdl")
    // one meta snapshot for all four views — per-artifact resolution
    // could straddle a concurrent pointer flip and mix generations; the
    // terms/docs views render tombstone-filtered ("live") when the index
    // carries a delete set, so module SQL never scores deleted docs
    val rel = graft.queries.Retrieval.lexRelation(spark, indexDir)
    Seq("terms", "docs", "df", "stats").map { sub =>
      spark.sql(s"CREATE OR REPLACE VIEW $dbName.${prefix}_$sub AS " +
        s"SELECT ${cols(sub)} FROM ${rel(sub)}")
      s"${prefix}_$sub"
    }
  }

  /** Reinstate an archived state table from a snapshot (restore path). */
  def restoreStateTable(name: String, df: DataFrame): Unit = lock.synchronized {
    require(name.startsWith("state_"), s"not a state table: $name")
    if (!listTables().contains(name))
      df.write.mode(SaveMode.Overwrite).saveAsTable(s"$dbName.$name")
    else {
      val snap = df.localCheckpoint(true)
      snap.write.mode(SaveMode.Overwrite).insertInto(s"$dbName.$name")
    }
    refreshBoth(name)
    stateVer += 1
    saveMeta()
  }

  // ---------------- append path (A2/A3/A4) ----------------

  /** Append a batch of events: authorize all (any failure rejects the whole
    * batch, nothing written), then append to the log and fold through the
    * materializer. Returns Right(newLatestIdx) or Left(rejection message). */
  def addEvents(batch: Seq[IncomingEvent]): Either[String, Long] = lock.synchronized {
    ensureOpen()
    if (batch.isEmpty) return Right(latestIdx)
    catchUp()
    val m = currentModule.getOrElse(return Left("no module installed"))

    val signature = signBatch(batch)
    val rows = batch.zipWithIndex.map { case (e, i) =>
      Row(latestIdx + i + 1, e.user, e.payload, signature)
    }
    val batchDF = spark.createDataFrame(rows.asJava, eventSchema)

    // A3: set-based authorize — the whole batch is visible as `event`; any
    // throw()/unauthorized() raised by any row rejects the whole batch,
    // which is exactly the reference's all-or-nothing outcome (lib.rs:696-705).
    if (m.authorizer.trim.nonEmpty) {
      batchDF.select(col("idx"), col("user"), col("payload"))
        .createOrReplaceTempView("event")
      try SqlText.prepare(m.authorizer).foreach(s => execInDb(s, Map.empty).foreach(_.count()))
      catch {
        case t: Throwable =>
          LeafFunctions.authFailure(t) match {
            case Some(l) => return Left(l.getMessage)
            case None => throw t
          }
      } finally spark.catalog.dropTempView("event")
    }

    val logBefore = listFiles(logDir)
    val snap = snapshotTables()
    try {
      batchDF.write.mode(SaveMode.Append).parquet(logDir.toString)
      refreshEvents()
      materialize(m, batchDF.select(col("idx"), col("user"), col("payload")))
      latestIdx += batch.size
      cursor = latestIdx
      saveMeta()
      commitBaks()
      // the store session may hold cached listings of the tables this batch
      // appended to (writes on the handle session only refresh it)
      snap.keys.foreach(t =>
        try store.spark.sql(s"REFRESH TABLE $dbName.$t") catch { case _: Exception => })
      Right(latestIdx)
    } catch {
      case t: Throwable =>
        rollback(logBefore, snap)
        LeafFunctions.authFailure(t) match {
          case Some(l) => Left(l.getMessage)
          case None => throw t
        }
    }
  }

  /** A11 + bulk-ingest fast path: append pre-indexed events as one
    * distributed write (idx must continue the sequence), then one set-based
    * materializer pass. This is the 100 TB ingest path.
    *
    * The batch is staged: the source pipeline is evaluated ONCE into a
    * staging dir (a second evaluation for the contiguity stats would re-run
    * arbitrarily expensive upstream work — encoding UDFs, joins); the
    * stats come from a cheap idx-only columnar re-read of the staged files,
    * and only a validated batch is moved into the log (a failed check
    * leaves the log untouched). */
  def bulkImport(events: DataFrame): Long = lock.synchronized {
    ensureOpen()
    val staging = Files.createTempDirectory(dir, ".import_")
    try {
      events.select(col("idx").cast("long"), col("user").cast("string"),
          col("payload").cast("binary"),
          coalesce(col("signature"), lit(Array.empty[Byte])).cast("binary").as("signature"))
        .write.mode(SaveMode.Overwrite).parquet(staging.toString)
      val stats = spark.read.parquet(staging.toString)
        .agg(min("idx"), max("idx"), count(lit(1))).head()
      if (stats.isNullAt(0)) return latestIdx // empty import is a no-op
      val (lo, hi, n) = (stats.getLong(0), stats.getLong(1), stats.getLong(2))
      require(lo == latestIdx + 1, s"import must start at ${latestIdx + 1}, got $lo")
      require(hi - lo + 1 == n, s"import range [$lo,$hi] not contiguous ($n rows)")
      withList(staging)(_.filter(_.toString.endsWith(".parquet")).toList)
        .foreach(f => Files.move(f, logDir.resolve(f.getFileName.toString)))
      refreshEvents()
      latestIdx = hi
      saveMeta()
      catchUp()
      latestIdx
    } finally deleteRecursively(staging)
  }

  /** A10: raw range scan, pruned by parquet min/max stats on idx. */
  def rawGetEvents(minIdx: Long, maxIdx: Long): DataFrame =
    eventsDF.filter(col("idx").between(minIdx, maxIdx)).orderBy("idx")

  /** Maintenance: compact the accumulated per-batch log files. Every append
    * adds at least one parquet file, so a long-lived stream degrades into
    * the classic small-files problem (per-file open cost dominates scans at
    * scale). Compaction rewrites the log range-partitioned on idx into
    * ~128MB files — idx-disjoint, so per-file min/max pruning gets strictly
    * better — and flips the events table to the new version directory.
    *
    * Snapshot isolation: the old file set is left fully intact until the
    * NEXT compaction (one retained version), so a reader that resolved the
    * table before the flip — including one on another session with a cached
    * file listing — scans a complete, consistent log; it never sees the
    * half-swapped state a move-out/move-in of individual files would
    * expose. Returns the new file count. */
  def compactLog(): Int = lock.synchronized {
    ensureOpen()
    val parts = listFiles(logDir).filter(_.toString.endsWith(".parquet")).toSeq
    if (parts.size <= 1) return parts.size
    val bytes = parts.map(Files.size(_)).sum
    val target = math.max(1, math.ceil(bytes / (128.0 * 1024 * 1024)).toInt)
    val oldDir = logDir
    val newDir = dir.resolve(s"log_v${logVersion + 1}")
    // the rewrite reads the events VIEW, so it doubles as the PHYSICAL
    // purge of redactions: nulled payloads bake into the new log version
    // and the redaction set drains in the same commit below
    eventsDF.repartitionByRange(target, col("idx"))
      .sortWithinPartitions("idx")
      .write.mode(SaveMode.Overwrite).parquet(newDir.toString)
    // catalog location flip is a single metadata update — readers resolve
    // either the complete old set or the complete new set
    spark.sql(s"ALTER TABLE $dbName.events_raw SET LOCATION '${newDir.toUri}'")
    logVersion += 1
    if (redactionsDir.nonEmpty) {
      val displaced = redactionsDir
      redactionsDir = ""
      saveMeta()
      refreshEventsView()
      // the displaced set survives one cycle for in-flight readers whose
      // view text still joins it (over the retained old log version)
      sweepRedactions(keep = Set(displaced))
    }
    refreshEvents()
    // retain exactly one previous version for in-flight readers; anything
    // older than that has had a full compaction cycle to finish
    val keep = Set(oldDir.getFileName.toString, newDir.getFileName.toString)
    val vre = "log(_v\\d+)?".r
    withList(dir)(_.filter { p =>
      val n = p.getFileName.toString
      vre.pattern.matcher(n).matches() && !keep.contains(n)
    }.toList).foreach(deleteRecursively)
    target
  }

  // ---------------- materialization (A4/A6) ----------------

  /** A6: replay unapplied events through the materializer. */
  def catchUp(): Long = lock.synchronized {
    ensureOpen()
    val m = currentModule.getOrElse(return cursor)
    if (cursor >= latestIdx) return cursor
    val pending = eventsDF
      .filter(col("idx") > cursor && col("idx") <= latestIdx)
      .select(col("idx"), col("user"), col("payload"))
    try { materialize(m, pending); commitBaks() }
    catch { case t: Throwable => restoreBaks(); throw t }
    cursor = latestIdx
    saveMeta()
    cursor
  }

  /** Run the materializer over a set of events. Batch-safe modules (every
    * statement an INSERT whose source never reads a table the materializer
    * writes) run set-based — one pass over the whole set. Others replay
    * per event in idx order, the reference's exact model. */
  /** Events replayed through the per-event fallback loop since this handle
    * opened — exposed so tests can assert a module took the set-based path. */
  @volatile var perEventReplays: Long = 0L

  /** Warnings emitted by the fallback loop (one per 10k replayed events). */
  @volatile var perEventWarnings: Long = 0L

  private def materialize(m: ModuleDef, events: DataFrame): Unit = {
    if (m.materializer.trim.isEmpty) return
    val stmts = preparedMaterializer(m)
    if (isBatchSafe(stmts)) {
      events.createOrReplaceTempView("event")
      try stmts.foreach(s => execInDb(s, Map.empty))
      finally spark.catalog.dropTempView("event")
    } else {
      val rows = events.orderBy("idx").collect()
      // a non-batch-safe module at bulk-ingest scale is a driver loop over
      // every event — semantically required, but it must be VISIBLE before
      // it dominates a 100 TB ingest: one warning per 10k replayed events
      val before = perEventReplays
      perEventReplays += rows.length
      if (perEventReplays / 10000 > before / 10000) {
        perEventWarnings += 1
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"stream $id: module ${m.cid} is not batch-safe — " +
            s"$perEventReplays events replayed one at a time on the driver; " +
            "rewrite its materializer as pure INSERTs for set-based ingest")
      }
      rows.foreach { r =>
        spark.createDataFrame(java.util.List.of(r), events.schema)
          .createOrReplaceTempView("event")
        try stmts.foreach(s => execInDb(s, Map.empty))
        finally spark.catalog.dropTempView("event")
      }
    }
  }

  // materializer statements after the UPDATE-FROM rewrite, cached per
  // module cid (the rewrite consults only table schemas, which are fixed
  // for a module's lifetime — re-deriving it per batch would re-analyze
  // probe queries on every append)
  @volatile private var stmtCache: Option[(String, Seq[String])] = None

  private def preparedMaterializer(m: ModuleDef): Seq[String] =
    stmtCache match {
      case Some((cid, ss)) if cid == m.cid => ss
      case _ =>
        val ss = SqlText.prepare(m.materializer).map(rewriteUpdateFrom)
        stmtCache = Some((m.cid, ss))
        ss
    }

  /** Rewrite the reference's `UPDATE t SET … FROM event WHERE …` upsert
    * shape (SQLite UPDATE-FROM — the "fold the latest event value into a
    * keyed row" module idiom) into the self-overwrite INSERT the engine
    * already executes set-based. The rewrite applies ONLY when the shape
    * is provably batch-safe:
    *  - every WHERE conjunct (Catalyst-parsed, split on And nodes so an
    *    OR above an AND is ONE conjunct, never mis-factored) is either an
    *    equi-key `t.col = <expr>` with the expr referencing event columns
    *    only, or a residual referencing event columns only (both
    *    probe-analyzed against the event schema — an unqualified
    *    reference that is not an event column fails the probe and vetoes
    *    the rewrite; a bare event-column name binds to the event even
    *    when the target shares the name, identically in batch and
    *    per-event replay);
    *  - every SET right-hand side references event columns only.
    * Under those conditions per-event replay in idx order ends with the
    * LAST matching event's values per key, which is exactly what the
    * rewrite computes (row_number over idx DESC per derived key), so one
    * set-based pass over the whole batch is identical to the loop — and
    * the engine's crash discipline (stash/commit/restore) applies
    * unchanged because the output is the existing INSERT OVERWRITE
    * shape. Statements that don't match return unchanged (a raw UPDATE
    * would not execute on v1 parquet today, so nothing regresses). */
  private[stream] def rewriteUpdateFrom(stmt: String): String = {
    val re = ("(?is)^\\s*UPDATE\\s+([A-Za-z_][A-Za-z0-9_]*)\\s+SET\\s+" +
      "(.*?)\\s+FROM\\s+event\\s+WHERE\\s+(.*?)\\s*;?\\s*$").r
    stmt match {
      case re(target, setClause, whereClause) =>
        try rewriteUpdateFrom0(target, setClause, whereClause).getOrElse(stmt)
        catch { case _: Exception => stmt }
      case _ => stmt
    }
  }

  /** Split on `,` at paren depth 0 outside quotes (SET-list assignments;
    * WHERE decomposition goes through the Catalyst parser so AND/OR
    * precedence is honoured, not a token scan). */
  private def splitTop(s: String, onComma: Boolean): Seq[String] = {
    require(onComma)
    val parts = scala.collection.mutable.Buffer.empty[String]
    val cur = new StringBuilder
    var depth = 0; var inStr = false; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { cur.append(c); if (c == '\'') inStr = false; i += 1 }
      else if (c == '\'') { inStr = true; cur.append(c); i += 1 }
      else if (c == '(') { depth += 1; cur.append(c); i += 1 }
      else if (c == ')') { depth -= 1; cur.append(c); i += 1 }
      else if (c == ',' && depth == 0) {
        parts += cur.toString; cur.setLength(0); i += 1
      } else { cur.append(c); i += 1 }
    }
    parts += cur.toString
    parts.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Analysis probe: does `expr` resolve against the event schema alone?
    * (schema-only — no data touched, no temp view required). Any embedded
    * subquery over a RELATION is rejected outright: a catalog table would
    * resolve in the probe too, and a rhs reading the evolving target mid-
    * batch is exactly the replay-order dependence the rewrite must not
    * collapse. */
  private def eventOnly(expr: String): Boolean =
    try {
      import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
      val probe = "SELECT (" + expr + ") FROM (SELECT CAST(NULL AS BIGINT) " +
        "AS idx, CAST(NULL AS STRING) AS user, CAST(NULL AS BINARY) " +
        "AS payload) AS event"
      val parsed = spark.sessionState.sqlParser.parsePlan(probe)
      val rels = parsed.collectWithSubqueries {
        case r: UnresolvedRelation => r }
      if (rels.nonEmpty) return false
      spark.sql(probe).queryExecution.analyzed
      true
    } catch { case _: Exception => false }

  private def rewriteUpdateFrom0(target: String, setClause: String,
      whereClause: String): Option[String] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{
      And, EqualTo, Expression, LambdaFunction, UnresolvedNamedLambdaVariable}
    val cols = spark.table(s"$dbName.$target").columns
    val colSet = cols.map(_.toLowerCase).toSet
    val parser = spark.sessionState.sqlParser
    val eventCols = Set("idx", "user", "payload")
    // Generation keeps ORIGINAL clause text wherever it can: the deduped-
    // event subquery is aliased `event` in the generated join, so
    // `event.`-qualified references and unambiguous bare event columns
    // work verbatim — no qualifier rewriting, so string literals and
    // higher-order-function lambdas pass through untouched. Only a BARE
    // event-column name that COLLIDES with a target column needs
    // qualification (the join scope would make it ambiguous; per-event
    // replay takes the same rewrite on 1-row batches, so batch and
    // sequential agree by construction) — that case re-renders the
    // parsed tree with the reference qualified. Rendering via .sql
    // cannot express lambdas (`LambdaFunction.sql` emits a
    // `lambdafunction(...)` call that does not re-analyze), so a clause
    // that needs BOTH a lambda and collision-qualification — or a lambda
    // inside a WHERE conjunct, whose per-conjunct original text the And
    // split cannot recover — refuses the rewrite (loud, never misbound).
    // A bare name shadowed by an enclosing lambda argument
    // (`user -> upper(user)`) is the lambda's variable, not the event
    // column — the shadow-tracking recursion never counts or rewrites it.
    def hasLambda(e: Expression): Boolean =
      e.collectFirst { case _: LambdaFunction => () }.isDefined
    def bareCollisions(e: Expression, shadowed: Set[String]): Int = e match {
      case lf: LambdaFunction =>
        val inner = shadowed ++ lf.arguments.collect {
          case v: UnresolvedNamedLambdaVariable =>
            v.nameParts.mkString(".").toLowerCase
        }
        bareCollisions(lf.function, inner)
      case a: UnresolvedAttribute if a.nameParts.length == 1 &&
          eventCols.contains(a.nameParts.head.toLowerCase) &&
          colSet.contains(a.nameParts.head.toLowerCase) &&
          !shadowed.contains(a.nameParts.head.toLowerCase) => 1
      case other => other.children.map(bareCollisions(_, shadowed)).sum
    }
    def qualifyBare(e: Expression): Expression = e.transform {
      case a: UnresolvedAttribute if a.nameParts.length == 1 &&
          eventCols.contains(a.nameParts.head.toLowerCase) =>
        UnresolvedAttribute(Seq("event", a.nameParts.head))
    }
    // SET a = expr, b = expr — rhs must parse and be event-only
    val asgRe = "(?s)^\\s*([A-Za-z_][A-Za-z0-9_]*)\\s*=\\s*(.*)$".r
    val assignments = splitTop(setClause, onComma = true).map {
      case asgRe(c, e) if colSet.contains(c.toLowerCase) =>
        val rhs = parser.parseExpression(e)
        if (!eventOnly(e)) return None
        val rendered =
          if (bareCollisions(rhs, Set.empty) == 0) e.trim
          else if (hasLambda(rhs)) return None
          else qualifyBare(rhs).sql
        c.toLowerCase -> rendered
      case _ => return None
    }.toMap
    // WHERE: split on Catalyst And nodes so SQL precedence is honoured —
    // `k = e AND a OR b` parses as Or(And(k=e, a), b), ONE conjunct whose
    // target reference fails the event-only probe → rewrite refused (the
    // old token-level AND split mis-factored it as key ∧ (a OR b)).
    // Conjunct text is regenerated from the tree (runs in the inner
    // `FROM event` scope, where bare and qualified event refs both
    // resolve) — lambdas there refuse the rewrite, per above.
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def targetKey(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute if a.nameParts.length == 2 &&
          a.nameParts.head.equalsIgnoreCase(target) &&
          colSet.contains(a.nameParts(1).toLowerCase) => Some(a.nameParts(1))
      case _ => None
    }
    val keys = scala.collection.mutable.Buffer.empty[(String, String)]
    val residuals = scala.collection.mutable.Buffer.empty[String]
    conjuncts(parser.parseExpression(whereClause)).foreach {
      case e if hasLambda(e) => return None
      case EqualTo(l, r) if targetKey(l).isDefined && eventOnly(r.sql) =>
        keys += ((targetKey(l).get, r.sql))
      case EqualTo(l, r) if targetKey(r).isDefined && eventOnly(l.sql) =>
        keys += ((targetKey(r).get, l.sql))
      case other if eventOnly(other.sql) => residuals += other.sql
      case _ => return None
    }
    if (keys.isEmpty) return None
    val kcols = keys.indices.map(i => s"__k$i")
    val derive = keys.zipWithIndex
      .map { case ((_, e), i) => s"($e) AS __k$i" }.mkString(", ")
    val resid =
      if (residuals.isEmpty) "" else s" WHERE ${residuals.mkString(" AND ")}"
    val setSel = cols.map { c =>
      assignments.get(c.toLowerCase) match {
        case Some(ee) =>
          s"CASE WHEN event.__m THEN ($ee) ELSE __t.`$c` END AS `$c`"
        case None => s"__t.`$c` AS `$c`"
      }
    }.mkString(", ")
    val on = keys.zipWithIndex
      .map { case ((c, _), i) => s"__t.`$c` = event.__k$i" }.mkString(" AND ")
    // the deduped-event side is aliased `event` so SET-rhs text runs
    // verbatim in the join scope (the inner subquery's own `FROM event`
    // reads the temp view; the outer alias shadows it only out here)
    Some(s"""INSERT OVERWRITE $target SELECT $setSel
            |FROM $target __t LEFT JOIN (
            |  SELECT *, true AS __m FROM (
            |    SELECT *, row_number() OVER (
            |      PARTITION BY ${kcols.mkString(", ")} ORDER BY idx DESC) AS __rn
            |    FROM (SELECT *, $derive FROM event$resid) __x) __y
            |  WHERE __rn = 1) event
            |ON $on""".stripMargin)
  }

  /** A statement set is batch-safe iff each statement is an INSERT and no
    * statement's source references a table that the set writes — except the
    * self-overwrite upsert shape (`INSERT OVERWRITE t SELECT ... FROM t
    * ... event ...`), which reads only its *own* target to merge it with
    * the new events and is therefore set-idempotent: applying the whole
    * event set at once produces the same final table as per-event replay,
    * because each application folds the current table with the events. */
  private def isBatchSafe(stmts: Seq[String]): Boolean = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement
    try {
      val parsed = stmts.map(spark.sessionState.sqlParser.parsePlan)
      val targets = parsed.collect {
        case ins: InsertIntoStatement => ins.table match {
          case UnresolvedRelation(parts, _, _) => parts.last.toLowerCase
          case _ => return false
        }
        case _ => return false
      }.toSet
      parsed.forall {
        case ins: InsertIntoStatement =>
          val target = ins.table match {
            case UnresolvedRelation(parts, _, _) => parts.last.toLowerCase
            case _ => return false
          }
          // collectWithSubqueries: a self-read hiding inside a scalar/IN/
          // EXISTS subquery expression is invisible to plain collect (plan
          // traversal does not descend into expression-held subplans) and
          // would silently misclassify a cross-event module as batch-safe
          val reads = ins.query.collectWithSubqueries {
            case UnresolvedRelation(p, _, _) => p.last.toLowerCase }
          val conflicts = reads.toSet.intersect(targets)
          conflicts.isEmpty || (ins.overwrite && conflicts == Set(target))
        case _ => false
      }
    } catch { case _: Throwable => false }
  }

  // ---------------- state events (A5/A12) ----------------

  /** A5: fold state events into `state_*` tables; nothing touches the log. */
  def addStateEvents(batch: Seq[IncomingEvent]): Either[String, Unit] = lock.synchronized {
    ensureOpen()
    val m = currentModule.getOrElse(return Left("no module installed"))
    if (m.stateMaterializer.trim.isEmpty) return Right(())
    val rows = batch.map(e => Row(e.user, e.payload))
    val schema = StructType(Seq(
      StructField("user", StringType), StructField("payload", BinaryType)))
    val df = spark.createDataFrame(rows.asJava, schema)
    val stmts = SqlText.prepare(m.stateMaterializer)
    SqlClassifier.checkAll(spark, SqlClassifier.StateCtx, stmts) match {
      case Left(e) => return Left(e)
      case Right(()) =>
    }
    df.createOrReplaceTempView("event")
    try {
      stmts.foreach(s => execInDb(s, Map.empty))
      commitBaks()
      stateTables().foreach(refreshBoth)
      stateVer += 1
      saveMeta()
      Right(())
    } catch {
      case t: Throwable =>
        restoreBaks()
        LeafFunctions.authFailure(t) match {
          case Some(l) => Left(l.getMessage)
          case None => throw t
        }
    } finally spark.catalog.dropTempView("event")
  }

  /** A12: drop all state tables and re-run the module's state init SQL. */
  def clearState(): Unit = lock.synchronized {
    ensureOpen()
    stateTables().foreach(t => spark.sql(s"DROP TABLE IF EXISTS $dbName.$t"))
    currentModule.foreach(m => runStatements(m.stateInitSql, Map.empty))
    stateTables().foreach(refreshBoth)
    stateVer += 1
    saveMeta()
  }

  // ---------------- query path (A7 + A16) ----------------

  /** A7: run a named query. All statements execute; the last one's result is
    * returned. Binds $-params plus $start (default 1), $limit, and
    * $requesting_user (null when anonymous) — reference: basic.rs:160-246. */
  def query(user: Option[String], q: LeafQuery): DataFrame = {
    catchUp()
    val m = currentModule.getOrElse(
      throw new IllegalStateException("no module installed"))
    val defn = m.queries.getOrElse(q.name,
      throw new IllegalArgumentException(s"no query named '${q.name}'"))
    QueryValidation.validate(defn, q).left.foreach(e =>
      throw new IllegalArgumentException(e))
    val args: Map[String, Any] =
      defn.params.flatMap(p => q.params.get(p.name).map(v => p.name -> sqlValueToAny(v))).toMap ++
        Map(
          "start" -> q.start.getOrElse(1L),
          "limit" -> q.limit,
          "requesting_user" -> user.orNull)
    val stmts = SqlText.prepare(defn.sql)
    if (stmts.isEmpty) throw new IllegalArgumentException("Query did not return a result")
    SqlClassifier.checkAll(spark, SqlClassifier.QueryCtx, stmts).left.foreach(e =>
      throw new IllegalArgumentException(e))
    var last: Option[DataFrame] = None
    stmts.foreach(s => last = execInDb(s, args))
    last.getOrElse(throw new IllegalArgumentException("Query did not return a result"))
  }

  /** Collect a query result as dynamically-typed tagged rows (the wire
    * format of the reference: SqlRows, lib.rs:226-227). */
  def queryTagged(user: Option[String], q: LeafQuery): Vector[Map[String, SqlValue]] = {
    val df = query(user, q)
    val names = df.schema.fieldNames
    df.collect().toVector.map(r =>
      names.zipWithIndex.map { case (n, i) => n -> SqlValue.fromAny(r.get(i)) }.toMap)
  }

  private def sqlValueToAny(v: SqlValue): Any = v match {
    case SqlValue.SqlNull => null
    case SqlValue.SqlInteger(i) => i
    case SqlValue.SqlReal(d) => d
    case SqlValue.SqlText(s) => s
    case SqlValue.SqlBlob(b) => b
  }

  // ---------------- execution helpers ----------------

  /** Execute one statement with the stream's database as the resolution
    * context (this session's current database, set once at init — streams
    * never contend on shared session state). DDL/DML return None;
    * SELECT-shaped statements return the df. */
  private def execInDb(stmt: String, args: Map[String, Any]): Option[DataFrame] =
    lock.synchronized { // per-stream: temp-view staging must not interleave
      selfOverwrite(stmt) match {
        case Some((target, selectSql)) =>
          // upsert-shaped state updates ("merge current table with the new
          // events, overwrite"): Spark refuses to overwrite a table it is
          // reading, so snapshot the merged result first (localCheckpoint
          // severs the file lineage), then overwrite the target. The old
          // files are moved aside (not deleted) so a later failure in the
          // same batch can restore them — the overwrite physically removes
          // them, which an add-only file snapshot cannot undo.
          val snap = spark.sql(selectSql).localCheckpoint(true)
          stashTableFiles(target)
          snap.write.mode(SaveMode.Overwrite).insertInto(s"$dbName.$target")
          refreshBoth(target)
          None
        case None =>
          val df = if (args.nonEmpty) spark.sql(stmt, args) else spark.sql(stmt)
          if (df.schema.nonEmpty) Some(df) else { df.collect(); None }
      }
    }

  /** Detect `INSERT OVERWRITE t SELECT ... FROM ... t ...` (the reference's
    * ON CONFLICT upsert shape re-expressed for immutable storage); returns
    * (target, bare select text). */
  private def selfOverwrite(stmt: String): Option[(String, String)] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement
    val prefix = "(?is)^\\s*INSERT\\s+OVERWRITE\\s+(?:TABLE\\s+)?([A-Za-z0-9_.]+)\\s+(.*)$".r
    try {
      spark.sessionState.sqlParser.parsePlan(stmt) match {
        case ins: InsertIntoStatement if ins.overwrite =>
          val target = ins.table match {
            case UnresolvedRelation(parts, _, _) => parts.last
            case _ => return None
          }
          val reads = ins.query.collect { case UnresolvedRelation(p, _, _) => p.last.toLowerCase }
          if (!reads.contains(target.toLowerCase)) return None
          stmt match {
            case prefix(_, select) => Some((target, select))
            case _ => None
          }
        case _ => None
      }
    } catch { case _: Exception => None }
  }

  private def runStatements(sql: String, args: Map[String, Any]): Unit =
    SqlText.prepare(sql).foreach(s => execInDb(s, args))

  // ---------------- rollback machinery ----------------

  /** Consume a Files.list stream with a guaranteed close (each unclosed
    * stream leaks one file descriptor — this sits on the hot append path). */
  private def withList[T](p: Path)(f: Iterator[Path] => T): T = {
    val s = Files.list(p)
    try f(s.iterator().asScala) finally s.close()
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      withList(p)(_.toList).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }

  private def listFiles(p: Path): Set[Path] =
    if (!Files.exists(p)) Set.empty
    else {
      val s = Files.walk(p)
      try s.iterator().asScala.filter(Files.isRegularFile(_)).toSet
      finally s.close()
    }

  // Overwrite staging: files displaced by a self-overwrite during the
  // current batch, held in a .bak dir until the batch commits. Guarded by
  // `lock` like every mutation path.
  private val pendingBaks =
    mutable.ListBuffer.empty[(String, Path, Map[Path, Path])]

  /** Move the target table's current files into a fresh .bak dir before an
    * overwrite, recording how to put them back. */
  private def stashTableFiles(target: String): Unit =
    tableLocation(target).foreach { loc =>
      val files = listFiles(loc)
      if (files.nonEmpty) {
        val bak = Files.createTempDirectory(dir, ".overwrite_bak_")
        val moved = files.map { f =>
          val dest = bak.resolve(loc.relativize(f).toString)
          Files.createDirectories(dest.getParent)
          Files.move(f, dest)
          f -> dest
        }.toMap
        pendingBaks += ((target, bak, moved))
      }
    }

  /** Batch succeeded: the displaced files are garbage. */
  private def commitBaks(): Unit = lock.synchronized {
    pendingBaks.foreach { case (_, bak, _) => deleteRecursively(bak) }
    pendingBaks.clear()
  }

  /** Batch failed: put every displaced file back (newest overwrite first). */
  private def restoreBaks(): Unit = lock.synchronized {
    pendingBaks.toList.reverse.foreach { case (t, bak, moved) =>
      moved.foreach { case (orig, stashed) =>
        Files.createDirectories(orig.getParent)
        Files.move(stashed, orig, StandardCopyOption.REPLACE_EXISTING)
      }
      deleteRecursively(bak)
      refreshBoth(t)
    }
    pendingBaks.clear()
  }

  private def tableLocation(t: String): Option[Path] = {
    val meta = spark.sessionState.catalog
      .getTableMetadata(TableIdentifier(t, Some(dbName)))
    Option(meta.location).map(u => Paths.get(u))
  }

  private def snapshotTables(): Map[String, (Path, Set[Path])] =
    listTables().filterNot(t => t == "events" || t == "events_raw")
      .flatMap { t =>
        tableLocation(t).map(loc => t -> (loc, listFiles(loc)))
      }.toMap

  private def rollback(logBefore: Set[Path], snap: Map[String, (Path, Set[Path])]): Unit = {
    (listFiles(logDir) -- logBefore).foreach(Files.deleteIfExists(_))
    refreshEvents()
    snap.foreach { case (t, (loc, before)) =>
      (listFiles(loc) -- before).foreach(Files.deleteIfExists(_))
      refreshBoth(t)
    }
    // overwritten tables: deleting added files is not enough — the
    // overwrite removed the pre-batch files; move them back from the stash
    restoreBaks()
  }
}
