package graft.stream

import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{Executors, TimeUnit}

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.col

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
    val prior = validateChain(
      if (fs.exists(metaPath)) rangesOf(parseMeta(readText(fs, metaPath)))
      else Vector.empty)
    val lastBacked = prior.lastOption.map(_._2).getOrElse(0L)
    val latest = h.latest
    require(latest >= lastBacked,
      s"backup destination is ahead of the stream ($lastBacked > $latest) — " +
        "it belongs to a different or rolled-back stream")
    val appended =
      if (latest > lastBacked) {
        val r = (lastBacked + 1, latest)
        // the idx filter prunes the log's parquet files by min/max stats:
        // only files overlapping the new range are read
        h.eventsDF.filter(col("idx").between(r._1, r._2))
          .sortWithinPartitions("idx")
          .write.mode(SaveMode.Overwrite).parquet(rangeDir(root, r).toString)
        Some(r)
      } else None
    val stateTables = h.stateTableNames
    stateTables.foreach(t =>
      h.tableDF(t).write.mode(SaveMode.Overwrite)
        .parquet(new HPath(root, s"state/$t").toString))
    val m = h.currentModule.getOrElse(ModuleDef())
    writeText(fs, new HPath(root, "module.json"), moduleToJson(m))
    writeText(fs, metaPath, Json.render(Map(
      "latest_idx" -> latest,
      "state_tables" -> stateTables,
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
