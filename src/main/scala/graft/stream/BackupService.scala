package graft.stream

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import org.apache.spark.sql.SaveMode

import graft.server.Json
import graft.types.{ModuleDef, ParamDef, ParamKind, QueryDef}

/** Stream backup/restore (the A17 capability, re-based on the log).
  *
  * The reference archives event ranges, module blobs, and state snapshots
  * to S3 and restores by validating range contiguity then replaying
  * (/root/reference/leaf-server/src/storage.rs:635-1056). Here the
  * append-only parquet log IS the archive format: a backup is one
  * idx-sorted parquet write of the full log, a snapshot of each `state_*`
  * table (state events bypass the log, so replay cannot rebuild them), and
  * the module definition; restore validates contiguity (the same check as
  * raw import), replays the log through the module to rebuild every
  * derived table, then reinstates the state snapshots.
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

  /** Export a stream's log + state snapshots + module def to `destDir`. */
  def backup(h: StreamHandle, destDir: String): Unit = {
    val (fs, root) = fsFor(h, destDir)
    fs.mkdirs(root)
    h.eventsDF.orderBy("idx").write.mode(SaveMode.Overwrite)
      .parquet(new HPath(root, "events").toString)
    val stateTables = h.stateTableNames
    stateTables.foreach(t =>
      h.tableDF(t).write.mode(SaveMode.Overwrite)
        .parquet(new HPath(root, s"state/$t").toString))
    val m = h.currentModule.getOrElse(ModuleDef())
    writeText(fs, new HPath(root, "module.json"), moduleToJson(m))
    writeText(fs, new HPath(root, "meta.json"), Json.render(Map(
      "latest_idx" -> h.latest, "state_tables" -> stateTables)))
  }

  /** Restore a backup into a fresh stream id; replays the log through the
    * module (contiguity validated by the import path), then reinstates the
    * archived state tables. */
  def restore(store: StreamStore, newId: String, srcDir: String): StreamHandle = {
    val h = store.open(newId)
    val (fs, root) = fsFor(h, srcDir)
    require(h.latest == 0, s"restore target $newId is not empty")
    val m = moduleFromJson(readText(fs, new HPath(root, "module.json")))
    h.setModule(m)
    val events = store.spark.read.parquet(new HPath(root, "events").toString)
    if (!events.isEmpty) h.bulkImport(events)
    val meta = readText(fs, new HPath(root, "meta.json"))
    val expected = "\"latest_idx\":(\\d+)".r
      .findFirstMatchIn(meta).map(_.group(1).toLong).getOrElse(0L)
    require(h.latest == expected,
      s"restore incomplete: expected latest_idx=$expected, got ${h.latest}")
    val stateTables = "\"state_tables\":\\[([^\\]]*)\\]".r
      .findFirstMatchIn(meta).map(_.group(1)).toSeq
      .flatMap(_.split(',')).map(_.trim.stripPrefix("\"").stripSuffix("\""))
      .filter(_.nonEmpty)
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
