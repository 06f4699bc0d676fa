package graft.stream

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.server.Json
import graft.types.{ModuleDef, ParamDef, ParamKind, QueryDef}

/** Stream backup/restore (the A17 capability, re-based on the log).
  *
  * The reference archives event ranges, module blobs, and state snapshots
  * to S3 and restores by validating range contiguity then replaying
  * (/root/reference/leaf-server/src/storage.rs:635-1056). Here the
  * append-only parquet log IS the archive format: a backup is one
  * idx-sorted parquet write of the full log plus the module definition;
  * restore validates contiguity (the same check as raw import), replays
  * the log through the module, and rebuilds every derived table. Pointing
  * the destination at an object store path distributes the copy for free.
  */
object BackupService {

  /** Export a stream's log + module definition to `destDir`. */
  def backup(h: StreamHandle, destDir: String): Unit = {
    val dest = Paths.get(destDir)
    Files.createDirectories(dest)
    h.eventsDF.orderBy("idx").write.mode(SaveMode.Overwrite)
      .parquet(dest.resolve("events").toString)
    val m = h.currentModule.getOrElse(ModuleDef())
    Files.write(dest.resolve("module.json"), moduleToJson(m).getBytes(UTF_8))
    Files.write(dest.resolve("meta.json"),
      s"""{"latest_idx":${h.latest}}""".getBytes(UTF_8))
  }

  /** Restore a backup into a fresh stream id; replays the log through the
    * module (contiguity validated by the import path). */
  def restore(store: StreamStore, newId: String, srcDir: String): StreamHandle = {
    val src = Paths.get(srcDir)
    val h = store.open(newId)
    require(h.latest == 0, s"restore target $newId is not empty")
    val m = moduleFromJson(new String(Files.readAllBytes(src.resolve("module.json")), UTF_8))
    h.setModule(m)
    val events = store.spark.read.parquet(src.resolve("events").toString)
    if (!events.isEmpty) h.bulkImport(events)
    val expected = "\"latest_idx\":(\\d+)".r
      .findFirstMatchIn(new String(Files.readAllBytes(src.resolve("meta.json")), UTF_8))
      .map(_.group(1).toLong).getOrElse(0L)
    require(h.latest == expected,
      s"restore incomplete: expected latest_idx=$expected, got ${h.latest}")
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
