package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.funsuite.AnyFunSuite

import graft.server.{Json, ServerMain}

/** The CLI entry point: flag/env parsing mirrors the reference binary's
  * surface, and the booted wiring serves a real RPC round-trip, including
  * a `--restore-from` boot that restores a bucket before traffic. */
class ServerMainSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private lazy val client = HttpClient.newHttpClient()

  private def post(port: Int, path: String, body: Map[String, Any],
      token: Option[String] = Some("smoketoken")): Map[String, Any] = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .POST(HttpRequest.BodyPublishers.ofString(Json.render(body)))
    token.foreach(t => b.header("Authorization", s"Bearer $t"))
    Json.parse(client.send(b.build(),
      HttpResponse.BodyHandlers.ofString()).body()).asInstanceOf[Map[String, Any]]
  }

  private def ok(r: Map[String, Any]): Map[String, Any] = {
    assert(!r.contains("err"), r.toString)
    r("ok").asInstanceOf[Map[String, Any]]
  }

  private def payload(n: Long): String = {
    import graft.drisl.DValue._
    java.util.Base64.getEncoder.encodeToString(
      graft.drisl.Drisl.encode(obj("n" -> int(n))))
  }

  test("parse covers the reference CLI surface") {
    val c = ServerMain.parse(Seq("server",
      "-l", "0.0.0.0:6001", "-d", "/tmp/x", "-D", "did:web:graft.example",
      "--module-admins", "did:plc:a,did:web:b",
      "--unsafe-auth-token", "tok",
      "--backup-dest", "file:/tmp/bak", "--backup-format", "reference",
      "--backup-export-keys", "--backup-sweep-ms", "1234",
      "--restore-from", "file:/tmp/oldbak",
      "--plc-directory", "http://127.0.0.1:3001"))
    assert(c.command == "server" && c.port == 6001 && c.dataDir == "/tmp/x")
    assert(c.serviceDid == "did:web:graft.example")
    assert(c.moduleAdmins == Set("did:plc:a", "did:web:b"))
    assert(c.unsafeAuthToken.contains("tok"))
    assert(c.backupDest.contains("file:/tmp/bak") && c.referenceFormat)
    assert(c.backupExportKeys && c.backupSweepMs == 1234L)
    assert(c.restoreFrom.contains("file:/tmp/oldbak"))
    assert(c.plcDirectory.contains("http://127.0.0.1:3001"))
    // defaults mirror the reference's
    val d = ServerMain.parse(Seq.empty)
    assert(d.command == "server" && d.port == 5530 &&
      d.dataDir == "./data" && d.serviceDid == "did:web:localhost" &&
      d.backupFormat == "native" && !d.backupExportKeys &&
      d.plcDirectory.isEmpty)
    // subcommands dispatch like the reference's clap tree
    assert(ServerMain.parse(Seq("backup", "restore", "--from", "file:/b"))
      .command == "backup-restore")
    assert(ServerMain.parse(Seq("backup", "reset-backup-cache"))
      .command == "backup-reset-cache")
    // bad input fails at parse time, not at boot
    intercept[IllegalArgumentException](ServerMain.parse(Seq("--nope")))
    intercept[IllegalArgumentException](
      ServerMain.parse(Seq("--module-admins", "alice")))
    intercept[IllegalArgumentException](
      ServerMain.parse(Seq("--backup-format", "tar")))
    intercept[IllegalArgumentException](
      ServerMain.parse(Seq("-l", "nocolon")))
  }

  test("booted config serves a full RPC round-trip") {
    val c = ServerMain.parse(Seq("server",
      "-d", TempDirs.create("graft-cli-data").toString,
      "--unsafe-auth-token", "smoketoken"))
    val srv = ServerMain.boot(c, spark, portOverride = Some(0))
    srv.start()
    try {
      val port = srv.boundPort
      val cid = ok(post(port, "/module/upload", Map("module" -> Map(
        "init_sql" ->
          "CREATE TABLE IF NOT EXISTS notes (idx BIGINT, n BIGINT) USING PARQUET",
        "materializer" ->
          "INSERT INTO notes SELECT idx, drisl_extract_long(payload, '.n') FROM event",
        "queries" -> Map("list" -> Map(
          "sql" -> "SELECT idx, n FROM notes ORDER BY idx"))))))(
        "cid").toString
      val sid = ok(post(port, "/stream/create", Map(
        "id" -> "did:graft:cli-smoke", "module_cid" -> cid)))("id").toString
      ok(post(port, "/stream/event_batch", Map("id" -> sid, "events" ->
        Vector(Map("user" -> "u", "payload_b64" -> payload(7)),
          Map("user" -> "u", "payload_b64" -> payload(9))))))
      val rows = ok(post(port, "/stream/query", Map("id" -> sid,
        "query" -> Map("name" -> "list"))))("rows").asInstanceOf[Vector[Any]]
      assert(rows.size == 2, rows.toString)
    } finally srv.stop()
  }

  test("--restore-from boots by restoring the bucket before serving") {
    // populate a source server, sweep it to a reference-format bucket
    val bak = TempDirs.create("graft-cli-bak")
    val srcCfg = ServerMain.parse(Seq("server",
      "-d", TempDirs.create("graft-cli-src").toString,
      "--unsafe-auth-token", "smoketoken",
      "--backup-dest", "file:" + bak, "--backup-format", "reference",
      "--backup-export-keys", "--backup-sweep-ms", "250"))
    val src = ServerMain.boot(srcCfg, spark, portOverride = Some(0))
    src.start()
    val sid = try {
      val port = src.boundPort
      val cid = ok(post(port, "/module/upload", Map("module" -> Map(
        "init_sql" ->
          "CREATE TABLE IF NOT EXISTS notes (idx BIGINT, n BIGINT) USING PARQUET",
        "materializer" ->
          "INSERT INTO notes SELECT idx, drisl_extract_long(payload, '.n') FROM event",
        "queries" -> Map("list" -> Map(
          "sql" -> "SELECT idx, n FROM notes ORDER BY idx"))))))(
        "cid").toString
      val sid = ok(post(port, "/stream/create", Map(
        "id" -> "did:graft:cli-restored", "module_cid" -> cid)))("id").toString
      ok(post(port, "/stream/event_batch", Map("id" -> sid, "events" ->
        Vector(Map("user" -> "u", "payload_b64" -> payload(41))))))
      // wait for the COMPLETE export: metadata and the event chunk
      val metaPath = bak.resolve(s"streams/$sid/metadata.drisl")
      val eventsPath = bak.resolve(s"streams/$sid/1-1.events.drisl.zstd")
      val deadline = System.nanoTime + 30L * 1000000000L
      def exported = java.nio.file.Files.exists(metaPath) &&
        java.nio.file.Files.exists(eventsPath)
      while (!exported && System.nanoTime < deadline) Thread.sleep(100)
      assert(exported, "sweep never exported the full stream")
      sid
    } finally src.stop()
    // a FRESH data dir booted with --restore-from serves the stream
    val dstCfg = ServerMain.parse(Seq("server",
      "-d", TempDirs.create("graft-cli-dst").toString,
      "--unsafe-auth-token", "smoketoken",
      "--restore-from", "file:" + bak))
    val dst = ServerMain.boot(dstCfg, spark, portOverride = Some(0))
    dst.start()
    try {
      val rows = ok(post(dst.boundPort, "/stream/query", Map("id" -> sid,
        "query" -> Map("name" -> "list"))))("rows").asInstanceOf[Vector[Any]]
      assert(rows.size == 1, rows.toString)
    } finally dst.stop()
  }
}
