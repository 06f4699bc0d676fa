package graft.server

import org.apache.spark.sql.SparkSession

import graft.stream.StreamStore

/** The operator-facing entry point, mirroring the reference server binary's
  * CLI surface (leaf-server/src/cli.rs:9-28 + main.rs:27-56): `server`
  * boots the store and serves traffic (restoring a bucket first when
  * `--restore-from` is set, like the reference's restore-then-serve flow),
  * `backup restore` rebuilds a data dir from a bucket and exits, and
  * `backup reset-backup-cache` mirrors the reference subcommand (our
  * sweep cache is per-process, so a restart IS the reset — the command
  * documents that and exits).
  *
  * Every flag falls back to an env var with the clap-style derived name
  * (`--data-dir` → `DATA_DIR`), matching the reference's `#[arg(env)]`.
  * Run via `sbt run`, or package with `sbt package` and launch with
  * `tools/graft-server` (thin jar + /opt/spark/jars on the classpath).
  */
object ServerMain {

  final case class Config(
      command: String = "server",
      listen: String = "0.0.0.0:5530",
      dataDir: String = "./data",
      serviceDid: String = "did:web:localhost",
      moduleAdmins: Set[String] = Set.empty,
      unsafeAuthToken: Option[String] = None,
      backupDest: Option[String] = None,
      backupFormat: String = "native",
      backupExportKeys: Boolean = false,
      backupSweepMs: Long = 60 * 1000L,
      restoreFrom: Option[String] = None,
      plcDirectory: Option[String] = None,
      sparkMaster: String = "local[*]",
      shufflePartitions: Int = 32) {
    def port: Int = {
      val p = listen.substring(listen.lastIndexOf(':') + 1)
      p.toIntOption.getOrElse(
        throw new IllegalArgumentException(s"bad --listen-address: $listen"))
    }
    def referenceFormat: Boolean = backupFormat match {
      case "native" => false
      case "reference" => true
      case other => throw new IllegalArgumentException(
        s"--backup-format must be native|reference, got $other")
    }
  }

  val usage: String =
    """usage: graft-server [server|backup restore|backup reset-backup-cache] [flags]
      |  -l, --listen-address HOST:PORT   (env LISTEN_ADDRESS, default 0.0.0.0:5530)
      |  -d, --data-dir DIR               (env DATA_DIR, default ./data)
      |  -D, --did DID                    service DID for JWT audience (env DID)
      |      --module-admins DID[,DID...] admin DIDs, did:plc:/did:web: only (env MODULE_ADMINS)
      |      --unsafe-auth-token TOKEN    trusted-auth bearer token (env UNSAFE_AUTH_TOKEN)
      |      --backup-dest URI            bucket to sweep backups to (env BACKUP_DEST)
      |      --backup-format native|reference   (env BACKUP_FORMAT, default native)
      |      --backup-export-keys         ship custodied did_keys in the bucket (env BACKUP_EXPORT_KEYS)
      |      --backup-sweep-ms N          sweep period (env BACKUP_SWEEP_MS, default 60000)
      |      --restore-from URI           restore this bucket at boot, before serving (env RESTORE_FROM)
      |      --plc-directory URL          PLC directory base URL; unset = in-process directory (env PLC_DIRECTORY)
      |      --from URI                   (backup restore) the bucket to restore
      |      --spark-master M             (env SPARK_MASTER, default local[*])
      |      --shuffle-partitions N       (env SHUFFLE_PARTITIONS, default 32)
      |""".stripMargin

  private def env(name: String): Option[String] = sys.env.get(name)

  private def requireDid(s: String): String = {
    require(s.startsWith("did:plc:") || s.startsWith("did:web:"),
      s"expected a `did:plc:` or `did:web:` DID, got `$s`")
    s
  }

  /** Parse argv (clap-shaped: subcommand words, then `--flag value` /
    * `--flag` for booleans), env-var fallbacks applied first. */
  def parse(args: Seq[String]): Config = {
    var c = Config(
      listen = env("LISTEN_ADDRESS").getOrElse("0.0.0.0:5530"),
      dataDir = env("DATA_DIR").getOrElse("./data"),
      serviceDid = env("DID").getOrElse("did:web:localhost"),
      moduleAdmins = env("MODULE_ADMINS").toSet[String]
        .flatMap(_.split(',').filter(_.nonEmpty).map(requireDid)),
      unsafeAuthToken = env("UNSAFE_AUTH_TOKEN"),
      backupDest = env("BACKUP_DEST"),
      backupFormat = env("BACKUP_FORMAT").getOrElse("native"),
      backupExportKeys = env("BACKUP_EXPORT_KEYS").exists(_ != "false"),
      backupSweepMs = env("BACKUP_SWEEP_MS").flatMap(_.toLongOption)
        .getOrElse(60 * 1000L),
      restoreFrom = env("RESTORE_FROM"),
      plcDirectory = env("PLC_DIRECTORY"),
      sparkMaster = env("SPARK_MASTER").getOrElse("local[*]"),
      shufflePartitions = env("SHUFFLE_PARTITIONS").flatMap(_.toIntOption)
        .getOrElse(32))
    // subcommand words come first, like the reference's clap dispatch
    var rest = args.toList
    rest match {
      case "server" :: t => c = c.copy(command = "server"); rest = t
      case "backup" :: "restore" :: t =>
        c = c.copy(command = "backup-restore"); rest = t
      case "backup" :: "reset-backup-cache" :: t =>
        c = c.copy(command = "backup-reset-cache"); rest = t
      case _ =>
    }
    def value(flag: String, t: List[String]): (String, List[String]) = t match {
      case v :: more if !v.startsWith("--") => (v, more)
      case _ => throw new IllegalArgumentException(s"$flag needs a value\n$usage")
    }
    while (rest.nonEmpty) {
      val (flag, tail) = (rest.head, rest.tail)
      flag match {
        case "-l" | "--listen-address" =>
          val (v, t) = value(flag, tail); c = c.copy(listen = v); rest = t
        case "-d" | "--data-dir" =>
          val (v, t) = value(flag, tail); c = c.copy(dataDir = v); rest = t
        case "-D" | "--did" =>
          val (v, t) = value(flag, tail); c = c.copy(serviceDid = v); rest = t
        case "--module-admins" =>
          val (v, t) = value(flag, tail)
          c = c.copy(moduleAdmins = c.moduleAdmins ++
            v.split(',').filter(_.nonEmpty).map(requireDid))
          rest = t
        case "--unsafe-auth-token" =>
          val (v, t) = value(flag, tail)
          c = c.copy(unsafeAuthToken = Some(v)); rest = t
        case "--backup-dest" =>
          val (v, t) = value(flag, tail)
          c = c.copy(backupDest = Some(v)); rest = t
        case "--backup-format" =>
          val (v, t) = value(flag, tail); c = c.copy(backupFormat = v); rest = t
        case "--backup-export-keys" =>
          c = c.copy(backupExportKeys = true); rest = tail
        case "--backup-sweep-ms" =>
          val (v, t) = value(flag, tail)
          c = c.copy(backupSweepMs = v.toLong); rest = t
        case "--restore-from" | "--from" =>
          val (v, t) = value(flag, tail)
          c = c.copy(restoreFrom = Some(v)); rest = t
        case "--plc-directory" =>
          val (v, t) = value(flag, tail)
          c = c.copy(plcDirectory = Some(v)); rest = t
        case "--spark-master" =>
          val (v, t) = value(flag, tail); c = c.copy(sparkMaster = v); rest = t
        case "--shuffle-partitions" =>
          val (v, t) = value(flag, tail)
          c = c.copy(shufflePartitions = v.toInt); rest = t
        case "-h" | "--help" =>
          println(usage); sys.exit(0)
        case other =>
          throw new IllegalArgumentException(s"unknown flag $other\n$usage")
      }
    }
    c.referenceFormat // validate eagerly so a typo fails at parse, not at sweep
    val _ = c.port
    c
  }

  def buildSpark(c: Config): SparkSession = {
    val s = SparkSession.builder()
      .master(c.sparkMaster)
      .appName("graft-server")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", c.shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Construct (and for `server`, start) the wired server. `portOverride`
    * lets tests boot the same wiring on an ephemeral port. */
  def boot(c: Config, spark: SparkSession,
      portOverride: Option[Int] = None): LeafServer = {
    val store = new StreamStore(spark, c.dataDir)
    // the reference always points at an HTTP directory (cli.rs:23,
    // default localhost:3001); this container has no egress, so the
    // in-process directory is OUR default and --plc-directory/
    // PLC_DIRECTORY opts into the reference's deployment shape
    val plc: PlcDirectory = c.plcDirectory match {
      case Some(url) => new HttpPlcDirectory(url)
      case None => new LocalPlcDirectory
    }
    val server = new LeafServer(store, portOverride.getOrElse(c.port),
      authToken = c.unsafeAuthToken,
      moduleAdmins = c.moduleAdmins,
      jwt = Some(new JwtAuth(c.serviceDid, plc.resolveKey)),
      serverDid = c.serviceDid,
      plc = Some(plc),
      backupDest = c.backupDest,
      backupReferenceFormat = c.referenceFormat,
      backupExportKeys = c.backupExportKeys,
      backupSweepMs = c.backupSweepMs,
      restoreFrom = c.restoreFrom)
    server
  }

  def main(args: Array[String]): Unit = {
    val c =
      try parse(args.toIndexedSeq)
      catch {
        case e: IllegalArgumentException =>
          System.err.println(e.getMessage); sys.exit(2)
      }
    c.command match {
      case "backup-reset-cache" =>
        // our sweep cache is process-local (LeafServer.sweepExported):
        // unlike the reference's on-disk cache there is nothing durable
        // to clear — the next boot re-probes the bucket from scratch
        println("backup cache is per-process; a server restart re-probes " +
          "the bucket — nothing to reset")
      case "backup-restore" =>
        val src = c.restoreFrom.getOrElse {
          System.err.println(s"backup restore needs --from URI\n$usage")
          sys.exit(2)
        }
        val spark = buildSpark(c)
        try {
          // construct but never start: restoreFromBucket needs the wired
          // store/acl/custody, not the listening sockets
          val server = boot(c.copy(restoreFrom = None), spark)
          val report = server.restoreFromBucket(src)
          println(s"restored ${report.restored.size} stream(s), " +
            s"skipped ${report.skipped.size} already-local, " +
            s"failed ${report.failed.size}")
          report.failed.foreach(d => println(s"  failed: $d"))
          if (report.failed.nonEmpty) sys.exit(1)
        } finally spark.stop()
      case _ =>
        val spark = buildSpark(c)
        val server = boot(c, spark)
        server.start() // runs the --restore-from bucket restore pre-traffic
        println(s"graft server listening on ${c.listen} " +
          s"(data: ${c.dataDir}, did: ${c.serviceDid})")
        val done = new java.util.concurrent.CountDownLatch(1)
        Runtime.getRuntime.addShutdownHook(new Thread(() => {
          server.stop(); spark.stop(); done.countDown()
        }, "graft-server-shutdown"))
        done.await() // serve until SIGTERM/SIGINT
    }
  }
}
