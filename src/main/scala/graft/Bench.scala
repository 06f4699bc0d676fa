package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {
  /** Times every query; returns (name -> seconds) plus the names that threw.
    * Failures are NOT swallowed into a sentinel time — a regression between
    * correctness runs must surface as a nonzero exit, not hide as -1s in
    * the BENCH numbers.
    */
  def runAll(spark: SparkSession, sfDir: String,
             queries: Seq[(String, (SparkSession, String) => DataFrame)])
      : (Seq[(String, Double)], Seq[String]) = {
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          failed += name
          System.err.println(s"BENCH FAIL $name: ${e.getClass.getName}: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // untimed hygiene between queries: drop persisted intermediates and
      // let finished broadcasts get cleaned so one query's memory footprint
      // doesn't tax the next one's timing
      try { spark.catalog.clearCache(); System.gc() } catch { case _: Throwable => }
      name -> dt
    }
    (results, failed.toSeq)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // One clear error on fixture drift beats 30 scattered analysis errors.
    SchemaContract.assertOk(spark, sfDir)
    spark.range(1000).selectExpr("sum(id)").collect() // JVM/codegen warmup
    // fixture warmup: the leaf_* gates share one ingested demo stream;
    // whichever gate runs FIRST would otherwise pay its construction
    // (test-fixture CBOR encoding of the events table — not operator
    // work), and map-order shifts between rounds would move that cost
    // across gate names. Build it untimed so every gate times its own
    // operator, and iterate in sorted order so attribution is stable
    // round over round. (A warmup throw is deliberately ignored: the
    // gate's own timed run will report and fail it below.)
    try SparkEntry.queries("leaf_raw_scan")(spark, sfDir).count()
    catch { case _: Throwable => }
    // machine-load markers: a bench taken on a co-tenanted machine is not
    // comparable round over round (the round-11 record showed a phantom
    // 1.2x median "regression" that a quiet re-run erased). The 1-minute
    // load average before/after makes a polluted run self-identifying —
    // loadavg far above the core count means the numbers measure the
    // neighbor, not the engine.
    def loadAvg(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    // Self-defense: three rounds running, the round's FINAL recorded bench
    // carried a co-tenant load marker (r13: load 5.08, a uniform ~1.17x
    // inflation) even though clean intermediate records existed. Don't let a
    // polluted run become the artifact: wait (bounded) for the 1-minute load
    // to settle below the threshold, and if it never does, stamp the record
    // "tainted": true so downstream comparison can refuse it.
    val loadThreshold =
      sys.env.get("SPARK_GRAFT_LOAD_MAX").map(_.toDouble).getOrElse(1.5)
    val settleWaitNs =
      sys.env.get("SPARK_GRAFT_LOAD_WAIT_SEC").map(_.toLong).getOrElse(600L) * 1000000000L
    def settleLoad(): Double = {
      val deadline = System.nanoTime() + settleWaitNs
      while (loadAvg() > loadThreshold && System.nanoTime() < deadline) {
        System.err.println(f"BENCH: load ${loadAvg()}%.2f > $loadThreshold%.1f — waiting for the machine to go quiet")
        Thread.sleep(15000L)
      }
      loadAvg()
    }
    // Sentinel pins (round-15, verdict r14 item 6): the load_before gate
    // catches a run that LAUNCHES dirty, but co-tenant load arriving
    // MID-run still poisoned two recorded rounds. A handful of queries
    // with pinned steady-state costs (sf0.1) self-identify that case: any
    // sentinel above 1.5x its pin re-runs ONCE on the spot (transient
    // co-tenancy heals; the re-run replaces the poisoned number), and a
    // sentinel that still breaches stamps the record tainted.
    //
    // Round-18 (verdict r17 item 1b): the pins are NORMALIZED by the
    // sweep's own median gate time. An absolute pin conflates "this gate
    // spiked" (co-tenancy — what the sentinel exists to catch) with "this
    // box is uniformly 1.2x slower" (calibration drift — which must NOT
    // taint the record, or the taint becomes self-sustaining and the
    // driver flies blind, as it did in r16 AND r17). The median of 205
    // gates is insensitive to any one gate spiking, so breach =
    // value > 1.5 x pin x max(1, median/medianPin) fires exactly on
    // disproportionate per-gate inflation.
    case class Sentinel(query: String, phase: Option[String], pinSec: Double)
    val sentinels =
      if (!sfDir.stripSuffix("/").endsWith("sf0.1")) Seq.empty
      else Seq(
        Sentinel("q_dedup_incremental2", Some("increment2"), 2.1),
        Sentinel("leaf_backup_reference", None, 4.5),
        Sentinel("q_dedup_lsh", None, 4.5))
    // quiet-box median gate seconds at sf0.1/32 cpus (measured r18; the
    // same provenance as the pins themselves)
    val medianPin = 0.30
    def medianOf(xs: Seq[Double]): Double =
      if (xs.isEmpty) 0.0 else xs.sorted.apply(xs.size / 2)
    def sentinelValue(s: Sentinel, res: Map[String, Double]): Option[Double] =
      s.phase match {
        case Some(p) => PhaseTimings.snapshot.get(s.query)
          .flatMap(_.collectFirst { case (`p`, t) => t })
        case None => res.get(s.query)
      }
    case class Attempt(results: Seq[(String, Double)], failed: Seq[String],
        loadBefore: Double, reruns: Int, stillBreached: Seq[String]) {
      def tainted: Boolean = loadBefore > loadThreshold || stillBreached.nonEmpty
    }
    def attempt(): Attempt = {
      val loadBefore = settleLoad()
      if (loadBefore > loadThreshold)
        System.err.println(f"BENCH: load never settled (${loadBefore}%.2f) — record will be stamped tainted")
      val (results0, failed) = runAll(spark, sfDir, SparkEntry.queries.toSeq.sortBy(_._1))
      var results = results0
      var reruns = 0
      // uniform-slow-box normalization: see the sentinel comment above
      val speedFactor = math.max(1.0, medianOf(results0.map(_._2)) / medianPin)
      def margin(s: Sentinel): Double = 1.5 * s.pinSec * speedFactor
      val stillBreached = scala.collection.mutable.ArrayBuffer.empty[String]
      sentinels.foreach { s =>
        val resMap = results.toMap
        sentinelValue(s, resMap).filter(_ > margin(s)).foreach { v =>
          System.err.println(f"BENCH: sentinel ${s.query}${s.phase.fold("")("/" + _)} " +
            f"at $v%.2fs breaches pin ${s.pinSec}%.1fs x1.5 x speed $speedFactor%.2f — re-running once")
          try { spark.catalog.clearCache(); System.gc() } catch { case _: Throwable => }
          val (rr, _) = runAll(spark, sfDir,
            Seq(s.query -> SparkEntry.queries(s.query)))
          reruns += 1
          // a FAILED re-run returns no timing: keep the original number,
          // count the sentinel as still breached (the taint stamp is the
          // honest record), and never crash a completed sweep on .head
          rr.headOption.map(_._2) match {
            case Some(nv) =>
              results = results.map { case (k, t) =>
                if (k == s.query) k -> math.min(t, nv) else k -> t }
              if (sentinelValue(s, results.toMap).exists(_ > margin(s)))
                stillBreached += s.query
            case None =>
              System.err.println(s"BENCH: sentinel re-run of ${s.query} FAILED — keeping original timing, stamping tainted")
              stillBreached += s.query
          }
        }
      }
      Attempt(results, failed, loadBefore, reruns, stillBreached.toSeq)
    }
    // Round-18 (verdict r17 item 1a): a tainted record must not ship as
    // the round's artifact while a clean run is obtainable — but the
    // round-17 mechanism retried the full sweep IN THE SAME JVM, where
    // GateCache memos, disk fixtures and the JIT stay warm, so retry
    // attempts were not cold-comparable and the shipped record was
    // useless either way. Retries now run in a FRESH CHILD JVM each
    // (same java, same flags, same classpath, SPARK_GRAFT_BENCH_ATTEMPTS
    // forced to 1 in the child): every attempt is a true cold sweep, and
    // whichever one ships is like-for-like with any other round's cold
    // attempt. The parent keeps the FIRST untainted attempt and records
    // every discarded attempt's total (attemptN_total) so cross-round
    // comparison can see the record is a retry and what it replaced.
    // Tainted ships only when every attempt breached; a failed query is
    // an engine problem, not co-tenancy, so it never triggers a retry.
    val maxAttempts = math.max(1,
      sys.env.get("SPARK_GRAFT_BENCH_ATTEMPTS").flatMap(_.toIntOption)
        .getOrElse(3))
    val att = attempt()
    var attempts = 1
    val discardedTotals = scala.collection.mutable.ArrayBuffer.empty[Double]
    if (att.tainted && att.failed.isEmpty && attempts < maxAttempts) {
      discardedTotals += att.results.map(_._2).sum
      spark.stop()
      val javaBin = new java.io.File(new java.io.File(
        System.getProperty("java.home"), "bin"), "java").getAbsolutePath
      val jvmArgs = java.lang.management.ManagementFactory
        .getRuntimeMXBean.getInputArguments
      var shipped: Option[String] = None
      while (shipped.isEmpty && attempts < maxAttempts) {
        attempts += 1
        System.err.println(s"BENCH: attempt ${attempts - 1} tainted by " +
          s"co-tenant load — retrying the full sweep in a fresh JVM " +
          s"(attempt $attempts of $maxAttempts)")
        val cmd = new java.util.ArrayList[String]()
        cmd.add(javaBin)
        jvmArgs.forEach(a => cmd.add(a))
        cmd.add("-cp"); cmd.add(System.getProperty("java.class.path"))
        cmd.add("graft.Bench")
        val pb = new ProcessBuilder(cmd)
        pb.environment().put("SPARK_GRAFT_BENCH_ATTEMPTS", "1")
        pb.redirectError(ProcessBuilder.Redirect.INHERIT)
        val proc = pb.start()
        val childOut = new String(proc.getInputStream.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        val rc = proc.waitFor()
        val record = childOut.linesIterator.toSeq.reverseIterator
          .find(_.startsWith("{\"metric\":"))
        record match {
          case Some(line) =>
            val parsed = try graft.server.Json.parse(line)
              .asInstanceOf[Map[String, Any]] catch { case _: Throwable => Map.empty[String, Any] }
            val childTainted = parsed.get("tainted").contains(true)
            def total = parsed.get("value") match {
              case Some(d: Double) => d
              case Some(l: Long) => l.toDouble
              case _ => 0.0
            }
            if (rc != 0 || !childTainted || attempts >= maxAttempts) {
              // ship this child's record, augmented with the history of
              // every discarded attempt (same keys the in-JVM retry wrote)
              val history = discardedTotals.zipWithIndex.map { case (t, i) =>
                s""","attempt${i + 1}_total":$t,"attempt${i + 1}_tainted":true"""
              }.mkString
              shipped = Some(line.replace("\"attempts\":1,\"tainted\":",
                s""""attempts":$attempts$history,"tainted":"""))
              if (rc != 0) {
                println(shipped.get)
                System.err.println(s"BENCH: fresh-JVM attempt failed (rc=$rc)")
                sys.exit(rc)
              }
            } else discardedTotals += total
          case None =>
            System.err.println(s"BENCH: fresh-JVM attempt printed no record (rc=$rc) — aborting retries")
            println(childOut)
            sys.exit(if (rc != 0) rc else 1)
        }
      }
      println(shipped.get)
      return
    }
    val Attempt(results, failed, loadBefore, reruns, stillBreached) = att
    val loadAfter = loadAvg()
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // phase breakdown for gates that record one (e.g. incremental dedup's
    // one-off index build vs the steady-state increment): extra key, same
    // single-line contract
    val phases = PhaseTimings.snapshot.toSeq.sortBy(_._1).map { case (q, ps) =>
      s"\"" + q + "\":" + ps.map { case (p, t) => s"\"" + p + "\":" + t }
        .mkString("{", ",", "}")
    }.mkString("{", ",", "}")
    val sentinelsJson = sentinels.flatMap(s =>
      sentinelValue(s, results.toMap).map(v =>
        s"\"" + s.query + s.phase.fold("")("/" + _) + "\":" + v))
      .mkString("{", ",", "}")
    val taintedFinal = att.tainted
    if (stillBreached.nonEmpty)
      System.err.println("BENCH: sentinels still breached after re-run — " +
        s"record stamped tainted: ${stillBreached.mkString(", ")}")
    // on a retried run, record what each discarded tainted attempt cost —
    // later attempts ride warm fixtures, so cross-round comparison needs
    // to see that this record IS a retry, and what it replaced
    val attempt1Json = discardedTotals.zipWithIndex.map { case (t, i) =>
      s""","attempt${i + 1}_total":$t,"attempt${i + 1}_tainted":true"""
    }.mkString
    // cpus is the raw master thread spec (e.g. "32" or "*") — quote it so
    // the line stays valid JSON for any legitimate SPARK_GRAFT_CPUS value
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"phases":$phases,"sf":"$sfDir","load_avg_before":$loadBefore,"load_avg_after":$loadAfter,"cpus":"$cpus","sentinels":$sentinelsJson,"sentinel_reruns":$reruns,"attempts":$attempts$attempt1Json,"tainted":$taintedFinal}""")
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"BENCH: ${failed.size} queries failed: ${failed.mkString(", ")}")
      sys.exit(1)
    }
  }
}
