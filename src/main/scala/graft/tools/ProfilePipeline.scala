package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables, TempDirs}

/** Dev harness: replicate the documents/embeddings corpus N× (ids offset,
  * text salted per replica so the duplicate DENSITY stays what the base
  * corpus has, instead of every doc gaining N-1 exact copies) and time the
  * corpus-heavy pipeline operators against the blown-up input. The point
  * is the growth CURVE: an operator whose cost is candidate-bounded should
  * scale ~linearly in N; anything quadratic surfaces immediately.
  *
  * GRAFT_REPLICATE=10 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.tools.ProfilePipeline q_dedup_lsh q_dedup_cluster"
  */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("GRAFT_REPLICATE", "10").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = sys.env.getOrElse("GRAFT_SCALE_DIR",
      TempDirs.create("graft-scaleprof").toString)
    val skew = sys.env.getOrElse("GRAFT_SKEW", "0").toInt
    val d = Tables.df(spark, base, "documents")
    val docN = d.agg(max("doc_id")).head().getLong(0) + 1
    val reps = spark.range(mult).select(col("id").as("r"))
    // each replica rewrites most characters (a distinct alphabet
    // permutation keyed by r), so cross-replica shingle overlap is ~zero
    // and the base corpus's dup structure repeats N times WITHOUT replicas
    // near-duplicating each other (a suffix salt leaves Jaccard ≈ 1 and
    // manufactures O(N²) true pairs per base doc — output-bound, not a
    // scaling signal)
    val alpha = "abcdefghijklmnopqrst"
    // distinct permutations: affine index maps k -> (a·k + b) mod 20 with
    // `a` a unit mod 20 — 8 units × 20 offsets = 160 distinct maps (two
    // affine maps agree everywhere only when (a,b) are equal). Replicas
    // must never share a permutation, or the translate manufactures exact
    // cross-replica dups and inflates the dedup curves the tool exists to
    // measure. r=0 is (a=1,b=0): the identity — replica 0 IS the base
    // corpus, and r in [0,19] reproduces the old pure-rotation decade.
    val units = Vector(1, 3, 7, 9, 11, 13, 17, 19)
    require(mult >= 1 && mult <= units.length * alpha.length,
      s"GRAFT_REPLICATE must be in [1, ${units.length * alpha.length}] " +
        s"(got $mult); extend the affine family for more replicas")
    def perm(r: Int): String = {
      val a = units(r / alpha.length)
      val b = r % alpha.length
      (0 until alpha.length).map(k => alpha((a * k + b) % alpha.length)).mkString
    }
    val whens = (0 until mult).map(r =>
      when(col("r") === r, translate(col("text"), alpha, perm(r))))
    val salted = whens.init.foldRight(whens.last: org.apache.spark.sql.Column)(
      (w, acc) => w.otherwise(acc))
    val replicated = d.crossJoin(reps)
      .select((col("doc_id") + col("r") * docN).as("doc_id"),
        coalesce(salted, col("text")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    // optional adversarial skew: ONE boilerplate text duplicated `skew`
    // times (the mega dup group of a web crawl) appended after the
    // replicas — the dedup family must complete with flat per-task memory,
    // never buffering the group in one aggregation state
    val boiler = "this page is a mirror of the original content " * 4
    val withSkew =
      if (skew == 0) replicated
      else replicated.unionByName(
        spark.range(skew).select(
          (col("id") + lit(mult.toLong * docN)).as("doc_id"),
          lit(boiler).as("text"), lit("en").as("lang"),
          lit("boilerplate").as("source"),
          lit(boiler.length.toLong).as("n_chars")))
    withSkew.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = Tables.df(spark, base, "embeddings")
    val vecN = e.agg(max("vec_id")).head().getLong(0) + 1
    e.crossJoin(reps)
      .select((col("vec_id") + col("r") * vecN).as("vec_id"),
        col("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // events replicate with shifted event/user ids: per-user adjacency,
    // per-type value distributions, and the active-day windows all keep
    // their structure while user and event volume grow ×mult. The raw
    // ts column rides through unchanged whatever its parquet encoding
    // (nanos LONG or micros timestamp), so Tables.df's schema-tolerant
    // normalization applies to replicas exactly as to the original.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawEv = spark.read.parquet(s"$base/events.parquet")
    val evN = rawEv.agg(max("event_id")).head().getLong(0) + 1
    val userN = rawEv.agg(max("user_id")).head().getLong(0) + 1
    rawEv.crossJoin(reps)
      .select((col("event_id") + col("r") * evN).as("event_id"), col("ts"),
        (col("user_id") + col("r") * userN).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val nd = spark.read.parquet(s"$dir/documents.parquet").count()
    val ne = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val nv = spark.read.parquet(s"$dir/events.parquet").count()
    println(s"[scaleprof] corpus ×$mult: $nd documents, $ne embeddings, $nv events at $dir")

    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_dedup_exact", "q_dedup_minhash", "q_dedup_lsh", "q_dedup_cluster",
      "q_dedup_canonical", "q_decontaminate", "q_pack_sequences",
      "q_corpus_vocab", "q_quality_repetition", "q_emb_quantize")
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"[scaleprof] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    spark.stop()
  }
}
