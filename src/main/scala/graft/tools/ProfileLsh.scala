package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Stage-by-stage timing of the LSH dedup pipeline (dev only). */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[lsh] $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    time("warmup")(spark.range(10).count())
    val d = Tables.df(spark, dir, "documents").select(col("doc_id"), col("text"))
    val corpus = d.unionAll(d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
    val sh = corpus.select(col("doc_id"), trim(col("text")).as("t"))
      .select(col("doc_id"), col("t"), explode(sequence(lit(1), length(col("t")) - 4)).as("i"))
      .select(col("doc_id"), col("t").substr(col("i"), lit(5)).as("sh"))
    time("shingles count")(println("  n=" + sh.count()))
    val shArr = sh.groupBy("doc_id").agg(sort_array(collect_set(col("sh"))).as("shs")).persist()
    time("shArr materialize")(println("  docs=" + shArr.count()))
    val sigCols = (0 until 6).map(k =>
      array_min(transform(col("shs"), x => md5(concat(lit(s"$k|"), x)))).as(s"h$k"))
    val sg = shArr.select((col("doc_id") +: sigCols): _*)
    time("sigs")(println("  sigs=" + sg.count()))
    val bands = sg.select(col("doc_id"), posexplode(array(
        md5(concat(col("h0"), col("h1"), col("h2"))),
        md5(concat(col("h3"), col("h4"), col("h5"))))).as(Seq("band_id", "bh"))).persist()
    time("bands materialize")(println("  bands=" + bands.count()))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band_id") === col("y.band_id") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
    time("cand")(println("  cand=" + cand.count()))
    val interCount = udf((a: Seq[String], b: Seq[String]) => {
      var i = 0; var j = 0; var n = 0L
      while (i < a.length && j < b.length) {
        val c = a(i).compareTo(b(j))
        if (c == 0) { n += 1; i += 1; j += 1 } else if (c < 0) i += 1 else j += 1
      }
      n
    })
    val res = cand
      .join(broadcast(shArr.as("za")), col("a") === col("za.doc_id"))
      .join(broadcast(shArr.as("zb")), col("b") === col("zb.doc_id"))
      .select(col("a"), col("b"),
        interCount(col("za.shs"), col("zb.shs")).as("inter"),
        size(col("za.shs")).cast("long").as("sza"),
        size(col("zb.shs")).cast("long").as("szb"))
      .select(col("a"), col("b"),
        (col("inter").cast("double") / (col("sza") + col("szb") - col("inter"))).as("jac"))
      .filter(col("jac") >= 0.9)
    time("jaccard+filter")(println("  out=" + res.count()))
    spark.stop()
  }
}
