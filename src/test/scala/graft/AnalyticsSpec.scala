package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral invariants of the analytics operators (Analytics.scala and
  * the k-means trainer in Similarity.scala) — the oracle gate proves
  * cross-engine equality; these pin the semantics themselves.
  */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.queries(name)(spark, dir).collect()

  test("retention: offsets stay in [0,7] and day 0 dominates its cohort") {
    val rows = run("q_events_retention")
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, off, _) => off >= 0 && off <= 7 })
    // a user is by definition active on their cohort day, so offset 0
    // carries every user of the cohort — no later offset can exceed it
    val byCohort = rows.groupBy(_._1)
    byCohort.foreach { case (c, rs) =>
      val day0 = rs.find(_._2 == 0L).map(_._3)
        .getOrElse(fail(s"cohort $c has no day-0 row"))
      assert(rs.forall(_._3 <= day0), s"cohort $c: offset beats day 0")
    }
  }

  test("funnel: stage counts are monotone non-increasing") {
    val r = run("q_events_funnel").head
    val (users, view, vc, full) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(users >= view && view >= vc && vc >= full && full >= 0)
    assert(users > 0)
  }

  test("collocations: support floor and positive lift hold for all rows") {
    val rows = run("q_text_collocations")
    assert(rows.length <= 25 && rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 5, "bigram below support floor")
      assert(r.getDouble(3) > 0.0, "non-positive lift")
    }
    // ranked descending by lift
    val lifts = rows.map(_.getDouble(3))
    assert(lifts.sameElements(lifts.sortBy(-_)))
  }

  test("zorder: bucket stats stay inside the bucket's key range") {
    val rows = run("q_zorder")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (b, zmin, zmax) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(zmin >= b * 4096 && zmax < (b + 1) * 4096 && zmin <= zmax)
      // 8+8 interleaved bits can never exceed 16 bits
      assert(zmax < 65536)
    }
  }

  test("anomaly: group counts reconcile and outliers are a strict minority") {
    val rows = run("q_events_anomaly")
    val totalEvents = graft.Tables.df(spark, dir, "events").count()
    assert(rows.map(_.getLong(1)).sum == totalEvents)
    rows.foreach { r =>
      val (n, mean, sd, out) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))
      assert(out >= 0 && out < n, "outliers must be a strict subset")
      assert(mean >= 0 && sd >= 0)
      // Chebyshev: at most 1/9 of any distribution sits beyond 3 sigma
      assert(out.toDouble / n <= 1.0 / 9.0 + 1e-9)
    }
  }

  test("novelty: hapax ratio is a proper fraction and frequencies are >= 1") {
    val rows = run("q_text_novelty")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nb, nh, ratio, mf) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(nh <= nb && ratio >= 0.0 && ratio <= 1.0)
      assert(math.abs(ratio - nh.toDouble / nb) < 1e-12)
      assert(mf >= 1.0, "every bigram occurs at least once in the corpus")
    }
  }

  test("kmeans: clusters partition the corpus and assignments are stable") {
    val rows = run("q_emb_kmeans")
    val total = rows.map(_.getLong(1)).sum
    val n = SparkEntry.queries("q_emb_quantize")(spark, dir).count()
    assert(total == n, s"cluster sizes sum to $total, corpus is $n")
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 8))
    assert(rows.forall(_.getLong(2) >= 0), "negative distortion")
    // determinism: a second run returns the identical table
    val again = run("q_emb_kmeans")
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("decay: decayed score never exceeds raw and event counts reconcile") {
    val rows = run("q_events_decay").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (u, dec, raw, n) =>
      assert(n > 0)
      assert(dec <= raw, s"user $u: decayed $dec exceeds raw $raw")
      assert(dec >= (raw >> 10), s"user $u: decay beyond the possible bucket range")
    }
    val nEvents = spark.read.parquet(s"$dir/events.parquet").count()
    assert(rows.map(_._4).sum == nEvents)
  }

  test("transitions: per-from shares sum to 1 and counts reconcile " +
    "with the event total") {
    val rows = run("q_events_transitions").map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (from, rs) =>
      val total = rs.map(_._4).sum
      assert(math.abs(total - 1.0) < 1e-9, s"$from shares sum to $total")
    }
    // every event except each user's last contributes one transition
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val nUsers = ev.select("user_id").distinct().count()
    val nEvents = ev.count()
    assert(rows.map(_._3).sum == nEvents - nUsers)
  }

  test("pagerank: probability mass conserves up to floor leakage and " +
    "every node keeps at least the teleport mass") {
    val rows = run("q_graph_pagerank").map(r => (r.getLong(0), r.getLong(1)))
    val n = rows.length
    assert(n > 1)
    assert(rows.map(_._1).distinct.length == n, "duplicate node rows")
    val scale = 1000000000000L
    val tele = 150000000000L / n
    rows.foreach { case (nk, r) =>
      assert(r >= tele, s"node $nk rank $r below teleport floor $tele")
    }
    val total = rows.map(_._2).sum
    // integer floors only ever LOSE mass: total ≤ SCALE, and with ≤ a
    // few hundred floor ops the loss stays well under 1%
    assert(total <= scale, s"rank mass $total exceeds scale")
    assert(total > scale * 99 / 100, s"rank mass $total leaked > 1%")
    // ranks differ across nodes (the graph is not regular) — the op
    // computed something beyond the uniform initialization
    assert(rows.map(_._2).distinct.length > 1)
  }
}
