package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral invariants of the corpus-statistics operators
  * (Corpus.scala) — the oracle gate proves cross-engine equality; these
  * pin the semantics themselves.
  */
class CorpusSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.queries(name)(spark, dir).collect()

  test("tfidf: exactly ≤3 keywords per doc, ranked by rounded score desc") {
    val rows = run("q_text_tfidf").map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_._1)
    byDoc.foreach { case (d, rs) =>
      assert(rs.length <= 3, s"doc $d has ${rs.length} keywords")
      assert(rs.map(_._6).sorted.sameElements(1L to rs.length))
      // scores are non-increasing in rank order
      val inRank = rs.sortBy(_._6).map(_._5)
      assert(inRank.zip(inRank.tail).forall { case (a, b) => a >= b },
        s"doc $d scores not monotone: ${inRank.mkString(",")}")
    }
    // df never exceeds the corpus size and a df == N term scores 0
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.forall(_._4 <= n))
    rows.filter(_._4 == n).foreach(r => assert(r._5 == 0.0))
  }

  test("substring spans: ≥8 tokens wide, inside the doc, and the cloned " +
    "docs reproduce their originals' spans") {
    val rows = run("q_dedup_substring").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (d, s0, e0, nw) =>
      assert(e0 - s0 >= 8, s"doc $d span [$s0,$e0) narrower than a window")
      assert(nw == e0 - s0 - 7, s"doc $d: n_win inconsistent with span width")
    }
    // every clone (doc_id >= 1e6) duplicates its source doc in full, so
    // the clone's whole token range is one duplicated span
    val clones = rows.filter(_._1 >= 1000000L).map(_._1).distinct
    assert(clones.nonEmpty, "cloned corpus produced no duplicated spans")
    clones.foreach { c =>
      val orig = c - 1000000L
      val os = rows.filter(_._1 == orig).map(t => (t._2, t._3)).toSet
      val cs = rows.filter(_._1 == c).map(t => (t._2, t._3)).toSet
      assert(os == cs, s"clone $c spans differ from original $orig")
    }
  }

  test("containment: clones score 1.0 and fractions are proper") {
    val rows = run("q_dedup_containment").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (d, nw, ndup, f) =>
      assert(ndup >= 0 && ndup <= nw, s"doc $d: n_dup out of range")
      assert(f >= 0.0 && f <= 1.0, s"doc $d: dup_frac $f not a fraction")
    }
    // every clone is a full copy: 100% of its windows exist in the source
    val clones = rows.filter(_._1 >= 1000000L)
    assert(clones.nonEmpty)
    clones.foreach { case (d, _, _, f) =>
      assert(f == 1.0, s"clone $d dup_frac $f != 1.0")
    }
  }

  test("bloom decontamination: flagged ⊇ exact (no false negatives)") {
    val rows = run("q_decontaminate_bloom").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (d, flagged, exact) =>
      assert(flagged >= exact,
        s"doc $d: bloom flagged $flagged < exact $exact — a false negative")
      assert(flagged > 0)
    }
  }

  test("range window: counts ≥1, and widening the frame to the full " +
    "history only grows them") {
    val rows = run("q_window_range_time").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._3 >= 1)) // the current row is always in frame
    // per-user event count bounds every 1h rolling count
    val byUser = rows.groupBy(_._2).view.mapValues(_.length).toMap
    rows.foreach { case (e, u, c) =>
      assert(c <= byUser(u), s"event $e: rolling count exceeds user total")
    }
  }

  test("sketch merge: ALL row estimate is within HLL error of the true " +
    "global distinct and per-type sketches merge consistently") {
    val rows = run("q_sketch_merge").map(r =>
      (r.getString(0), r.getDouble(1), r.getLong(2)))
    val all = rows.find(_._1 == "ALL").getOrElse(fail("no ALL row"))
    val types = rows.filter(_._1 != "ALL")
    assert(types.nonEmpty)
    // merged filled buckets = union of per-type filled buckets ≤ 64
    assert(all._3 <= 64 && types.forall(_._3 <= all._3))
    // the estimate is a real cardinality estimate: within 3x of truth
    // (64 buckets → ~13% standard error; 3x is a loose sanity net)
    val truth = spark.read.parquet(s"$dir/events.parquet")
      .select("user_id").distinct().count().toDouble
    assert(all._2 > truth / 3 && all._2 < truth * 3,
      s"ALL estimate ${all._2} vs truth $truth")
  }
}
