package graft

import org.scalatest.funsuite.AnyFunSuite

/** ANN quality contract: probing more cells can only help. Recall is
  * measured against the exact brute-force top-k on the same fixture. */
class SimilaritySpec extends AnyFunSuite with SharedSpark {

  private val sf = "/root/testdata/sf0.01"

  private def topSets(name: String): Map[Long, Set[Long]] =
    SparkEntry.queries(name)(spark, sf)
      .select("q_id", "vec_id").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }

  test("multi-probe IVF recall dominates single-probe recall") {
    val exact = topSets("ss_topk_brute")
    val p1 = topSets("ss_topk_ivf")
    val p2 = topSets("ss_topk_ivf2")
    for (q <- exact.keys) {
      val r1 = (p1.getOrElse(q, Set.empty) & exact(q)).size
      val r2 = (p2.getOrElse(q, Set.empty) & exact(q)).size
      assert(r2 >= r1, s"query $q: nprobe=2 recall $r2 < nprobe=1 $r1")
    }
  }
}
