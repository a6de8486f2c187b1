package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** Pins operators.Graph.triangleStats on closed-form graphs the
  * fixture oracle can't certify: the catalog face hash-checks a real
  * co-purchase graph, these pin the algebra where counts are
  * hand-computable — including the orientation tie cases of
  * regular graphs (every vertex equal degree). */
class GraphSpec extends AnyFunSuite with SharedSpark {

  private def stats(edges: (Long, Long)*): Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    val und = edges.toSeq.map { case (a, b) => (math.min(a, b),
      math.max(a, b)) }.distinct.toDF("u", "v")
    Graph.triangleStats(und).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
  }

  test("a single triangle: every corner counts it, clustering 1000") {
    val m = stats(1L -> 2L, 2L -> 3L, 1L -> 3L)
    assert(m.size == 3)
    assert(m.values.forall(_ == ((2L, 1L, 1000L))))
  }

  test("a square (4-cycle) has no triangles") {
    val m = stats(1L -> 2L, 2L -> 3L, 3L -> 4L, 1L -> 4L)
    assert(m.size == 4)
    assert(m.values.forall(_ == ((2L, 0L, 0L))))
  }

  test("K4: four triangles, every vertex on three, clustering 1000") {
    // complete graph on 4 vertices — all degrees equal, so every
    // orientation decision rides the vertex-id tiebreak
    val m = stats(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L,
      3L -> 4L)
    assert(m.size == 4)
    assert(m.values.forall(_ == ((3L, 3L, 1000L))))
    assert(m.values.map(_._2).sum / 3 == 4)
  }

  test("bowtie: the cut vertex sits on both triangles, wings on one") {
    // triangles {1,2,3} and {3,4,5} sharing vertex 3
    val m = stats(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L, 4L -> 5L,
      3L -> 5L)
    assert(m(3L) == ((4L, 2L, (2000L * 2) / (4 * 3))))
    for (v <- Seq(1L, 2L, 4L, 5L)) assert(m(v) == ((2L, 1L, 1000L)))
  }

  test("a hub star has wedges but no triangles") {
    val m = stats(1L -> 2L, 1L -> 3L, 1L -> 4L, 1L -> 5L, 1L -> 6L)
    assert(m(1L) == ((5L, 0L, 0L)))
    assert(Seq(2L, 3L, 4L, 5L, 6L).forall(m(_) == ((1L, 0L, 0L))))
  }

  test("single edge: degree-1 endpoints, zero clustering, no crash") {
    val m = stats(7L -> 9L)
    assert(m == Map(7L -> ((1L, 0L, 0L)), 9L -> ((1L, 0L, 0L))))
  }
}
