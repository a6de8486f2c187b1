package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the integer PageRank the oracle can't
  * state: rank respects the fixture graph's known topology (hub
  * mirrors > linked sources > isolated sources), every rank holds the
  * damping floor, and the update is a contraction — no rank exceeds
  * the theoretical mass bound. */
class LinkGraphSpec extends AnyFunSuite with SharedSpark {

  private val S = 1000000000L
  private lazy val ranks = graft.queries.TextAnalysis.domainPagerank
    .fn(spark, "/root/testdata/sf0.001")
    .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("rank order matches the fixture topology: mirrors > linked > isolated") {
    val mirrors = ranks.filter(_._1.startsWith("mirror-")).values
    val sources = ranks.filter(_._1.endsWith(".example.com")).values
    assert(mirrors.nonEmpty && sources.nonEmpty)
    // every mirror hub (fed by many even-doc sources) outranks every
    // source domain
    assert(mirrors.min > sources.max,
      s"hub floor ${mirrors.min} vs source ceiling ${sources.max}")
    // sources split: even-doc sources receive mirror back-links,
    // odd-only sources are isolated at exactly the damping floor
    val floor = 15L * S / 100
    val isolated = sources.filter(_ == floor)
    val linked = sources.filter(_ > floor)
    assert(isolated.nonEmpty, "odd-only sources sit at the 0.15·S floor")
    assert(linked.nonEmpty, "even-doc sources rise above the floor")
  }

  test("ranks hold the damping floor and the total-mass bound") {
    val floor = 15L * S / 100
    assert(ranks.values.forall(_ >= floor))
    // total mass can only shrink under the floor-division update
    assert(ranks.values.sum <= S * ranks.size,
      "rank mass exceeded the initial total — update is not a contraction")
  }
}
