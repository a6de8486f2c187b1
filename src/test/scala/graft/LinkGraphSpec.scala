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

  test("driver replay equals the distributed rounds on random graphs, " +
      "both variants") {
    import spark.implicits._
    import graft.operators.LinkGraph
    val rnd = new scala.util.Random(7)
    val names = (0 until 12).map(i => s"d$i")
    for (trial <- 1 to 2; redis <- Seq(false, true)) {
      // duplicate node rows included: pageRank's node-SET contract
      // dedups them once for both paths (distributively they would
      // otherwise multiply every in-mass contribution through the
      // rank join while the local HashMap counts them once)
      val nodes = (names ++ Seq("d0", "d3")).toDF("domain")
      // random sparse graph incl. self-filtered pairs, dangling nodes,
      // duplicate edges (deg counts rows), and an edge to a NON-node
      // (must contribute nothing, its src still counts toward deg)
      val edges = (Seq.fill(20)((names(rnd.nextInt(12)),
          names(rnd.nextInt(12)))).filter { case (a, b) => a != b } ++
        Seq(("d0", "d1"), ("d0", "d1"), ("d2", "not-a-node")))
        .toDF("src", "dst")
      val fast = LinkGraph.pageRank(nodes, edges, rounds = 4,
        redistribute = redis)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val dist = LinkGraph.pageRank(nodes, edges, rounds = 4,
        redistribute = redis, driverEdgeLimit = 0L)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(fast == dist,
        s"trial $trial redis=$redis: driver $fast != distributed $dist")
    }
  }

  test("non-string node ids and null-bearing graphs route to the " +
      "type-generic distributed loop instead of crashing the local " +
      "replay") {
    import spark.implicits._
    import graft.operators.LinkGraph
    // Long-typed ids, small graph: the size gate alone would take the
    // local replay, whose collect is typed getString — the type gate
    // must route it distributed and return the same ranks as a forced
    // distributed run
    val nodesL = Seq(1L, 2L, 3L).toDF("domain")
    val edgesL = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
      .toDF("src", "dst")
    def ranksOf(lim: Long) =
      LinkGraph.pageRank(nodesL, edgesL, rounds = 3,
        driverEdgeLimit = lim)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranksOf(1L << 20) == ranksOf(0L),
      "long-typed graph diverged between gated and forced-distributed")
    // null src/dst edges and a null domain: SQL join semantics (null
    // keys match nothing; the null node row still holds the floor) —
    // the null gate must keep this off the HashMap replay
    val nodesN = (Seq("a", "b") :+ null.asInstanceOf[String])
      .toDF("domain")
    val edgesN = Seq(("a", "b"), (null, "a"), ("b", null))
      .toDF("src", "dst")
    val gated = LinkGraph.pageRank(nodesN, edgesN, rounds = 2)
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val forced = LinkGraph.pageRank(nodesN, edgesN, rounds = 2,
      driverEdgeLimit = 0L)
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(gated == forced,
      s"null-bearing graph diverged: gated $gated vs forced $forced")
    assert(gated.contains(None), "null node row lost")
  }

  test("sink graph: redistribution matches the exact integer recurrence " +
      "and dominates the no-redistribution form") {
    import spark.implicits._
    import graft.operators.LinkGraph
    // a <-> b cycle plus isolated sink c: the smallest graph where the
    // two variants diverge every round
    val nodes = Seq("a", "b", "c").toDF("domain")
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    def run(redis: Boolean): Map[String, Long] =
      LinkGraph.pageRank(nodes, edges, rounds = 5, redistribute = redis)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = run(redis = false)
    val redis = run(redis = true)
    // hand replay of the exact integer recurrence the operator promises
    val floor = 15L * S / 100
    var (ra, rb, rc) = (S, S, S)
    for (_ <- 1 to 5) {
      val share = rc / 3 // dangling mass div N, floor
      val na = floor + (85L * (rb + share)) / 100
      val nb = floor + (85L * (ra + share)) / 100
      val nc = floor + (85L * share) / 100
      ra = na; rb = nb; rc = nc
    }
    assert(redis == Map("a" -> ra, "b" -> rb, "c" -> rc),
      s"redistribution recurrence mismatch: $redis")
    // without redistribution the sink drains to the bare floor...
    assert(plain("c") == floor)
    // ...and with it every node holds at least the plain variant's rank
    // (monotone update + non-negative share, by induction over rounds)
    assert(Seq("a", "b", "c").forall(d => redis(d) >= plain(d)))
    assert(redis.values.sum > plain.values.sum,
      "redistribution must retain strictly more total mass on a sink graph")
    // a graph with NO dangling nodes: the variants are identical
    val cyc = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val p2 = LinkGraph.pageRank(nodes, cyc, 5, redistribute = false)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val r2 = LinkGraph.pageRank(nodes, cyc, 5, redistribute = true)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(p2 == r2, "no sinks -> zero share -> identical ranks")
  }
}
