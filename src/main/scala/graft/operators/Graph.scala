package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Non-iterative graph kernels (the iterative family lives in
  * [[ConnectedComponents]] and [[LinkGraph]]).
  *
  * [[triangleStats]] is the oriented-wedge triangle counter shared by
  * the `rel_copurchase_triangles` catalog face and GraphSpec's
  * closed-form pins; the catalog face documents the algorithm and its
  * O(m^{3/2}) bound.
  */
object Graph {

  /** Per-vertex triangle count + degree over an UNDIRECTED edge set.
    *
    * Input: one row per undirected edge as `(u, v)` with `u < v`,
    * duplicate-free (callers own canonicalization — both the catalog
    * face and the spec build edges that way). Output:
    * `(vertex, deg, n_triangles, clustering_permille)` — every vertex
    * of the edge set appears (isolated vertices have no edges, hence
    * no row); each triangle credits all three corners; clustering is
    * the Watts–Strogatz local coefficient in exact floor permille
    * `(2000·t) div (deg·(deg−1))`, 0 for degree-1 vertices.
    *
    * Shape (Suri & Vassilvitskii 2011): edges oriented from the
    * (degree, vertex)-LOWER endpoint, wedges enumerated only at each
    * edge's low-rank end via a self-join on the oriented src key with
    * the second leg strictly rank-above the first, closed by one
    * semi-join probe into the same oriented list. Each triangle
    * appears exactly once (at its lowest-rank corner, legs in
    * canonical order), and total wedge work is O(m^{3/2}) on any
    * degree distribution. The vertex type is whatever the caller's
    * `u`/`v` columns hold (orderable). */
  def triangleStats(und: DataFrame): DataFrame = {
    // the caller's edge lineage (often an expensive pair aggregation)
    // feeds the degree count AND the orientation join — persisted so
    // it computes once across those two jobs (r20: unpersisted, the
    // degs job re-ran it and the e job ran it again)
    val undP = und.persist()
    // degrees by ONE explode pass over the edge list, not a
    // union-of-two-selects (which scanned the edge lineage twice —
    // same multiset of endpoints either way)
    // persisted: degs feeds BOTH e-build joins and the final output
    // join, and the cached InMemoryRelation boundary of `e` cannot
    // bridge exchange reuse back to it — unpersisted, the final join
    // re-ran the whole (possibly expensive) caller lineage plus the
    // self-union aggregate a third time
    val degs = undP
      .select(explode(array(col("u"), col("v"))).as("vertex"))
      .groupBy("vertex").agg(count(lit(1)).as("deg"))
      .persist()
    val lower = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val e = undP
      .join(degs.select(col("vertex").as("u"), col("deg").as("du")),
        "u")
      .join(degs.select(col("vertex").as("v"), col("deg").as("dv")),
        "v")
      .select(when(lower, col("u")).otherwise(col("v")).as("src"),
        when(lower, col("v")).otherwise(col("u")).as("dst"),
        when(lower, col("dv")).otherwise(col("du")).as("ddeg"))
      .persist()
    val w = e.as("x").join(e.as("y"),
      col("x.src") === col("y.src") &&
        (col("x.ddeg") < col("y.ddeg") ||
          (col("x.ddeg") === col("y.ddeg") &&
            col("x.dst") < col("y.dst"))))
      .select(col("x.src").as("a"), col("x.dst").as("b"),
        col("y.dst").as("c"))
    val tri = w.join(
      e.select(col("src").as("b"), col("dst").as("c")),
      Seq("b", "c"), "left_semi")
    val perVertex = tri
      .select(explode(array(col("a"), col("b"), col("c")))
        .as("vertex"))
      .groupBy("vertex").agg(count(lit(1)).as("t"))
    val out = degs.join(perVertex, Seq("vertex"), "left")
      .select(col("vertex"), col("deg"),
        coalesce(col("t"), lit(0L)).as("n_triangles"),
        expr("CASE WHEN deg >= 2 THEN (2000 * coalesce(t, 0L)) " +
          "div (deg * (deg - 1)) ELSE 0L END")
          .as("clustering_permille"))
    CacheScope.eval(out)(e, degs, undP)
  }
}
