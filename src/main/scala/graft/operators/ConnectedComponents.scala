package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the
  * cluster-resolution step that turns near-dup candidate PAIRS into
  * duplicate GROUPS (keep one representative per component).
  *
  * Each node converges to the minimum doc id reachable from it, a
  * unique fixpoint independent of iteration order — deterministic and
  * replayable by a recursive-CTE oracle.
  *
  * Scale shape: the driver loop runs diameter-many rounds (near-dup
  * clusters are shallow — usually 2–3); each round is ONE distributed
  * action: an edge⋈label join unioned with the labels themselves and
  * reduced by a single min-aggregation that carries both the new label
  * and the node's previous label. The convergence probe then scans the
  * checkpointed blocks of that round (no plan re-execution, no second
  * join — r3's probe re-ran the propagation join every round). This is
  * the legitimate use of driver-side iteration: coordination only, all
  * data movement stays distributed. Each round's labels are
  * localCheckpoint'ed — persist alone is NOT enough: the logical plan
  * would still nest two copies of the previous round's plan, growing
  * exponentially with iterations until analysis itself OOMs; the
  * checkpoint truncates lineage to the materialized result.
  */
object ConnectedComponents {

  /** (id, cluster) for every node in `edges`, cluster = min reachable
    * id. `edges` is undirected input given as (aCol, bCol) pairs.
    *
    * Throws [[IllegalStateException]] if the fixpoint is not reached
    * within `maxIters` rounds — returning silently non-converged
    * labels would be a wrong answer with no signal. */
  def minLabel(edges: DataFrame, aCol: String, bCol: String,
               maxIters: Int = 50): DataFrame = {
    val bidir = edges
      .select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist()
    var labels = bidir.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      // Neighbor labels and the node's own (id, label) row flow into one
      // min-aggregation: min over all rows = new label; the is_self row
      // (exactly one per id — labels' ids are bidir's distinct srcs)
      // resurfaces the previous label so `changed` needs no extra join.
      val fromNeighbors = bidir
        .join(labels, bidir("dst") === labels("id"))
        .select(bidir("src").as("id"), col("label"),
          lit(false).as("is_self"))
      val next = fromNeighbors
        .union(labels.select(col("id"), col("label"),
          lit(true).as("is_self")))
        .groupBy("id")
        .agg(min("label").as("label"),
          max(when(col("is_self"), col("label"))).as("__old"))
        .withColumn("__changed", col("label") < col("__old"))
        .localCheckpoint()
      // Scans the blocks just materialized by localCheckpoint — cheap.
      converged = next.filter(col("__changed")).isEmpty
      labels = next.select("id", "label")
      iter += 1
    }
    bidir.unpersist()
    if (!converged) throw new IllegalStateException(
      s"ConnectedComponents.minLabel: no fixpoint after $maxIters rounds" +
        " — labels would be silently wrong; raise maxIters")
    labels.select(col("id"), col("label").as("cluster"))
  }
}
