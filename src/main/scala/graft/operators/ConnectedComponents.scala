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
  * clusters are shallow — usually 2–3); each round is one shuffle join
  * of the edge list against current labels plus one aggregation. This
  * is the legitimate use of driver-side iteration: coordination only,
  * all data movement stays distributed. Each round's labels are
  * localCheckpoint'ed — persist alone is NOT enough: the logical plan
  * would still nest two copies of the previous round's plan, growing
  * exponentially with iterations until analysis itself OOMs; the
  * checkpoint truncates lineage to the materialized result.
  */
object ConnectedComponents {

  /** (id, cluster) for every node in `edges`, cluster = min reachable
    * id. `edges` is undirected input given as (aCol, bCol) pairs. */
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
      val neighborMin = bidir
        .join(labels, bidir("dst") === labels("id"))
        .groupBy(bidir("src").as("n_id"))
        .agg(min("label").as("n_min"))
      val next = labels
        .join(neighborMin, labels("id") === col("n_id"), "left")
        .select(labels("id"),
          least(col("label"), coalesce(col("n_min"), col("label")))
            .as("label"))
        .localCheckpoint()
      converged = next.join(labels.withColumnRenamed("label", "old"), "id")
        .filter(col("label") =!= col("old")).isEmpty
      labels = next
      iter += 1
    }
    bidir.unpersist()
    labels.select(col("id"), col("label").as("cluster"))
  }
}
