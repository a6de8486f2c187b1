package graft.operators

import org.apache.spark.sql.DataFrame

/** Cache-lifetime discipline for queries that persist intermediates.
  *
  * A catalog query that caches a shared lineage (shingle tables, band
  * tables, bucketed corpora) must not leak those blocks to the session:
  * a bench harness's `clearCache()` hides the leak, a long-lived
  * pipeline accumulates it. [[eval]] materializes the final result
  * eagerly — one extra scan of result-sized data, cheap next to the
  * released lineage — and then frees every intermediate immediately, so
  * after a catalog query runs the session's cache manager is empty.
  */
object CacheScope {

  /** Release a localCheckpoint'ed DataFrame's storage blocks.
    * `Dataset.unpersist` only evicts cache-manager entries, and
    * localCheckpoint blocks live at the RDD layer behind the plan's
    * `LogicalRDD` leaf — unpersist that RDD or the blocks linger until
    * GC-driven cleanup. No-op for non-checkpoint plans. */
  def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Materialize `result` eagerly (localCheckpoint) and release the
    * `intermediates` — persisted or localCheckpoint'ed — right away.
    * The returned DataFrame reads the materialized blocks; those are
    * result-scoped and reclaimed by the context cleaner once the caller
    * drops the reference. */
  def eval(result: DataFrame)(intermediates: DataFrame*): DataFrame = {
    val out = result.localCheckpoint()
    intermediates.foreach { d =>
      d.unpersist(blocking = false)
      releaseCheckpoint(d)
    }
    out
  }
}
