package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Approximate/exact nearest-neighbor search API over embedding
  * columns — the library face behind the `ss_topk_*` catalog queries.
  *
  * Inputs: `corpus` (idCol, vecCol), `queries` (q_id, q_emb). Outputs:
  * (q_id, rank, idCol, cosine), rank 1..k, ties broken by id — fully
  * deterministic given the bit-stable fold cosine (VectorFns).
  *
  * Scale: queries are broadcast (small batch contract); brute force is
  * |Q|·N embarrassingly parallel; bucketed probing joins on the bucket
  * key so probe cost tracks bucket size, not corpus size.
  */
object Ann {

  private def rank(scored: DataFrame, k: Int, idCol: String): DataFrame = {
    val w = Window.partitionBy("q_id")
      .orderBy(col("cosine").desc, col(idCol).asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col(idCol), col("cosine"))
      .orderBy("q_id", "rank")
  }

  /** Exact top-k by cosine: every query scored against every corpus
    * vector (minus itself when ids collide). */
  def topkBrute(s: SparkSession, corpus: DataFrame, queries: DataFrame,
                k: Int, idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame =
    rank(
      corpus.join(broadcast(queries), col(idCol) =!= col("q_id"))
        .withColumn("cosine", VectorFns.cosineNative(s, "q_emb", vecCol)),
      k, idCol)

  /** SRP-bucketed approximate top-k: corpus and queries bucketed by
    * `nPlanes` sign-projection bits (operators.Srp — a narrow map);
    * probes score same-bucket vectors only. */
  def topkSrp(s: SparkSession, corpus: DataFrame, queryIds: DataFrame,
              k: Int, nPlanes: Int, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    // bucketed feeds both the query lookup and the probe join —
    // persisted lazily (the result-materializing job fills the cache in
    // passing; no eager extra pass), released as soon as the (k·|Q|)-row
    // result is itself materialized (CacheScope.eval) so no blocks
    // outlive the call
    val bucketed = Srp.withBucket(s, corpus, nPlanes).persist()
    val queries = bucketed.join(queryIds, idCol)
      .select(col(idCol).as("q_id"), col("bucket").as("q_bucket"),
        col(vecCol).as("q_emb"))
    CacheScope.eval(rank(
      bucketed.join(broadcast(queries),
          col("bucket") === col("q_bucket") && col(idCol) =!= col("q_id"))
        .withColumn("cosine", VectorFns.cosineNative(s, "q_emb", vecCol)),
      k, idCol))(bucketed)
  }
}
