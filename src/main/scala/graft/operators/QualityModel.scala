package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The shared linear quality-model kernel behind `ta_classifier_score`
  * and the streaming admission gate — ONE formula for the feature hash
  * and the weight vector, so a batch backfill and a live ingest filter
  * can never disagree on a verdict (the Pii/BpeOps discipline).
  *
  * Features are the hashing-trick dims of `ta_hash_embed` (token →
  * md5-ascii dim in [0, 64)); the weight per dim is the fixed integer
  * formula `w(d) = (37d + 11) mod 21 − 10` standing in for a trained
  * model vector (in production: a broadcast literal array — the plan
  * shape is identical). All arithmetic is BIGINT-exact.
  */
object QualityModel {

  /** Hashed feature dim of a token — BIGINT in [0, 64). */
  def dimOf(token: Column): Column =
    ((ascii(substring(md5(token), 1, 1)) * 31 +
      ascii(substring(md5(token), 2, 1))) % 64).cast("long")

  /** Integer weight of a dim — BIGINT in [−10, 10]. */
  def weightOfDim(dim: Column): Column =
    (dim * 37 + 11) % 21 - 10

  /** Per-ROW logit: fold the model over a document's tokens in one
    * narrow expression — the streaming-gate form. Equals the batch
    * explode → (doc, dim)-count → Σ cnt·w(dim) plan exactly (the sum
    * of per-token weights IS that double aggregation flattened), which
    * EdgeCaseSpec pins row-for-row against the catalog face. */
  def logitOf(textCol: Column): Column =
    aggregate(
      filter(split(textCol, " "), t => t =!= ""),
      lit(0L),
      (acc, t) => acc + weightOfDim(dimOf(t)))

  /** The corpus-unigram surprisal kernel behind `ta_unigram_surprisal`
    * and the composed quality gate — ONE builder so the two faces
    * cannot drift (the same discipline as [[logitOf]]): train the
    * unigram model (token → count, one aggregate), score every
    * document by exact whole-bit surprisal `floorlog2(N) −
    * floorlog2(cnt)` via binary-string lengths (no libm logs), and
    * collapse per document. Output: (idCol, n_tokens, total_bits,
    * mean_millibits). Documents with no non-empty token produce no
    * row (nothing to score). The corpus total attaches as a 1-row
    * broadcast — callers appear in PlanAuditSpec's scalar-attach
    * allowlist. */
  def surprisalPerDoc(docs: org.apache.spark.sql.DataFrame,
                      idCol: String = "doc_id",
                      textCol: String = "text")
      : org.apache.spark.sql.DataFrame = {
    val tok = docs.select(col(idCol),
        explode(split(col(textCol), " ")).as("token"))
      .filter(col("token") =!= "")
    val counts = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").as("n_total"))
    tok.join(counts, "token")
      .join(broadcast(total))
      .withColumn("bits",
        ((length(bin(col("n_total"))) - 1) -
          (length(bin(col("cnt"))) - 1)).cast("long"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"), sum("bits").as("total_bits"))
      .withColumn("mean_millibits",
        expr("(total_bits * 1000) div n_tokens"))
  }
}
