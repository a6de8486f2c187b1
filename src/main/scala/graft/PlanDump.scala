package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan-inspection companion to [[Explain]] for kernels whose catalog
  * faces eagerly materialize through `CacheScope.eval` (the explain of
  * the FACE then shows only the truncated `Scan ExistingRDD`): builds
  * the inner lineage directly and prints `explain("formatted")`
  * WITHOUT executing it. Used to commit the r20 before/after plan
  * evidence under plans/r20/.
  *
  * Usage: scripts/run.sh graft.PlanDump /root/testdata/sf0.1 <kernel...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.ensure(spark)
    def docs = graft.sources.Tables(spark, sfDir, "documents")
    val kernels: Map[String, () => org.apache.spark.sql.DataFrame] = Map(
      "chunk_dup_stats" -> (() =>
        graft.operators.TextDedup.chunkDupStats(docs)),
      "ngram_novelty" -> (() =>
        graft.operators.TextDedup.ngramNovelty(docs, 6)),
      "bm25_ranked" -> (() =>
        graft.queries.Similarity.bm25Ranked(docs)._1),
      "surprisal_per_doc" -> (() =>
        graft.operators.QualityModel.surprisalPerDoc(docs)),
      // the ss_rrf_fusion tail (r21 verdict #4): the face materializes
      // through CacheScope.eval, so this prints the shared inner
      // lineage; the postings cache entry stays registered so the
      // explain shows the face's real InMemoryRelation substitution
      "rrf_fusion" -> (() =>
        graft.queries.Similarity.rrfFusionLineage(spark, sfDir)._1),
      // the packShards in-plan offsets evidence (r21): the window +
      // broadcast-offsets join over a deterministic weight projection
      "pack_shards" -> (() =>
        graft.operators.Partitioning.packShards(
          docs.select(org.apache.spark.sql.functions.col("source"),
            org.apache.spark.sql.functions.col("doc_id"),
            org.apache.spark.sql.functions.expr(
              "cast(size(split(text, ' ')) as long)").as("n_tokens")),
          "source", "doc_id", "n_tokens", 2000L)),
      "pair_overlap" -> (() => {
        val sh = graft.operators.TextDedup.hashedShingles(docs)
        val cand = graft.operators.TextDedup
          .lshCandidates(docs, numPerms = 8, nBands = 2)
          .select("doc_a", "doc_b")
        graft.operators.TextDedup.pairOverlap(sh, cand)
      }),
      // the r20 lazy-lshCandidates evidence pair (dd_minhash_lsh as the
      // representative face): "before" is the eager kernel — its
      // materializing checkpoint truncates the face plan to a
      // LogicalRDD leaf and costs a separate job; "after" is the lazy
      // twin's single fused plan (signature → band self-join over the
      // in-plan cache → sort), the shape the face's one final job now
      // executes. Printing "before" EXECUTES the checkpoint by
      // construction — run at a small sf.
      "minhash_lsh_before" -> (() =>
        graft.operators.TextDedup
          .lshCandidates(docs, numPerms = 8, nBands = 2)
          .select(col("doc_a"), col("doc_b"), col("shared_bands"))
          .orderBy("doc_a", "doc_b")),
      "minhash_lsh_after" -> (() => {
        val (cand, _) = graft.operators.TextDedup
          .lshCandidatesLazy(docs, numPerms = 8, nBands = 2)
        cand.select(col("doc_a"), col("doc_b"), col("shared_bands"))
          .orderBy("doc_a", "doc_b")
      }))
    val selected = if (names.isEmpty) kernels.keys.toSeq.sorted else names
    selected.foreach { n =>
      println(s"\n========== $n ==========")
      kernels(n)().explain("formatted")
    }
    spark.stop()
  }
}
