package graft

import org.scalatest.funsuite.AnyFunSuite

/** The cluster-size-independence contract: every query whose Scaladoc
  * claims determinism "across cluster sizes" must return IDENTICAL
  * rows (values and order) when the shuffle width and the input
  * partitioning change — what actually varies between a laptop run
  * and a 1000-executor run. Catches order-dependent aggregation
  * (float sums), partition-index-dependent sampling, and
  * first-row-wins reductions that only look deterministic at one
  * width.
  *
  * Runs each query at shuffle.partitions=3 and =17 (runtime-settable
  * conf; SharedSpark's default is 4 — restored after). The queries
  * here all end in a deterministic ORDER BY, so full-row equality
  * including order is the right bar. */
class ReproducibilitySpec extends AnyFunSuite with SharedSpark {

  private val sf = "/root/testdata/sf0.001"

  /** Determinism-claimed queries spanning every claim class: hash
    * sampling (rel/ta), temperature rates (driver-side sqrt +
    * broadcast), MinHash/SimHash fingerprints (narrow kernels), LSH
    * candidate generation (self-join), shard packing (two-level
    * prefix sum), quantization (per-row IEEE chain), connected
    * components (iterative min-label). */
  private val queries = Seq(
    "rel_hash_sample", "rel_stratified_sample", "ta_quality_sample",
    "ta_temperature_sample", "dd_simhash", "dd_minhash_lsh",
    "ta_shard_assign", "ss_quantize_int8", "dd_dup_clusters",
    "rel_table_checksum", "rel_copurchase", "dd_incremental",
    "rel_salted_join",
    // round-9 additions whose docs claim partitioning-independence:
    // integer PageRank (floor-div power iterations), keeper election
    // (sentinel argmax on integer keys), dup weights (1/|cluster|),
    // incremental view merge (exact cents), SCD2 islands + streaks
    // (tie-broken windows), containment (candidate-bounded rationals)
    "ta_domain_pagerank", "dd_dedup_best", "dd_dup_weights",
    "rel_incremental_view", "ev_scd2", "ev_activity_streaks",
    "dd_containment",
    // heavy hitters: output columns are exact counts + theorem
    // booleans (k ≥ fixture vocab, so the summary itself is exact);
    // the partitioning-dependent survivor SET never reaches the output
    "ta_heavy_hitters", "ev_path_transitions", "ev_attribution",
    // round-10 additions: redistribution PageRank (same floor-div
    // integer kernel + 1-row dangling aggregate), paragraph scrub
    // (md5-hash election, deterministic df threshold), CDC merge
    // (latest-change reduction with total ts+seq tie-break, U/K/I/D)
    "ta_domain_pagerank2", "dd_paragraph_dedup", "ev_cdc_merge",
    // round-11 additions: two-pass skyline (partitioning-INVARIANT by
    // the distributivity argument its doc makes — the strongest claim
    // here), SemDeDup (literal-centroid fits + pair pruning),
    // cohort-quintile RFM (user_id tie-broken ntiles), CDC chunking
    // (per-row narrow), classifier logits (integer sums), phash
    // near-dup (bit-flip join), bucket stats (map-combined counts)
    "rel_skyline", "dd_semantic_dedup", "ev_rfm", "dd_cdc_chunk_dup",
    "ta_classifier_score", "mm_phash_neardup", "dd_lsh_bucket_stats")

  test("claimed-deterministic queries are identical across shuffle widths") {
    val conf = spark.conf
    val orig = conf.get("spark.sql.shuffle.partitions")
    try {
      val failures = queries.flatMap { name =>
        def runAt(n: Int): Seq[String] = {
          conf.set("spark.sql.shuffle.partitions", n)
          SparkEntry.queries(name)(spark, sf)
            .collect().map(_.toString).toSeq
        }
        val narrow = runAt(3)
        val wide = runAt(17)
        if (narrow == wide) None
        else Some(s"$name: ${narrow.size} vs ${wide.size} rows, first diff " +
          narrow.zip(wide).indexWhere { case (a, b) => a != b })
      }
      assert(failures.isEmpty, failures.mkString("\n"))
    } finally conf.set("spark.sql.shuffle.partitions", orig)
  }
}
