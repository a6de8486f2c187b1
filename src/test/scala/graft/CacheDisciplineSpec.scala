package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cache discipline — queries that cache shared intermediates (shingle
  * and band tables, bucketed corpora, fingerprints) must release them
  * once their result is materialized (operators.CacheScope.eval): a
  * long-lived pipeline must not accumulate session-lifetime blocks. */
class CacheDisciplineSpec extends AnyFunSuite with SharedSpark {

  private val sf = "/root/testdata/sf0.001"

  test("cache-heavy catalog queries leave no session cache entries") {
    for (name <- Seq("dd_minhash_lsh", "dd_jaccard_verify",
        "dd_simhash_hamming", "dd_simhash_hamming2", "dd_embed_srp",
        "dd_dup_clusters", "dd_dedup_corpus", "dd_decontaminate",
        "ss_topk_srp", "ss_topk_ivf")) {
      SparkEntry.queries(name)(spark, sf).count()
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$name left entries in the session cache manager")
    }
  }
}
