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

  test("graft.checkpoint.dir is applied once per context, not once " +
      "per materialize call") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ckpt-spec").toString
    spark.conf.set("graft.checkpoint.dir", dir)
    try {
      val d = Seq(1, 2, 3).toDF("x")
      graft.operators.CacheScope.materialize(d)
      graft.operators.CacheScope.materialize(d.filter(col("x") > 1))
      graft.operators.CacheScope.materialize(d.filter(col("x") > 2))
      // SparkContext.setCheckpointDir mints a fresh UUID subdirectory
      // every time it runs — a per-call re-set litters one orphan dir
      // per iteration of every loop that materializes through here
      val subdirs = new java.io.File(dir).listFiles()
        .count(_.isDirectory)
      assert(subdirs == 1,
        s"$subdirs checkpoint UUID dirs created across 3 calls, want 1")
    } finally {
      spark.conf.unset("graft.checkpoint.dir")
    }
  }
}
