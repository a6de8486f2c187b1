package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental BM25 inverted-index maintenance — the LEXICAL member
  * of the incremental trio (fingerprints `dd_incremental`, vectors
  * `Ann.appendIvfIndex` / `ss_ivf_append`, and this): at 100 TB the
  * posting build dominates lexical retrieval cost, and re-tokenizing
  * the resident corpus for every daily crawl batch is exactly what a
  * pipeline cannot afford. The index is four artifacts a warehouse
  * persists — the postings table `(doc_id, token, tf)`, the
  * vocabulary table `(token, df)`, the doc-length table
  * `(doc_id, dl)` (maintained so a probe NEVER re-aggregates the
  * full postings for lengths — the corpus-sized cost that would
  * otherwise hide inside every query batch), and the two corpus
  * scalars `(n_docs, Σdl)` — and appending a batch touches the
  * resident corpus ZERO times:
  *
  *   - batch postings: one tokenize pass over the BATCH only;
  *   - postings' = postings ∪ batch postings (batches are doc-
  *     disjoint from the resident corpus by construction — a crawl
  *     batch is new doc_ids — so per-doc term counts never merge);
  *   - df' = df +_token batch-df (full-outer add; new tokens enter
  *     with their batch df);
  *   - dl' = dl ∪ batch-dl (doc-disjoint union, like postings);
  *   - n_docs' / Σdl' add the batch scalars.
  *
  * Every merge is exact integer addition, so the appended index is
  * BIT-IDENTICAL to a from-scratch rebuild over the union corpus —
  * [[rankedFromIndex]] over the appended bundle returns the same
  * rankings as the full-rebuild `bm25Ranked` (SimilaritySpec pins
  * probe parity and the df/scalar merges). Re-tuning (the df-cap,
  * band structure) is a separate gated decision — `ss_bm25_append`
  * reports the per-term posting growth that triggers it, the
  * `ss_ivf_append` / `dd_lsh_bucket_stats` role.
  *
  * Terms are the repo's word-2-shingle convention (see
  * `ss_bm25_topk`'s rationale: the synthetic unigram vocabulary is
  * too dense for unigram idf). Scalars live as driver longs — a
  * 1-row planning-class collect per build/append, the
  * `ta_heavy_hitters` scalar-attach stance.
  */
object Lexical {

  /** Instance-grain word-2-shingles of a split-token array `__l` —
    * the one term definition shared by the index build, the append
    * path and the query side (the `dd_*` shingle convention). */
  val GramsOf: String =
    "if(size(__l) >= 2, transform(sequence(1, size(__l) - 1), " +
      "i -> concat_ws(' ', slice(__l, i, 2))), array())"

  /** One tokenize pass → the postings relation `(doc_id, token, tf)`
    * — the inverted index as a DataFrame, map-side combinable. */
  def postings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("__l"))
      .select(col("doc_id"), explode(expr(GramsOf)).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))

  /** The persisted-index bundle. `nDocs` counts docs WITH at least
    * one posting (the `bm25Ranked` convention — a one-token doc has
    * no 2-shingles and no dl); `sumDl` is the total posting mass
    * Σtf, so `avgdl_m = (1000·sumDl) div nDocs` exactly as the
    * full-rebuild scorer freezes it. `dl` is the per-doc posting
    * mass `(doc_id, dl)` — maintained through append/remove exactly
    * like the postings so the probe reads lengths from a |docs|-row
    * table instead of re-aggregating |postings| rows per batch. */
  final case class Bm25Index(tf: DataFrame, df: DataFrame,
                             dl: DataFrame, nDocs: Long, sumDl: Long)

  private def docLengths(tf: DataFrame): DataFrame =
    tf.groupBy("doc_id").agg(sum("tf").as("dl"))

  /** The one vocabulary derivation (df = docs per token) every face
    * shares — drift in any copy would break the bit-identical-to-
    * rebuild contract between the maintained and derived forms. */
  private def vocabOf(tf: DataFrame): DataFrame =
    tf.groupBy("token").agg(count(lit(1)).as("df"))

  /** From-scratch build: one tokenize pass + the vocabulary and
    * doc-length aggregates + a 1-row scalar collect. */
  def buildIndex(docs: DataFrame): Bm25Index = {
    val tf = postings(docs)
    val r = tf.agg(countDistinct("doc_id"), sum("tf")).collect()(0)
    Bm25Index(tf, vocabOf(tf), docLengths(tf), r.getLong(0),
      if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** The append: tokenize the BATCH only, union postings, add df per
    * token, add the scalars. The batch must be doc-disjoint from the
    * resident corpus (new doc_ids — the crawl-batch invariant); a
    * re-crawled doc_id goes through [[removeDocs]] first — NOT a bare
    * postings filter, which would leave `df`/`nDocs`/`sumDl` counting
    * the ghost doc and silently shift idf and avgdl away from the
    * rebuild the bit-identical contract promises. The true delete
    * cost is the filter plus ONE bounded aggregate over the removed
    * slice (see removeDocs), still never a corpus re-tokenize. */
  def appendIndex(idx: Bm25Index, batch: DataFrame): Bm25Index = {
    val btf = postings(batch)
    val bdf = vocabOf(btf)
    val r = btf.agg(countDistinct("doc_id"), sum("tf")).collect()(0)
    val mergedDf = idx.df.withColumnRenamed("df", "__base")
      .join(bdf.withColumnRenamed("df", "__new"),
        Seq("token"), "full_outer")
      .select(col("token"),
        (coalesce(col("__base"), lit(0L)) +
          coalesce(col("__new"), lit(0L))).as("df"))
    Bm25Index(idx.tf.unionByName(btf), mergedDf,
      idx.dl.unionByName(docLengths(btf)),
      idx.nDocs + r.getLong(0),
      idx.sumDl + (if (r.isNullAt(1)) 0L else r.getLong(1)))
  }

  /** The delete: remove a doc_id set (re-crawl supersession, takedown)
    * from the index without touching the surviving corpus. Cost is
    * the maintenance mirror of append: an anti-join filter over the
    * postings plus ONE aggregate over the REMOVED slice only — the
    * per-token df decrement (each (doc, token) appears once in the
    * postings, so the decrement is a row count) and the two scalar
    * subtractions (distinct removed docs for `nDocs`, Σtf for
    * `sumDl`, matching buildIndex's docs-with-postings convention).
    * Tokens whose df reaches zero LEAVE the vocabulary — exactly
    * what a from-scratch rebuild over the remainder computes, so the
    * result is bit-identical to `buildIndex(corpus minus ids)`
    * (SimilaritySpec pins df-map, scalar and probe parity). Ids
    * absent from the index are no-ops. The removed-slice aggregate
    * is bounded by the deleted docs' posting mass, never corpus
    * size — the crawl-maintenance invariant shared with
    * [[appendIndex]]. */
  def removeDocs(idx: Bm25Index, ids: DataFrame): Bm25Index = {
    val rm = ids.select(col("doc_id")).distinct()
    val removed = idx.tf.join(rm, Seq("doc_id"), "left_semi")
    val dec = removed.groupBy("token").agg(count(lit(1)).as("__dec"))
    val r = removed.agg(countDistinct("doc_id"), sum("tf")).collect()(0)
    val newDf = idx.df.join(dec, Seq("token"), "left_outer")
      .select(col("token"),
        (col("df") - coalesce(col("__dec"), lit(0L))).as("df"))
      .filter(col("df") > 0)
    Bm25Index(idx.tf.join(rm, Seq("doc_id"), "left_anti"), newDf,
      idx.dl.join(rm, Seq("doc_id"), "left_anti"),
      idx.nDocs - r.getLong(0),
      idx.sumDl - (if (r.isNullAt(1)) 0L else r.getLong(1)))
  }

  /** Persist the bundle as four parquet datasets under `path`
    * (`postings/`, `vocab/`, `doclen/`, `scalars/` — the last a
    * 1-row table) via the T6 dynamic-overwrite sink, so the index
    * survives the session the way the IVF bucketed table does
    * (`Ann.appendIvfIndex`): build once, probe from any later job.
    * Re-delivery overwrites in place — idempotent like every other
    * sink in `jobs.Sinks`.
    *
    * The tokenize lineage executes ONCE: only the postings write
    * forces it; vocab and doclen are then re-derived from the
    * just-written parquet (a columnar scan of three narrow columns),
    * not from the in-session plans — three independent writes of
    * lazy plans all rooted at `postings(docs)` would tokenize the
    * corpus three times, the exact cost this module exists to avoid.
    * Sound because both tables are exact functions of the postings
    * and the MAINTAINED forms are spec-pinned bit-identical to these
    * recomputes at every lifecycle step.
    *
    * Each dataset lands via STAGE-THEN-RENAME (write `<dir>__stage`,
    * then swap): the maintain-and-rewrite flow — readIndex(path) →
    * append/remove → writeIndex(path) — has the postings write
    * READING the very directory it replaces, which a direct
    * overwrite both refuses (self-read) and, worked around with a
    * checkpoint, turns into a data-loss window (target dropped while
    * the only copy is non-fault-tolerant blocks). With the stage, a
    * crash leaves the intact original or a complete durable staging
    * copy. The four datasets are not one transaction — a crash
    * between swaps leaves a mixed bundle; re-running writeIndex
    * converges it (every write is idempotent). */
  def writeIndex(idx: Bm25Index, path: String): Unit = {
    val spark = idx.tf.sparkSession
    def staged(dir: String)(write: String => Unit): Unit = {
      val stage = dir + "__stage"
      write(stage)
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
      fs.rename(new org.apache.hadoop.fs.Path(stage), p)
    }
    staged(s"$path/postings") {
      graft.jobs.Sinks.partitionedParquet(idx.tf, _, Nil) }
    val tfDisk = graft.sources.Tables
      .readLake(spark, s"$path/postings", "parquet")
    staged(s"$path/vocab") {
      graft.jobs.Sinks.partitionedParquet(vocabOf(tfDisk), _, Nil) }
    staged(s"$path/doclen") {
      graft.jobs.Sinks.partitionedParquet(docLengths(tfDisk), _, Nil) }
    import spark.implicits._
    staged(s"$path/scalars") {
      graft.jobs.Sinks.partitionedParquet(
        Seq((idx.nDocs, idx.sumDl)).toDF("n_docs", "sum_dl"), _, Nil) }
  }

  /** Reload a [[writeIndex]] bundle. The scalar read is a 1-row
    * planning-class collect (the `ta_heavy_hitters` stance); the
    * postings/vocab/doclen come back as lazy scans, so a
    * reload-then-probe reads only the posting lists the query's
    * terms touch — the serving shape, corpus never rescanned. A
    * bundle persisted BEFORE the doclen dataset existed (three
    * datasets only) stays readable: its doc lengths derive from the
    * intact postings instead — correct (dl is an exact function of
    * tf), just without the probe-cost benefit until the bundle is
    * rewritten. */
  def readIndex(spark: org.apache.spark.sql.SparkSession,
                path: String): Bm25Index = {
    import graft.sources.Tables
    val sc = Tables.readLake(spark, s"$path/scalars", "parquet")
      .select("n_docs", "sum_dl").collect()(0)
    val tf = Tables.readLake(spark, s"$path/postings", "parquet")
    val dlPath = new org.apache.hadoop.fs.Path(s"$path/doclen")
    val dl =
      if (dlPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .exists(dlPath))
        Tables.readLake(spark, s"$path/doclen", "parquet")
      else docLengths(tf)
    Bm25Index(tf,
      Tables.readLake(spark, s"$path/vocab", "parquet"),
      dl, sc.getLong(0), sc.getLong(1))
  }

  /** Serving-TABLE layout of the bundle — the `Ann.buildIvfIndex`
    * build-once pattern, lexical edition: the same four artifacts as
    * [[writeIndex]], but postings and vocabulary persisted as
    * TOKEN-bucketed catalog tables and doclen bucketed by doc_id. A
    * probe over [[readIndexTables]] then plans every INDEX-side join
    * without an exchange on the index side — the bucketed scans come
    * out hash-partitioned by their bucket spec, so only the (small)
    * query-derived side shuffles to meet them; at 100 TB the
    * postings never move. Same one-tokenize-pass discipline as
    * writeIndex: vocab and doclen derive from the just-written
    * postings table. Every table installs via
    * [[Partitioning.replaceBucketed]]'s stage-then-swap, so the
    * maintain-and-rewrite flow — readIndexTables(name) →
    * append/remove → writeIndexTables(name) — works in place (the
    * postings lineage may READ the table being replaced) and a
    * mid-write failure can never destroy the serving copy. The four
    * tables are not one transaction — a crash between swaps leaves a
    * mixed bundle; re-running writeIndexTables converges it. */
  def writeIndexTables(idx: Bm25Index, name: String,
                       buckets: Int = 16): Unit = {
    val spark = idx.tf.sparkSession
    Partitioning.replaceBucketed(spark, s"${name}_postings", idx.tf,
      "token", buckets)
    val tfDisk = spark.table(s"${name}_postings")
    Partitioning.replaceBucketed(spark, s"${name}_vocab",
      vocabOf(tfDisk), "token", buckets)
    Partitioning.replaceBucketed(spark, s"${name}_doclen",
      docLengths(tfDisk), "doc_id", buckets)
    import spark.implicits._
    val stage = s"${name}_scalars__stage"
    Seq((idx.nDocs, idx.sumDl)).toDF("n_docs", "sum_dl")
      .write.mode("overwrite").format("parquet").saveAsTable(stage)
    spark.sql(s"DROP TABLE IF EXISTS ${name}_scalars")
    spark.sql(s"ALTER TABLE $stage RENAME TO ${name}_scalars")
  }

  /** Reload a [[writeIndexTables]] bundle by name — lazy bucketed
    * scans plus the 1-row scalar collect, probe-parity-identical to
    * the in-session index (spec-pinned, along with the probe plan
    * having strictly fewer exchanges than the plain-parquet form). */
  def readIndexTables(spark: org.apache.spark.sql.SparkSession,
                      name: String): Bm25Index = {
    val sc = spark.table(s"${name}_scalars")
      .select("n_docs", "sum_dl").collect()(0)
    Bm25Index(spark.table(s"${name}_postings"),
      spark.table(s"${name}_vocab"),
      spark.table(s"${name}_doclen"),
      sc.getLong(0), sc.getLong(1))
  }

  /** The probe against a prebuilt/appended index — arithmetic
    * identical to the full-rebuild `bm25Ranked` (exact-rational
    * Okapi k1=1.2 b=0.75, whole-bit floor-log2 idf, df·dfCapDen ≤ N
    * impact pruning, ties to doc_id), with the corpus stats taken
    * from the index SCALARS instead of a 1-row aggregate — the
    * serving shape: stats are literals in the plan, the query batch
    * equi-joins the vocabulary then the postings on the TERM key,
    * and doc lengths come from the bundle's MAINTAINED `dl` table
    * (a |docs|-row equi-join on the candidates), never a probe-time
    * re-aggregation of the full postings — the corpus-sized cost
    * that would otherwise hide inside every query batch. Per-query
    * cost is therefore Σ posting-list length over its terms plus the
    * candidate dl lookups, never |postings|. SimilaritySpec pins
    * output equality with the full-rebuild scorer on the union
    * corpus. */
  def rankedFromIndex(idx: Bm25Index, queryDocs: DataFrame,
                      dfCapDen: Int = 20, k: Int = 10): DataFrame = {
    require(idx.nDocs > 0, "empty index")
    val avgdlM = (1000L * idx.sumDl) / idx.nDocs
    val idf = idx.df.withColumn("idf_b", expr(
      s"length(bin((2*${idx.nDocs}L - 2*df + 1) div (2*df + 1))) - 1"))
    val qterms = queryDocs
      .select(col("doc_id").as("q_id"), split(col("text"), " ").as("__l"))
      .select(col("q_id"),
        explode(array_distinct(expr(GramsOf))).as("token"))
      .join(idf, "token")
      .filter(col("df") * dfCapDen <= lit(idx.nDocs))
      .select("q_id", "token", "idf_b")
    val scored = qterms.join(idx.tf, "token")
      .filter(col("doc_id") =!= col("q_id"))
      .join(idx.dl, "doc_id")
      .withColumn("contrib", expr(
        s"(idf_b * 22000 * tf * ${avgdlM}L) div " +
          s"(10 * ${avgdlM}L * tf + 3 * ${avgdlM}L + 9000 * dl)"))
      .groupBy("q_id", "doc_id")
      .agg(sum("contrib").as("score_milli"),
        count(lit(1)).as("n_terms"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("score_milli").desc, col("doc_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "doc_id", "score_milli", "n_terms")
  }
}
