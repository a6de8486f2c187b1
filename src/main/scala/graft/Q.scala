package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark builder plus (when SQL-expressible) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. `oracle = None` → the driver records a weaker rows-only check
  * (used for ops DuckDB can't express: MinHash LSH, SimHash, custom
  * expressions, multimodal stubs).
  *
  * Determinism contract: every query that has an oracle must produce a
  * totally-ordered, exactly-reproducible result — deterministic ORDER BY
  * on both sides; identical column names/aliases on both sides (the
  * driver sorts columns by name before hashing values); and any float
  * column produced by the IDENTICAL IEEE operation sequence in both
  * engines (sequential folds mirrored by DuckDB list_reduce; money sums
  * as exact integer cents). Never cast a double to DECIMAL — Spark
  * rounds the shortest decimal repr HALF_UP, DuckDB rounds the binary
  * value, and the two disagree (round 2 failures).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** A group of related queries (one object per SURVEY.md §2 area). */
trait QueryModule {
  def all: Seq[Q]
}
