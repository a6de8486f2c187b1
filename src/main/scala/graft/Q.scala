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
  * on both sides, float aggregates rounded on both sides, identical
  * column names/aliases on both sides (the driver sorts columns by name
  * before hashing values).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** A group of related queries (one object per SURVEY.md §2 area). */
trait QueryModule {
  def all: Seq[Q]
}
