package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by QueryModule objects (one per SURVEY.md §2
  * area); each Q bundles the Spark plan with its DuckDB oracle SQL so the
  * two can never drift apart.
  */
object SparkEntry {

  /** All registered query modules. */
  def modules: Seq[QueryModule] = Seq(
    graft.queries.ReferencePorts,
    graft.queries.Joins,
    graft.queries.ScalarFns,
    graft.queries.TextAnalysis,
    graft.queries.Dedup,
    graft.queries.Events,
    graft.queries.Relational,
    graft.queries.Similarity,
    graft.queries.MultimodalQueries,
    graft.queries.Curation)

  private lazy val catalog: Seq[Q] = modules.flatMap(_.all)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.ReferencePorts.latestOrderPerCustomer
      .fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Every query
    * runs with the engine extensions installed (native expressions +
    * the NativeVectorOps optimizer rule) — the driver builds the
    * session itself, so registration happens here, idempotently. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> { (s: SparkSession, dir: String) =>
      GraftExtensions.ensure(s)
      q.fn(s, dir)
    }).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.collect { case Q(n, _, Some(sql)) => n -> sql }.toMap
}
