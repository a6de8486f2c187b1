package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source layer.
  *
  * The reference consumes Oracle views as forward-only cursors with
  * late-bound schemas and lowercases all column names at read time
  * (reference: jonesy/jobs.py:177). Here the source role is played by
  * parquet fixtures (one file per table, TESTDATA.md); in production the
  * same functions would wrap `spark.read.format("jdbc")` with
  * partitionColumn/numPartitions for parallel extraction — Spark pushes
  * filters/projections into either source automatically.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table from a scale-factor directory. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    lowercased(spark.read.parquet(s"$dir/$name.parquet"))

  /** Lowercase-normalize column names (reference: jonesy/jobs.py:177
    * `[c[0].lower() for c in result.description]`). Fixture columns are
    * already lowercase; this keeps the contract explicit for any source.
    */
  def lowercased(df: DataFrame): DataFrame = {
    val lower = df.columns.map(_.toLowerCase)
    if (lower.sameElements(df.columns)) df else df.toDF(lower.toIndexedSeq: _*)
  }
}
