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

  /** Read one table from a scale-factor directory.
    *
    * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects; read it as a nanos long (legacy conf) and
    * rebuild the timestamp with integral division (ns longs exceed
    * double's exact integer range, so `div`, never `/`).
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = lowercased(spark.read.parquet(s"$dir/$name.parquet"))
    df.schema.fields.find(f => f.name == "ts" &&
        f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case None => df
    }
  }

  /** Lowercase-normalize column names (reference: jonesy/jobs.py:177
    * `[c[0].lower() for c in result.description]`). Fixture columns are
    * already lowercase; this keeps the contract explicit for any source.
    */
  def lowercased(df: DataFrame): DataFrame = {
    val lower = df.columns.map(_.toLowerCase)
    if (lower.sameElements(df.columns)) df else df.toDF(lower.toIndexedSeq: _*)
  }
}
