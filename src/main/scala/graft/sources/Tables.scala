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
    * `events.ts` normalization — the fixtures have shipped two flavors
    * and the source layer absorbs both so every query downstream sees
    * one type, TIMESTAMP (with UTC session semantics):
    *
    *   - parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects
    *     it; with `spark.sql.legacy.parquet.nanosAsLong` set at
    *     SparkSession build (Verify/Bench/spec harness — NOT mutated
    *     here, per ADVICE r2) it arrives as a nanos long and is rebuilt
    *     with floor division (`(ts - pmod(ts,1000)) div 1000`) so
    *     pre-1970 nanos round toward -∞, not toward zero. Ns longs
    *     exceed double's exact integer range, so integral `div`,
    *     never `/`.
    *   - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): scans as
    *     TIMESTAMP_NTZ, which `unix_micros`/INTERVAL arithmetic
    *     reject. Cast to TIMESTAMP — exact under the pinned UTC
    *     session zone (same wall-clock instant, no offset applied),
    *     and identical to what DuckDB's `epoch_us(ts)` sees.
    *
    * The rewrite is restricted to the `events` table so a genuine long
    * `ts` column elsewhere is never reinterpreted.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = lowercased(spark.read.parquet(s"$dir/$name.parquet"))
    if (name != "events") df
    else df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros((ts - pmod(ts, 1000)) div 1000)"))
      case Some(TimestampNTZType) =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** S2 — the production JDBC path the parquet fixtures stand in for:
    * a partitioned parallel extract (replacing the reference's
    * client-side ROWNUM pagination, jonesy/queries.py:37-48) with
    * filter/projection pushdown into the database. Exercised
    * end-to-end in TablesSpec against an embedded Derby database
    * (partition count, lowercase contract, pushed predicate).
    */
  /** The base JDBC reader every path here layers on — url/dbtable plus
    * the caller's props, in ONE place so option-layering fixes can't
    * silently miss the probe or the unpartitioned fallback. */
  private def jdbcReader(spark: SparkSession, url: String,
                         dbtable: String,
                         props: Map[String, String])
      : org.apache.spark.sql.DataFrameReader =
    props.foldLeft(
      spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", dbtable)
    ) { case (r, (k, v)) => r.option(k, v) }

  def jdbc(spark: SparkSession, url: String, table: String,
           partitionColumn: String, lowerBound: Long, upperBound: Long,
           numPartitions: Int,
           props: Map[String, String] = Map.empty): DataFrame =
    lowercased(
      jdbcReader(spark, url, table, props)
        .option("partitionColumn", partitionColumn)
        .option("lowerBound", lowerBound)
        .option("upperBound", upperBound)
        .option("numPartitions", numPartitions)
        .load())

  /** [[jdbc]] with the partition bounds DERIVED from the data — the
    * Spark-native replacement for the reference driver's
    * batch-until-short pagination loop (jonesy/jobs.py:99-114: it has
    * no idea how big the extract is, so it pages blind until a short
    * batch). One probe query — `SELECT min(col), max(col)` pushed to
    * the database as a derived-table scan, a 1-row planning-class
    * round-trip like the IVF seed collect — yields the exact window,
    * then the partitioned parallel read proceeds as if the caller had
    * known the bounds. Stride semantics: Spark's upperBound is treated
    * as exclusive when striding (rows AT the bound still land in the
    * last partition — bounds clip stride, never filter rows), so
    * max+1 keeps the final partition from holding the entire max-value
    * run plus a stripe.
    *
    * Empty table (or all-NULL partition column): no bounds exist, so
    * the read degrades to a single partition — correct (nothing to
    * parallelize over) and the same shape Spark itself produces for
    * an unpartitioned jdbc read. */
  def jdbcAutoBounds(spark: SparkSession, url: String, table: String,
                     partitionColumn: String, numPartitions: Int,
                     props: Map[String, String] = Map.empty): DataFrame = {
    val probeSql =
      s"(SELECT MIN($partitionColumn) AS mn, MAX($partitionColumn) AS mx " +
        s"FROM $table) probe"
    val probe = jdbcReader(spark, url, probeSql, props).load().head()
    if (probe.isNullAt(0) || probe.isNullAt(1))
      lowercased(jdbcReader(spark, url, table, props).load())
    else {
      // the probe column arrives as whatever the dialect maps the
      // database type to — normalize the numeric family to Long
      def asLong(i: Int): Long = probe.get(i) match {
        case n: java.lang.Number => n.longValue()
        case other => throw new IllegalArgumentException(
          s"partitionColumn $partitionColumn must be numeric for " +
            s"bound derivation, got ${other.getClass.getSimpleName}")
      }
      // max+1 keeps the max-value run out of a whole-stripe final
      // partition — but saturate instead of wrapping when max is
      // Long.MaxValue (snowflake-style ids): bounds clip stride, never
      // filter rows, so the saturated bound stays correct
      val mx = asLong(1)
      jdbc(spark, url, table, partitionColumn,
        lowerBound = asLong(0),
        upperBound = if (mx == Long.MaxValue) mx else mx + 1L,
        numPartitions = numPartitions, props = props)
    }
  }

  /** S2, Oracle face — the dialect-specific knobs the reference's
    * actual warehouse source needs, layered over [[jdbc]] (which stays
    * database-neutral; TablesSpec proves the shared path end-to-end on
    * embedded Derby). Spark's built-in OracleDialect handles quoting
    * and type mapping; what it does NOT default correctly for a
    * reproducible extract:
    *
    *   - `oracle.jdbc.mapDateToTimestamp=false` — Oracle DATE carries
    *     a time-of-day; the driver default maps it to Timestamp, but
    *     the reference's date columns are calendar dates and a
    *     TZ-shifted timestamp silently moves them a day at the
    *     UTC boundary.
    *   - `sessionInitStatement` pins NLS date/timestamp formats per
    *     session, so `to_char`-shaped pushed predicates behave the
    *     same from every executor connection.
    *   - `customSchema` — Oracle `NUMBER` (no scale) arrives as
    *     DECIMAL(38,10); ids/counts must land as LONG or every
    *     downstream join key carries decimal overhead. Callers pass
    *     the narrow truth per column ("enrollment_id LONG, units
    *     DOUBLE").
    *   - `fetchsize` — the driver default (10 rows/round-trip) makes a
    *     partitioned extract latency-bound; 10k is the standard bulk
    *     setting.
    *
    * Offline contract: OracleDialectSpec pins the option map and that
    * Spark resolves the oracle URL to its Oracle dialect (identifier
    * quoting included). The live path cannot run in this sandbox (no
    * Oracle instance/driver jar) — it is the same partitioned reader
    * TablesSpec certifies on Derby, with these options layered on. */
  def oracleJdbc(spark: SparkSession, url: String, table: String,
                 partitionColumn: String, lowerBound: Long,
                 upperBound: Long, numPartitions: Int,
                 customSchema: Option[String] = None,
                 props: Map[String, String] = Map.empty): DataFrame = {
    require(url.startsWith("jdbc:oracle:"),
      s"oracleJdbc requires a jdbc:oracle: url, got $url")
    jdbc(spark, url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, oracleOptions(customSchema) ++ props)
  }

  /** The Oracle reader options [[oracleJdbc]] layers over the neutral
    * partitioned reader — exposed for the offline spec. */
  def oracleOptions(customSchema: Option[String]): Map[String, String] =
    Map(
      "oracle.jdbc.mapDateToTimestamp" -> "false",
      "sessionInitStatement" ->
        ("ALTER SESSION SET NLS_DATE_FORMAT = 'YYYY-MM-DD' " +
          "NLS_TIMESTAMP_FORMAT = 'YYYY-MM-DD HH24:MI:SS.FF6'"),
      "fetchsize" -> "10000") ++
      customSchema.map("customSchema" -> _)

  /** Lowercase-normalize column names (reference: jonesy/jobs.py:177
    * `[c[0].lower() for c in result.description]`). Fixture columns are
    * already lowercase; this keeps the contract explicit for any source.
    */
  def lowercased(df: DataFrame): DataFrame = {
    val lower = df.columns.map(_.toLowerCase)
    if (lower.sameElements(df.columns)) df else df.toDF(lower.toIndexedSeq: _*)
  }

  /** Formats the lake helpers accept: Spark-native columnar/text
    * formats only (no external connector jars in this build). */
  val lakeFormats: Set[String] = Set("parquet", "orc", "json", "csv")

  /** Materialize an extract in any built-in lake format. One writer
    * path for all four: parquet/orc are the columnar scale choices
    * (splittable, predicate/projection pushdown, per-chunk stats);
    * json/csv are the interchange faces. CSV keeps a header and pins
    * MICROSECOND timestamp patterns for BOTH timestamp flavors —
    * Spark timestamps carry μs, and the default (and any millisecond)
    * pattern silently floors them on the way out; TIMESTAMP_NTZ (what
    * parquet ms-precision unadjusted timestamps scan as) takes its
    * pattern from the separate timestampNTZFormat option, offset-free
    * — so the text round-trip is lossless under [[readLake]]'s
    * explicit schema; text formats get gzip (the S4
    * sink convention) — columnar formats keep their internal codec. */
  /** The µs-precision text-format timestamp patterns, ONE definition
    * shared by [[writeLake]] and [[readLake]]: the read patterns must
    * exactly match the write patterns or the text round-trip silently
    * floors/mis-parses — hoisting them makes one-sided drift
    * impossible. */
  private val LakeTsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
  private val LakeTsNtzFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

  def writeLake(df: DataFrame, path: String, format: String): Unit = {
    require(lakeFormats(format), s"unsupported lake format: $format")
    val w = df.write.mode("overwrite").format(format)
    val tuned = format match {
      case "csv" => w.option("header", "true")
        .option("timestampFormat", LakeTsFmt)
        .option("timestampNTZFormat", LakeTsNtzFmt)
        .option("compression", "gzip")
      case "json" => w
        .option("timestampFormat", LakeTsFmt)
        .option("timestampNTZFormat", LakeTsNtzFmt)
        .option("compression", "gzip")
      case _ => w
    }
    tuned.save(path)
  }

  /** Read back a [[writeLake]] extract. Columnar formats are
    * self-describing; the text formats REQUIRE the writer's schema —
    * CSV has no types at all and JSON would widen int32→int64 and
    * read timestamps as strings, silently breaking joins against
    * columnar tables downstream. Passing the schema also keeps the
    * scan single-pass (no inference job — at 100 TB an inference
    * pre-read is a full extra scan). */
  def readLake(spark: SparkSession, path: String, format: String,
               schema: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    require(lakeFormats(format), s"unsupported lake format: $format")
    require(schema.nonEmpty || format == "parquet" || format == "orc",
      s"$format round-trip requires the writer's schema (no inference " +
        "pass at scale)")
    val r = spark.read.format(format)
    val tuned = format match {
      case "csv" => r.option("header", "true")
        .option("timestampFormat", LakeTsFmt)
        .option("timestampNTZFormat", LakeTsNtzFmt)
      case "json" =>
        r.option("timestampFormat", LakeTsFmt)
        .option("timestampNTZFormat", LakeTsNtzFmt)
      case _ => r
    }
    lowercased(schema.fold(tuned)(tuned.schema).load(path))
  }
}
