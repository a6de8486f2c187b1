package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Single-pass column profiler — the data-quality report a lake runs
  * before admitting a new drop into a training corpus: per column, the
  * row/null/distinct counts plus min/max (numeric and string kept in
  * separate typed output columns — casting a double through a string
  * would tie the result to an engine's float formatting).
  *
  * Scale stance: the naive profiler (and the DuckDB oracle form) runs
  * one `SELECT ... FROM t` per column — N full scans of a 100 TB
  * table. Here all per-column aggregates go into ONE `agg(...)`, so
  * the table is scanned once; the wide 1-row result is reshaped to
  * one-row-per-column driver-side cost-free (explode of a literal
  * struct array over a single row). Exact `countDistinct` over many
  * columns makes Catalyst expand rows ×N before the shuffle — that is
  * the price of exactness and it still reads the data once; the
  * `approxProfile` variant swaps in `approx_count_distinct` (HLL,
  * no expand) for the 100 TB path where a 2% distinct-count error is
  * acceptable.
  */
object Profiler {

  /** Backtick-quoted column reference that survives ANY top-level
    * name: dots would otherwise parse as nested-field access, and an
    * embedded backtick would end the quote early and throw a parse
    * error — Spark's own escape is doubling (`` ` `` → ```` `` ````),
    * same as SQL identifier quoting. */
  private def quoted(name: String): Column =
    col("`" + name.replace("`", "``") + "`")

  private def metrics(df: DataFrame, cols: Seq[String],
                      distinct: Column => Column): Seq[Column] = {
    require(cols.nonEmpty, "profile needs at least one column")
    val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val missing = cols.filterNot(byName.contains)
    require(missing.isEmpty,
      s"columns not in schema: ${missing.mkString(", ")} " +
        s"(have: ${df.columns.mkString(", ")})")
    cols.flatMap { name =>
      // backtick-quoted: a top-level column literally named "a.b"
      // passes the schema-map require above, but a bare col("a.b")
      // would then parse the dot as nested-field access and throw
      // UNRESOLVED_COLUMN — the guard must validate what the body
      // resolves
      val c = quoted(name)
      val numeric = byName(name).isInstanceOf[NumericType]
      def num(m: Column => Column) =
        if (numeric) m(c).cast("double") else lit(null).cast("double")
      def str(m: Column => Column) =
        if (numeric) lit(null).cast("string") else m(c).cast("string")
      Seq(
        (count(lit(1)) - count(c)).as(s"${name}__nulls"),
        distinct(c).as(s"${name}__distinct"),
        num(min).as(s"${name}__min_num"),
        num(max).as(s"${name}__max_num"),
        str(min).as(s"${name}__min_str"),
        str(max).as(s"${name}__max_str"))
    }
  }

  private def reshape(wide: DataFrame, cols: Seq[String]): DataFrame = {
    // same backtick rule as the metrics builder: the synthesized
    // names inherit any dot from the source column name
    val entries = array(cols.map(name => struct(
      lit(name).as("col_name"),
      quoted(s"${name}__nulls").as("n_nulls"),
      quoted(s"${name}__distinct").as("n_distinct"),
      quoted(s"${name}__min_num").as("min_num"),
      quoted(s"${name}__max_num").as("max_num"),
      quoted(s"${name}__min_str").as("min_str"),
      quoted(s"${name}__max_str").as("max_str"))): _*)
    wide.select(explode(entries).as("p")).select("p.*")
      .orderBy("col_name")
  }

  /** Exact profile: one scan, exact distinct counts (expand ×N). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val m = metrics(df, cols, countDistinct(_))
    reshape(df.agg(m.head, m.tail: _*), cols)
  }

  /** Scale profile: one scan, HLL distinct estimates, no expand. */
  def approxProfile(df: DataFrame, cols: Seq[String],
                    rsd: Double = 0.02): DataFrame = {
    val m = metrics(df, cols, approx_count_distinct(_, rsd))
    reshape(df.agg(m.head, m.tail: _*), cols)
  }
}
