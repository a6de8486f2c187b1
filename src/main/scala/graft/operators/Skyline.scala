package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto-optimal set): the rows no other row dominates,
  * where A dominates B iff `A.x ≤ B.x AND A.y ≥ B.y` with at least one
  * strict (minimize x, maximize y). The naive semantics is the
  * quadratic pairwise dominance test (the catalog face's DuckDB
  * oracle states exactly that); this operator computes the same set
  * in O(n log n) per pass with the sort-based staircase filter, run
  * twice in the published distributed-skyline shape:
  *
  *   pass 1 — local skylines under ANY partitioning of the rows
  *     (dominance within a bucket implies dominance globally, and
  *     dominance is transitive, so every globally-dominated row is
  *     eliminated by some bucket survivor that itself survives or is
  *     dominated by one that does);
  *   pass 2 — the same filter globally over the union of local
  *     staircases, which is all that remains.
  *
  * Staircase filter: a row survives iff no strictly-cheaper row has
  * y ≥ its own (`max(y) RANGE UNBOUNDED..1 PRECEDING` over x — a
  * RANGE frame so x-ties stay out of the running max) and no same-x
  * row has y strictly greater (a per-x partition max). Equal (x, y)
  * duplicates survive together — no strict coordinate, no dominance.
  *
  * Scale (100 TB): pass 1 is embarrassingly parallel; only local
  * survivors (≤ |distinct x in bucket| rows each — a staircase) reach
  * the pass-2 global sort. PropertySpec pins equality with the brute
  * force on random tie-heavy data.
  */
object Skyline {

  /** One staircase pass: keep the rows not dominated within their
    * partition. `parts` empty = global. Both running maxes ride ONE
    * window spec (same partitioning, same x order, two RANGE frames),
    * which Catalyst collapses into a single Window node — one
    * exchange + one sort per pass, not two:
    *   max over x' <  x  ≥ y  → dominated by a strictly-cheaper row;
    *   max over x' ≤ x  >  y  → dominated by a same-or-cheaper row
    *                            with strictly larger y (covers the
    *                            same-x case; equal (x, y) duplicates
    *                            give max = y and survive together). */
  private def pass(df: DataFrame, xCol: String, yCol: String,
                   parts: Seq[Column]): DataFrame = {
    // order by x as DECIMAL(20,0), not the raw integral column: the
    // RANGE -1 frame bound evaluates x−1 PER ROW, which at
    // x = Long.MinValue overflows — ARITHMETIC_OVERFLOW under Spark
    // 4's ANSI default on a perfectly legal input (r20 review).
    // decimal(20,0) holds every long with room below MinValue, and
    // the cast is order-preserving, so the frames are unchanged.
    val byX = Window.partitionBy(parts: _*)
      .orderBy(col(xCol).cast("decimal(20,0)"))
    val wLower = byX.rangeBetween(Window.unboundedPreceding, -1)
    val wLe = byX.rangeBetween(Window.unboundedPreceding, 0)
    df.withColumn("__max_y_cheaper", max(col(yCol)).over(wLower))
      .withColumn("__max_y_le", max(col(yCol)).over(wLe))
      .filter((col("__max_y_cheaper").isNull ||
          col("__max_y_cheaper") < col(yCol)) &&
        col("__max_y_le") <= col(yCol))
      .drop("__max_y_cheaper", "__max_y_le")
  }

  /** The skyline of `df` minimizing `xCol` and maximizing `yCol`.
    * `xCol` must be an INTEGRAL type — enforced, not just documented:
    * the strictly-cheaper frame is `RANGE UNBOUNDED..−1 PRECEDING`,
    * and a −1 offset only means "strictly less" when x values are
    * whole numbers (with doubles, a dominator at x−0.5 would fall
    * outside the frame and a dominated row would silently survive —
    * quantize fractional measures to integer cents first, as the
    * catalog face does). `bucket` is the pass-1 partitioning
    * expression — any expression works (correctness is
    * partitioning-invariant); pick one that spreads rows evenly. */
  def skyline2d(df: DataFrame, xCol: String, yCol: String,
                bucket: Column): DataFrame = {
    val xt = df.schema(xCol).dataType
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(xt),
      s"skyline2d: $xCol must be integral (got $xt) — the RANGE -1 " +
        "frame is only a strict bound on whole numbers; quantize " +
        "first (e.g. cents)")
    // the scratch columns silently OVERWRITE same-name caller columns
    // (withColumn replaces) and the trailing drop would then delete
    // the caller's data — refuse loudly instead, the
    // ZOrder.writeZOrdered __zkey discipline (r20 review)
    for (c <- Seq("__bucket", "__max_y_cheaper", "__max_y_le"))
      require(!df.columns.contains(c),
        s"skyline2d: input must not carry a column named $c — it is " +
          "used as an internal scratch column and would be destroyed")
    // NULL-coordinate rows ride OUTSIDE the staircase: under SQL
    // three-valued logic a NULL x or y can neither dominate (its
    // comparisons are NULL) nor be dominated (the oracle's NOT EXISTS
    // sees NULL and keeps the row), so the pairwise semantics is
    // skyline(non-null slice) ∪ null-coordinate rows. Left inside the
    // window they'd do the OPPOSITE of both: ascending-nulls-first
    // ordering puts a NULL-x row in every row's strictly-cheaper
    // RANGE frame (its y then kills non-dominated rows) and its own
    // frame bound is NULL (null peers compare equal, so it kills
    // itself on y-ties).
    val nonNull = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val nullRows = df.filter(col(xCol).isNull || col(yCol).isNull)
    // materialize the bucket once: handing the raw expression to both
    // window specs would re-alias it per withColumn, and CollapseWindow
    // only merges Window nodes over the SAME partition attribute —
    // with a named column each pass is one exchange + one sort
    pass(pass(nonNull.withColumn("__bucket", bucket),
        xCol, yCol, Seq(col("__bucket"))).drop("__bucket"),
      xCol, yCol, Seq.empty)
      .unionByName(nullRows)
  }
}
