package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-mixing allocation operators (SURVEY.md §2.12).
  *
  * [[unimaxAllocate]] is the UniMax water-fill (Chung et al. 2023)
  * shared by the `ta_unimax_mix` catalog face and MixingSpec's
  * synthetic-regime pins; the catalog face documents the algorithm and
  * the closed form.
  */
object Mixing {

  /** UniMax budget allocation over a bounded group dimension.
    *
    * Input: one row per group with `groupCol` (any orderable type used
    * as the deterministic tiebreak) and `c` (LONG group token count,
    * ≥ 0). Budget is `(budgetNum · Σc) div budgetDen`; per-group
    * capacity is `epochCap · c`. Output adds `cap`, `budget`,
    * `capped` (BOOLEAN) — Σ budget = min(B, Σ cap) exactly, each
    * budget ≤ cap, and the capped set is a prefix of the
    * (cap, group) ascending order.
    *
    * Closed form (all exact BIGINT): with capacities sorted ascending
    * and P_rn the running capacity prefix, rank rn is capped iff
    * `cap_rn·(K − rn) + P_rn ≤ B` — monotone in rn because cap is
    * sorted, so the un-capped suffix shares level
    * `t = (B − P_capped) div (K − n_capped)` and the first
    * `(B − P_capped) mod (K − n_capped)` un-capped groups take one
    * extra token. When B ≥ Σ cap every group is capped (the predicate
    * covers it: cap_rn·(K−rn) ≤ Σ_{j>rn} cap_j for sorted caps —
    * NON-strict ≤ so the B = Σ cap plateau flags too: a group
    * consuming exactly its capacity IS at cap, and a strict < left
    * `capped = false` on exactly those rows while budget = cap,
    * misleading an at_cap consumer; budgets are identical either
    * way, only the flag moves — r19 review).
    *
    * Scale: every window here runs on the AGGREGATED group dimension —
    * callers fold the corpus to |groups| rows first, so the
    * single-partition windows are bounded-dimension by construction
    * (the rel_pareto class). */
  def unimaxAllocate(perGroup: DataFrame, groupCol: String,
                     budgetNum: Int = 3, budgetDen: Int = 2,
                     epochCap: Int = 2): DataFrame = {
    require(budgetNum > 0 && budgetDen > 0 && epochCap > 0,
      s"unimaxAllocate: positive parameters required, got " +
        s"($budgetNum, $budgetDen, $epochCap)")
    val tot = perGroup.agg(
      expr(s"($budgetNum * sum(c)) div $budgetDen").as("b"),
      count(lit(1)).as("k"))
    val w = Window.orderBy("cap", groupCol)
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    perGroup.crossJoin(broadcast(tot))
      .withColumn("cap", expr(s"$epochCap * c"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("p", sum("cap").over(w))
      .withColumn("capped", expr("cap * (k - rn) + p <= b"))
      .withColumn("n_capped",
        sum(when(col("capped"), 1L).otherwise(0L)).over(wAll))
      .withColumn("p_capped",
        sum(when(col("capped"), col("cap")).otherwise(0L)).over(wAll))
      .withColumn("t", expr(
        "(b - p_capped) div greatest(k - n_capped, 1)"))
      .withColumn("rem", expr(
        "(b - p_capped) % greatest(k - n_capped, 1)"))
      .withColumn("budget", expr(
        "CASE WHEN capped THEN cap " +
          "ELSE t + (CASE WHEN rn - n_capped <= rem THEN 1 " +
          "ELSE 0 END) END"))
      .drop("b", "k", "rn", "p", "n_capped", "p_capped", "t", "rem")
  }
}
