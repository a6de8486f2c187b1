package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Sketch aggregates: bounded error against exact answers (no DuckDB
  * oracle — sketch internals are engine-specific by design). */
class SketchSpec extends AnyFunSuite with SharedSpark {

  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct within 3x rsd of exact per group") {
    val o = Tables(spark, sf, "orders")
    val both = o.groupBy("o_orderpriority").agg(
      countDistinct(col("o_custkey")).as("exact"),
      approx_count_distinct(col("o_custkey"), rsd = 0.05).as("approx"))
    both.collect().foreach { r =>
      val (exact, approx) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(approx - exact) / exact <= 0.15,
        s"${r.getString(0)}: exact=$exact approx=$approx")
    }
  }

  test("rel_sketch_agg face: sane groups, estimates within bounds") {
    // the spec-only catalog face (not in SparkEntry.queries — no SQL
    // oracle can replay engine-specific sketch internals): run the
    // EXACT Q the library ships and certify it against exact answers
    val got = graft.queries.Relational.sketchAgg.fn(spark, sf)
    assert(got.columns.toSeq ==
      Seq("priority", "approx_customers", "approx_median_price"))
    val exact = Tables(spark, sf, "orders")
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(countDistinct(col("o_custkey")).as("exact_customers"),
        min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
    val joined = got.join(exact, "priority").collect()
    assert(joined.length == 5, "one row per order priority")
    joined.foreach { r =>
      val approx = r.getAs[Long]("approx_customers").toDouble
      val ex = r.getAs[Long]("exact_customers").toDouble
      assert(math.abs(approx - ex) / ex <= 0.15,
        s"${r.getAs[String]("priority")}: exact=$ex approx=$approx")
      val med = r.getAs[Double]("approx_median_price")
      assert(med >= r.getAs[Double]("lo") && med <= r.getAs[Double]("hi"))
    }
  }

  test("windowUsersSketch: groups/counts identical to the exact face, " +
      "estimate inside the certification bound") {
    // the scale-path variant (no exact rider, no Expand — the plan pin
    // lives in PlanAuditSpec) must be ROWS-STABLE against the
    // certification face: same (bucket, event_type) groups, same
    // n_events, and its estimate within the same 15%-or-3 bound the
    // oracle pins TRUE on the exact face.
    val exact = graft.queries.Events.windowUsers.fn(spark, sf)
      .select("bucket", "event_type", "n_events", "exact_users")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val sketch = graft.queries.Events.windowUsersSketch(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(sketch.keySet == exact.keySet,
      "dropping the exact rider must not change the group set")
    sketch.foreach { case (k, (nEvents, approx)) =>
      val (nExact, users) = exact(k)
      assert(nEvents == nExact, s"$k: n_events $nEvents != $nExact")
      assert(math.abs(approx - users) <= math.max(users * 0.15, 3.0),
        s"$k: approx=$approx exact=$users")
    }
  }

  test("winsorizeSketch: no ordering window, bounds in the exact rank " +
      "neighborhood, in-band rows pass through") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val sketch = graft.queries.Events.winsorizeSketch(spark, sf)
    // the whole point of the swap: the plan must carry NO window —
    // the exact face's per-type rank sort is what dominant groups
    // cannot afford
    val plan = sketch.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"sketch winsorize still plans a window:\n$plan")
    // sketch [lo, hi] per type must land inside the exact p1–p10 /
    // p90–p99 rank neighborhood of the same cents column
    val w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    val ranked = Tables(spark, sf, "events").select(
        col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy("event_type")))
    def rankVal(pct: Int) = ranked
      .filter(col("rn") ===
        greatest(lit(1L), expr(s"($pct * n) div 100")))
      .groupBy("event_type").agg(min("cents").as(s"p$pct"))
    val bands = rankVal(1).join(rankVal(10), "event_type")
      .join(rankVal(90), "event_type").join(rankVal(99), "event_type")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val got = sketch.groupBy("event_type")
      .agg(min("w_cents").as("lo"), max("w_cents").as("hi"))
      .collect().map(r =>
        r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    got.foreach { case (tpe, (lo, hi)) =>
      val (p1, p10, p90, p99) = bands(tpe)
      assert(lo >= p1 && lo <= p10, s"$tpe: lo=$lo outside [$p1, $p10]")
      assert(hi >= p90 && hi <= p99, s"$tpe: hi=$hi outside [$p90, $p99]")
    }
    // conservation: a row inside its type's band is never altered
    val altered = sketch
      .filter(col("cents") =!= col("w_cents"))
      .join(sketch.groupBy("event_type")
        .agg(min("w_cents").as("blo"), max("w_cents").as("bhi")),
        "event_type")
      .filter(col("cents") >= col("blo") && col("cents") <= col("bhi"))
      .count()
    assert(altered == 0, s"$altered in-band rows were clamped")
  }

  test("qualityCalibrateSketch: no window, monotone deciles, " +
      "boundary containment") {
    import org.apache.spark.sql.functions._
    val sketch = graft.queries.TextAnalysis
      .qualityCalibrateSketch(spark, sf)
    val plan = sketch.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"sketch calibration still plans a window:\n$plan")
    val rows = sketch.collect().map(r =>
      (r.getString(1), r.getLong(2), r.getLong(3)))
    // within-source monotonicity: a strictly higher score never lands
    // in a lower decile
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val byScore = rs.sortBy(_._2)
      byScore.sliding(2).foreach {
        case Array((_, s1, d1), (_, s2, d2)) =>
          assert(s1 > s2 || d1 <= d2,
            s"$src: score $s1->decile $d1 but $s2->$d2")
        case _ => ()
      }
      // deciles stay in range and equal scores share one decile
      rs.foreach { case (_, _, d) => assert(d >= 1 && d <= 10) }
      rs.groupBy(_._2).foreach { case (sc, same) =>
        assert(same.map(_._3).distinct.size == 1,
          s"$src: equal score $sc split across deciles")
      }
    }
  }

  test("percentile_approx median between per-group min and max") {
    val o = Tables(spark, sf, "orders")
    val rows = o.groupBy("o_orderpriority").agg(
      min("o_totalprice").as("lo"),
      percentile_approx(col("o_totalprice"), lit(0.5), lit(1000))
        .as("med"),
      max("o_totalprice").as("hi")).collect()
    rows.foreach { r =>
      assert(r.getDouble(2) >= r.getDouble(1) &&
        r.getDouble(2) <= r.getDouble(3))
    }
  }
}
