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
