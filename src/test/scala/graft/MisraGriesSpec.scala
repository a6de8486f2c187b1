package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Misra-Gries aggregate under real decrement pressure — k far
  * below the vocabulary, Zipfian skew, multiple partitionings. The
  * catalog face (ta_heavy_hitters, k ≥ vocab) certifies the
  * distributed plumbing against the oracle; this spec certifies the
  * THEOREM in the regime where counters actually decrement and merge
  * truncation actually fires: for every item,
  * exact − N/(k+1) ≤ est ≤ exact, regardless of partitioning. */
class MisraGriesSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  // Zipf-ish: item i appears ~ 4000/i times, vocab 200 >> k
  private lazy val rows: Seq[String] =
    (1 to 200).flatMap(i => Seq.fill(4000 / i)(s"item_$i"))
  private lazy val exact: Map[String, Long] =
    rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
  private lazy val n = rows.size.toLong

  private def summarize(k: Int, parts: Int): Map[String, Long] = {
    GraftExtensions.ensure(spark)
    spark.createDataset(rows).toDF("token")
      .repartition(parts)
      .agg(expr(s"mg_summary(token, $k)").as("mg"))
      .selectExpr("explode(mg) AS (item, est)")
      .as[(String, Long)].collect().toMap
  }

  test("bound and coverage hold for every item across partitionings") {
    for (k <- Seq(8, 16); parts <- Seq(1, 4, 13)) {
      val est = summarize(k, parts)
      assert(est.size <= k, s"k=$k parts=$parts: ${est.size} counters")
      val slack = n / (k + 1)
      exact.foreach { case (item, ex) =>
        val e = est.getOrElse(item, 0L)
        assert(e <= ex, s"k=$k parts=$parts: $item overcounted $e > $ex")
        assert(ex - e <= slack,
          s"k=$k parts=$parts: $item est $e vs exact $ex slack $slack")
        if (ex > slack) assert(est.contains(item),
          s"k=$k parts=$parts: heavy item $item missing")
      }
      // no phantom items: every counter names something that exists
      est.keys.foreach(item => assert(exact.contains(item)))
    }
  }

  test("serialize/deserialize round-trips a buffer exactly") {
    val agg = graft.functions.MisraGriesAgg(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), 4)
    val buf = scala.collection.mutable.HashMap(
      "a" -> 3L, "b" -> 1L, "ünïcødé" -> 7L,
      // past writeUTF's 65535-byte modified-UTF-8 cap: a document-
      // sized key must round-trip, not throw at the shuffle boundary
      "x" * 100000 -> 2L)
    assert(agg.deserialize(agg.serialize(buf)) == buf)
    val empty = agg.createAggregationBuffer()
    assert(agg.deserialize(agg.serialize(empty)).isEmpty)
  }

  test("k at or above vocabulary degenerates to exact counts") {
    val est = summarize(256, 7)
    assert(est == exact,
      "no decrement can fire when k >= |vocab|, so MG must be exact")
  }
}
