package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the gaps-and-islands faces (ev_scd2,
  * ev_activity_streaks) and the containment near-dup — properties the
  * DuckDB hash-compare can't express because they hold *within* one
  * engine's output: interval chains must tile, streaks must be maximal,
  * containment must dominate Jaccard. */
class IntervalOpsSpec extends AnyFunSuite with SharedSpark {

  private val sf = "/root/testdata/sf0.001"

  private lazy val scd = graft.queries.Events.scd2.fn(spark, sf)
    .collect().toSeq
  private lazy val streaks = graft.queries.Events.activityStreaks
    .fn(spark, sf).collect().toSeq

  test("scd2: per-user intervals chain exactly (valid_to = next valid_from)") {
    scd.groupBy(_.getLong(0)).foreach { case (user, rows) =>
      val sorted = rows.sortBy(r => (r.getTimestamp(2).getTime,
        r.getTimestamp(2).getNanos))
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a.getTimestamp(3) == b.getTimestamp(2),
            s"user $user: interval chain broken at ${a.getTimestamp(3)}")
        case _ => ()
      }
    }
  }

  test("scd2: exactly one open (is_current) interval per user") {
    scd.groupBy(_.getLong(0)).foreach { case (user, rows) =>
      val open = rows.count(r => r.isNullAt(3))
      assert(open == 1, s"user $user has $open open intervals")
      assert(rows.forall(r => r.getBoolean(4) == r.isNullAt(3)),
        s"user $user: is_current disagrees with valid_to IS NULL")
    }
  }

  test("scd2: consecutive intervals never share a type, counts tile the stream") {
    scd.groupBy(_.getLong(0)).foreach { case (user, rows) =>
      val sorted = rows.sortBy(r => (r.getTimestamp(2).getTime,
        r.getTimestamp(2).getNanos))
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a.getString(1) != b.getString(1),
            s"user $user: adjacent runs share type ${a.getString(1)}")
        case _ => ()
      }
    }
    val events = graft.sources.Tables(spark, sf, "events")
    val total = events.count()
    assert(scd.map(_.getLong(5)).sum == total,
      "island n_events must sum to the full stream")
  }

  test("streaks: span = n_days - 1 and adjacent streaks leave a real gap") {
    def days(r: Row, i: Int) = r.getDate(i).toLocalDate
    streaks.foreach { r =>
      val span = java.time.temporal.ChronoUnit.DAYS.between(
        days(r, 1), days(r, 2))
      assert(span == r.getLong(3) - 1,
        s"streak span $span != n_days-1 for user ${r.getLong(0)}")
    }
    streaks.groupBy(_.getLong(0)).foreach { case (user, rows) =>
      rows.sortBy(_.getDate(1).toLocalDate.toEpochDay).sliding(2).foreach {
        case Seq(a, b) =>
          val gap = java.time.temporal.ChronoUnit.DAYS.between(
            days(a, 2), days(b, 1))
          assert(gap >= 2,
            s"user $user: streaks touch (gap $gap) — not maximal")
        case _ => ()
      }
    }
  }

  test("streaks: n_events sums to the user's event count") {
    val events = graft.sources.Tables(spark, sf, "events")
    val perUser = events.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    streaks.groupBy(_.getLong(0)).foreach { case (user, rows) =>
      assert(rows.map(_.getLong(4)).sum == perUser(user),
        s"user $user: streak events don't tile the stream")
    }
  }

  test("containment dominates jaccard and both stay in [0,1]") {
    val got = graft.queries.Dedup.containment.fn(spark, sf).collect()
    assert(got.nonEmpty, "LSH candidates exist at sf0.001")
    got.foreach { r =>
      val (c, j) = (r.getDouble(2), r.getDouble(3))
      assert(c >= j - 1e-12, s"containment $c < jaccard $j")
      assert(c >= 0.0 && c <= 1.0 && j >= 0.0 && j <= 1.0)
      assert(r.getBoolean(4) == (c >= 0.7 && j < 0.7))
    }
  }

  test("containment flags a doc wholly quoted inside a longer one") {
    import spark.implicits._
    import graft.operators.TextDedup
    import org.apache.spark.sql.functions._
    // short doc's shingles are a strict subset of the long doc's
    val short = "alpha beta gamma delta epsilon zeta"
    val long = short + " eta theta iota kappa lambda mu nu xi " +
      "omicron pi rho sigma tau upsilon phi chi psi omega " +
      "one two three four five six seven eight nine ten"
    val docs = Seq((1L, short), (2L, long)).toDF("doc_id", "text")
    val sh = TextDedup.shingles(docs)
    val inter = sh.filter(col("doc_id") === 1).select("shingle")
      .intersect(sh.filter(col("doc_id") === 2).select("shingle"))
      .count()
    val nShort = sh.filter(col("doc_id") === 1).count()
    assert(inter == nShort, "every short-doc shingle appears in the long doc")
    val jaccard = inter.toDouble / sh.select("shingle").distinct().count()
    assert(jaccard < 0.7, "Jaccard alone would miss this pair")
  }
}
