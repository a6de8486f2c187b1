package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Mixing

/** Pins the UniMax water-fill closed form (operators.Mixing) on the
  * synthetic regimes the fixture's balanced languages never reach:
  * all-capped (budget exceeds corpus capacity), non-trivial remainder
  * distribution, a single group, and a zero-token group. The catalog
  * face `ta_unimax_mix` hash-checks the mixed regime against DuckDB;
  * these pins certify the algebra itself. */
class MixingSpec extends AnyFunSuite with SharedSpark {

  private def alloc(counts: (String, Long)*)(
      num: Int, den: Int, cap: Int): Map[String, (Long, Long, Boolean)] = {
    import spark.implicits._
    val perGroup = counts.toSeq.toDF("lang", "c")
    Mixing.unimaxAllocate(perGroup, "lang", num, den, cap)
      .select("lang", "cap", "budget", "capped")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
  }

  test("mixed regime: tails capped, head water-filled, sum = B") {
    // c = (10, 20, 1000), cap N=2 -> capacities (20, 40, 2000);
    // B = 3*1030/2 = 1545. Small groups cap; head gets 1545-60=1485.
    val m = alloc("a" -> 10L, "b" -> 20L, "z" -> 1000L)(3, 2, 2)
    assert(m("a") === ((20L, 20L, true)))
    assert(m("b") === ((40L, 40L, true)))
    assert(m("z") === ((2000L, 1485L, false)))
    assert(m.values.map(_._2).sum === 1545L)
  }

  test("all-capped regime: B >= sum(cap) allocates every capacity") {
    // B = 3*sum(c) = 3*130; capacities 2*c sum to 260 < 390.
    val m = alloc("a" -> 100L, "b" -> 30L)(3, 1, 2)
    assert(m("a") === ((200L, 200L, true)))
    assert(m("b") === ((60L, 60L, true)))
  }

  test("B = sum(cap) exactly: every group consumes its capacity AND " +
      "flags capped (the equality plateau, r19 review)") {
    // c = (1, 2, 2), num/den = 2/1, cap N=1 -> capacities (1, 2, 2),
    // B = 2*5 div 2 = 5 = sum(cap). The strict-< predicate left ranks
    // 2-3 flagged capped=false with budget = cap — an at_cap consumer
    // read "can absorb more" off groups at their exact capacity.
    val m = alloc("a" -> 1L, "b" -> 2L, "c" -> 2L)(1, 1, 1)
    assert(m.values.map(_._2).sum === 5L)
    for ((lang, (cap, budget, capped)) <- m) {
      assert(budget === cap, s"$lang budget != cap")
      assert(capped, s"$lang at exact capacity must flag capped")
    }
  }

  test("remainder goes one token each to the first un-capped groups " +
    "in (cap, group) order") {
    // c = (7, 7, 7), B = (3*21) div 2 = 31, caps 14 each: nothing
    // capped (14*2+14=42 >= 31 at rn=1; 14*1+28=42 >= 31; 14*0+42 >=
    // 31); t = 31 div 3 = 10, rem = 1 -> budgets (11, 10, 10) by
    // lang order on equal caps.
    val m = alloc("a" -> 7L, "b" -> 7L, "c" -> 7L)(3, 2, 2)
    assert(m("a")._2 === 11L)
    assert(m("b")._2 === 10L)
    assert(m("c")._2 === 10L)
    assert(m.values.forall(!_._3))
  }

  test("single group takes min(B, cap)") {
    val m1 = alloc("only" -> 100L)(3, 2, 2) // B=150 < cap=200
    assert(m1("only") === ((200L, 150L, false)))
    val m2 = alloc("only" -> 100L)(3, 1, 2) // B=300 >= cap=200
    assert(m2("only") === ((200L, 200L, true)))
  }

  test("zero-token group is capped at zero and absorbs no budget") {
    val m = alloc("empty" -> 0L, "z" -> 100L)(3, 2, 2)
    // B = 150, caps (0, 200): empty caps at 0, z takes all 150.
    assert(m("empty") === ((0L, 0L, true)))
    assert(m("z") === ((200L, 150L, false)))
    assert(m.values.map(_._2).sum === 150L)
  }

  test("budget never exceeds capacity and capped set is a prefix of " +
    "the (cap, group) order") {
    val m = alloc("a" -> 3L, "b" -> 50L, "c" -> 8L, "d" -> 1000L,
      "e" -> 8L)(3, 2, 3)
    assert(m.values.forall { case (cap, b, _) => b <= cap })
    val sorted = m.toSeq.sortBy { case (g, (cap, _, _)) => (cap, g) }
    val flags = sorted.map(_._2._3)
    assert(!flags.dropWhile(identity).contains(true),
      s"capped set not a prefix: $sorted")
  }
}
