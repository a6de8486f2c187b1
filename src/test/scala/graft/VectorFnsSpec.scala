package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFns

/** Vector fold semantics: known dot/norm/cosine values, float→double
  * exactness, orthogonality. */
class VectorFnsSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  private def one(a: Seq[Float], b: Seq[Float]) =
    Seq((a, b)).toDF("ea", "eb")

  test("dotFold: exact on small integers, orthogonal → 0") {
    val d1 = one(Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))
      .select(VectorFns.dotFold("ea", "eb")).as[Double].head()
    assert(d1 == 32.0)
    val d2 = one(Seq(1f, 0f), Seq(0f, 1f))
      .select(VectorFns.dotFold("ea", "eb")).as[Double].head()
    assert(d2 == 0.0)
  }

  test("normFold: 3-4-5 triangle") {
    val n = one(Seq(3f, 4f), Seq(0f, 0f))
      .select(VectorFns.normFold("ea")).as[Double].head()
    assert(n == 5.0)
  }

  test("cosineFold: identical vectors → 1.0 within one ulp; opposite → -1") {
    val c1 = one(Seq(0.5f, 0.25f, 0.125f), Seq(0.5f, 0.25f, 0.125f))
      .select(VectorFns.cosineFold("ea", "eb")).as[Double].head()
    assert(math.abs(c1 - 1.0) < 1e-15)
    val c2 = one(Seq(1f, 2f), Seq(-1f, -2f))
      .select(VectorFns.cosineFold("ea", "eb")).as[Double].head()
    assert(math.abs(c2 + 1.0) < 1e-15)
  }
}
