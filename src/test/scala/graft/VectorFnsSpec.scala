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

  test("fvec_dot (native codegen expression) is bit-identical to dotFold") {
    GraftExtensions.ensure(spark)
    val rnd = new scala.util.Random(42)
    val vecs = Seq.fill(50)((
      Seq.fill(64)(rnd.nextFloat() * 2 - 1),
      Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("ea", "eb")
    val out = df.select(
      VectorFns.dotFold("ea", "eb").as("fold"),
      org.apache.spark.sql.functions.expr("fvec_dot(ea, eb)").as("native"))
      .as[(Double, Double)].collect()
    out.foreach { case (fold, native) =>
      assert(java.lang.Double.doubleToLongBits(fold) ==
        java.lang.Double.doubleToLongBits(native),
        s"bit mismatch: $fold vs $native")
    }
  }

  test("fvec_dot runs inside whole-stage codegen") {
    GraftExtensions.ensure(spark)
    // a parquet-backed plan — a literal local relation would be
    // constant-folded into LocalTableScan before codegen
    val df = graft.sources.Tables(spark, "/root/testdata/sf0.001",
      "embeddings")
      .selectExpr("fvec_dot(embedding, embedding) AS d")
    // the '*(n)' prefix marks operators fused into a WholeStageCodegen
    // stage in the executed-plan string
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[fvec_dot.*"), plan)
    assert(df.as[Double].head() > 0.0)
  }

  test("NativeVectorOps rewrites fold dot-products to fvec_dot") {
    GraftExtensions.ensure(spark)
    val df = graft.sources.Tables(spark, "/root/testdata/sf0.001",
      "embeddings")
    val folded = df.select(
      VectorFns.dotFold("embedding", "embedding").as("d"),
      VectorFns.normFold("embedding").as("n"))
    val opt = folded.queryExecution.optimizedPlan.toString
    assert(opt.contains("fvec_dot"), s"rule did not fire:\n$opt")
    assert(!opt.contains("aggregate("), s"fold survived rewrite:\n$opt")
    // rewritten plan computes the same values as the interpreted fold
    val viaRule = folded.as[(Double, Double)].head()
    assert(viaRule._2 == math.sqrt(viaRule._1))
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
