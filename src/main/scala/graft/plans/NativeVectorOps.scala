package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.FloatVectorDot

/** Optimizer rule: rewrite the declarative higher-order dot-product
  * patterns over `array<float>` columns into the native codegen'd
  * [[FloatVectorDot]].
  *
  * Why a Rule (SURVEY.md §4 said "none needed for parity"): this is an
  * acceleration, not a semantics gap. `aggregate`/`zip_with` are
  * CodegenFallback expressions — one interpreted lambda dispatch per
  * element, and they break the enclosing whole-stage-codegen span. The
  * rewrite replaces them with one fused loop computing the identical
  * strict left-to-right IEEE sequence (bit-identical results, proven in
  * VectorFnsSpec), so users write the declarative form and the engine
  * supplies the fast path — on a 100 TB embedding column that is the
  * difference between an interpreted per-element call stack and a tight
  * branch-free loop.
  *
  * Matched shapes (both produced by VectorFns and Dedup):
  *   aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d,
  *             (acc,v) -> acc+v)                      → fvec_dot(a, b)
  *   aggregate(a, 0d, (acc,v) -> acc + double(v)*double(v))
  *                                                    → fvec_dot(a, a)
  *
  * Vector-column contract (same one the SRP/similarity ops assume):
  * equal-width arrays, non-null elements. zip_with would null-pad
  * mismatched lengths; fvec_dot truncates to the shorter — out of
  * contract either way.
  */
object NativeVectorOps extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def isZeroD(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case Cast(Literal(z, _), DoubleType, _, _) =>
      // a matcher must DECLINE, never throw: a non-numeric literal
      // under a to-double cast (CAST('x' AS DOUBLE) is legal SQL)
      // would otherwise escape the rule as a NumberFormatException
      // and fail the whole query instead of skipping the rewrite
      z != null && scala.util.Try(z.toString.toDouble)
        .toOption.contains(0.0)
    case _ => false
  }

  /** CAST(v AS DOUBLE) of the given lambda variable. */
  private def castOf(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case Cast(x: NamedLambdaVariable, DoubleType, _, _) =>
        x.exprId == v.exprId
      case _ => false
    }

  /** (acc, v) -> acc + v, any argument order in the Add. */
  private def isPlainSum(f: Expression): Boolean = f match {
    case LambdaFunction(Add(l: NamedLambdaVariable,
        r: NamedLambdaVariable, _),
        Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      Set(l.exprId, r.exprId) == Set(acc.exprId, v.exprId)
    case _ => false
  }

  /** finish lambda is the identity. */
  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(out: NamedLambdaVariable,
        Seq(in: NamedLambdaVariable), _) => out.exprId == in.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(
      _.containsPattern(org.apache.spark.sql.catalyst.trees
        .TreePattern.HIGH_ORDER_FUNCTION)) {

      // aggregate(zip_with(a,b, (x,y) -> dx*dy), 0d, (acc,v) -> acc+v)
      case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(Multiply(mx, my, _),
            Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          zero, merge, finish)
          if isFloatArray(a) && isFloatArray(b) && isZeroD(zero) &&
            ((castOf(mx, x) && castOf(my, y)) ||
              (castOf(mx, y) && castOf(my, x))) &&
            isPlainSum(merge) && isIdentity(finish) =>
        FloatVectorDot(a, b)

      // aggregate(a, 0d, (acc,v) -> acc + dv*dv)  (norm² shape)
      case ArrayAggregate(a, zero,
          LambdaFunction(Add(accRef: NamedLambdaVariable,
            Multiply(m1, m2, _), _),
            Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          finish)
          if isFloatArray(a) && isZeroD(zero) &&
            accRef.exprId == acc.exprId &&
            castOf(m1, v) && castOf(m2, v) && isIdentity(finish) =>
        FloatVectorDot(a, a)
    }
}
