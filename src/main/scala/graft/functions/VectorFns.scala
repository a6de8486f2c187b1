package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Vector math over `Array[Float]` embedding columns, as codegen'd
  * higher-order built-ins (SURVEY.md §2.9: no UDFs).
  *
  * Determinism contract: every fold is a strict left-to-right sequence of
  * IEEE double operations, and the paired DuckDB fragments replay the
  * identical operation order via `list_reduce` — so cosines computed by
  * the two engines are bit-identical and safe to hash-compare, filter,
  * and rank on without any rounding (see ADVICE r2 on decimal casts).
  */
object VectorFns {

  /** Sequential-fold dot product of two float-array columns, in double. */
  def dotFold(a: String, b: String): Column = expr(
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "CAST(0 AS DOUBLE), (acc, v) -> acc + v)")

  /** Sequential-fold L2 norm of a float-array column, in double. */
  def normFold(a: String): Column = expr(
    s"sqrt(aggregate($a, CAST(0 AS DOUBLE), " +
      "(acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))")

  /** Cosine similarity = dot/(‖a‖·‖b‖), all sequential folds. */
  def cosineFold(a: String, b: String): Column =
    dotFold(a, b) / (normFold(a) * normFold(b))

  /** Cosine via the native codegen'd expression (FloatVectorDot) —
    * bit-identical to cosineFold (same IEEE sequence: norm = √dot(v,v)),
    * but one fused loop per dot instead of interpreted lambdas. Needs
    * graft.GraftExtensions registered on the session. */
  def cosineNative(s: org.apache.spark.sql.SparkSession,
                   a: String, b: String): Column = {
    graft.GraftExtensions.ensure(s)
    expr(s"fvec_dot($a, $b) / " +
      s"(sqrt(fvec_dot($a, $a)) * sqrt(fvec_dot($b, $b)))")
  }

  /** DuckDB fragment computing the identical dot product fold. */
  def duckDot(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), " +
      "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), " +
      "(acc, v) -> acc + v)"

  /** DuckDB fragment computing the identical L2-norm fold. */
  def duckNorm(a: String): String =
    s"sqrt(list_reduce(list_transform($a, " +
      "v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (acc, v) -> acc + v))"

  /** DuckDB fragment computing the identical cosine. */
  def duckCosine(a: String, b: String): String =
    s"${duckDot(a, b)} / (${duckNorm(a)} * ${duckNorm(b)})"
}
