package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native per-position k-gram hasher: `kgram_xxhash64(text, k)` —
  * the xxhash64 (Spark's default seed) of every k-token window of
  * `split(text, ' ')`, i.e. element-for-element identical to
  *
  * {{{ transform(sequence(1, size(l) - k + 1),
  *       i -> xxhash64(concat_ws(' ', slice(l, i, k)))) }}}
  *
  * with `l = split(text, ' ')`, and the same short-doc convention
  * (fewer than k tokens → empty array; NULL text → NULL). This is
  * THE hashed-gram definition `TextDedup.hashedGramInstances` feeds
  * to every instance-level dedup face.
  *
  * Why native: the built-in form runs an interpreted lambda per
  * position, each allocating a k-element array slice, a concat_ws
  * UTF8String (~120 bytes at k=20), and re-walking those bytes for
  * the hash — the dominant cost of the span_scrub/repeated-spans
  * datapath kernel (r18 verdict #5). The key identity making a
  * zero-allocation kernel possible: `split` on a single literal
  * space keeps tokens verbatim and `concat_ws(' ', ...)` rejoins
  * them with the same single space, so every window's string is
  * EXACTLY a byte range of the original text (0x20 never occurs
  * inside a UTF-8 multibyte sequence, so a byte scan finds the
  * token boundaries exactly). One pass records the boundaries, then
  * each window hashes its byte range in place via the same XXH64
  * kernel the built-in `xxhash64` uses — no slices, no joins, no
  * per-window allocation. Equality with the built-in composition is
  * spec-pinned on random multibyte inputs (VectorFnsSpec).
  */
case class KgramXxhash64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!left.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string column, got " +
          left.dataType.simpleString)
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a literal int gram length")
    else right.eval() match {
      // analysis-time range check, the min_window_md5 convention: a
      // bad literal fails the QUERY, never a task
      case k: Integer if k > 0 => TypeCheckResult.TypeCheckSuccess
      case k => TypeCheckResult.TypeCheckFailure(
        s"$prettyName gram length must be a positive int, got $k")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "kgram_xxhash64"

  override protected def nullSafeEval(t: Any, k: Any): Any =
    KgramOps.kgramHashes(
      t.asInstanceOf[UTF8String], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k) =>
      s"graft.functions.KgramOps.kgramHashes($t, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KgramXxhash64 =
    copy(left = newLeft, right = newRight)
}

object KgramOps {

  /** Spark's `xxhash64` default seed — the value the built-in
    * composition this kernel must match byte-for-byte hashes with. */
  val Seed = 42L

  def kgramHashes(text: UTF8String, k: Int): ArrayData = {
    require(k > 0, "gram length must be positive")
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val n = text.numBytes
    // pass 1: token count (spaces + 1) — split(' ') with Spark's
    // implicit limit -1 keeps every empty token, leading/trailing
    // included, so the count is exact
    var spaces = 0
    var i = 0
    while (i < n) {
      if (Platform.getByte(base, off + i) == 0x20) spaces += 1
      i += 1
    }
    val nTok = spaces + 1
    if (nTok < k)
      return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    // pass 2: token start offsets; the virtual starts(nTok) = n + 1
    // makes "end of token j = starts(j+1) − 1" uniform for the last
    // token too
    val starts = new Array[Int](nTok + 1)
    var t = 1
    i = 0
    while (i < n) {
      if (Platform.getByte(base, off + i) == 0x20) {
        starts(t) = i + 1
        t += 1
      }
      i += 1
    }
    starts(nTok) = n + 1
    val out = new Array[Long](nTok - k + 1)
    var w = 0
    while (w < out.length) {
      val from = starts(w)
      val until = starts(w + k) - 1
      out(w) = XXH64.hashUnsafeBytes(base, off + from, until - from, Seed)
      w += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
