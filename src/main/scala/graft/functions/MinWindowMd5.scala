package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprint: `min_window_md5(text, w)` — the
  * lexicographic minimum of `md5(substring(text, i, w))` over every
  * sliding w-char window (all windows are full-length; a text
  * shorter than w contributes its whole self as the single window,
  * the `sequence(1, greatest(len-w+1, 1))` convention of the
  * `ta_fingerprint` oracle, empty string included).
  *
  * Why native: the built-in form evaluates an interpreted lambda per
  * window — one UTF8String substring allocation, one md5 expression
  * (byte-array + hex UTF8String allocation) each — ~320 windows per
  * fixture doc made `ta_fingerprint` the most expensive face in the
  * catalog once the bench measured full materialization (4.4 s at
  * sf0.1). This kernel walks the char boundaries once and runs one
  * reused MessageDigest over each window's byte slice, tracking the
  * minimum DIGEST (hex encoding is monotone in unsigned byte order,
  * so byte-wise min ≡ hex-string min) and hex-encodes once at the
  * end. Equality with the built-in composition is spec-pinned on
  * random multibyte inputs.
  */
case class MinWindowMd5(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!left.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string column, got " +
          left.dataType.simpleString)
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a literal int window length")
    else right.eval() match {
      // analysis-time range check, the simhash_long/minhash_sig
      // convention: a bad literal fails the QUERY, never a task
      case w: Integer if w > 0 => TypeCheckResult.TypeCheckSuccess
      case w => TypeCheckResult.TypeCheckFailure(
        s"$prettyName window length must be a positive int, got $w")
    }

  override def dataType: DataType = StringType

  override def prettyName: String = "min_window_md5"

  override protected def nullSafeEval(t: Any, w: Any): Any =
    FingerprintOps.minWindowMd5(
      t.asInstanceOf[UTF8String], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, w) =>
      s"graft.functions.FingerprintOps.minWindowMd5($t, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinWindowMd5 =
    copy(left = newLeft, right = newRight)
}

object FingerprintOps {

  private val HexDigits = "0123456789abcdef".toCharArray

  // one digest per thread (the SimhashOps/MinhashOps pattern): a
  // per-row getInstance is a JCA provider lookup + allocation on the
  // exact hot path this native kernel exists to optimize
  private val mdLocal =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  def minWindowMd5(text: UTF8String, w: Int): UTF8String = {
    require(w > 0, "window length must be positive")
    val bytes = text.getBytes
    val nBytes = bytes.length
    // char-boundary byte offsets (windows are CHARACTER windows,
    // substring semantics)
    val nChars = text.numChars()
    val offs = new Array[Int](nChars + 1)
    var i = 0
    var o = 0
    while (o < nBytes) {
      offs(i) = o
      o += UTF8String.numBytesForFirstByte(bytes(o))
      i += 1
    }
    offs(nChars) = nBytes

    val md = mdLocal.get()
    md.reset()
    val minDig = new Array[Byte](16)
    var haveMin = false
    val nWin = math.max(nChars - w + 1, 1)
    var s = 0
    while (s < nWin) {
      val from = offs(math.min(s, nChars))
      val until = offs(math.min(s + w, nChars))
      md.reset()
      md.update(bytes, from, until - from)
      val dig = md.digest()
      if (!haveMin || unsignedLess(dig, minDig)) {
        System.arraycopy(dig, 0, minDig, 0, 16)
        haveMin = true
      }
      s += 1
    }
    val hex = new Array[Char](32)
    i = 0
    while (i < 16) {
      hex(2 * i) = HexDigits((minDig(i) >> 4) & 0xf)
      hex(2 * i + 1) = HexDigits(minDig(i) & 0xf)
      i += 1
    }
    UTF8String.fromString(new String(hex))
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }
}
