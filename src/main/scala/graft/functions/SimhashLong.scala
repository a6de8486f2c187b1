package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native packed SimHash over a text column: `simhash_long(text, bits)`.
  *
  * Bit-identical to the declarative higher-order fold it replaces
  * (TextDedup.withSimhashIntFold, kept as the differential reference):
  * tokens are the segments of `text` split on single spaces with EMPTY
  * SEGMENTS KEPT (Spark's `split(text, ' ')` limit=-1 semantics,
  * including the trailing empty and the lone empty token of ""), each
  * token votes ±1 per bit by the ascii parity of its md5 hex char, and
  * positive votes set bit `bits-b`.
  *
  * Why native (SURVEY.md §2.9 preference order): the fold form runs a
  * nested `aggregate(sequence(1,bits), …, aggregate(__hs, …))` through
  * interpreted lambda evaluation — bits × tokens interpreter steps and
  * a materialized md5-hex array per row. This expression is one fused
  * loop over the raw UTF-8 bytes (md5 per token, nibble parity per
  * bit, no hex-string or array allocation) emitted as a single static
  * call inside whole-stage codegen. Semantics unchanged; every
  * downstream oracle replays exactly.
  */
case class SimhashLong(left: Expression, right: Expression)
    extends BinaryExpression {

  // ExpectsInputTypes is off-limits (AbstractDataType is private[sql]
  // in Spark 4) — validate (string, foldable int) directly instead.
  // The value range is checked here too: bits is foldable, and the SQL
  // face (`simhash_long(text, 40)`) would otherwise read past the
  // 16-byte md5 digest at runtime while bits<=0 silently returned 0.
  override def checkInputDataTypes(): TypeCheckResult =
    if (!(left.dataType.isInstanceOf[StringType] &&
          right.dataType == IntegerType && right.foldable))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, literal int), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    else right.eval() match {
      case b: Int if b >= 1 && b <= 32 => TypeCheckResult.TypeCheckSuccess
      case b => TypeCheckResult.TypeCheckFailure(
        s"$prettyName bits must be in 1..32 (16-byte md5 digest = 32 " +
          s"nibble votes), got $b")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash_long"

  override protected def nullSafeEval(t: Any, b: Any): Any =
    SimhashOps.compute(t.asInstanceOf[UTF8String],
      b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, b) =>
      s"graft.functions.SimhashOps.compute($t, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimhashLong =
    copy(left = newLeft, right = newRight)
}

/** Static kernel for [[SimhashLong]] — a standalone object so the
  * generated code can call it through the class's static forwarder. */
object SimhashOps {

  private val mdLocal =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** One pass over the UTF-8 bytes: token = bytes between 0x20
    * delimiters (0x20 never occurs inside a multi-byte UTF-8 sequence,
    * so byte-splitting equals string-splitting); per token one md5 and
    * `bits` nibble-parity votes. The hex char for nibble v is '0'+v
    * (even ascii base) below 10 and 'a'+v-10 (odd base 87) above, so
    * odd-ascii ⇔ (v<10 ∧ v odd) ∨ (v≥10 ∧ v even) — no hex string is
    * ever built. */
  def compute(text: UTF8String, bits: Int): Long = {
    val bytes = text.getBytes
    val n = bytes.length
    val votes = new Array[Int](bits)
    val md = mdLocal.get()
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == 0x20) {
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        var b = 0
        while (b < bits) {
          val by = d(b >> 1) & 0xff
          val v = if ((b & 1) == 0) by >> 4 else by & 0xf
          val oddAscii = if (v < 10) (v & 1) == 1 else (v & 1) == 0
          votes(b) += (if (oddAscii) 1 else -1)
          b += 1
        }
        start = i + 1
      }
      i += 1
    }
    var acc = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) acc |= 1L << (bits - 1 - b)
      b += 1
    }
    acc
  }
}
