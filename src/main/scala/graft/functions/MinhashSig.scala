package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature over a text column:
  * `minhash_sig(text, numPerms)` → `array<string>` of numPerms md5-hex
  * minima (EMPTY array when the doc has fewer than 2 tokens, i.e. no
  * word-bigram shingle).
  *
  * Bit-identical to the declarative form it replaces
  * (TextDedup.signaturesNarrowFold): shingle s = word bigram of
  * `split(text, ' ')` (empty tokens kept), h_p = min over shingles of
  * md5("p|" ++ s) as a lowercase hex string. Two exactnesses make the
  * kernel cheap: (1) min over duplicates equals min over distinct, so
  * the fold's array_distinct is skippable; (2) consecutive tokens are
  * separated by exactly one 0x20 byte, so every bigram shingle is a
  * CONTIGUOUS byte slice of the original text — no shingle string is
  * ever materialized, each md5 streams the prefix then the slice, and
  * minima compare as unsigned 16-byte digests (equivalent to hex
  * string order). Hex is rendered only for the numPerms winners.
  *
  * Why native (SURVEY.md §2.9): the fold form interprets
  * `array_min(transform(...))` lambdas per (perm × shingle) and
  * allocates every shingle string and hex digest; this is one fused
  * loop inside whole-stage codegen.
  */
case class MinhashSig(left: Expression, right: Expression)
    extends BinaryExpression {

  // numPerms is foldable, so its range is enforced at analysis time:
  // the SQL face (`minhash_sig(text, -1)`) would otherwise throw
  // NegativeArraySizeException mid-job, and 0 would yield a signature
  // that every downstream band filter silently drops.
  override def checkInputDataTypes(): TypeCheckResult =
    if (!(left.dataType.isInstanceOf[StringType] &&
          right.dataType == IntegerType && right.foldable))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, literal int), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    else right.eval() match {
      case p: Int if p >= 1 => TypeCheckResult.TypeCheckSuccess
      case p => TypeCheckResult.TypeCheckFailure(
        s"$prettyName numPerms must be >= 1, got $p")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(t: Any, p: Any): Any =
    MinhashOps.compute(t.asInstanceOf[UTF8String], p.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, p) =>
      s"graft.functions.MinhashOps.compute($t, $p)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinhashSig =
    copy(left = newLeft, right = newRight)
}

/** Static kernel for [[MinhashSig]] — standalone object so generated
  * code calls it through the class's static forwarder. */
object MinhashOps {

  // the permutation prefixes ("0|", "1|", …) depend only on numPerms
  // (a foldable literal per query) — rebuilding them per ROW was pure
  // allocation + int-formatting waste in the kernel that exists to
  // remove per-row allocation. The byte arrays are write-once and
  // only read after, so sharing across threads is safe.
  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()
  private val mkPrefixes =
    new java.util.function.Function[Int, Array[Array[Byte]]] {
      override def apply(n: Int): Array[Array[Byte]] =
        Array.tabulate(n)(p => (p.toString + "|").getBytes("UTF-8"))
    }

  private val mdLocal =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private val HexChars = "0123456789abcdef".toCharArray

  private def lessThan(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  def compute(text: UTF8String, numPerms: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    // token start offsets; consecutive tokens share one 0x20 separator
    var nTokens = 1
    var i = 0
    while (i < n) { if (bytes(i) == 0x20) nTokens += 1; i += 1 }
    if (nTokens < 2) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nTokens)
    var t = 1
    starts(0) = 0
    i = 0
    while (i < n) {
      if (bytes(i) == 0x20) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val prefixes = prefixCache.computeIfAbsent(numPerms, mkPrefixes)
    val mins = new Array[Array[Byte]](numPerms)
    val md = mdLocal.get()
    var j = 0
    while (j < nTokens - 1) {
      // shingle j = tokens j, j+1 = bytes [starts(j), end of token j+1)
      val from = starts(j)
      val until = if (j + 2 < nTokens) starts(j + 2) - 1 else n
      var p = 0
      while (p < numPerms) {
        md.reset()
        md.update(prefixes(p))
        md.update(bytes, from, until - from)
        val d = md.digest()
        if (mins(p) == null || lessThan(d, mins(p))) mins(p) = d
        p += 1
      }
      j += 1
    }
    val out = new Array[Any](numPerms)
    var p = 0
    while (p < numPerms) {
      val d = mins(p)
      val hex = new Array[Char](32)
      var k = 0
      while (k < 16) {
        hex(2 * k) = HexChars((d(k) >> 4) & 0xf)
        hex(2 * k + 1) = HexChars(d(k) & 0xf)
        k += 1
      }
      out(p) = UTF8String.fromString(new String(hex))
      p += 1
    }
    new GenericArrayData(out)
  }
}
