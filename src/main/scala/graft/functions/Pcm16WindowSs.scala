package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native PCM16 window energy: `pcm16_window_ss(payload, w)` — the
  * payload's bytes read as big-endian unsigned 16-bit samples
  * centered at 32768, cut into consecutive FULL w-sample windows
  * (trailing partial window dropped, the `bytes/2/w` convention of
  * `mm_audio_energy`), each reduced to its exact sum of squares as
  * one BIGINT array element.
  *
  * Why native: the built-in form hex-encodes the whole payload and
  * parses each sample with `conv(substr(...))` inside an interpreted
  * per-window lambda — 2 allocations per SAMPLE. This kernel walks
  * the bytes once; the hex round-trip disappears. The hex-conv
  * composition stays as the spec-pinned reference (MultimodalSpec),
  * and the DuckDB oracle still replays the hex form — the integers
  * are identical by construction.
  */
case class Pcm16WindowSs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary column, got " +
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

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "pcm16_window_ss"

  override protected def nullSafeEval(p: Any, w: Any): Any =
    Pcm16Ops.windowSs(p.asInstanceOf[Array[Byte]], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, w) =>
      s"graft.functions.Pcm16Ops.windowSs($p, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Pcm16WindowSs =
    copy(left = newLeft, right = newRight)
}

object Pcm16Ops {

  def windowSs(bytes: Array[Byte], w: Int): ArrayData = {
    require(w > 0, "window length must be positive")
    val nWin = bytes.length / 2 / w
    val out = new Array[Any](nWin)
    var win = 0
    while (win < nWin) {
      var ss = 0L
      var j = 0
      var o = win * w * 2
      while (j < w) {
        val v = (((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)) - 32768
        ss += v.toLong * v
        j += 1
        o += 2
      }
      out(win) = ss
      win += 1
    }
    new GenericArrayData(out)
  }
}
