package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Static forwarders for generated code (see [[Hash60Helper]]). */
class HilbertHelper
object HilbertHelper {

  /** Bits per axis: a 2^16 × 2^16 grid, d ∈ [0, 2^32) — non-negative,
    * so Hilbert keys sort correctly as signed longs.
    */
  val Bits = 16
  val Mask: Long = (1L << Bits) - 1 // 65535

  /** Hilbert curve index of grid cell (x, y) — the standard xy2d walk
    * from coarsest bit to finest, expressed in PURE ARITHMETIC so the
    * SQL mirror can run the identical token stream: the quadrant code
    * (3·rx) XOR ry collapses to `CASE rx WHEN 0 THEN ry ELSE 3−ry`,
    * and the reflection (2^16−1) XOR v collapses to `65535 − v`
    * (complementing a value known to sit in [0, 2^16) — no bit op has
    * engine-specific syntax anywhere). Inputs are masked to the low 16
    * bits; the rotation keeps (x, y) in range by construction.
    */
  def hilbert(xIn: Long, yIn: Long): Long = {
    var x = xIn & Mask
    var y = yIn & Mask
    var d = 0L
    var b = Bits - 1
    while (b >= 0) {
      val rx = (x >> b) & 1L
      val ry = (y >> b) & 1L
      d += (1L << (2 * b)) * (if (rx == 0L) ry else 3L - ry)
      if (ry == 0L) {
        if (rx == 1L) { x = Mask - x; y = Mask - y }
        val t = x; x = y; y = t
      }
      b -= 1
    }
    d
  }
}

/** Hilbert curve value: maps two long keys (low 16 bits each) onto the
  * order-16 Hilbert space-filling curve. The locality upgrade over the
  * Z-order curve ([[ZValueF]]): consecutive Hilbert indices are ALWAYS
  * 4-adjacent grid cells (Morton order jumps across the plane at every
  * power-of-two boundary), so range scans touch fewer distinct key
  * blocks and min/max file skipping prunes tighter boxes — the reason
  * lakehouse table formats offer hilbert clustering next to z-order.
  * Same deployment shape as layout_zorder: sort by the curve value,
  * write, and prune by column min/max.
  */
case class HilbertF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HilbertHelper.hilbert(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.HilbertHelper.hilbert($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertF =
    copy(left = newLeft, right = newRight)
}
