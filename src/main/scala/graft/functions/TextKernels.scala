package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Static-forwarder host for generated-code calls. */
class TextKernelsHelper
object TextKernelsHelper {
  private val P = 2147483647L

  /** SimHash over a hashed-token array: one traversal, per-bit majority
    * vote with strict `>` tie-to-zero — identical to 16 separate
    * `size(filter(xs, bit_i set)) * 2 > size(xs)` columns.
    */
  def simhash(xs: ArrayData, bits: Int): Long = {
    val n = xs.numElements()
    val counts = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val x = xs.getLong(i)
      var b = 0
      while (b < bits) {
        if (((x >> b) & 1L) == 1L) counts(b) += 1
        b += 1
      }
      i += 1
    }
    var sketch = 0L
    var b = 0
    while (b < bits) {
      if (2 * counts(b) > n) sketch |= (1L << b)
      b += 1
    }
    sketch
  }

  /** Rolling polynomial fingerprint: fold((acc*31 + x) mod P, 0). */
  def rollingFp(xs: ArrayData): Long = {
    val n = xs.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc = (acc * 31 + xs.getLong(i)) % P
      i += 1
    }
    acc
  }
}

private[functions] trait LongArrayKernel extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
}

/** Native one-pass SimHash sketch (see [[TextKernelsHelper.simhash]]). */
case class SimHashF(child: Expression, bits: Int) extends LongArrayKernel {
  override def prettyName: String = "graft_simhash"
  override protected def nullSafeEval(input: Any): Any =
    TextKernelsHelper.simhash(input.asInstanceOf[ArrayData], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernelsHelper.simhash($c, $bits)")
  override protected def withNewChildInternal(newChild: Expression): SimHashF =
    copy(child = newChild)
}

/** Native one-pass rolling fingerprint (see [[TextKernelsHelper.rollingFp]]). */
case class RollingFpF(child: Expression) extends LongArrayKernel {
  override def prettyName: String = "graft_rolling_fp"
  override protected def nullSafeEval(input: Any): Any =
    TextKernelsHelper.rollingFp(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernelsHelper.rollingFp($c)")
  override protected def withNewChildInternal(newChild: Expression): RollingFpF =
    copy(child = newChild)
}
