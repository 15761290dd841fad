package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Static forwarders for generated code (see [[Hash60Helper]]). */
class ZValueHelper
object ZValueHelper {

  /** Spread the low 31 bits of v so bit i lands at position 2i (the
    * classic magic-number bit dilation). 31 bits, not 32: the result's
    * highest used position is then 61 after the partner's left shift, so
    * z-values stay non-negative and sort correctly as signed longs.
    */
  def spread(v: Long): Long = {
    var x = v & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def zvalue(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}

/** Z-order (Morton) curve value: interleaves the low 31 bits of two long
  * keys so that sorting by the result clusters rows that are close in
  * BOTH dimensions. The data-layout primitive for multi-column pruning
  * at scale: a table laid out by z(a, b) serves min/max file skipping
  * for predicates on `a`, on `b`, and on (a, b) boxes, where a linear
  * sort serves only its leading column (ZOrderSuite measures exactly
  * this). Pure bit arithmetic — mirrored verbatim in the DuckDB oracle,
  * so layouts are cross-engine checkable.
  */
case class ZValueF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zvalue"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZValueHelper.zvalue(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ZValueHelper.zvalue($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZValueF =
    copy(left = newLeft, right = newRight)
}
