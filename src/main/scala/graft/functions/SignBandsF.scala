package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Static-forwarder host for the generated-code call. */
class SignBandsHelper
object SignBandsHelper {

  /** Hyperplane component for global plane `j` at 1-based vector index
    * `i1`: multiply-shift mix of (i, j) reduced to a small odd range,
    * `((((i1*31 + j) * 2654435761) >> 16) & 0xFFFF) % 7 − 3  ∈ [−3, 3]`.
    * Every value and intermediate is an exact int64, so the DuckDB mirror
    * (`// 65536` on the same positive products) reproduces it bit-for-bit,
    * and each component is exactly representable in double. Unlike the
    * retired `(i·(j+3)) mod 5 − 2` family (which had only 5 distinct
    * planes — j and j+5 were identical), the multiply-shift mix gives
    * genuinely distinct pseudo-random planes for every j.
    */
  def component(i1: Int, j: Int): Int =
    ((((i1.toLong * 31 + j) * 2654435761L) >> 16) & 0xFFFFL).toInt % 7 - 3

  /** All `nBands × bitsPerBand` hyperplane dot products in ONE traversal
    * of the vector, folded per-plane in index order (bit-identical to the
    * HOF / DuckDB left fold), then packed into one bucket int per band:
    * band b's bucket bit k is the sign (strict `> 0`) of plane
    * j = b·bitsPerBand + k.
    */
  def bands(v: ArrayData, nBands: Int, bitsPerBand: Int): ArrayData = {
    val planes = nBands * bitsPerBand
    val n = v.numElements()
    val sums = new Array[Double](planes)
    var i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble
      var j = 0
      while (j < planes) {
        sums(j) += x * component(i + 1, j).toDouble
        j += 1
      }
      i += 1
    }
    val out = new Array[Any](nBands)
    var b = 0
    while (b < nBands) {
      var bucket = 0
      var k = 0
      while (k < bitsPerBand) {
        if (sums(b * bitsPerBand + k) > 0d) bucket |= (1 << k)
        k += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** Native banded random-hyperplane LSH: `array<float>` → `array<int>` of
  * `nBands` bucket ids (`bitsPerBand` sign bits each), one vector
  * traversal for all planes. OR-amplification across bands is the scale
  * story: candidate recall 1−(1−s^r)^B (s = 1−θ/π) instead of the single
  * s^r, while each band still has 2^r buckets so within-bucket join
  * width stays ~corpus/2^r — the same banding MinHashLSH already uses
  * for text.
  */
case class SignBandsF(child: Expression, nBands: Int, bitsPerBand: Int)
    extends UnaryExpression {
  require(nBands >= 1 && bitsPerBand >= 1 && bitsPerBand <= 30)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_sign_bands"

  override protected def nullSafeEval(input: Any): Any =
    SignBandsHelper.bands(input.asInstanceOf[ArrayData], nBands, bitsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SignBandsHelper.bands($c, $nBands, $bitsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): SignBandsF =
    copy(child = newChild)
}
