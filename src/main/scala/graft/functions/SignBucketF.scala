package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

class SignBucketHelper
object SignBucketHelper {
  /** All `nBits` hyperplane dot products in one traversal of the vector.
    * Hyperplane j component i (1-based): ((i·(j+3)) mod 5) − 2 — the same
    * deterministic integer hyperplanes as the HOF form and the DuckDB
    * oracle, accumulated per-plane in index order so each plane's sum is
    * bit-identical to its `aggregate(zip_with(...))` equivalent.
    */
  def bucket(v: ArrayData, nBits: Int): Int = {
    val n = v.numElements()
    val sums = new Array[Double](nBits)
    var i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble
      var j = 0
      while (j < nBits) {
        sums(j) += x * (((i + 1) * (j + 3)) % 5 - 2).toDouble
        j += 1
      }
      i += 1
    }
    var b = 0
    var out = 0
    while (b < nBits) {
      if (sums(b) > 0d) out |= (1 << b)
      b += 1
    }
    out
  }
}

/** Native random-hyperplane LSH bucket id: `array<float>` → int, one
  * vector traversal for all sign bits (the HOF form re-walks the vector
  * once per hyperplane through `aggregate(zip_with(...))` lambdas, and
  * LSH queries evaluate it on both join sides).
  */
case class SignBucketF(child: Expression, nBits: Int) extends UnaryExpression {
  require(nBits >= 1 && nBits <= 30)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sign_bucket"

  override protected def nullSafeEval(input: Any): Any =
    SignBucketHelper.bucket(input.asInstanceOf[ArrayData], nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SignBucketHelper.bucket($c, $nBits)")

  override protected def withNewChildInternal(newChild: Expression): SignBucketF =
    copy(child = newChild)
}
