package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static-forwarder host for the generated-code call. */
class MinHashBandsHelper
object MinHashBandsHelper {
  private val P = 2147483647L

  /** One pass over the hashed-shingle array: all `perms` permutation
    * minima (mh_j = min_x ((2j+1)·x + 7919j) mod P), then the `bands`
    * comma-joined band signatures. Identical arithmetic and formatting to
    * the HOF pipeline it replaces (and to the DuckDB oracle).
    */
  def bands(xs: ArrayData, perms: Int, bandCount: Int): ArrayData = {
    val n = xs.numElements()
    val mins = Array.fill(perms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = xs.getLong(i)
      var j = 0
      while (j < perms) {
        val v = ((2 * j + 1) * x + j * 7919L) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    val r = perms / bandCount
    val out = new Array[AnyRef](bandCount)
    var b = 0
    while (b < bandCount) {
      val sb = new java.lang.StringBuilder
      var k = 0
      while (k < r) {
        if (k > 0) sb.append(',')
        sb.append(mins(b * r + k))
        k += 1
      }
      out(b) = UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** Native MinHash band-signature kernel: `array<long>` hashed shingles →
  * `array<string>` of `bands` signatures, one traversal, no intermediate
  * arrays. Replaces `perms` separate `array_min(transform(...))` HOF
  * columns + `bands` concat_ws calls, each of which walks the shingle
  * array again through an interpreted lambda — the dominant cost of the
  * LSH pipeline after hashing went native. Empty input yields minima of
  * Long.MaxValue; callers filter empty shingle sets upstream (as
  * MinHashLSH does).
  */
case class MinHashBandsF(child: Expression, perms: Int, bands: Int)
    extends UnaryExpression {
  require(perms % bands == 0, "perms must divide into bands")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_minhash_bands"

  override protected def nullSafeEval(input: Any): Any =
    MinHashBandsHelper.bands(input.asInstanceOf[ArrayData], perms, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashBandsHelper.bands($c, $perms, $bands)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBandsF =
    copy(child = newChild)
}
