package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** Static-forwarder host for the generated-code calls. */
class PqHelper
object PqHelper {

  /** Fixed-point subspace distance: left-to-right double fold of
    * `(emb[i]−cv[i])²` over subspace `mm`'s `d` dims, then
    * `floor(s·scale)` to a long — the identical operation sequence (and
    * therefore identical bits) as the HOF form in
    * [[graft.ops.Pq.subDistFix]] and the DuckDB `list_reduce` mirror.
    */
  private def subDistFix(emb: ArrayData, cv: ArrayData, mm: Int, d: Int,
      scale: Double): Long = {
    var s = 0d
    var i = 0
    while (i < d) {
      val idx = mm * d + i
      val diff = emb.getFloat(idx).toDouble - cv.getFloat(idx).toDouble
      s += diff * diff
      i += 1
    }
    math.floor(s * scale).toLong
  }

  /** PQ codes: per subspace, the argmin codebook index (strict `<`, so
    * ties keep the lowest index — same tiebreak as
    * `min(struct(dfix, cent_id))`).
    */
  def codes(emb: ArrayData, cvs: ArrayData, m: Int, scale: Double): ArrayData = {
    val d = emb.numElements() / m
    val kc = cvs.numElements()
    val out = new Array[Int](m)
    var mm = 0
    while (mm < m) {
      var bestD = Long.MaxValue
      var bestJ = -1
      var j = 0
      while (j < kc) {
        val q = subDistFix(emb, cvs.getArray(j), mm, d, scale)
        if (q < bestD) { bestD = q; bestJ = j }
        j += 1
      }
      out(mm) = bestJ
      mm += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** PQ query LUT: the flat m·kc fixed-point distance table, index
    * `mm·kc + j`.
    */
  def lut(emb: ArrayData, cvs: ArrayData, m: Int, scale: Double): ArrayData = {
    val d = emb.numElements() / m
    val kc = cvs.numElements()
    val out = new Array[Long](m * kc)
    var mm = 0
    while (mm < m) {
      var j = 0
      while (j < kc) {
        out(mm * kc + j) = subDistFix(emb, cvs.getArray(j), mm, d, scale)
        j += 1
      }
      mm += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** Full-vector fixed-point-L2 argmin index (0-based): the native form
    * of [[graft.ops.VectorOps.argminL2Index]] — one fold over the whole
    * vector per candidate, strict `<` first-wins tiebreak.
    */
  def argminL2(emb: ArrayData, cvs: ArrayData, scale: Double): Int = {
    val n = emb.numElements()
    val kc = cvs.numElements()
    var bestD = Long.MaxValue
    var bestJ = -1
    var j = 0
    while (j < kc) {
      val cv = cvs.getArray(j)
      var s = 0d
      var i = 0
      while (i < n) {
        val diff = emb.getFloat(i).toDouble - cv.getFloat(i).toDouble
        s += diff * diff
        i += 1
      }
      val q = math.floor(s * scale).toLong
      if (q < bestD) { bestD = q; bestJ = j }
      j += 1
    }
    bestJ
  }
}

/** Shared type checking for the (array<float>, array<array<float>>)
  * kernel family.
  */
trait PqKernelInputs { self: BinaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(FloatType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<array<float>>), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }
}

/** Native PQ encoder: embedding × codebook row → length-`m` code array.
  * Replaces an m×kc-deep nested HOF fold (each step allocating slices
  * and zip_with intermediates) with one tight primitive loop —
  * bit-identical by construction (see [[PqHelper.codes]]).
  */
case class PqCodesF(left: Expression, right: Expression, m: Int,
    scale: Double) extends BinaryExpression with PqKernelInputs {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_codes"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    PqHelper.codes(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], m, scale)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (e, c) =>
      s"graft.functions.PqHelper.codes($e, $c, $m, $scale)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqCodesF =
    copy(left = newLeft, right = newRight)
}

/** Native PQ LUT builder: embedding × codebook row → flat m·kc
  * fixed-point distance table (see [[PqHelper.lut]]).
  */
case class PqLutF(left: Expression, right: Expression, m: Int,
    scale: Double) extends BinaryExpression with PqKernelInputs {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pq_lut"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    PqHelper.lut(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], m, scale)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (e, c) =>
      s"graft.functions.PqHelper.lut($e, $c, $m, $scale)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqLutF =
    copy(left = newLeft, right = newRight)
}

/** Native fixed-point-L2 argmin over a broadcast centroid array (see
  * [[PqHelper.argminL2]]).
  */
case class ArgminL2F(left: Expression, right: Expression, scale: Double)
    extends BinaryExpression with PqKernelInputs {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_argmin_l2"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    PqHelper.argminL2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], scale)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (e, c) =>
      s"graft.functions.PqHelper.argminL2($e, $c, $scale)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgminL2F =
    copy(left = newLeft, right = newRight)
}
