package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BinaryExpression, Expression, If, IsNull, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Packed HyperLogLog register kernels (VERDICT r12 task #2).
  *
  * The HyperBall loop previously carried per-node register state in
  * LONG format — one row per (node, bucket, m_j) — which saturates at
  * 512 rows/node: 77M rows ≈ 1.8 GB of row overhead at the 100× probe
  * arm, the measured driver of both the per-round shuffle volume and
  * the GC swing (1× wall 5.7–14.5s across readings, NOTES r12). These
  * kernels move the state to the standard HyperBall layout (Boldi &
  * Vigna 2013, §4): ONE row per node holding a 512-byte binary
  * register array (byte b = ρ of register b, 0 = unset), merged per
  * round with a byte-wise MAX — 512× fewer rows at identical
  * semantics, since max over (bucket-aligned) bytes IS register-wise
  * max and ρ ∈ [1, 52] fits a byte with 0 free as the unset marker.
  *
  * Bit-exactness contract: [[HllRegsHelper.pack]] computes ρ exactly
  * as `Hll.registers` / the DuckDB mirror (`CASE WHEN w = 0 THEN 52
  * ELSE 52 - length(bin(w)) END`), and the two readouts reproduce the
  * long-format fold terms (`n_set` = set-register count, `s_ne` =
  * Σ 2^(52−ρ) over set registers) — so the packed loop feeds the SAME
  * `s_total`/estimate expressions and the oracle CTEs stay untouched
  * (HyperBallPackedSuite pins packed ≡ long-format per round).
  */
class HllRegsHelper
object HllRegsHelper {

  /** Register count — must equal [[graft.ops.Hll.M]]. */
  val M = 512

  /** One-register packed array: node's own hash sets bucket `bucket`
    * to ρ(w) where w is the remaining 51 hash bits. ρ = 52 −
    * length(bin(w)) for w > 0, else 52 — the exact `Hll.registers`
    * derivation (length(bin(w)) = 64 − numberOfLeadingZeros(w)).
    */
  def pack(bucket: Long, w: Long): Array[Byte] = {
    if (bucket < 0L || bucket >= M) throw new IllegalArgumentException(
      s"graft_hll_pack: bucket $bucket outside [0, $M)")
    if (w < 0L) throw new IllegalArgumentException(
      s"graft_hll_pack: negative sub-register hash $w")
    val rho =
      if (w == 0L) 52
      else 52 - (64 - java.lang.Long.numberOfLeadingZeros(w))
    val a = new Array[Byte](M)
    a(bucket.toInt) = rho.toByte
    a
  }

  /** Byte-wise max — register-wise max-merge on the packed layout.
    * Arrays must be register-array sized (a codec bug upstream, not a
    * data condition — refused loudly).
    */
  def maxBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    if (a.length != M || b.length != M) throw new IllegalArgumentException(
      s"graft_hll_max: register arrays must be $M bytes, " +
        s"got ${a.length}/${b.length}")
    val out = new Array[Byte](M)
    var i = 0
    while (i < M) {
      out(i) = if (a(i) >= b(i)) a(i) else b(i)
      i += 1
    }
    out
  }

  /** Set-register count (the long format's COUNT(*) per node). */
  def nSet(a: Array[Byte]): Long = {
    var i = 0; var n = 0L
    while (i < a.length) { if (a(i) != 0) n += 1L; i += 1 }
    n
  }

  /** Σ 2^(52−ρ) over SET registers — the long format's exact BIGINT
    * harmonic-denominator partial sum (each term ≤ 2^51, 512 terms:
    * no overflow).
    */
  def sNe(a: Array[Byte]): Long = {
    var i = 0; var s = 0L
    while (i < a.length) {
      if (a(i) != 0) s += 1L << (52 - a(i))
      i += 1
    }
    s
  }
}

/** (bucket, w) → packed single-register array; scan-side, one per key. */
case class HllPackF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_hll_pack"

  override protected def nullSafeEval(b: Any, w: Any): Any =
    HllRegsHelper.pack(b.asInstanceOf[Long], w.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (b, w) => s"graft.functions.HllRegsHelper.pack($b, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HllPackF =
    copy(left = newLeft, right = newRight)
}

/** Byte-wise max of two packed register arrays. */
case class HllMaxF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, binary), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_hll_max"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HllRegsHelper.maxBytes(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.HllRegsHelper.maxBytes($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HllMaxF =
    copy(left = newLeft, right = newRight)
}

/** Packed array → set-register count. */
case class HllNSetF(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hll_nset"

  override protected def nullSafeEval(a: Any): Any =
    HllRegsHelper.nSet(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.HllRegsHelper.nSet($a)")

  override protected def withNewChildInternal(newChild: Expression): HllNSetF =
    copy(child = newChild)
}

/** Packed array → exact set-register harmonic partial Σ 2^(52−ρ). */
case class HllSNeF(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hll_sne"

  override protected def nullSafeEval(a: Any): Any =
    HllRegsHelper.sNe(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.HllRegsHelper.sNe($a)")

  override protected def withNewChildInternal(newChild: Expression): HllSNeF =
    copy(child = newChild)
}

/** Declarative byte-wise-max AGGREGATE over packed register arrays —
  * the per-round merge `groupBy(node).agg(max-merge(reg))`. A
  * declarative aggregate keeps the merge inside codegen'd
  * HashAggregate with map-side partials: each map task ships ONE
  * 512-byte array per node it saw, so the per-round exchange is
  * bounded by tasks × nodes × 512B regardless of degree. (The
  * alternative — collect_list + reduce — would materialize deg arrays
  * per node; an Aggregator UDAF would leave codegen.)
  */
case class HllMaxAgg(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hll_max_agg"

  private lazy val regs = AttributeReference("regs", BinaryType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(regs)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(null, BinaryType))

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(regs), child,
      If(IsNull(child), regs, HllMaxF(regs, child))))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    If(IsNull(regs.left), regs.right,
      If(IsNull(regs.right), regs.left,
        HllMaxF(regs.left, regs.right))))

  override lazy val evaluateExpression: Expression = regs

  override protected def withNewChildInternal(newChild: Expression): HllMaxAgg =
    copy(child = newChild)
}
