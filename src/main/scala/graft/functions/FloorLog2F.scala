package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Static forwarder (the [[Hash60Helper]] convention) so generated code
  * calls a true Java static.
  */
class FloorLog2Helper
object FloorLog2Helper {
  /** Position of the most significant set bit of a non-negative long —
    * equal BY CONSTRUCTION to `length(bin(v)) - 1` for v ≥ 0 (Spark's
    * `bin` renders minimal binary digits: bin(0) = "0" → 0, bin(5) =
    * "101" → 2). Negatives are refused loudly: `bin` switches to the
    * 64-char two's-complement image there, and silently returning 63
    * would diverge from the SQL form the oracles pin.
    */
  def floorLog2(v: Long): Int = {
    if (v < 0L) throw new IllegalArgumentException(
      s"graft_floor_log2: negative input $v (bin() would render " +
        "two's complement; the log-bucket domain is non-negative)")
    if (v == 0L) 0 else 63 - java.lang.Long.numberOfLeadingZeros(v)
  }
}

/** Native form of `length(bin(v)) - 1` — the msb the log-bucket quantile
  * sketch derives per ROW per VALUE. The builtin route materializes a
  * UTF8String of up to 64 binary digits and takes its length (one
  * allocation per row on the hottest scan-side path in
  * agg_ddsketch_quantile / stream_e2e_quantile); this is one
  * `numberOfLeadingZeros` instruction. Values are bit-identical to the
  * SQL form (FloorLog2Suite pins equality across the boundary values),
  * so the DuckDB mirrors stay on `length(bin(v)) - 1` untouched.
  */
case class FloorLog2F(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_floor_log2"

  override protected def nullSafeEval(input: Any): Any =
    FloorLog2Helper.floorLog2(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.FloorLog2Helper.floorLog2($c)")

  override protected def withNewChildInternal(newChild: Expression): FloorLog2F =
    copy(child = newChild)
}
