package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Helper with a static forwarder (the empty companion class makes Scala
  * emit `Hash60Helper.hash60` as a true Java static) so generated code can
  * call it without reflection.
  */
class Hash60Helper
object Hash60Helper {
  /** md5(utf8 bytes), first 15 hex chars as a 60-bit value, mod 2^31−1.
    * Equal BY CONSTRUCTION to
    * `CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT) % 2147483647`.
    * Delegates to [[Raw60Helper.raw60]] — ONE copy of the byte-level
    * fold keeps the two hash families bit-coupled by construction.
    */
  def hash60(s: UTF8String): Long =
    Raw60Helper.raw60(s) % 2147483647L
}

/** Native form of [[graft.ops.TextHash.h31]]: 60-bit md5-prefix hash of a
  * string, reduced mod the Mersenne prime 2^31−1 — without materializing
  * the 32-char hex string or string-parsing it back through `conv`. The
  * value is bit-identical to the SQL form (see [[Hash60Helper.hash60]]),
  * so every DuckDB oracle built on the md5 arithmetic keeps hash-matching.
  * This expression sits under `transform(...)` over every shingle of every
  * document in the dedup/fingerprint family — the single hottest scalar in
  * the text pipeline.
  */
case class Hash60F(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash60"

  override protected def nullSafeEval(input: Any): Any =
    Hash60Helper.hash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Hash60Helper.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash60F =
    copy(child = newChild)
}

/** Raw-60-bit sibling of [[Hash60F]]: the md5-prefix value WITHOUT the
  * mod-P31 reduction — the uniform-bit form HyperLogLog needs (register
  * index + leading-zero rank both read raw hash bits; a Mersenne-mod
  * hash would bias the zero-run distribution). Bit-identical to
  * `CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)` without
  * materializing the 32-char hex string.
  */
case class Raw60F(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_raw60"

  override protected def nullSafeEval(input: Any): Any =
    Raw60Helper.raw60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Raw60Helper.raw60($c)")

  override protected def withNewChildInternal(newChild: Expression): Raw60F =
    copy(child = newChild)
}

/** Static-forwarder helper for [[Raw60F]] (same pattern as
  * [[Hash60Helper]]).
  */
class Raw60Helper
object Raw60Helper {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** First 8 md5 bytes big-endian, shifted right one nibble — the
    * 60-bit value `conv(substring(md5(s), 1, 15), 16, 10)` parses.
    */
  def raw60(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v >>> 4
  }
}
