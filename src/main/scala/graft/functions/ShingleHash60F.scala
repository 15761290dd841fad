package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

class ShingleHashHelper
object ShingleHashHelper {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** All k-token shingle hashes of a document in one pass over its bytes.
    *
    * Key identity: `split(text, ' ')` then `concat_ws(' ', slice(toks, i, k))`
    * reproduces the EXACT byte span of the original string from token i's
    * first byte to token (i+k-1)'s last byte (single-space join of a
    * single-space split round-trips, including empty tokens from runs of
    * spaces). So instead of materializing token and shingle strings, hash
    * the spans of the original UTF-8 buffer directly — zero intermediate
    * allocations. Hash = [[Hash60Helper]]'s md5-prefix mod 2^31−1,
    * bit-identical to hashing the concatenated shingle string.
    */
  /** Token start offsets of a space-separated byte buffer: token i
    * spans `starts(i)` until `starts(i+1) - 1`, with the sentinel
    * `starts(nTokens) = len + 1` making the last token's span uniform.
    * nTokens = result.length - 1. ONE copy of the two-pass scan — the
    * hash, span, and bigram kernels all rely on this exact byte-span
    * identity, and three drifting copies of it is how a sentinel tweak
    * silently desynchronizes them (review finding).
    */
  private[functions] def tokenStarts(bytes: Array[Byte]): Array[Int] = {
    var nTokens = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nTokens += 1; i += 1 }
    val starts = new Array[Int](nTokens + 1)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTokens) = bytes.length + 1
    starts
  }

  def shingleHashes(s: UTF8String, k: Int): GenericArrayData = {
    val bytes = s.getBytes
    val starts = tokenStarts(bytes)
    val nTokens = starts.length - 1
    if (nTokens < k) return new GenericArrayData(Array.empty[Any])
    val d = md.get()
    val out = new Array[Any](nTokens - k + 1)
    var j = 0
    while (j + k <= nTokens) {
      val from = starts(j)
      val until = starts(j + k) - 1 // end of token j+k-1
      d.reset()
      d.update(bytes, from, until - from)
      val h = d.digest()
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (h(b) & 0xffL); b += 1 }
      out(j) = (v >>> 4) % 2147483647L
      j += 1
    }
    new GenericArrayData(out)
  }

  /** All k-token shingle STRINGS of a document in one pass — the same
    * byte-span identity as [[shingleHashes]], but returning the spans
    * themselves as zero-copy [[UTF8String]] views instead of hashing
    * them. Bit-identical to `shingles(split(text,' '), k)`'s
    * transform(slice+concat) chain with none of its per-gram array and
    * string allocations.
    */
  def shingleSpans(s: UTF8String, k: Int): GenericArrayData = {
    val bytes = s.getBytes
    val starts = tokenStarts(bytes)
    val nTokens = starts.length - 1
    if (nTokens < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nTokens - k + 1)
    var j = 0
    while (j + k <= nTokens) {
      val from = starts(j)
      val until = starts(j + k) - 1 // end of token j+k-1
      out(j) = UTF8String.fromBytes(bytes, from, until - from)
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Fused tokenize → k-shingle kernel: string → array<string> of the
  * shingle byte spans in a single pass (see
  * [[ShingleHashHelper.shingleSpans]]). Drop-in for
  * `shingles(split(text, ' '), k)` wherever the token array came
  * straight from a single-space split of the text — every repo call
  * site (BigramStatsSuite pins bit-identity with the HOF form).
  */
case class ShingleSpansF(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingle_spans"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashHelper.shingleSpans(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashHelper.shingleSpans($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleSpansF =
    copy(child = newChild)
}

/** Fused tokenize → k-shingle → 60-bit-hash kernel: string → array<long>
  * in a single pass over the document's bytes (see
  * [[ShingleHashHelper.shingleHashes]]). Replaces the
  * `transform(sequence…, concat_ws(slice…))` + per-shingle [[Hash60F]]
  * chain, which allocates every shingle as a UTF8String first. k=1
  * degenerates to per-token hashing (the simhash/fingerprint input).
  */
case class ShingleHash60F(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hash60"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashHelper.shingleHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashHelper.shingleHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash60F =
    copy(child = newChild)
}
