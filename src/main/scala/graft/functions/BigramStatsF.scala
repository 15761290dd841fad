package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

class BigramStatsHelper
object BigramStatsHelper {

  /** (total, distinct) 2-token-shingle counts of a document in one pass
    * over its bytes.
    *
    * Same span identity as [[ShingleHashHelper.shingleHashes]]: a
    * single-space join of a single-space split round-trips, so bigram
    * string i IS the byte span from token i's first byte to token
    * (i+1)'s last byte. Distinctness is EXACT, not probabilistic: each
    * span is wrapped as a zero-copy [[UTF8String]] view over the shared
    * byte buffer (equals/hashCode compare content) and counted through
    * a HashSet — bit-identical to
    * `size(array_distinct(shingles(split(text,' '), 2)))` without
    * materializing token, slice, or shingle strings.
    */
  def bigramStats(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    // shared two-pass scan: see ShingleHashHelper.tokenStarts — the
    // byte-span identity there is the one this kernel counts over
    val starts = ShingleHashHelper.tokenStarts(bytes)
    val nTokens = starts.length - 1
    if (nTokens < 2)
      return new GenericInternalRow(Array[Any](0L, 0L))
    val seen = new java.util.HashSet[UTF8String](
      Integer.highestOneBit(nTokens) * 2)
    var j = 0
    while (j + 2 <= nTokens) {
      val from = starts(j)
      val until = starts(j + 2) - 1 // end of token j+1
      seen.add(UTF8String.fromBytes(bytes, from, until - from))
      j += 1
    }
    new GenericInternalRow(Array[Any]((nTokens - 1).toLong,
      seen.size.toLong))
  }
}

/** Fused tokenize → bigram → (count, exact-distinct-count) kernel:
  * string → struct<n_bigrams: long, n_distinct: long> in a single pass
  * over the document's bytes (see [[BigramStatsHelper.bigramStats]]).
  * Replaces the `size(shingles)` + `size(array_distinct(shingles))`
  * pair, whose interpreted transform(slice+concat) chain was the
  * bench's slowest line even after staged-projection dedup — the
  * repetition-ratio query needs only the two counts, never the array.
  */
case class BigramStatsF(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false)))
  override def prettyName: String = "graft_bigram_stats"

  override protected def nullSafeEval(input: Any): Any =
    BigramStatsHelper.bigramStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BigramStatsHelper.bigramStats($c)")

  override protected def withNewChildInternal(newChild: Expression): BigramStatsF =
    copy(child = newChild)
}
