package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: per-group top-k (value, tag) pairs via a bounded buffer —
  * the `Aggregator[IN, BUF, OUT]` extension surface (SURVEY §4.2: start
  * with Aggregator, promote to TypedImperativeAggregate only if bench
  * demands).
  *
  * Scale shape: the buffer is O(k) and `reduce` runs map-side, so each
  * partition contributes at most k candidates to the shuffle — a grouped
  * top-k costs one partial-agg pass + a k·partitions-sized exchange,
  * never a per-group global sort. Deterministic: ties break on the tag
  * ascending, so results are oracle-checkable.
  *
  * The buffer keeps at most 2k elements between compactions (amortized
  * O(n log k)-ish without a heap encoder; a binary heap would need a
  * custom Encoder for no asymptotic gain at these k).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def compact(buf: Seq[(Double, Long)]): Seq[(Double, Long)] =
    buf.sortBy { case (v, tag) => (-v, tag) }.take(k)

  // Vector, not List — see KmvAggregator.zero: List's O(buffer) append
  // and size make per-row reduce cost O(k)
  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] = {
    val next = buf :+ in
    if (next.size >= 2 * k) compact(next) else next
  }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    compact(a ++ b)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] =
    compact(buf)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
}
