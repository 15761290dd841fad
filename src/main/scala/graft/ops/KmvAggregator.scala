package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF form of the KMV distinct sketch: per group, the k smallest
  * DISTINCT hash values — the production shape promised by
  * `agg_approx_distinct_kmv`'s window anchor. The buffer is O(k), reduce
  * runs map-side, and each partition ships at most k values to the
  * shuffle: no per-group sort of the deduped hash set ever happens, so
  * the operator holds at any group cardinality. Same estimator, same
  * arithmetic — ScaleQueries registers both forms over the same DuckDB
  * oracle, so the equivalence is driver-checked, not just suite-checked.
  *
  * Buffer discipline mirrors [[TopKAggregator]]: sorted-distinct compact
  * every 2k insertions (amortized; a heap would need a custom Encoder
  * for no asymptotic gain at sketch-sized k).
  */
class KmvAggregator(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {

  private def compact(buf: Seq[Long]): Seq[Long] =
    buf.distinct.sorted.take(k)

  // Vector, not List: `Seq.empty` defaults to List, whose `:+` append
  // and `size` are both O(buffer) — every map-side reduce call then
  // copies up to 2k elements to add one, O(n·k) per partition instead
  // of the amortized O(n log k) the compaction discipline targets.
  // Vector appends and sizes in effectively O(1), and the reduce chain
  // keeps the concrete type (deserialized merge inputs may arrive as
  // another Seq, but merge compacts immediately).
  override def zero: Seq[Long] = Vector.empty

  override def reduce(buf: Seq[Long], h: Long): Seq[Long] = {
    val next = buf :+ h
    if (next.size >= 2 * k) compact(next) else next
  }

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    compact(a ++ b)

  override def finish(buf: Seq[Long]): Seq[Long] = compact(buf)

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] = bufferEncoder
}
