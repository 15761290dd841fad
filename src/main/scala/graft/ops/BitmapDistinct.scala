package graft.ops

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator

/** Exact-distinct BITMAP aggregate — the mergeable exact counterpart to
  * the approximate HLL/KMV family (the Kylin/Doris "bitmap" measure
  * shape): per group, a word-packed bitset over the value domain,
  * sharded as (word index = value >> 6) → 64-bit word. Reduce sets one
  * bit; merge ORs word-by-word — associative, commutative, idempotent,
  * so re-aggregation over pre-aggregated partials (the cube/rollup
  * regime HLL serves approximately) stays EXACT.
  *
  * Scale trade, stated honestly: the buffer is O(distinct/64) words —
  * ~64× denser than a value set for dense id domains (the case it is
  * built for: user/doc ids allocated compactly), but still linear in
  * cardinality where HLL is constant. The map-side combine does the
  * heavy lifting: each partition ships its bitmap once per group, not
  * once per row, and a dense id block collapses to one word per 64
  * ids. For sparse/adversarial domains, use the KMV/HLL arms; this op
  * is the exact tier of the same architecture.
  *
  * Determinism: bit-OR over integer words — order-free by
  * construction, no float, no tie-break to pin.
  */
class BitmapDistinct extends Aggregator[Long, Map[Long, Long], Long] {

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(buf: Map[Long, Long], v: Long): Map[Long, Long] = {
    // arithmetic shift floors toward -inf, so negative values shard
    // consistently with the (v & 63) bit index only for v >= 0 —
    // refuse the ambiguity loudly (fixture ids are non-negative)
    require(v >= 0L, s"bitmap distinct: negative value $v")
    val w = v >> 6
    buf.updated(w, buf.getOrElse(w, 0L) | (1L << (v & 63L)))
  }

  override def merge(
      a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
    val (small, big) = if (a.size <= b.size) (a, b) else (b, a)
    small.foldLeft(big) { case (acc, (w, bits)) =>
      acc.updated(w, acc.getOrElse(w, 0L) | bits)
    }
  }

  override def finish(buf: Map[Long, Long]): Long =
    buf.valuesIterator.map(java.lang.Long.bitCount(_).toLong).sum

  override def bufferEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()

  override def outputEncoder: Encoder[Long] =
    org.apache.spark.sql.Encoders.scalaLong
}

object BitmapDistinct {
  /** Column form over a long-typed value column. */
  def apply(value: Column): Column =
    org.apache.spark.sql.functions.udaf(new BitmapDistinct)
      .apply(value)
}
