package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise vector sum over FIXED-POINT (quantized long) vectors:
  * the scale shape for per-group embedding centroids. One buffer of
  * dim longs per group, map-side partials, one shuffle on the group
  * key — the posexplode anchor form instead shuffles (group × dim)
  * rows. Long arithmetic so partial-merge order cannot perturb the
  * result (a double buffer would make the centroid depend on partition
  * order and break the oracle hash).
  */
class VecSumAggregator extends Aggregator[Seq[Long], Seq[Long], Seq[Long]] {

  override def zero: Seq[Long] = Seq.empty

  // Null vectors are SKIPPED, not poison: the typed-aggregator path
  // hands null inputs straight to reduce (no automatic null drop), and
  // a null buffer would NPE the next merge or silently null the whole
  // group's sketch. Callers count contributors with count(vecCol) so
  // the divisor matches what actually summed.
  private def add(a0: Seq[Long], b0: Seq[Long]): Seq[Long] = {
    val a = if (a0 == null) Seq.empty[Long] else a0
    val b = if (b0 == null) Seq.empty[Long] else b0
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      require(a.length == b.length,
        s"ragged vectors: ${a.length} vs ${b.length}")
      val out = new Array[Long](a.length)
      var i = 0
      // addExact, not +: the compact long buffer trades unbounded range
      // for O(dim) state — past ±2^63 per element (≥ ~9e9 rows/group at
      // |q| ≤ 1e9) it must FAIL LOUDLY like the HUGEINT oracle's cast,
      // never wrap into a silently wrong centroid
      while (i < out.length) {
        out(i) = Math.addExact(a(i), b(i)); i += 1
      }
      out.toIndexedSeq
    }
  }

  override def reduce(buf: Seq[Long], v: Seq[Long]): Seq[Long] = add(buf, v)
  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = add(a, b)
  override def finish(buf: Seq[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = bufferEncoder
}
