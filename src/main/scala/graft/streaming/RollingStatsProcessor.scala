package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming form of `ts_anomaly_zscore`: per-user rolling 24-event
  * frame maintained as keyed state, emitting the rows whose spend sits
  * more than 2σ from their trailing mean.
  *
  * Where the cumvol processors keep a RUNNING total (state = 3 longs),
  * this is the bounded-WINDOW state shape: the ring of the last 24
  * fixed-point (q, q²) pairs per user — O(frame) state per key
  * regardless of stream length, the state discipline every rolling
  * feature needs on an unbounded stream. Arithmetic is identical to
  * the batch query: the |z| > 2 test runs in exact BigInt (the batch
  * side uses DECIMAL(38,0) — both exact, so the flag agrees), the
  * reported mean divides the same exact integers in the same order.
  * Within a micro-batch rows are folded in (ts, event_id) order, the
  * same total order the batch window sorts by; across micro-batches
  * the ring carries the frame over the boundary, which is exactly what
  * StreamingRollingStatsSuite asserts (streamed flags ≡ batch flags on
  * the same prefix).
  */
class RollingStatsProcessor
    extends StatefulProcessor[Long, RollingStatsProcessor.Ev,
      RollingStatsProcessor.Out] {

  import RollingStatsProcessor._

  @transient private var state: ValueState[Ring] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[Ring](
      "roll24", Encoders.product[Ring], TTLConfig.NONE)

  override def handleInputRows(
      userId: Long,
      rows: Iterator[Ev],
      timerValues: TimerValues): Iterator[Out] = {
    val sorted = rows.toSeq.sortBy(e => (e.tsUs, e.eventId))
    val st0 = Option(state.get()) // ONE store read + decode per key
    var qs = st0.map(_.qs).getOrElse(Seq.empty)
    var q2s = st0.map(_.q2s).getOrElse(Seq.empty)
    val out = Seq.newBuilder[Out]
    sorted.foreach { e =>
      qs = (qs :+ e.q).takeRight(Frame)
      q2s = (q2s :+ e.q2).takeRight(Frame)
      val n = qs.size
      val sq = qs.sum
      val sq2 = q2s.sum
      val lhs = BigInt(e.q) * n - BigInt(sq)
      val rhs = (BigInt(sq2) * n * 1000000000L - BigInt(sq) * BigInt(sq)) * 4
      if (lhs * lhs > rhs)
        out += Out(e.eventId, userId, n.toLong, e.value,
          sq.toDouble / (1.0e9 * n))
    }
    state.update(Ring(qs, q2s))
    out.result().iterator
  }
}

object RollingStatsProcessor {
  /** Frame length — must match the batch query's 24-event window. */
  val Frame = 24

  case class Ev(userId: Long, eventId: Long, tsUs: Long, value: Double,
      q: Long, q2: Long)
  case class Ring(qs: Seq[Long], q2s: Seq[Long])
  case class Out(eventId: Long, userId: Long, nFrame: Long, value: Double,
      mean: Double)
}
