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
    // indexed circular buffer + running sums: O(1) per event — the
    // evicted element is subtracted, the new one added (ADVICE r4; the
    // Seq-append form re-summed the whole frame per event). The
    // persisted Ring stays oldest→newest, so the state format is
    // unchanged across the rewrite.
    val qs = new Array[Long](Frame)
    val q2s = new Array[Long](Frame)
    var n = 0 // filled size; head (next write, = oldest when full)
    var head = 0
    var sq = 0L
    var sq2 = 0L
    st0.foreach { r =>
      r.qs.copyToArray(qs)
      r.q2s.copyToArray(q2s)
      n = r.qs.size
      head = n % Frame
      sq = r.qs.sum // once per batch, not per event
      sq2 = r.q2s.sum
    }
    val out = Seq.newBuilder[Out]
    sorted.foreach { e =>
      if (n == Frame) { sq -= qs(head); sq2 -= q2s(head) } else n += 1
      qs(head) = e.q
      q2s(head) = e.q2
      head = (head + 1) % Frame
      sq += e.q
      sq2 += e.q2
      val lhs = BigInt(e.q) * n - BigInt(sq)
      val rhs = (BigInt(sq2) * n * 1000000000L - BigInt(sq) * BigInt(sq)) * 4
      if (lhs * lhs > rhs)
        out += Out(e.eventId, userId, n.toLong, e.value,
          sq.toDouble / (1.0e9 * n))
    }
    // re-serialize oldest→newest (when full, the oldest sits at head)
    val ordered =
      if (n < Frame) (0 until n)
      else (0 until Frame).map(i => (head + i) % Frame)
    state.update(Ring(ordered.map(qs), ordered.map(q2s)))
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
