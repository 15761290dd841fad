package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.streaming.TopKProcessor.{TickIn, TopItem, TopKRow, TopKState}

/** Streaming top-k maintenance — the bounded-priority state shape the
  * e2e family was missing (running totals, a fixed ring, a last-value
  * pair, a dedup key set, session windows, and unbounded counts are
  * all covered; a leaderboard is none of them): per symbol, the k
  * highest (price, time) ticks seen so far, k rows of state per key
  * FOREVER — O(symbols · k), the state analog of the batch
  * TakeOrdered discipline (sort_topk), never a growing buffer.
  *
  * Determinism is structural, not ordering-based: the merge
  * (state ∪ batch → sort → take k) is a monotone set fold, so ANY
  * arrival order and ANY file→batch grouping reach the same final
  * state; the (price DESC, time ASC) order is total because the input
  * is pre-deduped to one tick per (symbol, second). Every batch emits
  * the key's FULL current top-k (replay-idempotent), so the LWW sink
  * keyed (symbol, rank) converges to the global leaderboard — a
  * partial emission ("only changed ranks") would be fragile against
  * replay and buys nothing at k=5.
  */
class TopKProcessor(k: Int)
    extends StatefulProcessor[String, TickIn, TopKRow] {

  @transient private var state: ValueState[TopKState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[TopKState](
      "topk", Encoders.product[TopKState], TTLConfig.NONE)

  override def handleInputRows(
      symbol: String,
      rows: Iterator[TickIn],
      timerValues: TimerValues): Iterator[TopKRow] = {
    val cur = Option(state.get()).map(_.items).getOrElse(Nil)
    // distinct makes the documented SET fold literally true: a
    // redelivered tick (a caller without the dedup pre-pass, or a
    // source replaying without state rollback) must not occupy two
    // ranks and evict a real entry
    val merged = (cur ++ rows.map(e => TopItem(e.price, e.time)))
      .distinct.sortBy(i => (-i.price, i.time)).take(k).toList
    state.update(TopKState(merged))
    merged.iterator.zipWithIndex.map { case (it, i) =>
      TopKRow(symbol, i + 1, it.price, it.time)
    }
  }
}

object TopKProcessor {

  case class TickIn(symbol: String, time: Long, price: Double)

  case class TopItem(price: Double, time: Long)

  /** The k state rows per symbol, kept in rank order. */
  case class TopKState(items: List[TopItem])

  /** One leaderboard row: rank 1 = highest price. */
  case class TopKRow(symbol: String, rank: Int, price: Double, time: Long)
}
