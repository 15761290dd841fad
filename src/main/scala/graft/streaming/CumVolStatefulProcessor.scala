package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.model.Schemas.{EnrichedTick, Tick}
import graft.streaming.CumVolProcessor.{CumState, TickWm}

/** Spark 4 `transformWithState` form of the cumulative-volume enrichment
  * (SURVEY §2.4 A1+A2 primary plan; [[CumVolProcessor.enrich]] is the
  * `flatMapGroupsWithState` fallback — both share the same per-row
  * arithmetic through [[CumVolProcessor.update]]'s semantics, and the
  * suite asserts output equality).
  *
  * `transformWithState` is the scale-preferred API: it runs on the
  * RocksDB state store (state spills to local disk instead of executor
  * heap — mandatory when key cardinality is large), supports per-state
  * TTL natively ([[TTLConfig]]), and versioned state schemas. State here
  * is one [[CumState]] (three longs) per symbol.
  */
class CumVolStatefulProcessor
    extends StatefulProcessor[String, Tick, EnrichedTick] {

  @transient private var state: ValueState[CumState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[CumState](
      "cumvol", Encoders.product[CumState], TTLConfig.NONE)

  override def handleInputRows(
      symbol: String,
      rows: Iterator[Tick],
      timerValues: TimerValues): Iterator[EnrichedTick] = {
    val st0 = Option(state.get()).getOrElse(CumState(Long.MinValue, 0L, 0L))
    val (st, out) = CumVolStatefulProcessor.fold(st0, rows)
    state.update(st)
    out.iterator
  }
}

/** Event-time variant of [[CumVolStatefulProcessor]]: same arithmetic,
  * plus state expiry through TWS timers — the per-key timer is re-armed
  * at every batch to fire when the watermark passes the session day's
  * end, and `handleExpiredTimer` clears the key's state. This is the
  * TWS-native port of `CumVolProcessor.enrichWithWatermark`'s
  * `EventTimeTimeout` logic, so the RocksDB path (the one a real
  * deployment runs) has the same bounded-state story as the
  * flatMapGroupsWithState fallback. (`TTLConfig` is deliberately NOT
  * used: it is processing-time-based; session expiry here is an
  * event-time contract.)
  */
class CumVolStatefulProcessorWm
    extends StatefulProcessor[String, TickWm, EnrichedTick] {

  @transient private var state: ValueState[CumState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[CumState](
      "cumvol", Encoders.product[CumState], TTLConfig.NONE)

  override def handleInputRows(
      symbol: String,
      rows: Iterator[TickWm],
      timerValues: TimerValues): Iterator[EnrichedTick] = {
    val st0 = Option(state.get()).getOrElse(CumState(Long.MinValue, 0L, 0L))
    val (st, out) = CumVolStatefulProcessor.fold(
      st0, rows.map(t => Tick(t.symbol, t.bid, t.price, t.ask, t.time,
        t.volume, t.tradeType)))
    state.update(st)
    // Single live timer per key: expire once the watermark passes the
    // session day's end (never at-or-before the current watermark, or
    // the timer would be considered already expired).
    getHandle.listTimers().foreach(ts => getHandle.deleteTimer(ts))
    val dayEndMs = (st.day + 1) * 86400L * 1000L
    getHandle.registerTimer(
      math.max(dayEndMs, timerValues.getCurrentWatermarkInMs() + 1))
    out.iterator
  }

  override def handleExpiredTimer(
      symbol: String,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[EnrichedTick] = {
    state.clear()
    Iterator.empty
  }
}

object CumVolStatefulProcessor {

  /** Shared per-batch fold: event-time-ordered rows through the golden
    * per-row arithmetic (see [[CumVolProcessor.update]] for the
    * reference-semantics commentary).
    */
  private[streaming] def fold(
      st0: CumState, rows: Iterator[Tick]): (CumState, Seq[EnrichedTick]) = {
    var st = st0
    val out = rows.toSeq.sortBy(_.time).map { t =>
      val day = Math.floorDiv(t.time, 86400L)
      if (st.day == Long.MinValue || day > st.day)
        st = CumState(day, 0L, 0L)
      st = t.tradeType match {
        case "B" => st.copy(cumbuy = st.cumbuy + t.volume)
        case "S" => st.copy(cumsell = st.cumsell + t.volume)
        case _   => st
      }
      EnrichedTick(t.symbol, t.bid, t.price, t.ask, t.time, t.volume,
        t.tradeType, st.cumbuy, st.cumsell, st.cumbuy - st.cumsell)
    }
    (st, out)
  }

  /** Streaming enrichment on the transformWithState/RocksDB path. */
  def enrich(ticks: Dataset[Tick]): Dataset[EnrichedTick] = {
    import ticks.sparkSession.implicits._
    ticks
      .groupByKey(_.symbol)
      .transformWithState(new CumVolStatefulProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Watermarked TWS enrichment with event-time state expiry (the
    * RocksDB-path equivalent of [[CumVolProcessor.enrichWithWatermark]]).
    */
  def enrichWithWatermark(
      ticks: DataFrame, delay: String): Dataset[EnrichedTick] = {
    import ticks.sparkSession.implicits._
    ticks
      .withColumn("ts", timestamp_seconds(col("time")))
      .withWatermark("ts", delay)
      .as[TickWm]
      .groupByKey(_.symbol)
      .transformWithState(new CumVolStatefulProcessorWm,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
