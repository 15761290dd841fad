package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.model.Schemas.{EnrichedTick, Tick}
import graft.streaming.CumVolProcessor.CumState

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
    var st = Option(state.get()).getOrElse(CumState(Long.MinValue, 0L, 0L))
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
    state.update(st)
    out.iterator
  }
}

object CumVolStatefulProcessor {

  /** Streaming enrichment on the transformWithState/RocksDB path. */
  def enrich(ticks: Dataset[Tick]): Dataset[EnrichedTick] = {
    import ticks.sparkSession.implicits._
    ticks
      .groupByKey(_.symbol)
      .transformWithState(new CumVolStatefulProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
