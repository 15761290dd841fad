package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins with bounded state: correlate each TICK with the
  * BOOK activity observed for the same symbol in the preceding
  * `lagSeconds` of event time — one output row per (tick, book-row)
  * pair, INNER semantics: a tick with no book activity in its window is
  * absent from the output (this is a correlation join, not a left
  * enrichment; consumers counting ticks must count the tick stream, not
  * this join — the pinned stream_e2e_join oracle mirrors the inner
  * form; `leftOuter` with the same watermarks would be the
  * null-padding variant). The reference cannot express this at all
  * — its two pipelines share nothing but Cassandra, so correlating a
  * trade with the quote ladder around it is an offline job there
  * (/root/reference/src/main.rs:95-130: independent BOOK and TICK
  * paths). Here it is one declarative join.
  *
  * State bounding is the part that matters at scale: BOTH inputs carry
  * event-time watermarks and the join predicate is a closed time range
  * (`t_ts - lag ≤ b_ts ≤ t_ts`), so Spark derives an eviction bound for
  * each side's buffer — book rows age out once the watermark passes
  * `b_ts + lag`, tick rows once it passes `t_ts`. Without the range
  * bound a stream-stream join must buffer FOREVER (the planner rejects
  * it in append mode); with it, state is O(rate × lag) per symbol
  * partition regardless of how long the job runs.
  */
object StreamJoins {

  /** @param ticks parsed tick rows (symbol, time epoch-seconds, price,
    *              volume, tradeType — [[graft.model.Schemas.Tick]] shape)
    * @param books parsed book levels (symbol, time, price, volume,
    *              orderType — [[graft.model.Schemas.BookLevel]] shape)
    */
  def tickWithRecentBook(
      ticks: DataFrame,
      books: DataFrame,
      lagSeconds: Int = 60,
      delayThreshold: String = "30 seconds"): DataFrame = {
    val t = ticks
      .withColumn("t_ts", timestamp_seconds(col("time")))
      .withWatermark("t_ts", delayThreshold)
      .select(col("symbol"), col("t_ts"),
        col("price").as("tick_price"),
        col("volume").as("tick_volume"),
        col("tradeType"))
    val b = books
      .withColumn("b_ts", timestamp_seconds(col("time")))
      .withWatermark("b_ts", delayThreshold)
      .select(col("symbol").as("b_symbol"), col("b_ts"),
        col("price").as("book_price"),
        col("volume").as("book_volume"),
        col("orderType"))
    t.join(b, expr(
      s"""symbol = b_symbol
         |AND b_ts >= t_ts - INTERVAL $lagSeconds SECONDS
         |AND b_ts <= t_ts""".stripMargin))
      .select(col("symbol"),
        unix_timestamp(col("t_ts")).as("tick_time"),
        col("tick_price"), col("tick_volume"), col("tradeType"),
        unix_timestamp(col("b_ts")).as("book_time"),
        col("book_price"), col("book_volume"), col("orderType"))
  }
}
