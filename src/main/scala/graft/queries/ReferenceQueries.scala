package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.ops.CumVol

/** Batch analogs of the reference pipeline's operators over the `events`
  * fixture table (FIXTURES.md §B.1 mapping: user_id -> symbol, ts -> time,
  * floor(value) -> volume, event_type -> trade side with 'purchase' = buy,
  * 'click' = sell, everything else passthrough).
  */
object ReferenceQueries extends QueryPack {

  /** Shared prelude: events projected into tick shape. */
  private def ticks(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .withColumn("symbol", col("user_id").cast("string"))
      .withColumn("volume", floor(col("value")).cast("int"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1+A2+F5+F6+R4: per-(symbol, UTC day) running cumulative buy/sell
    // volume with delta, emitted per input row (main.rs:107-130).
    "tick_cumvol" -> ((s, dir) => {
      CumVol(ticks(s, dir), col("user_id"), col("ts"), col("event_id"),
          col("event_type"), col("volume"), buyMark = "purchase", sellMark = "click")
        .select(
          col("symbol"),
          to_date(col("ts")).as("day"),
          unix_micros(col("ts")).as("time_us"),
          col("event_type"),
          col("volume"),
          col("cumbuy"), col("cumsell"), col("cumdelta"))
    })
  )

  private val volumeSql = "CAST(floor(value) AS INT)"
  private def sideSumSql(mark: String) =
    s"CAST(SUM(CASE WHEN event_type = '$mark' THEN $volumeSql ELSE 0 END) OVER w AS BIGINT)"

  def oracles: Map[String, String] = Map(
    "tick_cumvol" ->
      s"""SELECT CAST(user_id AS VARCHAR) AS symbol,
         |  CAST(ts AS DATE) AS day,
         |  epoch_us(ts) AS time_us,
         |  event_type,
         |  $volumeSql AS volume,
         |  ${sideSumSql("purchase")} AS cumbuy,
         |  ${sideSumSql("click")} AS cumsell,
         |  ${sideSumSql("purchase")} - ${sideSumSql("click")} AS cumdelta
         |FROM events
         |WINDOW w AS (PARTITION BY user_id, CAST(ts AS DATE)
         |             ORDER BY ts, event_id
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin
  )
}
