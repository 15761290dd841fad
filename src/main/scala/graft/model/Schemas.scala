package graft.model

import org.apache.spark.sql.types._

/** Typed records and explicit schemas for the reference's two row shapes and
  * the 3-frame ZeroMQ envelope.
  *
  * Reference: `BookData` /root/reference/src/main.rs:40-48, `TickData`
  * main.rs:50-60, envelope main.rs:220-222. Schemas are explicit
  * (`StructType`), never inferred — the strict analog of the reference's
  * compiled serde structs (unknown JSON fields ignored, missing/mistyped
  * fields null out and are routed to a dead-letter branch, vs the
  * reference's log-and-drop at main.rs:224-229).
  *
  * Time quirk (SURVEY §1.4.1): ingest `time` is epoch **seconds** (the unit
  * the reference's own day-bucketing uses, main.rs:109); we store a correct
  * TimestampType, diverging from the reference's buggy on-disk values.
  */
object Schemas {

  /** One 3-frame ZMQ multipart message (main.rs:220-222). */
  case class Envelope(topic: String, frameType: String, payload: String)

  /** One L2 ladder level; a BOOK payload is a JSON array of these
    * (main.rs:40-48, 77). `orderType` arrives as JSON key `type`
    * (serde rename main.rs:46-47).
    */
  case class BookLevel(
      symbol: String,
      price: Double,
      time: Long, // epoch seconds
      volume: Int,
      orderType: String)

  /** One trade tick; a TICK payload is a single JSON object
    * (main.rs:50-60, 107). `tradeType` arrives as JSON key `type`
    * (serde rename main.rs:58-59); "B"/"S" drive the cumulative
    * counters, anything else passes through (main.rs:124-128).
    */
  case class Tick(
      symbol: String,
      bid: Double,
      price: Double,
      ask: Double,
      time: Long, // epoch seconds
      volume: Int,
      tradeType: String)

  /** Tick enriched with the per-(symbol, UTC day) running totals
    * (main.rs:122-130).
    */
  case class EnrichedTick(
      symbol: String,
      bid: Double,
      price: Double,
      ask: Double,
      time: Long,
      volume: Int,
      tradeType: String,
      cumbuy: Long,
      cumsell: Long,
      cumdelta: Long)

  val envelopeSchema: StructType = StructType(Seq(
    StructField("topic", StringType),
    StructField("frameType", StringType),
    StructField("payload", StringType)))

  /** DOC-frame payload: a document riding the same envelope wire the
    * market frames use (stream_e2e_neardup ingests the corpus this way).
    */
  val docJsonSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** JSON-side field names (pre-rename): `type`, not `orderType`. */
  val bookJsonSchema: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("price", DoubleType),
    StructField("time", LongType),
    StructField("volume", IntegerType),
    StructField("type", StringType)))

  val tickJsonSchema: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("bid", DoubleType),
    StructField("price", DoubleType),
    StructField("ask", DoubleType),
    StructField("time", LongType),
    StructField("volume", IntegerType),
    StructField("type", StringType)))
}
