package graft.queries

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.ops.LwwDedup
import graft.sink.LwwSink
import graft.streaming.Pipelines

/** The whole streaming path under the DuckDB oracle: spool (JSONL
  * envelopes derived from the `events` fixture) → [[graft.source
  * .EnvelopeSourceProvider]] micro-batch source → [[Pipelines]] book
  * branch (demux → parse → normalize) → [[LwwSink]] keyed upsert →
  * batch read-back. This is the reference's full dataflow
  * (/root/reference/src/main.rs:186-229: SUB socket → route → parse →
  * Cassandra insert) exercised end to end, with the sink's OUTPUT — not
  * an intermediate transform — as the oracle-checked result.
  *
  * Determinism: envelopes are pre-deduped so the sink PK (symbol, time,
  * price) is unique; the LWW outcome is then independent of file→batch
  * grouping and row arrival order, which is what makes a streaming run
  * oracle-checkable at all.
  */
object StreamE2EQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_e2e_sink" -> ((s, dir) => run(s, dir)),
    "stream_e2e_cumvol" -> ((s, dir) => runCumvol(s, dir)))

  /** The STATEFUL path end to end: TICK envelopes → envelope source →
    * parse → keyed cumulative state (A1+A2: per-(symbol, UTC-day)
    * running buy/sell totals) → LWW sink → read-back, against a DuckDB
    * window-function oracle. Determinism rests on THREE legs, each
    * load-bearing: one tick per (symbol, second) (pre-dedup); a
    * symbol's envelopes all in ONE spool file in time order (hash
    * partition by symbol + sort within partitions, preserved through
    * the narrow to_json projection and `repartitionTo = None`), so any
    * admission pacing keeps a symbol's rows inside a single
    * micro-batch; and the processor's stable per-batch time sort.
    * Without the file-locality leg, a maxFilesPerTrigger setting could
    * split a symbol across batches and the per-batch sort could not
    * order rows across the batch boundary.
    */
  private def runCumvol(s: SparkSession, dir: String): DataFrame = {
    val base = LwwDedup(
      Tables(s, dir, "events")
        .filter(col("event_type").isin("purchase", "click"))
        .withColumn("time_s", expr("unix_micros(ts) div 1000000")),
      Seq(col("user_id"), col("time_s")),
      Seq(col("event_id")))
      .repartition(4, col("user_id"))
      .sortWithinPartitions(col("time_s"))
    val lines = base.select(to_json(struct(
      lit("feed").as("topic"),
      lit("TICK").as("frameType"),
      struct(
        col("user_id").cast("string").as("symbol"),
        col("value").as("bid"),
        col("value").as("price"),
        col("value").as("ask"),
        col("time_s").as("time"),
        floor(col("value")).cast("int").as("volume"),
        when(col("event_type") === "purchase", "B").otherwise("S")
          .as("type")).as("payload"))).as("value"))
    val work = Files.createTempDirectory("graft_e2e_cv")
    graft.source.SpoolWriter.deleteAtExit(work)
    val spool = graft.source.SpoolWriter.write(lines, work,
      repartitionTo = None) // preserve per-symbol file locality
    val env = s.readStream
      .format(classOf[graft.source.EnvelopeSourceProvider].getName)
      .option("path", spool).load()
    val sinkRoot = work.resolve("sink").toString
    val qs = Pipelines.start(env, "tick", sinkRoot,
      work.resolve("ckpt").toString)
    try qs.foreach(_.processAllAvailable()) finally qs.foreach(_.stop())
    LwwSink.read(s, sinkRoot, "feed", "tick")
      .select(col("symbol"), col("time").as("time_s"), col("volume"),
        col("tradeType").as("trade_type"),
        col("cumbuy"), col("cumsell"), col("cumdelta"))
  }

  private def run(s: SparkSession, dir: String): DataFrame = {
    // 1. Feed-adapter analog: events → one single-level BOOK envelope
    //    each, PK-unique per (symbol, time-second, price) so LWW output
    //    is order-independent (see scaladoc). `time` is epoch SECONDS —
    //    the reference's ingest unit (Schemas scaladoc, main.rs:109).
    val base = LwwDedup(
      Tables(s, dir, "events")
        .withColumn("time_s", expr("unix_micros(ts) div 1000000")),
      Seq(col("user_id"), col("time_s"), col("value")),
      Seq(col("event_id")))
    val lines = base.select(to_json(struct(
      lit("feed").as("topic"),
      lit("BOOK").as("frameType"),
      array(struct(
        col("user_id").cast("string").as("symbol"),
        col("value").as("price"),
        col("time_s").as("time"),
        floor(col("value")).cast("int").as("volume"),
        concat(lit("BOOK_TYPE_"), upper(col("event_type"))).as("type")))
        .as("payload"))).as("value"))

    // 2. Spool: monotone-named immutable .jsonl files (the source's
    //    writer contract), written distributed then renamed into place.
    val work = Files.createTempDirectory("graft_e2e")
    graft.source.SpoolWriter.deleteAtExit(work)
    val spool = graft.source.SpoolWriter.write(lines, work)

    // 3. Stream spool → book pipeline → LWW sink; drain; read back.
    val env = s.readStream
      .format(classOf[graft.source.EnvelopeSourceProvider].getName)
      .option("path", spool).load()
    val sinkRoot = work.resolve("sink").toString
    val qs = Pipelines.start(env, "book", sinkRoot,
      work.resolve("ckpt").toString)
    try qs.foreach(_.processAllAvailable()) finally qs.foreach(_.stop())
    LwwSink.read(s, sinkRoot, "feed", "book")
      .select(col("symbol"), col("price"), col("time").as("time_s"),
        col("volume"), col("orderType").as("order_type"))
  }

  private val cumvolSide = (m: String) =>
    s"CAST(SUM(CASE WHEN typ = '$m' THEN CAST(floor(value) AS INT) ELSE 0 END) OVER w AS BIGINT)"

  def oracles: Map[String, String] = Map(
    "stream_e2e_cumvol" ->
      s"""WITH base AS (
         |  SELECT * FROM (
         |    SELECT user_id, epoch_us(ts) // 1000000 AS sec, value,
         |      CASE WHEN event_type = 'purchase' THEN 'B' ELSE 'S' END AS typ,
         |      row_number() OVER (PARTITION BY user_id, epoch_us(ts) // 1000000
         |                         ORDER BY event_id DESC) AS rn
         |    FROM events WHERE event_type IN ('purchase', 'click'))
         |  WHERE rn = 1)
         |SELECT CAST(user_id AS VARCHAR) AS symbol,
         |  sec AS time_s,
         |  CAST(floor(value) AS INT) AS volume,
         |  typ AS trade_type,
         |  ${cumvolSide("B")} AS cumbuy,
         |  ${cumvolSide("S")} AS cumsell,
         |  ${cumvolSide("B")} - ${cumvolSide("S")} AS cumdelta
         |FROM base
         |WINDOW w AS (PARTITION BY user_id, sec // 86400
         |             ORDER BY sec
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,

    "stream_e2e_sink" ->
      """SELECT CAST(user_id AS VARCHAR) AS symbol,
        |  value AS price,
        |  epoch_us(ts) // 1000000 AS time_s,
        |  CAST(floor(value) AS INT) AS volume,
        |  upper(event_type) AS order_type
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY user_id, epoch_us(ts) // 1000000, value
        |        ORDER BY event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1""".stripMargin)
}
