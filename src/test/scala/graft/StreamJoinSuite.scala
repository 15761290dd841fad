package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.model.Schemas
import graft.streaming.StreamJoins

/** Watermarked stream-stream interval join: per-symbol matching within
  * the lag window, cross-symbol and out-of-window exclusion, and state
  * bounded by the watermark + range condition (append mode accepts the
  * join — Spark rejects unbounded stream-stream joins there).
  */
class StreamJoinSuite extends SparkSpec {
  import spark.implicits._

  private val t0 = 1687176000L

  test("ticks match same-symbol book rows within the lag window only") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ticks = MemoryStream[Schemas.Tick]
    val books = MemoryStream[Schemas.BookLevel]
    val joined = StreamJoins.tickWithRecentBook(
      ticks.toDF(), books.toDF(), lagSeconds = 60)
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      books.addData(
        Schemas.BookLevel("EURUSD", 1.08, t0 - 10, 9, "BUY"),   // in window
        Schemas.BookLevel("EURUSD", 1.07, t0 - 90, 8, "SELL"),  // too old
        Schemas.BookLevel("GBPUSD", 2.08, t0 - 5, 7, "BUY"))    // other symbol
      ticks.addData(
        Schemas.Tick("EURUSD", 1.0, 1.1, 1.2, t0, 3, "B"))
      q.processAllAvailable()
      val out = spark.table("ssj_out")
        .select("symbol", "tick_time", "book_time", "book_price", "orderType")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getString(4)))
      assert(out.toSeq === Seq(("EURUSD", t0, t0 - 10, 1.08, "BUY")),
        "exactly the in-window same-symbol book row joins")
    } finally q.stop()
  }

  test("stream-static join: ticks enrich from a broadcast dimension") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions._
    val dim = Seq(("EURUSD", "FX", 5), ("GBPUSD", "FX", 5))
      .toDF("symbol", "asset_class", "digits")
    val ticks = MemoryStream[Schemas.Tick]
    // static side broadcast: every micro-batch joins map-side, the
    // stream never shuffles and no state store is involved
    val q = ticks.toDF()
      .join(broadcast(dim), Seq("symbol"), "left")
      .writeStream.format("memory").queryName("ss_static")
      .outputMode("append").start()
    try {
      ticks.addData(
        Schemas.Tick("EURUSD", 1.0, 1.1, 1.2, t0, 3, "B"),
        Schemas.Tick("XAUUSD", 1.0, 2000.0, 1.2, t0, 1, "B")) // no dim row
      q.processAllAvailable()
      val out = spark.table("ss_static")
        .select("symbol", "asset_class")
        .collect().map(r => (r.getString(0), Option(r.getString(1))))
        .sortBy(_._1)
      assert(out.toSeq === Seq(
        ("EURUSD", Some("FX")),
        ("XAUUSD", None)), "left join keeps unmatched stream rows")
      assert(q.lastProgress.stateOperators.isEmpty,
        "stream-static join must not allocate a state store")
    } finally q.stop()
  }

  test("streaming session windows: gap-based sessions close at the watermark") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions._
    val ticks = MemoryStream[Schemas.Tick]
    // per-symbol sessions with a 30s inactivity gap; append mode only
    // emits a session once the watermark passes its close — bounded
    // state, the streaming form of the batch agg_session_window query
    val q = ticks.toDF()
      .withColumn("ts", timestamp_seconds(col("time")))
      .withWatermark("ts", "10 seconds")
      .groupBy(col("symbol"), session_window(col("ts"), "30 seconds"))
      .agg(sum(col("volume")).as("vol"), count(lit(1)).as("n"))
      .select(col("symbol"),
        unix_timestamp(col("session_window.start")).as("start_s"),
        col("vol"), col("n"))
      .writeStream.format("memory").queryName("ss_sess")
      .outputMode("append").start()
    try {
      // session 1: two ticks 20s apart (same session, gap < 30s)
      ticks.addData(
        Schemas.Tick("EURUSD", 1.0, 1.1, 1.2, t0, 3, "B"),
        Schemas.Tick("EURUSD", 1.0, 1.1, 1.2, t0 + 20, 5, "B"))
      q.processAllAvailable()
      // 2min later: new session, and its arrival advances the watermark
      // past session 1's close so session 1 is emitted
      ticks.addData(Schemas.Tick("EURUSD", 1.0, 1.1, 1.2, t0 + 120, 7, "S"))
      q.processAllAvailable()
      val out = spark.table("ss_sess")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
      assert(out.toSeq === Seq(("EURUSD", t0, 8L, 2L)),
        "the closed session merges both ticks; the open one stays buffered")
    } finally q.stop()
  }

  test("a tick matches multiple in-window book rows (interval, not as-of)") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ticks = MemoryStream[Schemas.Tick]
    val books = MemoryStream[Schemas.BookLevel]
    val q = StreamJoins.tickWithRecentBook(
        ticks.toDF(), books.toDF(), lagSeconds = 60)
      .writeStream.format("memory").queryName("ssj_multi")
      .outputMode("append").start()
    try {
      books.addData(
        Schemas.BookLevel("EURUSD", 1.08, t0 - 10, 9, "BUY"),
        Schemas.BookLevel("EURUSD", 1.09, t0 - 20, 5, "SELL"))
      ticks.addData(Schemas.Tick("EURUSD", 1.0, 1.1, 1.2, t0, 3, "B"))
      q.processAllAvailable()
      val prices = spark.table("ssj_multi")
        .select("book_price").collect().map(_.getDouble(0)).sorted
      assert(prices.toSeq === Seq(1.08, 1.09))
      // the join runs with state-eviction bounds on both sides: the
      // planner only admits append-mode stream-stream joins whose
      // buffers it can prove bounded (watermark + closed time range)
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.nonEmpty)
    } finally q.stop()
  }
}
