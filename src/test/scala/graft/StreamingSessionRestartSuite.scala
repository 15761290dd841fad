package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.sink.LwwSink
import graft.source.EnvelopeSourceProvider
import graft.streaming.Pipelines

/** Restart recovery for the append-mode session-window aggregation
  * behind `stream_e2e_session`: an OPEN session (not yet past the
  * watermark) must survive a checkpointed restart and MERGE with events
  * arriving in the next incarnation — the failure mode would be a
  * session split in two (state lost) or never emitted (watermark lost).
  * The sentinel-advance mechanics are the same as the registered query.
  */
class StreamingSessionRestartSuite extends SparkSpec {

  private val fmt = classOf[EnvelopeSourceProvider].getName
  private val t0 = 1687176000L

  private def tickLine(sym: String, time: Long) =
    s"""{"topic": "feed", "frameType": "TICK", "payload": {"symbol": "$sym", "bid": 1.0, "price": 1.1, "ask": 1.2, "time": $time, "volume": 1, "type": "B"}}"""

  private def write(dir: Path, name: String, lines: String*): Unit =
    Files.write(dir.resolve(name),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))

  test("open session survives restart and merges cross-incarnation events") {
    val spool = Files.createTempDirectory("sess_spool")
    val sink = Files.createTempDirectory("sess_sink").toString
    val ckpt = Files.createTempDirectory("sess_ckpt").toString

    def run(): Unit = {
      val env = spark.readStream.format(fmt)
        .option("path", spool.toString).load()
      val sess = Pipelines.parseTicks(env).filter(!col("_corrupt"))
        .withColumn("ts", timestamp_seconds(col("time")))
        .withWatermark("ts", "1 day")
        .groupBy(session_window(col("ts"), "30 minutes").as("w"),
          col("symbol"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("symbol"), col("w.start").as("s_start"),
          col("w.end").as("s_end"), col("n_events"))
      val q = sess.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          LwwSink.upsertBatch(batch.filter(col("symbol") =!= "ZZZ").toDF(),
            id, sink, "feed", "sess", Seq("symbol", "s_start"))
        }.start()
      try q.processAllAvailable() finally q.stop()
    }

    // incarnation 1: two events of an open EURUSD session; watermark
    // stays a day behind, so nothing can emit yet
    write(spool, "000.jsonl",
      tickLine("EURUSD", t0), tickLine("EURUSD", t0 + 10))
    run()
    // an absent or still-empty sink table both mean "nothing emitted"
    val n0 = try LwwSink.read(spark, sink, "feed", "sess").count()
      catch { case _: Exception => 0L }
    assert(n0 === 0, "no session may emit before the watermark passes")

    // incarnation 2: a third event INSIDE the same 30-min gap, a second
    // user's session, and the far-future sentinel that flushes state
    write(spool, "001.jsonl",
      tickLine("EURUSD", t0 + 60),
      tickLine("GBPUSD", t0 + 120),
      tickLine("ZZZ", t0 + 3 * 86400))
    run()

    val rows = LwwSink.read(spark, sink, "feed", "sess")
      .select("symbol", "n_events").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows === Set(("EURUSD", 3L), ("GBPUSD", 1L)),
      s"restored session state must merge all three EURUSD events: $rows")
  }
}
