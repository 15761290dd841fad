package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.sink.LwwSink
import graft.source.EnvelopeSourceProvider
import graft.streaming.Pipelines

/** Restart recovery for the unbounded update-mode aggregation behind
  * `stream_e2e_counts` — completing the restart triangle next to the
  * dedup-key and session-window suites: running totals must CONTINUE
  * from restored state after a checkpointed restart (a state loss would
  * restart the count at the new batch's rows and the LWW sink would
  * happily overwrite with the smaller number — invisible to a final
  * row-set compare against a re-run, so the assertion checks the exact
  * cumulative values).
  */
class StreamingCountsRestartSuite extends SparkSpec {

  private val fmt = classOf[EnvelopeSourceProvider].getName
  private val t0 = 1687176000L

  private def tickLine(time: Long, vol: Int, typ: String) =
    s"""{"topic": "feed", "frameType": "TICK", "payload": {"symbol": "EURUSD", "bid": 1.0, "price": 1.1, "ask": 1.2, "time": $time, "volume": $vol, "type": "$typ"}}"""

  private def write(dir: Path, name: String, lines: String*): Unit =
    Files.write(dir.resolve(name),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))

  test("running totals continue from restored aggregation state") {
    val spool = Files.createTempDirectory("cnt_spool")
    val sink = Files.createTempDirectory("cnt_sink").toString
    val ckpt = Files.createTempDirectory("cnt_ckpt").toString

    def run(): Unit = {
      val env = spark.readStream.format(fmt)
        .option("path", spool.toString).load()
      val agg = Pipelines.parseTicks(env).filter(!col("_corrupt"))
        .groupBy(col("tradeType").as("trade_type"))
        .agg(count(lit(1)).as("n_ticks"),
          sum(col("volume").cast("long")).as("sum_vol"))
      val q = agg.writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          LwwSink.upsertBatch(batch.toDF(), id, sink, "feed", "cnt",
            Seq("trade_type"))
        }.start()
      try q.processAllAvailable() finally q.stop()
    }

    write(spool, "000.jsonl",
      tickLine(t0, 3, "B"), tickLine(t0 + 1, 5, "B"), tickLine(t0 + 2, 2, "S"))
    run()

    write(spool, "001.jsonl",
      tickLine(t0 + 10, 7, "B"), tickLine(t0 + 11, 4, "S"))
    run() // must CONTINUE: B -> (3, 15), S -> (2, 6)

    val rows = LwwSink.read(spark, sink, "feed", "cnt")
      .select("trade_type", "n_ticks", "sum_vol").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows === Set(("B", 3L, 15L), ("S", 2L, 6L)),
      s"totals must include the first incarnation's rows: $rows")
  }
}
