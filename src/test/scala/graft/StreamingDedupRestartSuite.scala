package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.sink.LwwSink
import graft.source.EnvelopeSourceProvider
import graft.streaming.Pipelines

/** Restart recovery for the watermarked `dropDuplicates` operator behind
  * `stream_e2e_dedup`: the dedup key store must survive a checkpointed
  * restart, so a duplicate arriving in the SECOND incarnation of the
  * query is still suppressed — and new keys still pass. Without restored
  * state the duplicate would re-emit and the LWW sink would hide it
  * (same PK), so the assertion counts SINK WRITES via distinct batch
  * outcomes, not just final rows: the restarted query's batch must
  * contain only the genuinely-new key.
  */
class StreamingDedupRestartSuite extends SparkSpec {

  private val fmt = classOf[EnvelopeSourceProvider].getName
  private val t0 = 1687176000L

  private def tickLine(sym: String, time: Long, vol: Int) =
    s"""{"topic": "feed", "frameType": "TICK", "payload": {"symbol": "$sym", "bid": 1.0, "price": 1.1, "ask": 1.2, "time": $time, "volume": $vol, "type": "B"}}"""

  private def write(dir: Path, name: String, lines: String*): Unit =
    Files.write(dir.resolve(name),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))

  test("dedup state survives restart: old key suppressed, new key passes") {
    val spool = Files.createTempDirectory("dd_spool")
    val sink = Files.createTempDirectory("dd_sink").toString
    val ckpt = Files.createTempDirectory("dd_ckpt").toString
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()

    def run(): Unit = {
      val env = spark.readStream.format(fmt)
        .option("path", spool.toString).load()
      val dedup = Pipelines.parseTicks(env).filter(!col("_corrupt"))
        .withColumn("ts", timestamp_seconds(col("time")))
        .withWatermark("ts", "1 day")
        .dropDuplicates("symbol", "ts")
      val q = dedup.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          batch.select("symbol", "time").collect()
            .foreach(r => emitted.add((r.getString(0), r.getLong(1))))
          LwwSink.upsertBatch(
            batch.select(col("symbol"), col("time"), col("volume")).toDF(),
            id, sink, "feed", "dd", Seq("symbol", "time"))
        }.start()
      try q.processAllAvailable() finally q.stop()
    }

    write(spool, "000.jsonl",
      tickLine("EURUSD", t0, 3),
      tickLine("EURUSD", t0, 7)) // in-batch duplicate
    run()

    write(spool, "001.jsonl",
      tickLine("EURUSD", t0, 9),      // cross-restart duplicate
      tickLine("GBPUSD", t0 + 5, 4))  // genuinely new key
    run()

    // across both incarnations exactly two keys were ever emitted
    import scala.jdk.CollectionConverters._
    val keys = emitted.asScala.toSeq
    assert(keys.count(_ == ("EURUSD", t0)) === 1,
      s"duplicate re-emitted after restart: $keys")
    assert(keys.count(_ == ("GBPUSD", t0 + 5)) === 1, s"new key lost: $keys")
    assert(keys.size === 2, s"unexpected emissions: $keys")

    val rows = LwwSink.read(spark, sink, "feed", "dd")
      .select("symbol", "time").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows === Set(("EURUSD", t0), ("GBPUSD", t0 + 5)))
  }
}
