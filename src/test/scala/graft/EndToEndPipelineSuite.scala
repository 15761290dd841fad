package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.sink.LwwSink
import graft.source.EnvelopeSourceProvider
import graft.streaming.Pipelines

/** The reference's `full` pipeline end to end on engine machinery only:
  * DSv2 spool source → demux/route → parse → stateful enrichment →
  * foreachBatch LWW upsert sink, across multiple micro-batches —
  * the Spark-native form of /root/reference/src/main.rs:219-230's loop
  * with durable state and exactly-once-per-key delivery.
  */
class EndToEndPipelineSuite extends SparkSpec {

  private val fmt = classOf[EnvelopeSourceProvider].getName
  private val t0 = 1687176000L

  private def tickLine(sym: String, time: Long, vol: Int, typ: String) =
    s"""{"topic": "feed", "frameType": "TICK", "payload": {"symbol": "$sym", "bid": 1.0, "price": ${1.1 + vol / 100.0}, "ask": 1.2, "time": $time, "volume": $vol, "type": "$typ"}}"""

  private def write(dir: Path, name: String, lines: String*): Unit =
    Files.write(dir.resolve(name),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))

  test("source -> enrich -> LWW sink across micro-batches") {
    val spool = Files.createTempDirectory("e2e_spool")
    val sinkRoot = Files.createTempDirectory("e2e_sink").toString
    val pk = Seq("symbol", "time", "price")

    write(spool, "000.jsonl",
      tickLine("EURUSD", t0, 3, "B"),
      tickLine("EURUSD", t0 + 1, 5, "S"))

    val stream = spark.readStream.format(fmt)
      .option("path", spool.toString).load()
    val q = Pipelines.tickPipeline(stream)
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[_], id: Long) =>
        LwwSink.upsertBatch(batch.toDF(), id, sinkRoot, "feed", "tick", pk)
      }
      .start()
    try {
      q.processAllAvailable()
      write(spool, "001.jsonl", tickLine("EURUSD", t0 + 2, 7, "B"))
      q.processAllAvailable()

      val table = LwwSink.read(spark, sinkRoot, "feed", "tick")
      val rows = table
        .select("time", "cumbuy", "cumsell", "cumdelta")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).sortBy(_._1)
      assert(rows === Seq(
        (t0, 3L, 0L, 3L),
        (t0 + 1, 3L, 5L, -2L),
        (t0 + 2, 10L, 5L, 5L))) // state carried into batch 2; same-day sums

      // sink layout: one row per PK even though upserts arrived in
      // two separate merges (LWW semantics end-to-end)
      assert(table.groupBy("symbol", "time", "price").count()
        .filter(col("count") > 1).count() === 0)
    } finally q.stop()
  }
}
