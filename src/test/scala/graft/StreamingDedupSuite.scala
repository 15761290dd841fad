package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming exactly-once event dedup with bounded state:
  * dropDuplicatesWithinWatermark keeps one row per key while expiring
  * dedup state once the watermark passes — the streaming complement of
  * the sink-side LWW dedup (state does not grow with the full history,
  * only with the lateness window).
  */
class StreamingDedupSuite extends SparkSpec {
  import spark.implicits._

  private val t0 = 1687176000L

  test("duplicate event ids within the watermark window emit once") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long, Int)] // (event_id, time, volume)
    val q = input.toDF().toDF("event_id", "time", "volume")
      .withColumn("ts", timestamp_seconds(col("time")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("sdedup_out")
      .outputMode("append").start()
    try {
      input.addData((1L, t0, 5), (1L, t0 + 1, 5)) // dup in same batch
      q.processAllAvailable()
      input.addData((1L, t0 + 2, 5), (2L, t0 + 3, 7)) // dup across batches
      q.processAllAvailable()
      val out = spark.table("sdedup_out")
        .select("event_id").collect().map(_.getLong(0)).sorted
      assert(out.toSeq === Seq(1L, 2L),
        "each event id must be emitted exactly once within the watermark")
    } finally q.stop()
  }
}
