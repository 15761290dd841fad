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

  /** The eviction half of the contract — the part that makes dedup
    * state BOUNDED on an unbounded feed (the 100 TB requirement: state
    * ∝ lateness window, never history). Once the watermark passes a
    * key's event time + delay its state is dropped, and a re-send of
    * the same key with a fresh in-horizon event time is admitted
    * AGAIN: the deliberate trade (very-late duplicates resurface;
    * downstream LWW PK sinks absorb them) versus classic
    * dropDuplicates, whose state never expires and grows with every
    * key ever seen.
    */
  test("state evicts past the horizon and an evicted key re-admits") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long, Int)]
    val q = input.toDF().toDF("event_id", "time", "volume")
      .withColumn("ts", timestamp_seconds(col("time")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("sdedup_evict")
      .outputMode("append").start()
    def stateRows: Long = q.recentProgress.reverse
      .find(_.stateOperators.nonEmpty)
      .map(_.stateOperators(0).numRowsTotal).getOrElse(-1L)
    try {
      input.addData((1L, t0, 5))
      q.processAllAvailable()
      assert(stateRows === 1L)
      // a day-later event pushes the watermark far past key 1's
      // horizon; processAllAvailable includes the follow-up batch
      // that applies the new watermark to state
      input.addData((9L, t0 + 86400, 1))
      q.processAllAvailable()
      assert(stateRows === 1L,
        "key 1's dedup state must be evicted (bounded state), " +
          "only key 9 live")
      // same event_id, fresh in-horizon time: no state left to match
      // — admitted and emitted a second time
      input.addData((1L, t0 + 86400 + 10, 5))
      q.processAllAvailable()
      val ids = spark.table("sdedup_evict")
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(ids === Seq(1L, 1L, 9L),
        s"evicted key must re-admit (got $ids)")
    } finally q.stop()
  }
}
