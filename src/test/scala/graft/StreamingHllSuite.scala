package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Hll

/** Streaming HyperLogLog: the register table IS a streaming
  * aggregation — `groupBy(g, bucket).max(rho)` maintains the sketch
  * incrementally with state bounded at groups × 512 registers however
  * many distinct keys flow past (the unbounded-stream distinct-count
  * shape; an exact streaming COUNT(DISTINCT) would grow state without
  * limit). max is order-insensitive and idempotent, so micro-batch
  * boundaries and replays cannot move a register; the final registers
  * must equal the batch-built sketch over the same data, and therefore
  * so must the estimate.
  */
class StreamingHllSuite extends SparkSpec {
  import spark.implicits._

  test("incremental registers equal the batch sketch; estimate follows") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    // the SHARED op: registers() is select/groupBy/max only, so it is
    // streaming-compatible as-is — the suite certifies the production
    // operator, not a copy of its pipeline
    val q = Hll.registers(input.toDF().toDF("g", "key"),
        col("g"), col("key"))
      .writeStream.format("memory").queryName("shll_out")
      .outputMode("complete").start()
    val batches = Seq(
      (1L to 1400L).map(i => ("a", i)) ++ (1L to 50L).map(i => ("b", i)),
      (600L to 2000L).map(i => ("a", i)), // overlap: dedup is the sketch's job
      (1L to 30L).map(i => ("b", i * 7)))
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val streamed = spark.table("shll_out")

      val all = batches.flatten.toDF("g", "key")
      val batch = Hll.registers(all, col("g"), col("key"))
      val diff = streamed.as("s")
        .join(batch.as("b"), Seq("g", "bucket"), "full_outer")
        .filter($"s.m_j".isNull || $"b.m_j".isNull || $"s.m_j" =!= $"b.m_j")
      assert(diff.count() === 0, "streamed registers must equal batch")

      // state bound and estimate parity
      assert(streamed.count() <= 2L * Hll.M)
      val estS = Hll.estimate(streamed.select($"g", $"bucket", $"m_j"))
        .select($"g", $"est_distinct").as[(String, Double)].collect().toMap
      val estB = Hll.estimate(batch)
        .select($"g", $"est_distinct").as[(String, Double)].collect().toMap
      assert(estS === estB)
      // sanity: group a holds 2000 distinct keys (n ≈ 3.9·m, clear of
      // the 2.5·m small-range threshold) — inside the 3σ band of the
      // raw estimator. Group b (65 keys ≪ m=512 registers) sits in
      // the small-range regime where raw HLL is biased BY DESIGN; the
      // engine ships n_set instead of an inline ln-based correction
      // (transcendental — see Hll.scala), so the test applies linear
      // counting m·ln(m/V) here and pins THAT to the true count.
      assert(math.abs(estS("a") - 2000) / 2000.0 < 0.138)
      val nSetB = streamed.filter($"g" === "b").count().toDouble
      val lc = Hll.M * math.log(Hll.M / (Hll.M - nSetB))
      assert(math.abs(lc - 65) / 65.0 < 0.20,
        s"linear counting gave $lc for 65 true keys")
    } finally q.stop()
  }
}
