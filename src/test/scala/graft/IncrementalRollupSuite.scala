package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.IncrementalRollup

/** Incremental rollup maintenance: only unseen days are folded in,
  * replay adds nothing, sealed day partitions are never rewritten, and
  * the merged result always equals a direct full aggregate.
  */
class IncrementalRollupSuite extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def events = Tables(spark, sf, "events")

  private def direct = events.groupBy("event_type")
    .agg(count(lit(1)).as("n_events"),
      sum(col("value").cast("decimal(18,2)")).as("sum_value"))

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getDecimal(2).toString)).toMap

  test("maintenance folds only unseen complete days; merged equals direct") {
    val state = Files.createTempDirectory("rollup").toString
    val allDays = events.select(to_date(col("ts")).cast("string").as("d"))
      .distinct().collect().map(_.getString(0)).sorted
    assert(allDays.length >= 3, "fixture must span several days")
    val (oldDays, newDays) = allDays.splitAt(allDays.length - 1)

    // the morning run sees the FULL table, but the newest day is still
    // open (not yet complete) — the watermark must keep it unsealed so
    // its remaining rows are not lost to the seen-day filter forever
    val added1 = IncrementalRollup.update(events, state,
      java.sql.Date.valueOf(oldDays.last))
    assert(added1 === oldDays.toSeq, "open day must stay unsealed")

    // next run: the day has closed; only it gets folded
    val before = dirMtimes(state)
    val added2 = IncrementalRollup.update(events, state,
      java.sql.Date.valueOf(newDays.last))
    assert(added2 === newDays.toSeq, s"must fold exactly the new day, got $added2")
    dirMtimes(state).foreach { case (d, t) =>
      before.get(d).foreach(t0 =>
        assert(t === t0, s"sealed partition $d must not be rewritten"))
    }

    // replay: nothing new
    assert(IncrementalRollup.update(events, state,
      java.sql.Date.valueOf(newDays.last)).isEmpty)

    // the merged rollup answers exactly what a full rescan answers
    assert(asMap(IncrementalRollup.merged(spark, state)) === asMap(direct))
  }

  private def dirMtimes(state: String): Map[String, Long] = {
    val p = java.nio.file.Paths.get(state)
    graft.util.Fs.list(p)
      .filter(_.getFileName.toString.startsWith("day="))
      .map(d => d.getFileName.toString ->
        Files.getLastModifiedTime(d).toMillis).toMap
  }

  test("streaming landing + watermarked maintenance: the two-stage architecture") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val landing = Files.createTempDirectory("landing").toString
    val state = Files.createTempDirectory("rollup3").toString
    val day0 = 1687176000L // 12:00 UTC on day D — mid-day anchor, so
    // +/- a few hours of offset can never cross a day boundary
    val mem = MemoryStream[(Long, String, Double)]
    val q = mem.toDF().toDF("sec", "event_type", "value")
      .select(timestamp_seconds(col("sec")).as("ts"),
        col("event_type"), col("value"))
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("landing_ck").toString)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          // raw micro-batches land day-partitioned and append-only; the
          // rollup NEVER reads a day the watermark hasn't closed
          b.toDF().withColumn("day", to_date(col("ts")).cast("string"))
            .write.mode("append").partitionBy("day").parquet(landing)
      }.start()
    try {
      mem.addData((day0 + 10, "a", 1.5), (day0 + 20, "b", 2.0),
        (day0 + 86400 + 5, "a", 3.0)) // day D+1 begins mid-stream
      q.processAllAvailable()
      // watermark: only D is complete
      val dayD = new java.sql.Date(day0 * 1000L)
      assert(IncrementalRollup.update(
        spark.read.parquet(landing), state, dayD).nonEmpty)
      // more D+1 rows arrive AFTER D+1's first sighting — had D+1 been
      // sealed above, these would have been lost
      mem.addData((day0 + 86400 + 50, "a", 4.0))
      q.processAllAvailable()
      val dayD1 = new java.sql.Date((day0 + 86400) * 1000L)
      assert(IncrementalRollup.update(
        spark.read.parquet(landing), state, dayD1).nonEmpty)
      val merged = IncrementalRollup.merged(spark, state)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDecimal(2).doubleValue())).toMap
      assert(merged === Map("a" -> ((3L, 8.5)), "b" -> ((1L, 2.0))))
    } finally q.stop()
  }

  test("rollup table is one partial row per (day, key)") {
    val state = Files.createTempDirectory("rollup2").toString
    IncrementalRollup.updateAll(events, state)
    val partials = IncrementalRollup.read(spark, state)
    val dupes = partials.groupBy("day", "event_type")
      .count().filter(col("count") > 1).count()
    assert(dupes === 0)
    // and smaller than the raw table (the compression is per-day-per-key
    // cardinality vs row count, so the ratio GROWS with scale — ~6× at
    // this 1000-row fixture, unbounded at 100 TB)
    assert(partials.count() < events.count() / 5)
  }
}
