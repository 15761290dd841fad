package graft

import java.nio.file.Files

import graft.sink.LwwSink

/** Emulated Cassandra keyed-upsert sink: LWW by PK across micro-batches,
  * idempotent under batch re-delivery (SURVEY §2.5 K4, §2.6).
  */
class LwwSinkSuite extends SparkSpec {
  import spark.implicits._

  private def rows(v: Int*) =
    v.map(i => ("EURUSD", 100L, 1.08, i)).toDF("symbol", "time", "price", "volume")

  test("later batch overwrites same PK; distinct PKs accumulate") {
    val root = Files.createTempDirectory("lww").toString
    val pk = Seq("symbol", "time", "price")
    LwwSink.upsertBatch(rows(10), 0L, root, "feed", "tick", pk)
    LwwSink.upsertBatch(rows(20), 1L, root, "feed", "tick", pk)
    LwwSink.upsertBatch(
      Seq(("EURUSD", 200L, 1.09, 30)).toDF("symbol", "time", "price", "volume"),
      2L, root, "feed", "tick", pk)
    val out = LwwSink.read(spark, root, "feed", "tick")
      .collect().map(r => (r.getLong(1), r.getInt(3))).sortBy(_._1)
    assert(out === Seq((100L, 20), (200L, 30)))
  }

  test("crash between swap halves never loses the table (._old recovery)") {
    val root = Files.createTempDirectory("lww3").toString
    val pk = Seq("symbol", "time", "price")
    LwwSink.upsertBatch(rows(10), 0L, root, "feed", "tick", pk)
    LwwSink.upsertBatch(
      Seq(("EURUSD", 200L, 1.09, 30)).toDF("symbol", "time", "price", "volume"),
      1L, root, "feed", "tick", pk)
    // simulate a crash in the swap window: table moved aside, the new
    // version never moved in (the old delete-then-move design left
    // NOTHING recoverable here)
    val dst = java.nio.file.Paths.get(LwwSink.tablePath(root, "feed", "tick"))
    java.nio.file.Files.move(dst,
      java.nio.file.Paths.get(dst.toString + "._old"))
    // the replayed micro-batch must merge against the recovered history,
    // not rebuild the table from itself
    LwwSink.upsertBatch(
      Seq(("EURUSD", 200L, 1.09, 30)).toDF("symbol", "time", "price", "volume"),
      1L, root, "feed", "tick", pk)
    val out = LwwSink.read(spark, root, "feed", "tick")
      .collect().map(r => (r.getLong(1), r.getInt(3))).sortBy(_._1)
    assert(out === Seq((100L, 10), (200L, 30)),
      "prior history must survive the crash + replay")
  }

  test("re-delivered micro-batch is a no-op (exactly-once per key)") {
    val root = Files.createTempDirectory("lww2").toString
    val pk = Seq("symbol", "time", "price")
    LwwSink.upsertBatch(rows(10), 0L, root, "feed", "tick", pk)
    val once = LwwSink.read(spark, root, "feed", "tick").collect().toSeq
    LwwSink.upsertBatch(rows(10), 0L, root, "feed", "tick", pk) // replay
    val twice = LwwSink.read(spark, root, "feed", "tick").collect().toSeq
    assert(twice === once)
  }
}
