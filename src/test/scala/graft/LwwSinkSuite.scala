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
