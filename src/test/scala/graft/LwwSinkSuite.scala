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

  test("crash between swap halves never loses a bucket (aside recovery)") {
    val root = Files.createTempDirectory("lww3").toString
    val pk = Seq("symbol", "time", "price")
    LwwSink.upsertBatch(rows(10), 0L, root, "feed", "tick", pk)
    LwwSink.upsertBatch(
      Seq(("EURUSD", 200L, 1.09, 30)).toDF("symbol", "time", "price", "volume"),
      1L, root, "feed", "tick", pk)
    // simulate a crash in the swap window: the bucket dir moved aside,
    // the staged replacement never moved in (the old delete-then-move
    // design left NOTHING recoverable here)
    val table = java.nio.file.Paths.get(LwwSink.tablePath(root, "feed", "tick"))
    import scala.jdk.CollectionConverters._
    val bucket = java.nio.file.Files.list(table).iterator().asScala
      .filter(_.getFileName.toString.startsWith("kb=")).toSeq.head
    java.nio.file.Files.move(bucket, table.resolve(
      "_old_" + bucket.getFileName.toString))
    // the replayed micro-batch must merge against the recovered history,
    // not rebuild the bucket from itself
    LwwSink.upsertBatch(
      Seq(("EURUSD", 200L, 1.09, 30)).toDF("symbol", "time", "price", "volume"),
      1L, root, "feed", "tick", pk)
    val out = LwwSink.read(spark, root, "feed", "tick")
      .collect().map(r => (r.getLong(1), r.getInt(3))).sortBy(_._1)
    assert(out === Seq((100L, 10), (200L, 30)),
      "prior history must survive the crash + replay")
  }

  test("a batch rewrites only the buckets its keys hash into") {
    val root = Files.createTempDirectory("lww4").toString
    val pk = Seq("symbol", "time", "price")
    // many symbols spread the table across buckets
    val wide = (0 until 200)
      .map(i => (s"SYM$i", 100L, 1.0 + i, i))
      .toDF("symbol", "time", "price", "volume")
    LwwSink.upsertBatch(wide, 0L, root, "feed", "tick", pk)
    val table = java.nio.file.Paths.get(LwwSink.tablePath(root, "feed", "tick"))
    import scala.jdk.CollectionConverters._
    def mtimes = java.nio.file.Files.list(table).iterator().asScala
      .filter(_.getFileName.toString.startsWith("kb="))
      .map(p => p.getFileName.toString ->
        java.nio.file.Files.getLastModifiedTime(p).toMillis).toMap
    val before = mtimes
    assert(before.size > 4, "fixture must span several buckets")
    // one-symbol batch: exactly one bucket dir may change
    LwwSink.upsertBatch(
      Seq(("SYM7", 100L, 999.0, 99)).toDF("symbol", "time", "price", "volume"),
      1L, root, "feed", "tick", pk)
    val after = mtimes
    val changed = after.keySet.filter(k => before.get(k) != after.get(k))
    assert(changed.size === 1,
      s"narrow batch must touch one bucket, touched: $changed")
    assert(LwwSink.read(spark, root, "feed", "tick").count() === 201)
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
