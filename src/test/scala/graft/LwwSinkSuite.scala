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

  test("safeSeg is injective: distinct wire topics never share a table dir") {
    import graft.sink.LwwSink.safeSeg
    // regression: per-char variable-width hex encoded both of these to
    // "%2540" — two topics silently merged into one LWW table
    assert(safeSeg("%40") !== safeSeg("╀"))
    // decode inverts encode ⇒ injective. Decoder: %XX → byte, else the
    // (ASCII) char's byte, then UTF-8.
    def decode(enc: String): String = {
      if (enc == "%EMPTY") return ""
      val bytes = scala.collection.mutable.ArrayBuffer.empty[Byte]
      var i = 0
      while (i < enc.length) {
        if (enc(i) == '%') {
          bytes += Integer.parseInt(enc.substring(i + 1, i + 3), 16).toByte
          i += 3
        } else { bytes += enc(i).toByte; i += 1 }
      }
      new String(bytes.toArray, java.nio.charset.StandardCharsets.UTF_8)
    }
    val probes = Seq("", "%", "%%", "%25", "%2540", "╀", "a/b", "../..",
      "EURUSD", "feed.x-1", "naïve", "日本語", "a\u0000b", "%EMPTY", "😀")
    probes.foreach { s =>
      assert(decode(safeSeg(s)) === s, s"roundtrip failed for ${s.codePoints().toArray.toSeq}")
      assert(!safeSeg(s).contains('/'), s"path separator leaked for $s")
    }
  }

  test("writer fan-out follows the table's pinned bucket count, not the seed") {
    val root = Files.createTempDirectory("lww5").toString
    val pk = Seq("symbol", "time", "price")
    // simulate a table created under an older, smaller bucket count
    val table = java.nio.file.Paths.get(LwwSink.tablePath(root, "feed", "tick"))
    Files.createDirectories(table)
    Files.write(table.resolve("_nbuckets"), "4".getBytes)
    val wide = (0 until 100)
      .map(i => (s"SYM$i", 100L, 1.0 + i, i))
      .toDF("symbol", "time", "price", "volume")
    LwwSink.upsertBatch(wide, 0L, root, "feed", "tick", pk)
    import scala.jdk.CollectionConverters._
    val kbDirs = Files.list(table).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("kb=")).toSeq
    assert(kbDirs.nonEmpty && kbDirs.size <= 4,
      s"kb dirs must respect the pinned count 4, got $kbDirs")
    // and the merge still sees prior versions (no silent PK duplication)
    LwwSink.upsertBatch(wide, 1L, root, "feed", "tick", pk)
    assert(LwwSink.read(spark, root, "feed", "tick").count() === 100)
  }

  test("crash BETWEEN bucket swaps: replay converges per bucket (r8 ask #5)") {
    // The scaladoc admits a mid-upsert crash "can leave SOME buckets
    // merged and others not" — this kills the upsert after the FIRST
    // bucket swap via the fault-injection seam and proves the replayed
    // micro-batch (same batchId, as a checkpointed stream re-delivers
    // it) converges every bucket to the clean run's LWW state:
    // idempotence per bucket, not just per batch.
    val pk = Seq("symbol", "time", "price")
    def batch0 = (0 until 120)
      .map(i => (s"SYM$i", 100L, 1.0 + i, i))
      .toDF("symbol", "time", "price", "volume")
    def batch1 = (0 until 120)
      .map(i => (s"SYM$i", 100L, 1.0 + i, i + 1000)) // rewrite every PK
      .toDF("symbol", "time", "price", "volume")

    val clean = Files.createTempDirectory("lww_clean").toString
    LwwSink.upsertBatch(batch0, 0L, clean, "feed", "tick", pk)
    LwwSink.upsertBatch(batch1, 1L, clean, "feed", "tick", pk)

    val crashed = Files.createTempDirectory("lww_crash").toString
    LwwSink.upsertBatch(batch0, 0L, crashed, "feed", "tick", pk)
    var swapped = 0
    LwwSink.afterBucketSwap = { _ =>
      swapped += 1
      if (swapped == 1) throw new RuntimeException("injected crash")
    }
    try intercept[RuntimeException] {
      LwwSink.upsertBatch(batch1, 1L, crashed, "feed", "tick", pk)
    } finally LwwSink.afterBucketSwap = _ => ()
    assert(swapped === 1, "the crash must land between bucket swaps")
    // partial state is real: the stranded staging dir is still there
    val table = java.nio.file.Paths.get(
      LwwSink.tablePath(crashed, "feed", "tick"))
    import scala.jdk.CollectionConverters._
    def names = Files.list(table).iterator().asScala
      .map(_.getFileName.toString).toSeq
    assert(names.exists(_.startsWith("_tmp_b")), "crash left staging")

    // the checkpointed stream re-delivers the SAME batch
    LwwSink.upsertBatch(batch1, 1L, crashed, "feed", "tick", pk)
    def stateOf(root: String) =
      LwwSink.read(spark, root, "feed", "tick").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .sortBy(t => (t._1, t._2, t._3)).toSeq
    assert(stateOf(crashed) === stateOf(clean),
      "replay must converge the partially-swapped table to the clean state")
    assert(!names.exists(_.startsWith("_old_kb=")), "no aside remnants")
    assert(!names.exists(_.startsWith("_tmp_b")), "staging cleaned up")
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

  test("same-PK rows inside ONE batch elect a row-order-independent winner") {
    // _batch_id is constant within a micro-batch, so the version tuple
    // must extend into the payload columns — otherwise the window tie
    // is broken by shuffle fetch order and a crash replay of the same
    // batch can store a DIFFERENT row than the original run
    val pk = Seq("symbol", "time", "price")
    val dup = Seq(
      ("EURUSD", 100L, 1.08, 5, "BUY"),
      ("EURUSD", 100L, 1.08, 9, "SELL"),
      ("EURUSD", 100L, 1.08, 9, "BUY"))
    def upsert(order: Seq[(String, Long, Double, Int, String)],
        parts: Int): Seq[Any] = {
      val root = Files.createTempDirectory("lww_tie").toString
      val batch = order
        .toDF("symbol", "time", "price", "volume", "orderType")
        .repartition(parts)
      LwwSink.upsertBatch(batch, 0L, root, "feed", "book", pk)
      LwwSink.read(spark, root, "feed", "book").collect()
        .map(_.toSeq).toSeq.flatten
    }
    val a = upsert(dup, 1)
    val b = upsert(dup.reverse, 3)
    assert(a === b, "winner must not depend on row order or partitioning")
    // and the elected winner is the payload-desc maximum: volume 9
    // beats 5, then orderType SELL beats BUY
    assert(a.contains(9) && a.contains("SELL"))
  }
}
