package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.model.Schemas
import graft.sink.LwwSink
import graft.streaming.SaltedCumVolBatch

/** The hot-key-safe streaming cumvol path ([[SaltedCumVolBatch]]):
  * equivalence with the batch window form on an adversarial
  * 90%-one-key feed across micro-batches, day-rollover carry reset,
  * idempotent replay of a micro-batch (the crash-recovery contract),
  * and carry-state version pruning.
  */
class StreamingCumVolSaltedSuite extends SparkSpec {
  import spark.implicits._

  private val t0 = 1687176000L // 2023-06-19 12:00 UTC

  private def tickJson(sym: String, time: Long, vol: Int, typ: String) =
    s"""{"symbol": "$sym", "bid": 1.0, "price": 1.1, "ask": 1.2,
       | "time": $time, "volume": $vol, "type": "$typ"}""".stripMargin
  private def env(sym: String, time: Long, vol: Int, typ: String) =
    Schemas.Envelope("feed", "TICK", tickJson(sym, time, vol, typ))

  private def sinkRows(root: String, kind: String = "tick_salted") =
    LwwSink.read(spark, root, "feed", kind)
      .select("symbol", "time", "cumbuy", "cumsell", "cumdelta")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(r => (r._1, r._2)).toSeq

  test("salted streaming == batch window form on a 90%-one-key feed " +
      "across micro-batches and day rollovers") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rng = new scala.util.Random(11)
    // 90% of rows on one symbol, times strictly increasing (unique PK,
    // non-decreasing days — the documented feed contract), spanning
    // ~2.8 UTC days so carry resets fire mid-stream
    val all = (0 until 600).map { i =>
      val sym = if (rng.nextInt(10) < 9) "HOT" else s"C${rng.nextInt(5)}"
      (sym, t0 + i * 400L, rng.nextInt(50) + 1, Seq("B", "S", "X")(rng.nextInt(3)))
    }
    val work = Files.createTempDirectory("graft_salted_cv")
    graft.source.SpoolWriter.deleteAtExit(work)
    val sinkRoot = work.resolve("sink").toString
    val input = MemoryStream[Schemas.Envelope]
    val q = SaltedCumVolBatch.start(input.toDF(), sinkRoot,
      work.resolve("ckpt").toString, work.resolve("state").toString,
      numBuckets = 5)
    try {
      // three genuine micro-batches so the carry table does real work
      all.grouped(200).foreach { chunk =>
        input.addData(chunk.map { case (s, t, v, ty) => env(s, t, v, ty) })
        q.processAllAvailable()
      }
    } finally q.stop()
    val batch = graft.ops.CumVol(
        all.map { case (s, t, v, ty) =>
          Schemas.Tick(s, 1.0, 1.1, 1.2, t, v, ty) }.toDF(),
        col("symbol"), timestamp_seconds(col("time")), col("time"),
        col("tradeType"), col("volume"))
      .select("symbol", "time", "cumbuy", "cumsell", "cumdelta")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(r => (r._1, r._2)).toSeq
    assert(sinkRows(sinkRoot) === batch)
  }

  private def ticksDf(rows: (String, Long, Int, String)*) =
    rows.map { case (s, t, v, ty) =>
      Schemas.Tick(s, 1.0, 1.1, 1.2, t, v, ty) }.toDF()

  test("replaying a micro-batch is idempotent: same sink rows, same carry") {
    val work = Files.createTempDirectory("graft_salted_replay")
    graft.source.SpoolWriter.deleteAtExit(work)
    val (sink, state) =
      (work.resolve("sink").toString, work.resolve("state").toString)
    def run(id: Long, df: org.apache.spark.sql.DataFrame): Unit =
      SaltedCumVolBatch.processBatch(df, id, sink, state, "feed",
        "tick_salted", 4)
    val b0 = ticksDf(("HOT", t0, 5, "B"), ("HOT", t0 + 1, 3, "S"))
    val b1 = ticksDf(("HOT", t0 + 2, 7, "B"), ("C1", t0 + 3, 2, "B"))
    run(0, b0)
    run(1, b1)
    val before = sinkRows(sink)
    // carry continuity: batch 1's HOT row sees batch 0's totals
    assert(before.contains(("HOT", t0 + 2, 12L, 3L, 9L)))
    val stateBefore = SaltedCumVolBatch.readState(spark, state, 2L)
      .collect().map(_.toString).sorted.toSeq
    run(1, b1) // crash-recovery replay of the SAME batch id
    assert(sinkRows(sink) === before)
    assert(SaltedCumVolBatch.readState(spark, state, 2L)
      .collect().map(_.toString).sorted.toSeq === stateBefore)
  }

  test("carry survives a checkpointed RESTART: second incarnation " +
      "continues totals from the state table") {
    val spool = Files.createTempDirectory("salted_restart_spool")
    val work = Files.createTempDirectory("salted_restart_work")
    graft.source.SpoolWriter.deleteAtExit(spool)
    graft.source.SpoolWriter.deleteAtExit(work)
    val sinkRoot = work.resolve("sink").toString
    def envLine(sym: String, time: Long, vol: Int, typ: String) =
      s"""{"topic": "feed", "frameType": "TICK", "payload": ${tickJson(
        sym, time, vol, typ).replace("\n", "")}}"""
    def write(name: String, lines: String*): Unit =
      Files.write(spool.resolve(name),
        lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    def run(): Unit = {
      val env = spark.readStream
        .format(classOf[graft.source.EnvelopeSourceProvider].getName)
        .option("path", spool.toString).load()
      val q = SaltedCumVolBatch.start(env, sinkRoot,
        work.resolve("ckpt").toString, work.resolve("state").toString,
        numBuckets = 4)
      try q.processAllAvailable() finally q.stop()
    }
    write("0000000000.jsonl",
      envLine("HOT", t0, 5, "B"), envLine("HOT", t0 + 1, 3, "S"))
    run() // incarnation 1 drains the first file, then stops
    write("0000000001.jsonl", envLine("HOT", t0 + 2, 7, "B"))
    run() // incarnation 2: fresh query objects, same ckpt + state
    // the second incarnation's row must continue from (5, 3), not 0
    assert(sinkRows(sinkRoot).contains(("HOT", t0 + 2, 12L, 3L, 9L)))
  }

  test("carry resets on day rollover across batches; old versions pruned") {
    val work = Files.createTempDirectory("graft_salted_roll")
    graft.source.SpoolWriter.deleteAtExit(work)
    val (sink, state) =
      (work.resolve("sink").toString, work.resolve("state").toString)
    def run(id: Long, df: org.apache.spark.sql.DataFrame): Unit =
      SaltedCumVolBatch.processBatch(df, id, sink, state, "feed",
        "tick_salted", 4)
    run(0, ticksDf(("A", t0, 10, "B")))
    run(1, ticksDf(("A", t0 + 86400, 2, "B"), ("B", t0 + 86401, 4, "S")))
    run(2, ticksDf(("A", t0 + 86402, 1, "B")))
    val rows = sinkRows(sink)
    assert(rows === Seq(
      ("A", t0, 10L, 0L, 10L),
      ("A", t0 + 86400, 2L, 0L, 2L), // new day: carry did not apply
      ("A", t0 + 86402, 3L, 0L, 3L), // same new day: carry applied
      ("B", t0 + 86401, 0L, 4L, -4L)))
    // recovery only ever replays the in-flight batch: after batch 2,
    // v1 (its carry-in) and v2 survive, v0 is pruned
    assert(!Files.exists(work.resolve("state").resolve("v0")))
    assert(Files.exists(work.resolve("state").resolve("v1")))
    assert(Files.exists(work.resolve("state").resolve("v2")))
    // symbol absent from the last batch carries through untouched:
    // a later same-day B row still sees its totals
    run(3, ticksDf(("B", t0 + 86403, 6, "S")))
    assert(sinkRows(sink).contains(("B", t0 + 86403, 0L, 10L, -10L)))
  }
}
