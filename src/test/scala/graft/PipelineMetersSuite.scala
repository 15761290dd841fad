package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.{PipelineMeters, Pipelines}

/** (on_time, corrupt, dropped_late) counters on the PRODUCTION
  * pipeline assembly (round-13, VERDICT r12 task #5): Pipelines.start
  * in tick mode with the watermark conf set must meter — per named
  * pipeline query, across a checkpoint RESTART — exactly the planted
  * corrupt rows and exactly the planted watermark stragglers, with
  * on_time equal to what reached the sink.
  */
class PipelineMetersSuite extends SparkSpec {

  private val t0 = 1687176000L // 2023-06-19 12:00 UTC

  private def envLine(sym: String, time: Long, vol: Int) =
    s"""{"topic": "feed", "frameType": "TICK", "payload": {"symbol": "$sym",""" +
      s""" "bid": 1.0, "price": 1.1, "ask": 1.2, "time": $time,""" +
      s""" "volume": $vol, "type": "B"}}"""

  test("production assembly meters corrupt + late drops across a restart") {
    val spool = Files.createTempDirectory("meters_spool")
    val work = Files.createTempDirectory("meters_work")
    graft.source.SpoolWriter.deleteAtExit(spool)
    graft.source.SpoolWriter.deleteAtExit(work)
    val sinkRoot = work.resolve("sink").toString
    def write(name: String, lines: String*): Unit =
      Files.write(spool.resolve(name),
        lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    val meters = PipelineMeters.register(spark)
    // captures every real progress event so the end of the test can
    // re-deliver them — the engine's crash-recovery behavior (the last
    // uncommitted micro-batch replays under the SAME batchId and
    // reports progress again) simulated with genuine event objects
    val captured =
      new java.util.concurrent.ConcurrentLinkedQueue[
        org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent]
    val capturer = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
        captured.add(e)
    }
    spark.streams.addListener(capturer)
    spark.conf.set("spark.graft.tick.watermark", "1 day")
    try {
      // one incarnation of the production assembly: drain, stop
      def run(): Unit = {
        val env = spark.readStream
          .format(classOf[graft.source.EnvelopeSourceProvider].getName)
          .option("path", spool.toString)
          .option("maxFilesPerTrigger", "1") // advancers commit alone
          .load()
        val qs = Pipelines.start(env, "tick", sinkRoot,
          work.resolve("ckpt").toString)
        try qs.foreach(_.processAllAvailable()) finally qs.foreach(_.stop())
        org.apache.spark.sql.graftbridge.Bridge.drainListenerBus(spark)
      }
      // era rows (one corrupt: missing volume ⇒ strict serde fails it)
      // + TWO advancers (filter watermark lags one batch — see
      // runLateCommon's scaladoc for why one is not enough)
      write("0000000000.jsonl",
        envLine("A", t0, 5), envLine("A", t0 + 10, 3),
        s"""{"topic": "feed", "frameType": "TICK", "payload": """ +
          s"""{"symbol": "A", "bid": 1.0, "price": 1.1, "ask": 1.2, """ +
          s""""time": ${t0 + 20}, "type": "B"}}""")
      write("0000000001.jsonl", envLine("ZZZ", t0 + 100 * 86400, 1))
      write("0000000002.jsonl", envLine("ZZZ", t0 + 100 * 86400 + 60, 1))
      run()
      val m1 = meters(s"graft_tick:$sinkRoot")
      assert(m1.corrupt === 1L, s"planted one corrupt row: $m1")
      assert(m1.droppedLate === 0L, s"incarnation 1 has no late rows: $m1")
      assert(m1.onTime === m1.rows - 1L, s"on_time = rows - corrupt: $m1")
      // the dead-letter query metered separately (no observe stage on
      // it — zeros by design, the quarantine parquet is its record)
      assert(meters(s"graft_tick_dl:$sinkRoot").droppedLate === 0L)
      // incarnation 2, restarted from the checkpoint: ONLY stragglers
      // arrive, ~100 days behind the recovered watermark
      write("0000000003.jsonl",
        envLine("A", t0 + 30, 999), envLine("B", t0 + 40, 999))
      run()
      val m2 = meters(s"graft_tick:$sinkRoot")
      assert(m2.droppedLate === 2L,
        s"restarted incarnation must meter exactly the 2 stragglers: $m2")
      assert(m2.corrupt === 1L, s"corrupt count accumulates, not resets: $m2")
      assert(m2.onTime === m2.rows - 1L - 2L, s"on_time derivation: $m2")
      // on_time rows all reached the sink: distinct (symbol,time,price)
      // upserts equal the on-time count here (each on-time tick is a
      // distinct key by construction)
      val sunk = graft.sink.LwwSink.read(spark, sinkRoot, "feed", "tick")
        .count()
      assert(sunk === m2.onTime, s"sink rows $sunk vs on_time ${m2.onTime}")
      // UNCLEAN-shutdown replay (r13 ADVICE): after a crash the
      // recovered query re-executes the last uncommitted micro-batch
      // under the SAME batchId and its progress is reported AGAIN —
      // re-deliver every captured real event and assert the meters do
      // not move (batchId-keyed dedup), where the pre-fix accumulation
      // would double every counter. The replayed events carry their
      // original runIds with batchIds ≤ the folded high-water — the
      // round-15 era detection must NOT mistake any of them for a new
      // era (only the batchId-0 event has the fresh-era batch number,
      // and it arrives under an already-seen runId).
      assert(!captured.isEmpty, "capturer saw no progress events")
      val snapBefore = meters.snapshot
      captured.forEach(e => meters.onQueryProgress(e))
      assert(meters.snapshot === snapBefore,
        s"replayed batchIds must not re-count: $snapBefore vs ${meters.snapshot}")
      // FRESH-CHECKPOINT era (round-15, VERDICT r14 task #4): the same
      // name rerun from scratch — checkpoint deleted, batchIds restart
      // at 0 under a NEW runId while the folded high-water is > 0.
      // The carried r14 footgun silently skipped every batch of such a
      // rerun; the era-aware guard must instead accumulate the whole
      // second pass (all 4 spool files reprocess: same era rows, same
      // corrupt row, and the two stragglers drop again once the
      // advancers rebuild the watermark).
      def rmTree(p: java.nio.file.Path): Unit =
        if (Files.exists(p))
          Files.walk(p).sorted(java.util.Comparator.reverseOrder())
            .forEach(q => Files.delete(q))
      rmTree(work.resolve("ckpt"))
      run()
      val m3 = meters(s"graft_tick:$sinkRoot")
      assert(m3.rows === 2L * m2.rows,
        s"fresh-checkpoint era must re-accumulate, not skip: $m3 vs $m2")
      assert(m3.corrupt === 2L, s"corrupt counts both eras: $m3")
      assert(m3.droppedLate === 4L, s"dropped_late counts both eras: $m3")
      assert(m3.onTime === 2L * m2.onTime, s"on_time derivation: $m3")
      // the sink is unchanged: era 2 upserts the same keys (idempotent
      // replay is the sink's own contract, LwwSinkSuite)
      assert(graft.sink.LwwSink.read(spark, sinkRoot, "feed", "tick")
        .count() === sunk)
    } finally {
      spark.conf.unset("spark.graft.tick.watermark")
      spark.streams.removeListener(meters)
      spark.streams.removeListener(capturer)
    }
  }

  test("acceptBatch decision table: fresh era survives a dropped " +
      "batch-0 event (round-16, r15 ADVICE #2)") {
    import PipelineMeters.acceptBatch
    // first event ever under the name: always folded
    assert(acceptBatch(None, Set.empty, "r1", 0L))
    assert(acceptBatch(None, Set.empty, "r1", 7L))
    val guard = Some(("r1", 3L)) // r1 folded through batch 3
    val seen = Set("r1")
    // in-run monotone: > hw only; an unclean replay re-reports ≤ hw
    assert(acceptBatch(guard, seen, "r1", 4L))
    assert(!acceptBatch(guard, seen, "r1", 3L))
    assert(!acceptBatch(guard, seen, "r1", 0L))
    // clean restart (new runId, hw + 1 continues the sequence)
    assert(acceptBatch(guard, seen, "r2", 4L))
    // crash replay: the recovered runId re-reports EXACTLY hw — the
    // one retained safe skip (a fresh era loses only this one batch)
    assert(!acceptBatch(guard, seen, "r2", 3L))
    // fresh-checkpoint era: batchIds restart at 0 under a new runId
    assert(acceptBatch(guard, seen, "r2", 0L))
    // the ADVICE case: the fresh era's batch-0 progress event was
    // dropped by the bus — batchIds strictly below hw under a
    // never-seen runId are still unambiguously the new era and must
    // accumulate (pre-fix: silently skipped, meter undercount)
    assert(acceptBatch(guard, seen, "r2", 1L))
    assert(acceptBatch(guard, seen, "r2", 2L))
    // seen, non-current runId: stale re-delivery, always skipped
    assert(!acceptBatch(Some(("r2", 1L)), Set("r1", "r2"), "r1", 0L))
    assert(!acceptBatch(Some(("r2", 1L)), Set("r1", "r2"), "r1", 9L))
  }
}
