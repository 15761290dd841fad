package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.model.Schemas
import graft.sink.LwwSink
import graft.streaming.SaltedAsofBatch

/** The hot-key-safe streaming as-of path ([[SaltedAsofBatch]], VERDICT
  * r11 task #2): row-identity with the plain batch as-of on an
  * adversarial 90%-one-key feed across micro-batches, carry-quote
  * continuity (a trade whose prevailing quote arrived batches ago
  * still enriches), idempotent replay of a micro-batch, and a
  * checkpointed restart picking the carry back up — the same
  * certification slate the cumvol escape hatch carries.
  */
class StreamingAsofSaltedSuite extends SparkSpec {
  import spark.implicits._

  private val t0 = 1687176000L

  private def tickJson(sym: String, time: Long, price: Double, typ: String) =
    s"""{"symbol": "$sym", "bid": 1.0, "price": $price, "ask": 1.2,
       | "time": $time, "volume": 1, "type": "$typ"}""".stripMargin
  private def env(sym: String, time: Long, price: Double, typ: String) =
    Schemas.Envelope("feed", "TICK", tickJson(sym, time, price, typ))

  private def sinkRows(root: String, kind: String = "asof_salted") =
    LwwSink.read(spark, root, "feed", kind)
      .select("symbol", "time", "price", "tradeType", "quoteTime",
        "quotePrice")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getString(3), r.getLong(4), r.getDouble(5)))
      .sortBy(r => (r._1, r._2)).toSeq

  /** Plain batch as-of over the same rows — the pinned expectation. */
  private def batchMirror(all: Seq[(String, Long, Double, String)]) = {
    val df = all.toDF("symbol", "time", "price", "typ")
    val trades = df.filter(col("typ") =!= "Q")
      .select(col("symbol"), col("time"), col("price"),
        col("typ").as("tradeType"))
    val quotes = df.filter(col("typ") === "Q")
      .select(col("symbol"), col("time"), col("time").as("quoteTime"),
        col("price").as("quotePrice"))
    graft.ops.AsofJoin(trades, quotes, "symbol", "time",
        Seq("quoteTime", "quotePrice"))
      .filter(col("quoteTime").isNotNull)
      .select("symbol", "time", "price", "tradeType", "quoteTime",
        "quotePrice")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getString(3), r.getLong(4), r.getDouble(5)))
      .sortBy(r => (r._1, r._2)).toSeq
  }

  test("salted streaming == plain batch as-of on a 90%-one-key feed " +
      "across micro-batches") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rng = new scala.util.Random(7)
    // 90% of rows on one symbol, strictly increasing times (unique PK,
    // non-decreasing across batches — the documented feed contract);
    // ~1 in 3 rows is a quote, so many trades match a quote from an
    // EARLIER micro-batch and the carry table does real work
    val all = (0 until 600).map { i =>
      val sym = if (rng.nextInt(10) < 9) "HOT" else s"C${rng.nextInt(5)}"
      val typ =
        if (rng.nextInt(3) == 0) "Q"
        else if (rng.nextInt(2) == 0) "B" else "S"
      (sym, t0 + i * 7L, (rng.nextInt(900) + 100) / 10.0, typ)
    }
    val work = Files.createTempDirectory("graft_salted_asof")
    graft.source.SpoolWriter.deleteAtExit(work)
    val sinkRoot = work.resolve("sink").toString
    val input = MemoryStream[Schemas.Envelope]
    val q = SaltedAsofBatch.start(input.toDF(), sinkRoot,
      work.resolve("ckpt").toString, work.resolve("state").toString,
      numBuckets = 5)
    try {
      // three genuine micro-batches so the carry table does real work
      all.grouped(200).foreach { chunk =>
        input.addData(chunk.map { case (s, t, p, ty) => env(s, t, p, ty) })
        q.processAllAvailable()
      }
    } finally q.stop()
    val expected = batchMirror(all)
    assert(expected.nonEmpty)
    assert(sinkRows(sinkRoot) === expected)
  }

  private def evDf(rows: (String, Long, Double, String)*) =
    rows.map { case (s, t, p, ty) =>
      (s, t, if (ty == "Q") 0 else 1, p, ty)
    }.toDF("symbol", "time", "kind", "price", "tradeType")

  test("replaying a micro-batch is idempotent: same sink rows, same carry") {
    val work = Files.createTempDirectory("graft_asofs_replay")
    graft.source.SpoolWriter.deleteAtExit(work)
    val (sink, state) =
      (work.resolve("sink").toString, work.resolve("state").toString)
    def run(id: Long, df: org.apache.spark.sql.DataFrame): Unit =
      SaltedAsofBatch.processBatch(df, id, sink, state, "feed",
        "asof_salted", 4)
    // batch 0: quote then trade; batch 1: trades ONLY — both symbols'
    // enrichment comes entirely from the carry table
    run(0, evDf(("HOT", t0, 1.5, "Q"), ("HOT", t0 + 1, 9.0, "B"),
      ("C1", t0 + 2, 2.5, "Q")))
    run(1, evDf(("HOT", t0 + 3, 8.0, "S"), ("C1", t0 + 4, 7.0, "B"),
      ("C2", t0 + 5, 6.0, "B"))) // C2 has no quote anywhere: must drop
    val before = sinkRows(sink)
    assert(before === Seq(
      ("HOT", t0 + 1, 9.0, "B", t0, 1.5),
      ("HOT", t0 + 3, 8.0, "S", t0, 1.5), // carried across batches
      ("C1", t0 + 4, 7.0, "B", t0 + 2, 2.5)).sortBy(r => (r._1, r._2)))
    val stateBefore = graft.streaming.CarryState
      .read(spark, state, 2L, SaltedAsofBatch.StateSchema)
      .collect().map(_.toString).sorted.toSeq
    // C2 never quoted, so it must not enter the carry either
    assert(!stateBefore.exists(_.contains("C2")))
    run(1, evDf(("HOT", t0 + 3, 8.0, "S"), ("C1", t0 + 4, 7.0, "B"),
      ("C2", t0 + 5, 6.0, "B"))) // crash-recovery replay, same batch id
    assert(sinkRows(sink) === before)
    assert(graft.streaming.CarryState
      .read(spark, state, 2L, SaltedAsofBatch.StateSchema)
      .collect().map(_.toString).sorted.toSeq === stateBefore)
  }

  test("carry survives a checkpointed RESTART: second incarnation " +
      "enriches from the first's last quote; old versions pruned") {
    val spool = Files.createTempDirectory("asofs_restart_spool")
    val work = Files.createTempDirectory("asofs_restart_work")
    graft.source.SpoolWriter.deleteAtExit(spool)
    graft.source.SpoolWriter.deleteAtExit(work)
    val sinkRoot = work.resolve("sink").toString
    def envLine(sym: String, time: Long, price: Double, typ: String) =
      s"""{"topic": "feed", "frameType": "TICK", "payload": ${tickJson(
        sym, time, price, typ).replace("\n", "")}}"""
    def write(name: String, lines: String*): Unit =
      Files.write(spool.resolve(name),
        lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    def run(): Unit = {
      val env = spark.readStream
        .format(classOf[graft.source.EnvelopeSourceProvider].getName)
        .option("path", spool.toString).load()
      val q = SaltedAsofBatch.start(env, sinkRoot,
        work.resolve("ckpt").toString, work.resolve("state").toString,
        numBuckets = 4)
      try q.processAllAvailable() finally q.stop()
    }
    write("0000000000.jsonl",
      envLine("HOT", t0, 1.5, "Q"), envLine("HOT", t0 + 1, 9.0, "B"))
    run() // incarnation 1 drains the first file, then stops
    write("0000000001.jsonl", envLine("HOT", t0 + 2, 8.0, "S"))
    write("0000000002.jsonl", envLine("HOT", t0 + 3, 7.0, "B"))
    run() // incarnation 2: fresh query objects, same ckpt + state
    // both later trades enrich from the t0 quote carried across the
    // restart — not from a fresh empty state
    val rows = sinkRows(sinkRoot)
    assert(rows.contains(("HOT", t0 + 2, 8.0, "S", t0, 1.5)))
    assert(rows.contains(("HOT", t0 + 3, 7.0, "B", t0, 1.5)))
    // recovery only ever replays the in-flight batch: older carry
    // versions are pruned as batches commit
    val versions = graft.util.Fs.list(work.resolve("state"))
      .map(_.getFileName.toString).filter(_.startsWith("v")).sorted
    assert(versions.size <= 2, s"unpruned carry versions: $versions")
  }
}
