package graft

import java.nio.file.{Files, Path}

import graft.sink.LwwSink
import graft.source.EnvelopeSourceProvider
import graft.streaming.Pipelines

/** Checkpoint recovery: a stopped tick pipeline restarted on the same
  * checkpoint resumes with its keyed state and source offsets intact —
  * cumulative counters continue instead of restarting from zero, and
  * already-committed files are not re-read (the exactly-once story the
  * reference's in-memory HashMap cannot offer: its state dies with the
  * process, /root/reference/src/main.rs:207-208).
  */
class CheckpointRestartSuite extends SparkSpec {

  private val fmt = classOf[EnvelopeSourceProvider].getName
  private val t0 = 1687176000L

  private def tickLine(time: Long, vol: Int, typ: String) =
    s"""{"topic": "feed", "frameType": "TICK", "payload": {"symbol": "EURUSD", "bid": 1.0, "price": 1.1, "ask": 1.2, "time": $time, "volume": $vol, "type": "$typ"}}"""

  private def write(dir: Path, name: String, lines: String*): Unit =
    Files.write(dir.resolve(name),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))

  test("restart from checkpoint resumes keyed state and offsets") {
    val spool = Files.createTempDirectory("ckpt_spool")
    val sink = Files.createTempDirectory("ckpt_sink").toString
    val ckpt = Files.createTempDirectory("ckpt_ckpt").toString

    def run(): Unit = {
      val env = spark.readStream.format(fmt)
        .option("path", spool.toString).load()
      val qs = Pipelines.start(env, "tick", sink, ckpt)
      try qs.foreach(_.processAllAvailable())
      finally qs.foreach(_.stop())
    }

    write(spool, "000.jsonl", tickLine(t0, 3, "B"))
    run() // first incarnation processes file 0, then stops

    write(spool, "001.jsonl", tickLine(t0 + 1, 5, "B"))
    run() // second incarnation must resume, not restart

    val rows = LwwSink.read(spark, sink, "feed", "tick")
      .select("time", "cumbuy")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(rows === Seq((t0, 3L), (t0 + 1, 8L)),
      "cumbuy must continue from restored state (3 + 5 = 8)")
  }
}
