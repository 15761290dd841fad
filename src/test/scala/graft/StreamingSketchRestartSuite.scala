package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.ops.{CountMin, TextHash}
import graft.sink.LwwSink
import graft.source.EnvelopeSourceProvider
import graft.streaming.Pipelines

/** Restart recovery for the sketch-at-ingest rows: CMS registers are
  * SUMS, so the sensitive failure is double-counting — a restarted
  * query that re-reads file 1 (offsets lost) or re-applies a committed
  * batch without state rollback would inflate register counts and the
  * LWW sink would happily store the wrong totals (unlike a dedup or
  * max-merge row, nothing downstream can mask an over-count). The
  * suite drains one spool file, kills the query, appends a second
  * file, restarts from the same checkpoint, and asserts the register
  * table equals the batch-computed counts over BOTH files — each row
  * counted exactly once across the incarnation boundary.
  */
class StreamingSketchRestartSuite extends SparkSpec {

  private val fmt = classOf[EnvelopeSourceProvider].getName
  private val t0 = 1687176000L

  private def tickLine(sym: String, time: Long) =
    s"""{"topic": "feed", "frameType": "TICK", "payload": {"symbol": "$sym", "bid": 1.0, "price": 1.1, "ask": 1.2, "time": $time, "volume": 1, "type": "B"}}"""

  private def write(dir: Path, name: String, lines: String*): Unit =
    Files.write(dir.resolve(name),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))

  test("CMS registers count each row exactly once across a checkpointed restart") {
    val spool = Files.createTempDirectory("cms_spool")
    val sink = Files.createTempDirectory("cms_sink").toString
    val ckpt = Files.createTempDirectory("cms_ckpt").toString

    def run(): Unit = {
      val env = spark.readStream.format(fmt)
        .option("path", spool.toString).load()
      val regs = Pipelines.parseTicks(env).filter(!col("_corrupt"))
        .select(TextHash.h31(col("symbol")).as("h"))
        .select(posexplode(CountMin.cells(col("h"))).as(Seq("i", "dc")))
        .groupBy(col("dc.d").as("d"), col("dc.cell").as("cell"))
        .agg(count(lit(1)).as("n"))
      val q = regs.writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          LwwSink.upsertBatch(batch.toDF(), id, sink, "feed", "cms",
            Seq("d", "cell"))
        }.start()
      try q.processAllAvailable() finally q.stop()
    }

    // incarnation 1: AAA twice, BBB once
    write(spool, "000.jsonl",
      tickLine("AAA", t0), tickLine("AAA", t0 + 1), tickLine("BBB", t0 + 2))
    run()
    // incarnation 2: AAA again (its registers must reach exactly 3,
    // not 5 — re-reading file 1 would double-count) plus a new symbol
    write(spool, "001.jsonl",
      tickLine("AAA", t0 + 3), tickLine("CCC", t0 + 4))
    run()

    val got = LwwSink.read(spark, sink, "feed", "cms")
      .select("d", "cell", "n").collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    // batch truth over both files: symbol frequencies 3/1/1
    val expected = Seq(("AAA", 3L), ("BBB", 1L), ("CCC", 1L))
      .flatMap { case (sym, cnt) =>
        val h = java.lang.Long.parseLong(
          java.security.MessageDigest.getInstance("MD5")
            .digest(sym.getBytes("UTF-8"))
            .take(8).map("%02x".format(_)).mkString.take(15), 16) %
          TextHash.P31
        (0 until CountMin.Depth).map { d =>
          ((d, ((h * CountMin.A(d) + CountMin.B(d)) % TextHash.P31) %
            CountMin.Width), cnt)
        }
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(got === expected,
      s"register table must equal batch counts over both incarnations " +
        s"(got $got, expected $expected)")
  }
}
