package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.{CountMin, TextHash}

/** Streaming count-min sketch: the cell counters ARE a streaming
  * aggregation — `groupBy(d, cell).count` maintains the sketch
  * incrementally with STATE bounded at Depth×Width cells no matter how
  * many distinct tokens flow past (the property that makes frequency
  * tracking viable on an unbounded stream, where a per-token streaming
  * count would grow state without limit). The memory sink runs in
  * complete mode purely so the test can read the whole sketch back;
  * the bounded thing is the aggregation state, which is identical
  * under update mode. The final sketch must equal the batch-built
  * sketch over the same data — counter matrices are addition-merged,
  * so micro-batch order can't matter.
  */
class StreamingCmsSuite extends SparkSpec {
  import spark.implicits._

  test("incremental sketch equals the batch sketch; estimates never undercount") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    val q = input.toDF().toDF("token")
      .select(posexplode(CountMin.cells(TextHash.h31(col("token"))))
        .as(Seq("i", "dc")))
      .groupBy(col("dc.d").as("d"), col("dc.cell").as("cell"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("scms_out")
      .outputMode("complete").start()
    val batches = Seq(
      (1 to 40).map(i => s"tok${i % 7}"),
      (1 to 25).map(i => s"tok${i % 5}"),
      (1 to 10).map(_ => "hot"))
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val streamed = spark.table("scms_out")
        .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap

      val all = batches.flatten.toDF("token")
      val batch = all
        .select(posexplode(CountMin.cells(TextHash.h31(col("token"))))
          .as(Seq("i", "dc")))
        .groupBy(col("dc.d").as("d"), col("dc.cell").as("cell"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
      assert(streamed === batch, "streamed sketch must equal batch sketch")

      // state bound: the sketch can never exceed Depth×Width cells
      assert(streamed.size <= CountMin.Depth * CountMin.Width)

      // estimate for the known-hot token via the streamed sketch
      val hotCells = Seq("hot").toDF("token")
        .select(posexplode(CountMin.cells(TextHash.h31(col("token"))))
          .as(Seq("i", "dc")))
        .select(col("dc.d"), col("dc.cell"))
        .collect().map(r => (r.getInt(0), r.getLong(1)))
      val est = hotCells.map(streamed.getOrElse(_, 0L)).min
      assert(est >= 10L, s"hot token estimate $est must cover its 10 true hits")
    } finally q.stop()
  }
}
