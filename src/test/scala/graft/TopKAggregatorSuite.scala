package graft

import graft.ops.TopKAggregator

class TopKAggregatorSuite extends SparkSpec {
  import spark.implicits._

  test("typed top-k agg equals sort-take, deterministic on ties") {
    val rng = new scala.util.Random(43)
    val rows = (0 until 2000).map(i =>
      (s"G${i % 7}", (rng.nextInt(50) * 10).toDouble, i.toLong))
    val got = rows.toDS()
      .groupByKey(_._1)
      .mapValues(v => (v._2, v._3))
      .agg(new TopKAggregator(5).toColumn.name("topk"))
      .collect().map { case (g, hits) => g -> hits }.toMap
    val expected = rows.groupBy(_._1).view.mapValues(
      _.map(r => (r._2, r._3)).sortBy { case (v, t) => (-v, t) }.take(5)).toMap
    got.keySet.foreach { g =>
      assert(got(g).toSeq === expected(g).toSeq, s"group $g")
    }
  }

  test("merge of partial buffers preserves global top-k") {
    val agg = new TopKAggregator(3)
    val a = Seq((9.0, 1L), (7.0, 2L), (5.0, 3L))
    val b = Seq((8.0, 4L), (6.0, 5L), (10.0, 6L))
    assert(agg.finish(agg.merge(a, b)) ===
      Seq((10.0, 6L), (9.0, 1L), (8.0, 4L)))
  }
}
