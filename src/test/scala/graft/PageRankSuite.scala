package graft

import org.apache.spark.sql.functions._
import graft.ops.PageRank

class PageRankSuite extends SparkSpec {
  import spark.implicits._

  test("3-cycle: ranks stay uniform at 1/3") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val r = PageRank(edges, 5).collect()
      .map(x => (x.getLong(0), x.getDouble(1))).toMap
    assert(r.size === 3)
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-9))
  }

  test("star: the sink everyone links to out-ranks the spokes") {
    // 1..4 -> 5, 5 -> 1 (so node 5 isn't dangling)
    val edges = (1L to 4L).map(i => (i, 5L)).toDF("src", "dst")
      .union(Seq((5L, 1L)).toDF("src", "dst"))
    val r = PageRank(edges, 5).collect()
      .map(x => (x.getLong(0), x.getDouble(1))).toMap
    assert(r(5L) > r(1L) && r(1L) > r(2L), s"expected hub > backlinked > spoke: $r")
    assert(math.abs(r(2L) - r(3L)) < 1e-15 && math.abs(r(3L) - r(4L)) < 1e-15,
      "symmetric spokes must tie exactly")
  }

  test("fixture graph: mass is conserved up to dangling loss, ranks positive") {
    val out = SparkEntry.queries("graph_pagerank")(spark, "/root/testdata/sf0.001")
      .collect().map(_.getDouble(1))
    assert(out.forall(_ > 0))
    val total = out.sum
    assert(total > 0.8 && total <= 1.0 + 1e-9,
      s"rank mass out of range: $total")
  }

  test("determinism: two runs produce identical bits") {
    val q = SparkEntry.queries("graph_pagerank")(_, "/root/testdata/sf0.001")
    val a = q(spark).collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val b = q(spark).collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }
}
