package graft

import org.apache.spark.sql.functions._

import graft.ops.Scc

/** The FW-BW min-label peel against hand-checkable digraphs and a
  * brute-force closure — shapes chosen for the algorithm's distinct
  * regimes: multi-SCC with bridges (one peel), nested regions needing
  * MULTIPLE peels, and the id-decreasing chain (the adversarial
  * one-SCC-per-peel worst case the scaladoc documents).
  */
class SccSuite extends SparkSpec {

  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Scc(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** O(V·E) reference: labels from the definitional mutual-reachability
    * closure.
    */
  private def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val reach = scala.collection.mutable.Set[(Long, Long)](
      edges.map(e => (e._1, e._2)): _*)
    var grew = true
    while (grew) {
      grew = false
      for ((a, b) <- reach.toSeq; (c, d) <- reach.toSeq if b == c)
        if (reach.add((a, d))) grew = true
    }
    nodes.map { v =>
      val mutual = nodes.filter(u =>
        u == v || (reach((u, v)) && reach((v, u))))
      v -> mutual.min
    }.toMap
  }

  test("two cycles joined by a bridge resolve in one structure") {
    // 1→2→3→1 and 10→11→10, bridged 3→10: two SCCs + no strays
    val e = Seq[(Long, Long)](
      (1, 2), (2, 3), (3, 1), (10, 11), (11, 10), (3, 10))
    val got = run(e)
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L,
      11L -> 10L))
  }

  test("id-decreasing chain: every node its own SCC (worst-case peel)") {
    val e = Seq[(Long, Long)]((5, 4), (4, 3), (3, 2), (2, 1))
    assert(run(e) === Map(5L -> 5L, 4L -> 4L, 3L -> 3L, 2L -> 2L,
      1L -> 1L))
  }

  test("chain of SCCs with interleaved ids needs multiple peels") {
    // cycle A {7,8} → cycle B {2,3} → cycle C {5,6}: B's min (2) is
    // globally minimal but unreachable FROM C and doesn't reach A, so
    // peels must separate all three
    val e = Seq[(Long, Long)](
      (7, 8), (8, 7), (2, 3), (3, 2), (5, 6), (6, 5), (7, 2), (3, 5))
    assert(run(e) === Map(7L -> 7L, 8L -> 7L, 2L -> 2L, 3L -> 2L,
      5L -> 5L, 6L -> 5L))
  }

  test("matches the brute-force closure on a random digraph") {
    val rnd = new scala.util.Random(42)
    val edges = (0 until 120).map(_ =>
      (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter(e => e._1 != e._2).distinct
    assert(run(edges) === brute(edges))
  }

  test("topoLayers: longest path on a diamond-with-tail DAG") {
    // 1→2, 1→3, 2→4, 3→4, 4→5: layer = longest path from a source
    val got = Scc.topoLayers(
      Seq[(Long, Long)]((1, 2), (1, 3), (2, 4), (3, 4), (4, 5))
        .toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 3L))
  }

  test("topoLayers: cyclic input fails loudly at the bound") {
    val e = intercept[IllegalStateException](
      Scc.topoLayers(Seq[(Long, Long)]((1, 2), (2, 1)).toDF("src", "dst"),
        maxDepth = 5).collect())
    assert(e.getMessage.contains("cyclic"))
  }

  test("registered query matches sizes at sf0.001") {
    val rows = SparkEntry.queries("graph_scc")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    // scc_size is consistent with the grouped labels
    val byId = rows.groupBy(_.getAs[Long]("scc_id"))
    rows.foreach { r =>
      assert(r.getAs[Long]("scc_size") ===
        byId(r.getAs[Long]("scc_id")).length.toLong)
    }
  }
}
