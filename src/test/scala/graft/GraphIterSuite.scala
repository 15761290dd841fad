package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.GraphIter

class GraphIterSuite extends SparkSpec {
  import spark.implicits._

  /** Undirected adjacency (both orientations) from low→high pairs. */
  private def adj(pairs: (Long, Long)*): DataFrame =
    pairs.toDF("u", "v").union(pairs.map(_.swap).toDF("u", "v"))

  test("kcore: a triangle with a tail peels the tail, keeps the triangle") {
    // triangle 1-2-3, tail 3-4-5: node 5 (deg 1) goes round 1, node 4
    // (deg 1 after) goes round 2; the 2-core is exactly the triangle.
    val e = adj((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val core = GraphIter.kcoreEdges(e, 2, 3)
      .select("u").distinct().as[Long].collect().sorted
    assert(core.toSeq === Seq(1L, 2L, 3L))
  }

  test("kcore: synchronous peel — a path dissolves one end-pair per round") {
    // path 1-2-3-4-5-6 at k=2: round 1 drops ends 1,6; round 2 drops
    // 2,5; round 3 drops 3,4 — the synchronous schedule both the Spark
    // form and the mirror's CTE unroll must follow.
    val e = adj((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    def nodes(r: Int) = GraphIter.kcoreEdges(e, 2, r)
      .select("u").distinct().as[Long].collect().sorted.toSeq
    assert(nodes(1) === Seq(2L, 3L, 4L, 5L))
    assert(nodes(2) === Seq(3L, 4L))
    assert(nodes(3) === Seq.empty)
  }

  test("labelProp: tie votes go to the smallest label") {
    // node 3's neighbors are 1 and 2 (one vote each) -> label 1.
    // nodes 1,2 see only 3 -> label 3 after round 1.
    val e = adj((1L, 3L), (2L, 3L))
    val l1 = GraphIter.labelProp(e, 1)
      .as[(Long, Long)].collect().toMap
    assert(l1(3L) === 1L, "tie must break to the smallest label")
    assert(l1(1L) === 3L && l1(2L) === 3L)
  }

  test("labelProp: a clique converges to its minimum id") {
    // K4 on 5..8 plus an isolated-ish pendant pair 1-2: after 3
    // rounds every clique member carries label 5 (min id wins the
    // majority vote immediately and is then unanimous); the pendant
    // pair oscillates 1<->2 synchronously and lands swapped on the
    // odd round count — pinned so the unrolled-round semantics can't
    // drift silently.
    val k4 = for { a <- 5L to 8L; b <- 5L to 8L if a < b } yield (a, b)
    val e = adj(k4 :+ ((1L, 2L)): _*)
    val l3 = GraphIter.labelProp(e, 3).as[(Long, Long)].collect().toMap
    (5L to 8L).foreach(n => assert(l3(n) === 5L, s"node $n: ${l3(n)}"))
    assert(l3(1L) === 2L && l3(2L) === 1L)
  }

  test("fixture queries: deterministic across runs") {
    for (name <- Seq("graph_kcore", "graph_label_prop", "graph_link_jaccard",
        "graph_modularity", "graph_assortativity")) {
      val q = SparkEntry.queries(name)
      val a = q(spark, "/root/testdata/sf0.001").collect().map(_.toString).sorted
      val b = q(spark, "/root/testdata/sf0.001").collect().map(_.toString).sorted
      assert(a.toSeq === b.toSeq, name)
    }
  }
}
