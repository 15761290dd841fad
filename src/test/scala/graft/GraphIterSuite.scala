package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.GraphIter

class GraphIterSuite extends SparkSpec {
  import spark.implicits._

  /** Undirected adjacency (both orientations) from low→high pairs. */
  private def adj(pairs: (Long, Long)*): DataFrame =
    pairs.toDF("u", "v").union(pairs.map(_.swap).toDF("u", "v"))

  /** Low→high dedup'd edge list, the [[GraphIter.triangleCount]] input. */
  private def edgesLoHi(pairs: (Long, Long)*): DataFrame =
    pairs.map { case (a, b) => if (a < b) (a, b) else (b, a) }
      .distinct.toDF("ua", "ub")

  test("triangleCount: fixed shapes — triangle, K4, star, path") {
    def n(df: DataFrame): Long =
      GraphIter.triangleCount(df).as[Long].head()
    assert(n(edgesLoHi((1L, 2L), (2L, 3L), (1L, 3L))) == 1L)
    // K4 has C(4,3) = 4 triangles
    assert(n(edgesLoHi((1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 3L), (2L, 4L), (3L, 4L))) == 4L)
    // star and path are triangle-free
    assert(n(edgesLoHi((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))) == 0L)
    assert(n(edgesLoHi((1L, 2L), (2L, 3L), (3L, 4L))) == 0L)
  }

  test("triangleCount: degree-ordered ≡ id-ordered enumeration, skewed") {
    // the orientation swap must not change the count — compare against
    // the naive id-ordered form on random graphs including a hub (node
    // 0 connects to everyone: the case the degree order exists for)
    val rnd = new scala.util.Random(11)
    val pairs = (Seq.tabulate(40)(i => (0L, i + 1L)) ++
      Seq.fill(120)((rnd.nextInt(40).toLong + 1L,
        rnd.nextInt(40).toLong + 1L))).filter(p => p._1 != p._2)
    val e = edgesLoHi(pairs: _*)
    val naive = e.select(col("ua").as("a"), col("ub").as("b"))
      .join(e.select(col("ua").as("b"), col("ub").as("c")), Seq("b"))
      .join(e.select(col("ua").as("a"), col("ub").as("c")), Seq("a", "c"),
        "left_semi")
      .count()
    assert(GraphIter.triangleCount(e).as[Long].head() == naive)
    assert(naive > 0L) // the comparison must not be vacuous
  }

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
