package graft

import org.apache.spark.sql.DataFrame
import graft.ops.GraphIter

/** [[GraphIter.edgeSupport]] — per-edge triangle support (the k-truss
  * initialization behind graph_truss_support) on hand-computed shapes.
  */
class EdgeSupportSuite extends SparkSpec {
  import spark.implicits._

  private def edgesLoHi(pairs: (Long, Long)*): DataFrame =
    pairs.map { case (a, b) => if (a < b) (a, b) else (b, a) }
      .distinct.toDF("ua", "ub")

  private def support(edges: DataFrame): Map[(Long, Long), Long] = {
    val deg = {
      import org.apache.spark.sql.functions.{col, count, lit}
      edges.select(col("ua").as("u"))
        .union(edges.select(col("ub").as("u")))
        .groupBy("u").agg(count(lit(1)).as("d"))
    }
    GraphIter.edgeSupport(edges, deg).as[(Long, Long, Long)]
      .collect().map { case (a, b, s) => (a, b) -> s }.toMap
  }

  test("K4: every edge sits in exactly 2 triangles") {
    val s = support(edgesLoHi((1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(s.size == 6)
    assert(s.values.forall(_ == 2L))
  }

  test("triangle with a tail: triangle edges 1, tail edges 0") {
    val s = support(edgesLoHi((1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 4L), (4L, 5L)))
    assert(s((1L, 2L)) == 1L && s((2L, 3L)) == 1L && s((1L, 3L)) == 1L)
    assert(s((3L, 4L)) == 0L && s((4L, 5L)) == 0L)
  }

  test("star is triangle-free: all zero, every edge present") {
    val s = support(edgesLoHi((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)))
    assert(s.size == 4)
    assert(s.values.forall(_ == 0L))
  }

  test("two triangles sharing an edge: the shared edge supports 2") {
    // 1-2-3 and 2-3-4 share edge (2,3)
    val s = support(edgesLoHi((1L, 2L), (1L, 3L), (2L, 3L),
      (2L, 4L), (3L, 4L)))
    assert(s((2L, 3L)) == 2L)
    assert(s((1L, 2L)) == 1L && s((1L, 3L)) == 1L)
    assert(s((2L, 4L)) == 1L && s((3L, 4L)) == 1L)
  }

  test("total support = 3 x triangle count (every triangle has 3 edges)") {
    val rnd = new scala.util.Random(7)
    val pairs = (Seq.tabulate(20)(i => (0L, i + 1L)) ++
      Seq.fill(60)((rnd.nextInt(20).toLong + 1L,
        rnd.nextInt(20).toLong + 1L))).filter(p => p._1 != p._2)
    val e = edgesLoHi(pairs: _*)
    val tri = GraphIter.triangleCount(e).as[Long].head()
    val tot = support(e).values.sum
    assert(tot == 3L * tri)
    assert(tri > 0L) // non-vacuous
  }
}
