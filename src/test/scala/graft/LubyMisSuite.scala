package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[graft.ops.GraphIter.lubyMis]] invariants — checked structurally
  * (independence / domination follow from the algorithm, not from the
  * specific hash draws, so the tests hold for ANY priority function):
  * no edge joins two 'in' nodes; every 'out' node has an 'in'
  * neighbor; no 'und' node has an 'in' neighbor; deterministic under
  * repartition.
  */
class LubyMisSuite extends SparkSpec {
  import spark.implicits._

  private def undirected(e: Seq[(Long, Long)]): DataFrame =
    (e ++ e.map(_.swap)).toDF("u", "v")

  private def checkInvariants(adj: DataFrame, rounds: Int): Unit = {
    val st = graft.ops.GraphIter.lubyMis(adj, rounds)
    val withSt = adj
      .join(st.toDF("u", "st_u"), Seq("u"))
      .join(st.toDF("v", "st_v"), Seq("v"))
    // independence: never two adjacent 'in'
    assert(withSt.filter(col("st_u") === "in" &&
      col("st_v") === "in").count() == 0)
    // every 'out' has an 'in' neighbor (it was knocked out by one)
    val outs = st.filter(col("st") === "out").select("u")
    val outsWithInNbr = withSt
      .filter(col("st_u") === "out" && col("st_v") === "in")
      .select("u").distinct()
    assert(outs.count() == outsWithInNbr.count())
    // no 'und' node touches an 'in' node (it would have been 'out')
    assert(withSt.filter(col("st_u") === "und" &&
      col("st_v") === "in").count() == 0)
    // every node got a status
    assert(st.count() == adj.select("u").distinct().count())
  }

  test("path graph P10: invariants hold and 5 rounds converge") {
    val adj = undirected((1L to 9L).map(i => (i, i + 1)))
    checkInvariants(adj, 5)
    val st = graft.ops.GraphIter.lubyMis(adj, 5)
    // converged: maximality = independence + domination, both pinned
    // above; here additionally nothing is left undecided
    assert(st.filter(col("st") === "und").count() == 0)
  }

  test("two-node graph: one in, one out after one round") {
    val adj = undirected(Seq((1L, 2L)))
    val st = graft.ops.GraphIter.lubyMis(adj, 1)
      .as[(Long, String)].collect().toMap
    assert(st.values.toSeq.sorted == Seq("in", "out"))
  }

  test("clique K5 + pendant: invariants on a dense block") {
    val clique = for {
      a <- 1L to 5L; b <- 1L to 5L if a < b
    } yield (a, b)
    checkInvariants(undirected(clique :+ (5L, 6L)), 5)
  }

  test("deterministic under repartition") {
    val e = (1L to 20L).map(i => (i, i % 7 + 21L))
    val adj = undirected(e)
    val a = graft.ops.GraphIter.lubyMis(adj, 3)
      .as[(Long, String)].collect().toSet
    val b = graft.ops.GraphIter.lubyMis(adj.repartition(5), 3)
      .as[(Long, String)].collect().toSet
    assert(a == b)
  }
}
