package graft

import org.apache.spark.sql.functions._
import graft.ops.ConnectedComponents

/** Hash-to-min connected components: correct components on chains,
  * stars, and disjoint cliques; pointer jumping converges inside the
  * round bound on a path graph (the worst case for plain propagation).
  */
class ConnectedComponentsSuite extends SparkSpec {
  import spark.implicits._

  private def comp(edges: Seq[(Long, Long)], maxIter: Int = 25) =
    ConnectedComponents(edges.toDF("a", "b"), "a", "b", maxIter)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq

  test("disjoint clusters get their min id; singletons absent") {
    val out = comp(Seq((2L, 5L), (5L, 9L), (20L, 21L)))
    assert(out === Seq((2L, 2L), (5L, 2L), (9L, 2L), (20L, 20L), (21L, 20L)))
  }

  test("a long path converges (pointer jumping beats O(diameter))") {
    // path 0-1-2-...-63: diameter 63; hash-to-min + jumping must close
    // it well inside the default 25-round cap
    val edges = (0L until 63L).map(i => (i, i + 1))
    val out = comp(edges)
    assert(out.size === 64)
    assert(out.forall(_._2 === 0L))
  }

  test("edge direction and duplication don't matter") {
    val out = comp(Seq((5L, 2L), (2L, 5L), (9L, 5L), (9L, 5L)))
    assert(out === Seq((2L, 2L), (5L, 2L), (9L, 2L)))
  }

  test("non-convergence inside the round cap throws, never returns wrong labels") {
    // a 9-node path needs ~3 rounds with pointer jumping; cap at 1
    val edges = (0L until 8L).map(i => (i, i + 1))
    val e = intercept[IllegalStateException] {
      comp(edges, maxIter = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("empty pair set yields empty components") {
    val empty = Seq.empty[(Long, Long)]
    assert(comp(empty).isEmpty)
  }
}
