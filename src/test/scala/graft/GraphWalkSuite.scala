package graft

import graft.ops.GraphWalk

/** Pins [[graft.ops.GraphWalk]] against an in-test sequential replay of
  * the hash-argmin hop rule — the distributed join+argmin composition
  * must reproduce walker-by-walker simulation exactly, including the
  * tie-break (equal hash → smaller dst) and dead-end semantics (a
  * walker with no out-edge stops contributing).
  */
class GraphWalkSuite extends SparkSpec {

  import spark.implicits._

  private val Mul = 2654435761L
  private val Mod = 1000000007L
  private def h(cur: Long, r: Int, dst: Long): Long =
    ((cur * Mul + r) % Mod * Mul + dst) % Mod

  /** Sequential replay: every distinct src walks `steps` rounds. */
  private def reference(
      adj: Seq[(Long, Long)], steps: Int): Map[Long, Long] = {
    val out = adj.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    val visits = scala.collection.mutable.Map.empty[Long, Long]
    for (start <- adj.map(_._1).distinct) {
      var cur = start
      var alive = true
      for (r <- 1 to steps if alive) {
        out.get(cur) match {
          case Some(nbrs) =>
            cur = nbrs.minBy(d => (h(cur, r, d), d))
            visits(cur) = visits.getOrElse(cur, 0L) + 1L
          case None => alive = false
        }
      }
    }
    visits.toMap
  }

  private def run(adj: Seq[(Long, Long)], steps: Int): Map[Long, Long] =
    GraphWalk.visitCounts(adj.toDF("src", "dst"), steps)
      .as[(Long, Long)].collect().toMap

  test("matches the sequential replay on a pseudo-random digraph") {
    // deterministic sparse digraph with dead ends (nodes ≥ 40 have no
    // out-edges) and skewed in-degree on node 0
    val adj = (0L until 40L).flatMap { s =>
      (0 until (1 + (s % 3)).toInt).map { j =>
        val d = (s * 7 + j * 13 + 1) % 50
        (s, if (d % 5 == 0) 0L else d)
      }
    }.distinct
    for (steps <- Seq(1, 3, 5))
      assert(run(adj, steps) == reference(adj, steps), s"steps=$steps")
  }

  test("undirected two-cycle: walkers oscillate, visits split exactly") {
    val adj = Seq((1L, 2L), (2L, 1L))
    // both walkers alternate; 2 walkers × 4 steps = 8 visits, 4 per node
    assert(run(adj, 4) == Map(1L -> 4L, 2L -> 4L))
  }

  test("steps guard fails loudly") {
    val bad = intercept[IllegalArgumentException] { run(Seq((1L, 2L)), 0) }
    assert(bad.getMessage.contains("steps"))
  }
}
