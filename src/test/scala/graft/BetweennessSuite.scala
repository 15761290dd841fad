package graft

import graft.ops.Betweenness

/** Hand-computed Brandes fixtures for the fixed-point k-pivot
  * betweenness: the chain (unit σ everywhere) and the diamond (the
  * σ-split case where the fixed-point division actually divides).
  */
class BetweennessSuite extends SparkSpec {
  import spark.implicits._

  private val S = Betweenness.Scale

  private def bc(edges: (Long, Long)*): Map[Long, (Long, Long)] =
    Betweenness(edges.toDF("src", "dst"), pivots = 8, depth = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("chain 1→2→3→4: classic Brandes dependencies, exact in fixed point") {
    // from pivot 1: δ(2) = 2 (paths to 3 and 4 pass through), δ(3) = 1,
    // δ(4) = 0. Pivots 2 and 3 add δ(3) += 1 and nothing else at
    // depth ≤ 3 (their trees are shorter chains).
    val out = bc((1L, 2L), (2L, 3L), (3L, 4L))
    // node 2: reached by pivot 1 only (pivot 2 is its own source;
    // pivot 3's tree is {4})
    assert(out(2L)._2 === 2 * S)
    // node 3: δ = 1 under pivot 1, δ = 1 under pivot 2
    assert(out(3L)._2 === 2 * S)
    // node 4: leaf everywhere
    assert(out(4L)._2 === 0L)
    // reach counts: 4 is reached by pivots 1, 2, 3
    assert(out(4L)._1 === 3L)
  }

  test("diamond 1→{2,3}→4: σ-split halves the dependency, floor-exact") {
    // σ(4) = 2; δ(2) = δ(3) = ⌊1·(S+0)/2⌋ = S/2 under pivot 1.
    // Pivots 2 and 3 see 4 as a direct leaf — no further dependency.
    val out = bc((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
    assert(out(2L)._2 === S / 2)
    assert(out(3L)._2 === S / 2)
    assert(out(4L)._2 === 0L)
  }

  test("depth truncation: nodes past the horizon contribute nothing") {
    // chain of 5: with depth 3, node 5 is never discovered from pivot
    // 1, so δ(2) counts only paths to {3, 4} = 2, and under pivot 2
    // node 5 IS in reach (distance 3), raising δ(3) and δ(4) there.
    val out = bc((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(out(2L)._2 === 2 * S) // pivot 1 only, 5 beyond horizon
    assert(!out.contains(6L))
    // node 5 reached by pivots 2 (dist 3), 3 (dist 2), 4 (dist 1)
    assert(out(5L)._1 === 3L)
  }
}
