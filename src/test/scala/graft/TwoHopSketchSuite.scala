package graft

import org.apache.spark.sql.functions._

import graft.ops.GraphIter

/** Two-hop reach sketch (round-13, VERDICT r12 task #3): the per-node
  * HLL estimate must track the exact arm within the published HLL
  * error band on a real-fixture adjacency, and both arms must agree
  * exactly on the 1-hop degree and node set (same enumeration, only
  * the distinct-vs-sketch tail differs). The dedup_eval grounding
  * pattern: exact arm as the oracle for the approximate tier.
  */
class TwoHopSketchSuite extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def adj() = {
    // small undirected co-interaction graph from events
    val e = Tables(spark, sf, "events")
      .select((col("user_id") % 61).as("a"),
        (col("value").cast("long") % 53 + 100).as("b"))
      .filter(col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
    e.select(col("a").as("u"), col("b").as("v"))
      .unionByName(e.select(col("b").as("u"), col("a").as("v")))
      .distinct()
  }

  test("sketch arm: same node set and n_1hop as the exact arm; " +
      "estimates inside the HLL error envelope") {
    val a = adj().localCheckpoint()
    val exact = GraphIter.twoHopReach(a)
      .select(col("u"), col("n_1hop"), col("n_reach2")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val sk = GraphIter.twoHopReachSketch(a)
      .select(col("u"), col("n_1hop"), col("est_reach2"), col("n_set"))
      .collect()
    assert(sk.nonEmpty)
    assert(sk.map(_.getLong(0)).toSet === exact.keySet,
      "both arms must cover the identical node set")
    // The ROW carries the raw HLL estimate + n_set (the Hll contract:
    // no transcendental correction inline — ln is not bit-stable
    // cross-engine — so a consumer applies it downstream). Grounding
    // therefore applies the standard small-range linear-counting
    // correction HERE, exactly as a consumer would: for raw est ≤
    // 2.5m with empty registers, est = m·ln(m/(m−n_set)) (Flajolet
    // §4) — the regime every node on this small fixture graph is in.
    val m = graft.ops.Hll.M.toDouble
    var relErrs = List.empty[Double]
    sk.foreach { r =>
      val (d1, reach) = exact(r.getLong(0))
      assert(r.getLong(1) === d1, s"n_1hop diverged at u=${r.getLong(0)}")
      val raw = r.getDouble(2)
      val nSet = r.getLong(3).toDouble
      val est =
        if (raw <= 2.5 * m && nSet < m) m * math.log(m / (m - nSet))
        else raw
      relErrs ::= math.abs(est - reach) / math.max(1.0, reach)
    }
    // linear counting at n ≪ m is tight: median must sit within a few
    // percent, and no node may be off by more than ~25%
    val sorted = relErrs.sorted
    val median = sorted(sorted.size / 2)
    assert(median <= 0.05, f"median rel-err $median%.3f too loose")
    assert(sorted.last <= 0.25, f"worst rel-err ${sorted.last}%.3f too loose")
    org.apache.spark.sql.graftbridge.Bridge.releaseLocalCheckpoint(a)
  }

  test("sketch absorbs duplicate candidates: pre-deduped input gives " +
      "the identical registers as a duplicated one") {
    val base = adj().localCheckpoint()
    val dup = base.unionAll(base) // every edge twice → every wedge 4×
    val s1 = GraphIter.twoHopReachSketch(base)
      .select("u", "n_set", "s_total")
    // degrees differ (duplication doubles n_1hop) but the SKETCH state
    // must not move: max-merge is idempotent
    val s2 = GraphIter.twoHopReachSketch(dup)
      .select("u", "n_set", "s_total")
    assert(s1.exceptAll(s2).count() === 0)
    assert(s2.exceptAll(s1).count() === 0)
    org.apache.spark.sql.graftbridge.Bridge.releaseLocalCheckpoint(base)
  }
}
