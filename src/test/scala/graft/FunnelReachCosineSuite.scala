package graft

/** Round-12 batch-2 helpers: [[graft.queries.TemporalQueries
  * .strictFunnel]] (per-hop deadline funnel), [[graft.ops.GraphIter
  * .twoHopReach]], and [[graft.queries.VectorQueries
  * .centroidCosineHist]]. Expectations hand-computed.
  */
class FunnelReachCosineSuite extends SparkSpec {
  import spark.implicits._

  test("strictFunnel: deadlines gate each hop, first-touch greedy") {
    // w = 100:
    // u1 view@0 click@50 purchase@120  -> 120 <= 50+100    -> stage 3
    // u2 view@0 click@150              -> click misses     -> stage 1
    // u3 view@0 click@100 purchase@201 -> click at deadline
    //    (inclusive) but purchase > 100+100               -> stage 2
    // u4 click/purchase but NO view    -> absent
    // u5 purchase@30 view@40 click@50  -> purchase predates
    //    the click anchor                                  -> stage 2
    val ev = Seq(
      (1L, "view", 0L), (1L, "click", 50L), (1L, "purchase", 120L),
      (2L, "view", 0L), (2L, "click", 150L),
      (3L, "view", 0L), (3L, "click", 100L), (3L, "purchase", 201L),
      (4L, "click", 10L), (4L, "purchase", 20L),
      (5L, "purchase", 30L), (5L, "view", 40L), (5L, "click", 50L)
    ).toDF("user_id", "event_type", "sec")
    val out = graft.queries.TemporalQueries.strictFunnel(ev, 100L)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 1L), (2L, 2L), (3L, 1L)))
  }

  test("twoHopReach: path graph 1-2-3") {
    val adj = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("u", "v")
    val out = graft.ops.GraphIter.twoHopReach(adj)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 1L, 2L), (2L, 2L, 2L), (3L, 1L, 2L)))
  }

  test("twoHopReach: star centered on 1 — leaves see each other") {
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L))
    val adj = (e ++ e.map(_.swap)).toDF("u", "v")
    val out = graft.ops.GraphIter.twoHopReach(adj)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 3L, 3L), (2L, 1L, 3L),
      (3L, 1L, 3L), (4L, 1L, 3L)))
  }

  test("centroidCosineHist: hand-computed buckets") {
    // label 0: [1,0] and [0,1] -> centroid [0.5, 0.5];
    //   cos = 0.5 / sqrt(0.5) = 0.70710678... -> floor(14.14) = 14
    // label 1: [1,0] alone -> cos 1.0 -> bucket 20
    val e = Seq(
      (1L, Array(1f, 0f), 0), (2L, Array(0f, 1f), 0),
      (3L, Array(1f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = graft.queries.VectorQueries.centroidCosineHist(e)
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((0, 14L, 2L), (1, 20L, 1L)))
  }
}
