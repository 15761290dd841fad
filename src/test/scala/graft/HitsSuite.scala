package graft

import org.apache.spark.sql.functions._

import graft.ops.Hits

/** Pins [[graft.ops.Hits]] against a sequential reimplementation of the
  * quantized iteration (exact integer sums + the shared floor-normalize
  * IEEE sequence), plus the structural properties: mutual reinforcement
  * must rank an item endorsed by strong hubs above one with the same
  * degree from weak hubs, and the result must be independent of input
  * partitioning (the sums are exact integers — any float in the
  * aggregation would break this).
  */
class HitsSuite extends SparkSpec {

  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], iters: Int) =
    Hits(edges.toDF("src", "dst"), iters)
      .as[(Long, String, Long)].collect().toSet

  /** Sequential mirror of the op's arithmetic. */
  private def reference(
      edges: Seq[(Long, Long)], iters: Int): Set[(Long, String, Long)] = {
    val e = edges.distinct
    def normalize(s: Map[Long, Long]): Map[Long, Long] = {
      val t = s.values.sum
      s.map { case (k, v) =>
        k -> math.floor(v.toDouble / t.toDouble * 1e9).toLong }
    }
    var hubs = e.map(_._1).distinct.map(_ -> 1000000000L).toMap
    var auths = Map.empty[Long, Long]
    for (_ <- 1 to iters) {
      auths = normalize(e.groupBy(_._2).map { case (it, es) =>
        it -> es.map(x => hubs(x._1)).sum })
      hubs = normalize(e.groupBy(_._1).map { case (u, es) =>
        u -> es.map(x => auths(x._2)).sum })
    }
    hubs.map { case (u, s) => (u, "hub", s) }.toSet ++
      auths.map { case (it, s) => (it, "auth", s) }
  }

  // 4 users, 4 items: items 100/101 shared by the "good" hubs 1-3,
  // item 102 only by loner 4, item 103 by everyone
  private val graph = Seq[(Long, Long)](
    1L -> 100L, 2L -> 100L, 3L -> 100L,
    1L -> 101L, 2L -> 101L,
    4L -> 102L,
    1L -> 103L, 2L -> 103L, 3L -> 103L, 4L -> 103L)

  test("matches the sequential quantized iteration") {
    for (iters <- Seq(1, 3))
      assert(run(graph, iters) == reference(graph, iters), s"iters=$iters")
  }

  test("mutual reinforcement orders authorities by hub quality") {
    val scores = run(graph, 3).collect {
      case (n, "auth", s) => n -> s }.toMap
    // more strong endorsements -> more authority; the loner-only item
    // trails everything the connected hubs touch
    assert(scores(103L) > scores(100L))
    assert(scores(100L) > scores(101L))
    assert(scores(101L) > scores(102L))
  }

  test("result is partitioning-independent") {
    val base = run(graph, 2)
    val shuffled = Hits(
      graph.reverse.toDF("src", "dst").repartition(7), 2)
      .as[(Long, String, Long)].collect().toSet
    assert(shuffled == base)
  }

  test("per-side scores sum to the fixed-point unit (floor slack only)") {
    for (kind <- Seq("hub", "auth")) {
      val side = run(graph, 3).filter(_._2 == kind)
      val total = side.toSeq.map(_._3).sum
      assert(total <= 1000000000L && total > 1000000000L - side.size,
        s"$kind sum $total")
    }
  }
}
