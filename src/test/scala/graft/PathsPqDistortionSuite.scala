package graft

import org.apache.spark.sql.functions._

/** Round-12 batch-3 helpers: [[graft.queries.TemporalQueries
  * .pathsTopk]] (3-gram event paths) and [[graft.queries
  * .VectorQueries.pqDistortion]] (PQ self-reconstruction error).
  */
class PathsPqDistortionSuite extends SparkSpec {
  import spark.implicits._

  test("pathsTopk: hand-computed 3-gram counts and rank order") {
    // u1: a b a b  -> a>b>a, b>a>b
    // u2: a b a    -> a>b>a
    // ties on n=1 rank alphabetically after the n=2 path
    val ev = Seq(
      (1L, 1L, "a", 10L), (1L, 2L, "b", 20L),
      (1L, 3L, "a", 30L), (1L, 4L, "b", 40L),
      (2L, 5L, "a", 10L), (2L, 6L, "b", 20L), (2L, 7L, "a", 30L)
    ).toDF("user_id", "event_id", "event_type", "sec")
    val out = graft.queries.TemporalQueries.pathsTopk(ev)
      .as[(String, Long, Long)].collect().sortBy(_._3)
    assert(out.toSeq == Seq(("a>b>a", 2L, 1L), ("b>a>b", 1L, 2L)))
  }

  test("pathsTopk: same-sec ties order by event_id") {
    val ev = Seq(
      (1L, 1L, "x", 10L), (1L, 2L, "y", 10L), (1L, 3L, "z", 10L)
    ).toDF("user_id", "event_id", "event_type", "sec")
    val out = graft.queries.TemporalQueries.pathsTopk(ev)
      .as[(String, Long, Long)].collect()
    assert(out.toSeq == Seq(("x>y>z", 1L, 1L)))
  }

  test("pqDistortion: a corpus that IS the codebook reconstructs " +
      "exactly (0 distortion), and a far outlier does not") {
    // the 16 codebook source vectors (ids 0, 31, ..., 465): each
    // encodes to itself in every subspace -> efix 0
    val cbVecs = (0 until 16).map { i =>
      (i * 31L, Array.tabulate(64)(d => (i * 64 + d).toFloat / 1024f),
        0)
    }
    val zero = graft.queries.VectorQueries
      .pqDistortion(cbVecs.toDF("vec_id", "embedding", "label"))
      .as[(Int, Long, Double)].collect()
    assert(zero.toSeq == Seq((0, 16L, 0.0)))
    // add one distant vector under another label: its distortion is
    // strictly positive, the codebook label stays exact
    val out = graft.queries.VectorQueries
      .pqDistortion((cbVecs :+
        ((999L, Array.fill(64)(100f), 1)))
        .toDF("vec_id", "embedding", "label"))
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(out(0) == ((0, 16L, 0.0)))
    assert(out(1)._1 == 1 && out(1)._2 == 1L && out(1)._3 > 0.0)
  }
}
