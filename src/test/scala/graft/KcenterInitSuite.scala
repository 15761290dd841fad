package graft

import org.apache.spark.sql.functions._

import graft.ops.KcenterInit

/** Pins [[graft.ops.KcenterInit]] (Gonzalez farthest-first traversal)
  * against an in-test brute-force reimplementation of the greedy rule —
  * the distributed argmin/argmax composition must reproduce the
  * sequential algorithm exactly, including the fixed-point distance
  * arithmetic and both tie-breaks (seed = min id; per-round argmax
  * breaks distance ties on the smallest id).
  */
class KcenterInitSuite extends SparkSpec {

  import spark.implicits._

  /** Brute-force greedy trajectory with the op's exact arithmetic:
    * fixed-point l2 = floor(1e9 · Σ (a_i − b_i)²) folded left in index
    * order on doubles widened from floats.
    */
  private def reference(
      vecs: Seq[(Long, Array[Float])], k: Int): Seq[(Long, Long, Long)] = {
    def l2fix(a: Array[Float], b: Array[Float]): Long = {
      var acc = 0.0
      var i = 0
      while (i < a.length) {
        val d = a(i).toDouble - b(i).toDouble
        acc += d * d
        i += 1
      }
      math.floor(acc * 1e9).toLong
    }
    val sorted = vecs.sortBy(_._1)
    var chosen = Vector((sorted.head._1, 0L))
    while (chosen.size < math.min(k, vecs.size)) {
      val centerVecs = chosen.map { case (id, _) =>
        vecs.find(_._1 == id).get._2 }
      val cand = vecs
        .filterNot(v => chosen.exists(_._1 == v._1))
        .map { case (id, v) =>
          (id, centerVecs.map(c => l2fix(v, c)).min) }
      val best = cand.minBy { case (id, d) => (-d, id) }
      chosen :+= best
    }
    chosen.zipWithIndex.map { case ((id, d), i) => ((i + 1).toLong, id, d) }
  }

  private def run(vecs: Seq[(Long, Array[Float])], k: Int) =
    KcenterInit(vecs.toDF("vec_id", "embedding"), "vec_id", "embedding", k)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq

  test("matches the sequential greedy trajectory on a random corpus") {
    // deterministic pseudo-random floats (no Random: reproducible)
    val vecs = (0L until 60L).map { id =>
      (id, Array.tabulate(8) { j =>
        (((id * 31 + j) * 2654435761L % 1000) / 250.0f) - 2.0f })
    }
    assert(run(vecs, 7) == reference(vecs, 7))
  }

  test("selection radii are non-increasing after the seed") {
    val vecs = (0L until 40L).map { id =>
      (id, Array.tabulate(4) { j =>
        (((id * 17 + j * 7) % 23).toFloat / 5.0f) })
    }
    val radii = run(vecs, 6).drop(1).map(_._3)
    assert(radii == radii.sorted.reverse,
      s"greedy min-distance sequence must be non-increasing: $radii")
  }

  test("distance ties break on the smallest id") {
    // two far-apart duplicate groups: after the seed (id 0) the farthest
    // distance is shared by ids 10 and 11 — 10 must win
    val vecs = Seq(
      0L -> Array(0f, 0f), 1L -> Array(0f, 0f),
      10L -> Array(5f, 5f), 11L -> Array(5f, 5f))
    val got = run(vecs, 2)
    assert(got.map(_._2) == Seq(0L, 10L))
    assert(got == reference(vecs, 2))
  }

  test("k larger than the corpus stops early without duplicates") {
    val vecs = Seq(3L -> Array(1f, 0f), 7L -> Array(0f, 1f),
      9L -> Array(1f, 1f))
    val got = run(vecs, 10)
    assert(got.size == 3)
    assert(got.map(_._2).distinct.size == 3)
    assert(got == reference(vecs, 10))
  }
}
