package graft

import graft.ops.PcaPower

/** Pins [[graft.ops.PcaPower]] (top principal component by fixed-point
  * power iteration) on corpora with a KNOWN principal axis: the
  * recovered loading vector must align with the planted direction, the
  * pivot convention must hold (some component ≡ 1e6, everything else
  * ≤ in magnitude), and the Rayleigh explained-variance share must
  * match the planted anisotropy. Guards (dim mismatch, empty input)
  * fail loudly.
  */
class PcaPowerSuite extends SparkSpec {

  import spark.implicits._

  private def corpus(dims: Int, axis: Int, n: Int): Seq[Array[Float]] =
    // points spread along `axis` (variance ~ t²) with small
    // deterministic off-axis jitter — PC1 must be the planted axis
    (0 until n).map { t =>
      Array.tabulate(dims) { j =>
        val jitter = (((t * 31 + j) * 2654435761L % 100) / 5000.0f) - 0.01f
        if (j == axis) (t - n / 2) * 0.1f + jitter else jitter
      }
    }

  private def run(vecs: Seq[Array[Float]], dims: Int, iters: Int = 12) =
    PcaPower(vecs.toDF("embedding"), "embedding", dims, iters)
      .as[(Long, Long, Double)].collect().sortBy(_._1)

  test("recovers a planted principal axis and the pivot convention") {
    for (axis <- Seq(0, 3, 7)) {
      val out = run(corpus(8, axis, 50), 8)
      assert(out.length == 8)
      val loadings = out.map(_._2)
      // pivot convention: the dominant component is exactly 1e6 and
      // every other |loading| is ≤ it
      assert(loadings(axis) == 1000000L,
        s"axis $axis loading ${loadings(axis)}")
      assert(loadings.forall(l => math.abs(l) <= 1000000L))
      // off-axis loadings are jitter-scale (≪ 10% of the pivot)
      assert(loadings.zipWithIndex.filter(_._2 != axis)
        .forall { case (l, _) => math.abs(l) < 100000L })
      // planted anisotropy: PC1 carries nearly all the variance
      val ratio = out.head._3
      assert(out.forall(_._3 == ratio), "lambda_ratio must be constant")
      assert(ratio > 0.9 && ratio <= 1.0 + 1e-9, s"ratio $ratio")
    }
  }

  test("an isotropic pair-axis corpus splits variance and still pivots") {
    // equal variance on dims 0 and 1 but correlated (x, x) — PC1 is the
    // diagonal: both loadings ~1e6, ratio ~1 (rank-1 despite two dims)
    val vecs = (0 until 40).map { t =>
      Array.tabulate(4)(j =>
        if (j <= 1) (t - 20) * 0.1f else 0.001f * ((t * 7 + j) % 5))
    }
    val out = run(vecs, 4)
    val l = out.map(_._2)
    assert(l(0) == 1000000L || l(1) == 1000000L)
    assert(math.abs(l(0) - l(1)) < 20000L, s"diagonal loadings $l")
    assert(out.head._3 > 0.95)
  }

  test("project: exact integer dot with the solved loadings") {
    val vecs = corpus(8, 3, 50)
    val loadings = run(vecs, 8).map(_._2)
    val out = PcaPower.project(
      vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding"),
      "vec_id", "embedding", 8, 12)
      .as[(Long, Long)].collect().toMap
    assert(out.size == vecs.size)
    vecs.zipWithIndex.foreach { case (v, i) =>
      val expect = v.zip(loadings).map { case (e, l) =>
        math.floor(e.toDouble * 1e6).toLong * l }.sum
      assert(out(i.toLong) == expect, s"row $i")
    }
    // the planted axis dominates, so projections must be rank-ordered
    // by the axis coordinate: monotone in t
    val byId = (0 until vecs.size).map(i => out(i.toLong))
    assert(byId.sliding(2).forall(p => p(0) <= p(1)),
      "projection must be monotone along the planted axis")
  }

  test("guards: dim mismatch and empty input fail loudly") {
    val bad = intercept[IllegalArgumentException] {
      run(corpus(8, 0, 10), 9)
    }
    assert(bad.getMessage.contains("expected 9 dims"))
    val empty = intercept[IllegalArgumentException] {
      run(Seq.empty[Array[Float]], 4)
    }
    assert(empty.getMessage.contains("empty input"))
  }
}
