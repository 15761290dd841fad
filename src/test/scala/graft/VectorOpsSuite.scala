package graft

import org.apache.spark.sql.functions._
import graft.ops.VectorOps

class VectorOpsSuite extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Seq(1f, 0f, 0f), Seq(0f, 1f, 0f)), // orthogonal
    (Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)), // identical
    (Seq(1f, 1f, 0f), Seq(1f, 0f, 0f))) // 45 degrees
    .toDF("a", "b")

  test("dot, norm, cosine on known vectors") {
    val out = df.select(
      VectorOps.dot(col("a"), col("b")).as("dot"),
      VectorOps.norm(col("a")).as("na"),
      VectorOps.cosine(col("a"), col("b")).as("cos")).collect()
    assert(out(0).getDouble(0) === 0.0)
    assert(out(0).getDouble(2) === 0.0)
    assert(out(1).getDouble(0) === 14.0)
    assert(math.abs(out(1).getDouble(2) - 1.0) < 1e-12)
    assert(math.abs(out(2).getDouble(2) - math.sqrt(0.5)) < 1e-12)
  }

  test("signBands is deterministic, sized nBands, buckets within 2^bits") {
    val vecs = (0 until 50).map(i =>
      Tuple1((0 until 8).map(j => math.sin(i * 8 + j).toFloat)))
      .toDF("v")
    def run() = vecs.select(VectorOps.signBands(col("v")).as("b"))
      .collect().map(_.getSeq[Int](0))
    val (b1, b2) = (run(), run())
    assert(b1.map(_.toList).toSeq === b2.map(_.toList).toSeq)
    assert(b1.forall(_.length === 8))
    assert(b1.flatten.forall(b => b >= 0 && b < 65536))
    assert(b1.map(_.head).distinct.length > 1,
      "buckets should spread across vectors")
  }

  test("signBands native matches HOF reference bit-for-bit") {
    val vecs = (0 until 40).map(i =>
      Tuple1((0 until 16).map(j => (math.sin(i * 16 + j) * 3).toFloat)))
      .toDF("v")
    val diff = vecs.select(
      VectorOps.signBands(col("v"), 4, 8).as("nat"),
      VectorOps.signBandsHof(col("v"), 4, 8).as("hof"))
      .filter(col("nat") =!= col("hof"))
    assert(diff.count() === 0L)
  }

  test("identical vectors share all band buckets (LSH precondition)") {
    val v = Seq(0.3f, -0.7f, 0.2f, 0.9f)
    val b = Seq(Tuple1(v), Tuple1(v)).toDF("v")
      .select(VectorOps.signBands(col("v")).as("b"))
      .collect().map(_.getSeq[Int](0))
    assert(b(0).toList === b(1).toList)
  }

  test("hyperplane family has genuinely distinct planes (no j-period)") {
    // The retired (i·(j+3)) mod 5 family repeated every 5 planes; the
    // multiply-shift family must not. Compare component vectors pairwise
    // over a 64-dim index range for the first 128 planes.
    val comps = (0 until 128).map(j =>
      (1 to 64).map(i => graft.functions.SignBandsHelper.component(i, j)))
    assert(comps.distinct.length === 128)
  }
}
