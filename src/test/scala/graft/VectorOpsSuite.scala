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

  test("signBucket is deterministic and within [0, 2^nBits)") {
    val vecs = (0 until 50).map(i =>
      Tuple1((0 until 8).map(j => math.sin(i * 8 + j).toFloat)))
      .toDF("v")
    val b1 = vecs.select(VectorOps.signBucket(col("v")).as("b"))
      .collect().map(_.getInt(0))
    val b2 = vecs.select(VectorOps.signBucket(col("v")).as("b"))
      .collect().map(_.getInt(0))
    assert(b1.toSeq === b2.toSeq)
    assert(b1.forall(b => b >= 0 && b < 256))
    assert(b1.distinct.length > 1, "buckets should spread across vectors")
  }

  test("identical vectors share a bucket (LSH correctness precondition)") {
    val v = Seq(0.3f, -0.7f, 0.2f, 0.9f)
    val b = Seq(Tuple1(v), Tuple1(v)).toDF("v")
      .select(VectorOps.signBucket(col("v")).as("b"))
      .collect().map(_.getInt(0))
    assert(b(0) === b(1))
  }
}
