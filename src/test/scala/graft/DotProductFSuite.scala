package graft

import org.apache.spark.sql.functions._

import graft.ops.VectorOps

/** Native codegen'd dot product: bit-identical to the HOF fold it
  * replaces, null-safe, SQL-registered via GraftExtensions.
  */
class DotProductFSuite extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int) = {
    val rng = new scala.util.Random(13)
    (0 until n).map(_ => (
      Array.fill(64)(rng.nextFloat() * 2 - 1).toSeq,
      Array.fill(64)(rng.nextFloat() * 2 - 1).toSeq))
      .toDF("a", "b")
  }

  test("bit-identical to the aggregate/zip_with fold on random vectors") {
    val out = vecs(500).select(
      VectorOps.dot(col("a"), col("b")).as("native"),
      VectorOps.dotHof(col("a"), col("b")).as("hof")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        "native and HOF folds must not differ by even one ULP")
    }
  }

  test("null array yields null, not a crash") {
    val df = Seq((Some(Seq(1f, 2f)), Option.empty[Seq[Float]]))
      .toDF("a", "b")
    val r = df.select(VectorOps.dot(col("a"), col("b")).as("d")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("SQL registration via GraftExtensions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .collect()(0).getDouble(0)
    assert(r === 11.0)
  }

  test("participates in whole-stage codegen (no fallback)") {
    // spark.range-derived input: a LocalRelation would be constant-folded
    // away before reaching the physical planner.
    val df = spark.range(100)
      .selectExpr("array(cast(id as float), cast(id+1 as float)) as a",
        "array(cast(id+2 as float), cast(id+3 as float)) as b")
      .select(VectorOps.dot(col("a"), col("b")).as("d"))
    // the `*(n)` prefix marks operators fused into a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("graft_dot")),
      s"expected codegen'd projection, got:\n$plan")
    assert(df.agg(sum(col("d"))).collect()(0).getDouble(0) > 0)
  }
}
