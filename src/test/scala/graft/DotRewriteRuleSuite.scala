package graft

import org.apache.spark.sql.functions._

import graft.ops.VectorOps

/** The injected optimizer rule: a SQL user's textbook HOF dot-product
  * fold compiles to the native kernel — and ONLY when the rewrite is
  * provably result-identical (non-null array elements).
  */
class DotRewriteRuleSuite extends SparkSpec {
  import spark.implicits._

  private val hofSql =
    "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"

  test("HOF fold over non-null float arrays rewrites to graft_dot") {
    GraftExtensions.register(spark)
    // a real scan (literals constant-fold into a LocalRelation before
    // the plan can be inspected); transform+coalesce proves
    // containsNull=false to the rule the way a user would
    val df = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(transform(col("embedding"), x => coalesce(x, lit(0f))).as("a"),
        transform(col("embedding"), x => coalesce(x, lit(0f))).as("b"))
      .selectExpr(s"$hofSql AS d")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_dot"),
      s"expected the kernel in the optimized plan:\n$optimized")
    // and the value a pure-literal pipeline produces is the fold's value
    val lit3 = Seq((Seq(1f, 2f, 3f), Seq(0.5f, -1f, 2f)))
      .toDF("a", "b").selectExpr(s"$hofSql AS d")
    assert(lit3.collect().head.getDouble(0) === (0.5 - 2.0 + 6.0))
  }

  test("rewrite matches the HOF result on fixture embeddings (both operand orders)") {
    GraftExtensions.register(spark)
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      // parquet list elements are nullable; prove non-nullness to the
      // rule the way a user would, via an element-wise coalesce
      .select(transform(col("embedding"), x => coalesce(x, lit(0f))).as("v"))
    val out = e.select(
      VectorOps.dot(col("v"), col("v")).as("native"),
      VectorOps.dotHof(col("v"), col("v")).as("hof"))
    assert(out.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("unequal-length arrays keep the fold's NULL (length-guarded rewrite)") {
    GraftExtensions.register(spark)
    // zip_with pads the short side with nulls → the fold yields NULL;
    // the rewritten form must preserve that, not the kernel's min(len)
    val df = Seq((Seq(1f, 2f), Seq(3f)), (Seq(1f, 2f), Seq(3f, 4f)))
      .toDF("a", "b")
      .selectExpr(s"$hofSql AS d")
    val rows = df.collect()
    assert(rows(0).isNullAt(0), "length mismatch must stay NULL")
    assert(rows(1).getDouble(0) === 11.0)
  }

  test("nullable-element arrays are NOT rewritten (semantics diverge on null)") {
    GraftExtensions.register(spark)
    val df = Seq((Seq[java.lang.Float](1f, null, 3f), Seq[java.lang.Float](1f, 1f, 1f)))
      .toDF("a", "b")
      .selectExpr(s"$hofSql AS d")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("graft_dot"),
      s"nullable elements must keep the fold:\n$optimized")
    assert(df.collect().head.isNullAt(0),
      "the fold's null propagation must be preserved")
  }
}
