package graft

import org.apache.spark.sql.functions._

/** The injected bound-aware levenshtein rewrite: `dist <= k` compiles
  * to a free length guard plus the banded thresholded DP, with results
  * identical on every shape (bare/cast comparison, strict bound, null
  * inputs).
  */
class LevenshteinGuardSuite extends SparkSpec {
  import spark.implicits._

  private val pairs = Seq(
    ("small ring", "small king"), // dist 1
    ("red widget", "red widget"), // dist 0
    ("hot gear", "cold gears"), // dist > 2, len diff 2
    ("abcdefgh", "x"), // len diff 7 — guard kills it
    (null, "ring"), ("ring", null)) // null propagation

  test("the rewrite fires: banded DP + length guard in the optimized plan") {
    GraftExtensions.register(spark)
    val df = Tables(spark, "/root/testdata/sf0.001", "part")
      .filter(expr("levenshtein(p_name, p_brand) <= 2"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("levenshtein(p_name") && opt.contains("Some(2)"),
      s"expected thresholded levenshtein:\n$opt")
    assert(opt.contains("length(p_name"),
      s"expected the length guard:\n$opt")
  }

  test("guarded results ≡ unguarded on every boundary shape") {
    GraftExtensions.register(spark)
    val df = pairs.toDF("a", "b")
    // evaluate through a scan-shaped plan (literals would constant-fold)
    for (pred <- Seq(
        "levenshtein(a, b) <= 2",
        "levenshtein(a, b) < 2",
        "CAST(levenshtein(a, b) AS BIGINT) <= 1",
        "2 >= levenshtein(a, b)",
        // threshold-0 rewrites (ADVICE r4): `< 1` / `<= 0` exercise
        // the banded implementation's equality-only path against the
        // dist-0 fixture pair
        "levenshtein(a, b) < 1",
        "levenshtein(a, b) <= 0")) {
      val guarded = df.filter(expr(pred)).select("a").collect().toSet
      // reference: compute the distance first so the comparison sits on
      // a projected column the rule leaves alone
      val ref = df.withColumn("d", expr("levenshtein(a, b)"))
        .filter(expr(pred.replace("levenshtein(a, b)", "d")))
        .select("a").collect().toSet
      assert(guarded === ref, s"pred: $pred")
    }
  }

  test("dedup_fuzzy_name keeps its 24 pairs under the rewrite") {
    GraftExtensions.register(spark)
    val out = SparkEntry.queries("dedup_fuzzy_name")(
      spark, "/root/testdata/sf0.01")
    assert(out.count() === 24)
  }
}
