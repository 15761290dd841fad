package graft

import org.apache.spark.sql.functions._

import graft.queries.LpmSolve

/** Invariants for the closed-form least-squares solver: exact recovery
  * of a planted linear relationship (R² = 1, betas to machine
  * precision), NULL on a singular system, and the registered
  * distillation query landing in the honest band — high variance
  * explained, but strictly below 1 (the composite's symbol term and
  * clamps are real unexplained remainder).
  */
class LpmSolveSuite extends SparkSpec {

  /** Run the solver fragments over an (x1, x2, y) frame exactly as the
    * registered query does: exact DECIMAL sufficient statistics,
    * doubles once, shared Cramer/R² texts.
    */
  private def solve(rows: Seq[(Long, Long, Long)]): (Double, Double, Double, Double) = {
    import spark.implicits._
    val d38 = "decimal(38,0)"
    val feat = rows.toDF("x1", "x2", "yq")
    val r = feat.agg(
        count(lit(1)).cast(d38).as("cn"),
        sum(col("x1").cast(d38)).as("csx1"),
        sum(col("x2").cast(d38)).as("csx2"),
        sum(col("x1").cast(d38) * col("x1").cast(d38)).as("cs11"),
        sum(col("x1").cast(d38) * col("x2").cast(d38)).as("cs12"),
        sum(col("x2").cast(d38) * col("x2").cast(d38)).as("cs22"),
        sum(col("yq").cast(d38)).as("csy"),
        sum(col("x1").cast(d38) * col("yq").cast(d38)).as("cs1y"),
        sum(col("x2").cast(d38) * col("yq").cast(d38)).as("cs2y"),
        sum(col("yq").cast(d38) * col("yq").cast(d38)).as("csyy"))
      .select(
        col("cn").cast("double").as("n"),
        col("csx1").cast("double").as("sx1"),
        col("csx2").cast("double").as("sx2"),
        col("cs11").cast("double").as("s11"),
        col("cs12").cast("double").as("s12"),
        col("cs22").cast("double").as("s22"),
        col("csy").cast("double").as("sy"),
        col("cs1y").cast("double").as("s1y"),
        col("cs2y").cast("double").as("s2y"),
        col("csyy").cast("double").as("syy"))
      .select(col("n"), col("sy"), col("s1y"), col("s2y"), col("syy"),
        expr(LpmSolve.beta(LpmSolve.num0)).as("beta0"),
        expr(LpmSolve.beta(LpmSolve.num1)).as("beta1"),
        expr(LpmSolve.beta(LpmSolve.num2)).as("beta2"))
      .select(col("beta0"), col("beta1"), col("beta2"),
        expr(LpmSolve.r2).as("r2"))
      .collect().head
    (if (r.isNullAt(0)) Double.NaN else r.getDouble(0),
      if (r.isNullAt(1)) Double.NaN else r.getDouble(1),
      if (r.isNullAt(2)) Double.NaN else r.getDouble(2),
      if (r.isNullAt(3)) Double.NaN else r.getDouble(3))
  }

  test("planted linear relationship is recovered exactly (R^2 = 1)") {
    // y = 7 + 3*x1 - 2*x2 over a non-degenerate grid
    val rows = for (a <- 0L until 20L; b <- 0L until 20L)
      yield (a * 13 + b, b * 9 + a, 7 + 3 * (a * 13 + b) - 2 * (b * 9 + a))
    val (b0, b1, b2, r2) = solve(rows)
    assert(math.abs(b0 - 7.0) < 1e-6, s"beta0 $b0")
    assert(math.abs(b1 - 3.0) < 1e-9, s"beta1 $b1")
    assert(math.abs(b2 + 2.0) < 1e-9, s"beta2 $b2")
    assert(r2 > 1.0 - 1e-9, s"r2 $r2")
  }

  test("singular system (constant feature) yields NULL betas and r2") {
    val rows = (0L until 50L).map(i => (5L, 5L, i))
    val (b0, _, _, r2) = solve(rows)
    assert(b0.isNaN && r2.isNaN)
  }

  test("constant response: betas exist, r2 NULL (zero variance guard)") {
    val rows = (0L until 50L).map(i => (i, i * i % 17, 42L))
    val (b0, b1, b2, r2) = solve(rows)
    // exact fit through the constant: intercept 42, slopes 0
    assert(math.abs(b0 - 42.0) < 1e-6 &&
      math.abs(b1) < 1e-9 && math.abs(b2) < 1e-9)
    assert(r2.isNaN, "SST = 0 must not divide")
  }

  test("registered distillation lands in the honest band") {
    val r = SparkEntry.queries("text_quality_lpm")(
      spark, "/root/testdata/sf0.001").collect().head
    val r2 = r.getDouble(4)
    assert(r2 > 0.3 && r2 < 0.999,
      s"expected high-but-imperfect distillation fit, got $r2")
    assert(r.getLong(0) > 0)
  }
}
