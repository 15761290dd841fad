package graft.queries

/** Closed-form 2-feature-plus-intercept least squares (the normal
  * equations solved by Cramer's rule) as ONE shared arithmetic text per
  * quantity — the CorrTail discipline scaled up to a 3×3 system. The
  * caller accumulates the nine sufficient statistics exactly
  * (DECIMAL(38,0) on Spark, HUGEINT on DuckDB), converts each to
  * DOUBLE once (VARCHAR-routed on DuckDB — the HUGEINT double-rounding
  * fix), exposes them as columns `n, sx1, sx2, s11, s12, s22, sy, s1y,
  * s2y`, and then these fragments evaluate bit-identically in either
  * engine: +,−,× on doubles are exactly rounded, and the
  * parenthesization is pinned here, in one place.
  *
  * System: [ n sx1 sx2 ; sx1 s11 s12 ; sx2 s12 s22 ] · β = [ sy, s1y,
  * s2y ] — the symmetric Gram matrix of (1, x1, x2).
  */
private[graft] object LpmSolve {

  /** det of the Gram matrix (cofactor expansion along the first row). */
  val det: String =
    "n * (s11 * s22 - s12 * s12)" +
      " - sx1 * (sx1 * s22 - s12 * sx2)" +
      " + sx2 * (sx1 * s12 - s11 * sx2)"

  /** Cramer numerators: column k of the Gram matrix replaced by the
    * response vector, expanded along that column's cofactors.
    */
  val num0: String =
    "sy * (s11 * s22 - s12 * s12)" +
      " - sx1 * (s1y * s22 - s12 * s2y)" +
      " + sx2 * (s1y * s12 - s11 * s2y)"

  val num1: String =
    "n * (s1y * s22 - s12 * s2y)" +
      " - sy * (sx1 * s22 - s12 * sx2)" +
      " + sx2 * (sx1 * s2y - s1y * sx2)"

  val num2: String =
    "n * (s11 * s2y - s1y * s12)" +
      " - sx1 * (sx1 * s2y - s1y * sx2)" +
      " + sy * (sx1 * s12 - s11 * sx2)"

  /** β_k guarded on a non-singular system; NULL betas on a degenerate
    * one (constant features), which the caller's scoring pass must
    * surface rather than mask.
    */
  def beta(num: String): String =
    s"CASE WHEN ($det) <> 0e0 THEN ($num) / ($det) END"

  /** Variance explained, computed from the SAME sufficient statistics
    * (never from per-row residuals, whose float summation would be
    * partial-order-dependent): SSE = Syy − βᵀ[Sy S1y S2y], SST = Syy −
    * Sy²/n. Expects `beta0..beta2` and the sums in scope as DOUBLE
    * columns; NULL when the response is constant or the system
    * singular.
    */
  val r2: String =
    "CASE WHEN syy - sy * sy / n > 0e0 AND beta0 IS NOT NULL THEN" +
      " 1e0 - (syy - (beta0 * sy + beta1 * s1y + beta2 * s2y))" +
      " / (syy - sy * sy / n) END"
}
