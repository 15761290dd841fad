package graft.queries

/** The exact-Pearson tail shared by `ts_autocorr` and
  * `graph_assortativity`: one token stream per engine over the five
  * classical sums (columns `n, sx, sy, sxx, syy, sxy`, accumulated in
  * DECIMAL(38,0) / HUGEINT by the caller), CASE-guarded on the
  * exact-integer zero-variance test, converting each combination to
  * double ONCE (VARCHAR-routed on the DuckDB side — the HUGEINT→DOUBLE
  * double-rounding fix). Factored so a change to the guard or the IEEE
  * op order cannot drift between sites or engines (the BenfordChi2 /
  * MomentSqls discipline). `agg_corr` keeps its own variant ON
  * PURPOSE: its Σx stays BIGINT under a documented per-row bound, so
  * its token stream is legitimately different.
  */
private[queries] object CorrTail {

  /** Spark SQL fragment (sums are DECIMAL(38,0)); alias at the call
    * site.
    */
  val spark: String =
    "CASE WHEN CAST(n AS DECIMAL(38,0)) * sxx - sx * sx > 0" +
      " AND CAST(n AS DECIMAL(38,0)) * syy - sy * sy > 0 THEN" +
      " CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)" +
      " / sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx" +
      " AS DOUBLE))" +
      " / sqrt(CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy" +
      " AS DOUBLE)) END"

  /** DuckDB fragment (sums are HUGEINT); alias at the call site. */
  val duck: String =
    """CASE WHEN CAST(n AS HUGEINT) * sxx - sx * sx > 0
      |        AND CAST(n AS HUGEINT) * syy - sy * sy > 0
      |  THEN
      |    CAST(CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS VARCHAR)
      |      AS DOUBLE)
      |    / sqrt(CAST(CAST(CAST(n AS HUGEINT) * sxx - sx * sx
      |      AS VARCHAR) AS DOUBLE))
      |    / sqrt(CAST(CAST(CAST(n AS HUGEINT) * syy - sy * sy
      |      AS VARCHAR) AS DOUBLE))
      |  END""".stripMargin
}
