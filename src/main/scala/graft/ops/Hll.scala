package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch, bit-exact cross-engine.
  *
  * Classic HLL (Flajolet et al. 2007): hash each key, use the low
  * `p = 9` bits as a register index (m = 512 registers), and keep per
  * register the maximum ρ = 1 + leading-zero-count of the remaining
  * 51 hash bits. Estimate = α·m²/Σ 2^−M_j. Fixed O(m) state per group
  * where exact COUNT(DISTINCT) state is unbounded — with standard error
  * 1.04/√m ≈ 4.6 % at m = 512. Complements the KMV sketch
  * (`agg_approx_distinct_kmv`): HLL state is 6 bits/register vs KMV's
  * 64-bit hashes, and HLL unions are register-wise max (no re-sort).
  *
  * Cross-engine determinism (the whole design):
  *   - the hash is the md5-prefix 60-bit value (same family as
  *     [[TextHash.h31]], WITHOUT the mod-P31 reduction — HLL needs the
  *     raw uniform bits), identical by construction in DuckDB as
  *     `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`;
  *   - ρ is computed with INTEGER STRING ops (`52 − length(bin(w))`),
  *     not a transcendental log2, so both engines agree exactly;
  *   - the harmonic-mean denominator Σ 2^−M_j is scaled by 2^52 into
  *     a pure BIGINT sum (each term `1 << (52 − M_j)`; ≤ 2^61 total,
  *     no overflow) — exact in any summation order, where the
  *     textbook double sum spans 52 binades and would round
  *     order-dependently;
  *   - the final estimate is ONE double expression over that exact
  *     integer, written with identical decimal literals on both
  *     engines. The small-range linear-counting correction
  *     (m·ln(m/V)) is deliberately NOT applied inline — ln is
  *     transcendental; `n_set` rides along so a consumer can apply
  *     any correction downstream.
  *
  * Plan shape at 100 TB: one scan; groupBy(group, register) max-agg
  * with map-side partials bounds the shuffle at tasks × groups × 512
  * rows regardless of input size; the register→estimate fold touches
  * ≤ 512 rows per group.
  *
  * Reference anchor: the reference engine keeps exact per-key state in
  * an unbounded process-local HashMap (`/root/reference/src/main.rs:207`)
  * — this sketch is the bounded-state form of the same "how many
  * distinct keys" question at corpus scale.
  */
object Hll {

  /** Register count m = 2^9. */
  val M = 512

  /** Sub-register hash width (51 bits) + 1: ρ ∈ [1, 52]; the exact
    * integer denominator scales each 2^−ρ term by 2^52.
    */
  private val Shift = 52

  private val Pow52 = 1L << 52

  /** Raw 60-bit md5-prefix hash (no mod reduction — see class doc),
    * as the codegen'd native kernel; [[raw60Hof]] is the
    * built-in-functions reference form (equivalence anchored in
    * HllSuite, and the DuckDB mirror computes exactly it).
    */
  def raw60(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.functions.Raw60F(
      Bridge.expression(c.cast("string"))))
  }

  /** Built-in-functions form of [[raw60]]. */
  def raw60Hof(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Per-(group, register) max-ρ table: columns (g, bucket, m_j). */
  def registers(df: DataFrame, group: Column, key: Column): DataFrame =
    registersFromHash(df.select(group.as("g"), raw60(key).as("h")))

  /** [[registers]] over a PRE-hashed stream (g, h) — for callers whose
    * candidate stream repeats keys many times (the two-hop wedge set:
    * Σ deg² rows over ≤ V distinct endpoints): hashing once at the
    * edge level and letting the join PROPAGATE `h` turns Σ deg² md5
    * computations into E — measured 15.2s → the join-bound cost at
    * sf0.1. The register derivation is unchanged, so estimates are
    * bit-identical to hashing per row.
    */
  def registersFromHash(gh: DataFrame): DataFrame =
    registersFromParts(gh.select(col("g"),
      bucketOf(col("h")).as("bucket"), rhoOf(col("h")).as("rho")))

  /** Register index of a raw60 hash — `h % 512` as an exact bit op
    * (h ≥ 0, M = 2^9, so `h & 511` ≡ the SQL form).
    */
  def bucketOf(h: Column): Column = h.bitwiseAND(lit((M - 1).toLong))

  /** ρ of a raw60 hash via the native msb kernel — `h DIV 512` is the
    * exact `shiftright(h, 9)` for h ≥ 0 (NEVER a double divide: 60-bit
    * values exceed double's 2^53 integer range), and 52 −
    * length(bin(w)) = 51 − floorLog2(w) for w > 0 by the FloorLog2F
    * construction (bin() would materialize a string per row on
    * Σ deg²-sized streams).
    */
  def rhoOf(h: Column): Column = {
    val w = shiftright(h, 9)
    when(w === 0L, lit(Shift))
      .otherwise(lit(Shift - 1) - graft.ops.Bits.floorLog2(w))
  }

  /** Final fold of a pre-derived (g, bucket, rho) stream — for callers
    * that compute the register parts BEFORE a fan-out join (the
    * two-hop wedge: bucket/ρ depend on h alone, so deriving them at
    * the EDGE level and propagating through the join does the scalar
    * work E times instead of Σ deg² times).
    */
  def registersFromParts(parts: DataFrame): DataFrame =
    parts.groupBy("g", "bucket")
      .agg(max(col("rho")).as("m_j"))

  /** Fold a register table to (g, n_set, s_total, est_distinct). */
  def estimate(regs: DataFrame): DataFrame =
    regs.groupBy("g")
      .agg(
        count(lit(1)).as("n_set"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($Shift - m_j AS INT))"))
          .as("s_ne"))
      .select(col("g"), col("n_set"),
        (col("s_ne") + (lit(M.toLong) - col("n_set")) * lit(Pow52))
          .as("s_total"))
      .withColumn("est_distinct", expr(estSql("s_total")))

  /** The estimate expression, shared verbatim with the DuckDB mirror:
    * α_m · m² · 2^52 / S with α_m = 0.7213/(1 + 1.079/m). Every literal
    * is e-notation ON PURPOSE: Spark parses plain `0.7213` as
    * DECIMAL(4,4) (decimal arithmetic, different rounding) while DuckDB
    * parses it as DOUBLE — `7213e-4` is DOUBLE in both grammars, so the
    * identical token stream evaluates to the identical double.
    */
  def estSql(sTotal: String): String =
    s"(7213e-4 / (1e0 + 1079e-3 / 512e0)) * 262144e0 * 4503599627370496e0" +
      s" / CAST($sTotal AS DOUBLE)"

  // --- packed register layout (round-13, VERDICT r12 task #2): one
  // row per group holding a 512-byte binary register array (byte b =
  // ρ of register b, 0 = unset) merged by a codegen'd byte-wise-max
  // declarative aggregate — 512× fewer state rows than the long
  // (g, bucket, m_j) format at bit-identical semantics (the ρ/n_set/
  // s_total derivations are shared, HyperBallPackedSuite pins
  // equality), so the DuckDB mirrors stay on the long-format CTEs
  // untouched. Used by the HyperBall loop and the two-hop-reach
  // sketch, where per-group register rows were the measured shuffle
  // and GC driver.

  private def bridged(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(e)
  private def expOf(c: Column) =
    org.apache.spark.sql.graftbridge.Bridge.expression(c)

  /** (bucket, w) → single-register packed array (scan side). */
  def packCol(bucket: Column, w: Column): Column =
    bridged(graft.functions.HllPackF(expOf(bucket), expOf(w)))

  /** Byte-wise-max AGGREGATE over packed arrays (map-side partials). */
  def maxAggCol(reg: Column): Column =
    bridged(graft.functions.HllMaxAgg(expOf(reg)).toAggregateExpression())

  /** Packed array → set-register count (long format's COUNT(*)). */
  def nSetCol(reg: Column): Column =
    bridged(graft.functions.HllNSetF(expOf(reg)))

  /** Packed array → exact Σ 2^(52−ρ) over set registers. */
  def sNeCol(reg: Column): Column =
    bridged(graft.functions.HllSNeF(expOf(reg)))

  /** Packed per-group register table: columns (g, reg binary). The
    * candidate stream may carry DUPLICATE (g, key) rows — the
    * byte-max merge absorbs them, which is exactly what lets callers
    * skip an exact pre-distinct (the two-hop-reach sketch's point).
    */
  def packedRegisters(df: DataFrame, group: Column, key: Column): DataFrame =
    df.select(group.as("g"), raw60(key).as("h"))
      .selectExpr("g", s"h % $M AS bucket", s"h DIV $M AS w")
      .select(col("g"), packCol(col("bucket"), col("w")).as("reg"))
      .groupBy("g").agg(maxAggCol(col("reg")).as("reg"))

  /** Fold a packed register table (g, reg) to the IDENTICAL
    * (g, n_set, s_total, est_distinct) surface as [[estimate]].
    */
  def packedEstimate(regs: DataFrame): DataFrame =
    regs.select(col("g"), nSetCol(col("reg")).as("n_set"),
      sNeCol(col("reg")).as("s_ne"))
      .select(col("g"), col("n_set"),
        (col("s_ne") + (lit(M.toLong) - col("n_set")) * lit(Pow52))
          .as("s_total"))
      .withColumn("est_distinct", expr(estSql("s_total")))

  /** DuckDB mirror of registers→estimate over a CTE named `hashed`
    * with columns (g, h).
    */
  def duckCtes: String =
    s"""hllb AS (SELECT g, h % $M AS bucket, h // $M AS w FROM hashed),
       |hllr AS (
       |  SELECT g, bucket,
       |    MAX(CASE WHEN w = 0 THEN $Shift
       |        ELSE $Shift - length(bin(w)) END) AS m_j
       |  FROM hllb GROUP BY 1, 2),
       |hlls AS (
       |  SELECT g, COUNT(*) AS n_set,
       |    CAST(SUM(CAST(1 AS BIGINT) << CAST($Shift - m_j AS INT))
       |      AS BIGINT)
       |      + ($M - COUNT(*)) * ${Pow52} AS s_total
       |  FROM hllr GROUP BY 1)""".stripMargin
}
