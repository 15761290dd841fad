package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode/Muthukrishnan 2005) for token frequencies:
  * the bounded-state answer to "how often does X occur?" when the exact
  * per-token frequency table would itself be shuffle-sized at 100 TB.
  *
  * The sketch is `Depth` rows × `Width` cells of counts; occurrence
  * (d, cell_d(token)) increments are a plain groupBy — mergeable
  * map-side partials, and the WHOLE sketch is ≤ Depth·Width cells
  * regardless of corpus size. `est(token) = min_d sketch[d][cell_d]`
  * overestimates only (collisions add, never subtract), with error
  * ≤ N·e/Width at confidence 1−e^−Depth.
  *
  * Determinism discipline: row hashes are affine maps of the md5-based
  * [[TextHash.h31]] — `((a_d·h + b_d) mod P31) mod Width` — exact int64
  * arithmetic (a_d ≤ 1031, h < 2^31 → products < 2^41), so the sketch
  * and every estimate are bit-identical cross-engine.
  */
object CountMin {

  val Depth = 4
  val Width = 1024

  /** Pairwise-independent-ish affine coefficients per row (fixed,
    * public; any distinct odd multipliers work for the fixture-scale
    * demo — production would draw them from a seeded PRNG).
    */
  val A: Seq[Long] = Seq(1L, 31L, 131L, 1031L)
  val B: Seq[Long] = Seq(0L, 17L, 71L, 173L)

  /** Cell index of row `d` for a pre-hashed token column `h`. */
  def cell(h: Column, d: Int): Column =
    ((h * A(d) + B(d)) % TextHash.P31) % Width

  /** Array of (d, cell) structs for one token hash — posexplode to get
    * the sketch increment rows. The DuckDB mirror is generated from
    * [[A]]/[[B]] as a VALUES list (see the freq_topk_cms oracle), so the
    * coefficients can't drift between engines.
    */
  def cells(h: Column): Column =
    array((0 until Depth).map(d =>
      struct(lit(d).as("d"), cell(h, d).as("cell"))): _*)
}
