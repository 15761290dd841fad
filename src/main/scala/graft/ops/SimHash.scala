package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SimHash document sketch: each token votes ±1 on every bit of its hash;
  * the sketch keeps the sign of each bit's vote total. Near-identical
  * documents land on identical (or hamming-close) sketches.
  *
  * Pure scan-side projection — one 16-bit sketch per row, no shuffle, no
  * per-token explode (the bit counts are `size(filter(...))` over the
  * hashed-token array). Grouping by the sketch value afterwards is a
  * shuffle on a 16-bit key: at 100 TB the collision buckets ARE the
  * near-dup clusters, so downstream work scales with duplicate mass, not
  * corpus size. Bits kept small (16) so the oracle stays integer-exact;
  * widen to 64 in production by raising `bits`.
  */
object SimHash {

  /** 16-bit (default) simhash over a hashed-token array column.
    * Tie (equal ±votes) contributes 0 — matches the strict `>` in the
    * DuckDB mirror.
    */
  def simhash(xs: Column, bits: Int = 16): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.functions.SimHashF(Bridge.expression(xs), bits))
  }

  /** Built-in-functions form of [[simhash]] (equivalence anchor). */
  def simhashHof(xs: Column, bits: Int = 16): Column = {
    val terms = (0 until bits).map { i =>
      when(size(filter(xs, x => shiftright(x, i).bitwiseAND(lit(1L)) === 1L)) * 2
             > size(xs),
           lit(1L << i)).otherwise(lit(0L))
    }
    terms.reduce(_ + _)
  }
}
