package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge

/** Column forms of the integer-bit native kernels (the TextHash.h31
  * pattern: one Scala entry point per codegen expression).
  */
object Bits {

  /** msb position of a non-negative long — `length(bin(v)) - 1`
    * without materializing the binary string ([[graft.functions
    * .FloorLog2F]]); the DuckDB mirrors stay on the bin() form.
    */
  def floorLog2(v: Column): Column =
    Bridge.column(graft.functions.FloorLog2F(Bridge.expression(v)))

  /** One-hot in-word bit of a NON-NEGATIVE id: `1L << (v % 64)` with a
    * loud per-row refusal of negatives — arithmetic shift floors
    * toward −∞ while the bit index wraps, so a negative id would shard
    * to the WRONG (word, bit) silently (the [[BitmapDistinct]].reduce
    * guard, applied to the pure-builtin bitmap tier: rollup, IVM,
    * rolling window, streaming). The guard is one codegen branch per
    * row; a fixture regen to signed ids fails with this message
    * instead of a hash mismatch three layers downstream.
    */
  def oneHot(v: Column): Column = {
    import org.apache.spark.sql.functions.{call_function, lit, when}
    when(v < lit(0L),
      call_function("raise_error",
        lit("bitmap one-hot: negative id (non-negative domain only)"))
        .cast("long"))
      .otherwise(call_function("shiftleft", lit(1L),
        (v % lit(WordSize.toLong)).cast("int")))
  }

  /** Bits per bitmap word. [[oneHot]]'s modulus and every word-index
    * projection must agree — use [[wordOf]] rather than a literal
    * `DIV 64` so the two can't drift (a desync silently mis-shards).
    */
  val WordSize = 64

  /** SQL fragment for the word index of an id column: `id DIV 64`. */
  def wordOf(idCol: String): String = s"$idCol DIV $WordSize"
}
