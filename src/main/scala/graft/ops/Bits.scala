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
}
