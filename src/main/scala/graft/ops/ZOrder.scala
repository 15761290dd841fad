package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level surface of the Z-order curve (see
  * [[graft.functions.ZValueF]]): `zvalue` dispatches to the codegen'd
  * native expression; `zvalueHof` is the same arithmetic in built-in
  * column operators (the portable reference form the equivalence suite
  * pins bit-for-bit, and the template for the DuckDB oracle mirror).
  */
object ZOrder {

  def zvalue(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.functions.ZValueF(
      Bridge.expression(a), Bridge.expression(b)))
  }

  /** Built-in-operator form of the 31-bit dilation. */
  private def spreadHof(c: Column): Column = {
    def step(x: Column, sh: Int, mask: Long): Column =
      x.bitwiseOR(shiftleft(x, sh)).bitwiseAND(lit(mask))
    var x = c.bitwiseAND(lit(0x7FFFFFFFL))
    x = step(x, 16, 0x0000FFFF0000FFFFL)
    x = step(x, 8, 0x00FF00FF00FF00FFL)
    x = step(x, 4, 0x0F0F0F0F0F0F0F0FL)
    x = step(x, 2, 0x3333333333333333L)
    step(x, 1, 0x5555555555555555L)
  }

  def zvalueHof(a: Column, b: Column): Column =
    spreadHof(a).bitwiseOR(shiftleft(spreadHof(b), 1))

  /** The DuckDB-side dilation as a chained-CTE step list: returns the
    * SQL select items computing spread(`src`) into `dst` across 5 CTE
    * stages (stage i reads the previous stage's `dst`). Used by the
    * layout_zorder oracle so both engines run literally the same masks.
    */
  val SpreadSteps: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8 -> 0x00FF00FF00FF00FFL,
    4 -> 0x0F0F0F0F0F0F0F0FL,
    2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)
}
