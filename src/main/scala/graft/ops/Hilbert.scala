package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.HilbertHelper

/** Column-level surface of the Hilbert curve (see
  * [[graft.functions.HilbertF]]): `hvalue` dispatches to the codegen'd
  * native expression, and [[duckSteps]] emits the identical 16
  * arithmetic rounds as a DuckDB CTE chain for the oracle. The usual
  * third face (a built-in-operator Column fold as equivalence anchor)
  * is deliberately ABSENT: each round reads the previous round's
  * (x, y, d) three ways, so a single-expression unroll grows ~4^16
  * nodes, and even a named-column-per-round chain drove the analyzer
  * to OOM (measured; the z-order dilation anchors fine because its
  * rounds are straight-line single-use). The independent anchor is the
  * suite's standalone d2xy INVERSE walk instead — round-tripping
  * d2xy(hvalue(x, y)) == (x, y) pins the native kernel against a
  * second implementation, and the driver's hash compare pins the CTE
  * mirror.
  */
object Hilbert {

  def hvalue(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.functions.HilbertF(
      Bridge.expression(a), Bridge.expression(b)))
  }


  /** The identical rounds as DuckDB chained CTEs: stage i reads stage
    * i−1's (x, y, d) plus the carried `keyCols`, ending in
    * `h${Bits}(…, d)`. Shifts are integer division by powers of two
    * and the reflection is subtraction, so the expression text is
    * engine-portable.
    */
  def duckSteps(keyCols: String, x0: String, y0: String): String = {
    // ((v % 65536) + 65536) % 65536, not plain `% 65536`: SQL modulo
    // keeps the dividend's sign, so a negative input would diverge from
    // the native kernel's `& 0xFFFF` (always in [0, 65535]).
    val init =
      s"""h0 AS (SELECT $keyCols,
         |  ((($x0 % 65536) + 65536) % 65536) AS x,
         |  ((($y0 % 65536) + 65536) % 65536) AS y,
         |  CAST(0 AS BIGINT) AS d FROM src)""".stripMargin
    val rounds = (HilbertHelper.Bits - 1 to 0 by -1).zipWithIndex.map {
      case (b, i) =>
        val s = 1L << b
        s"""h${i + 1} AS (SELECT $keyCols,
           |  CASE WHEN (y // $s) % 2 = 1 THEN x
           |       WHEN (x // $s) % 2 = 1 THEN 65535 - y ELSE y END AS x,
           |  CASE WHEN (y // $s) % 2 = 1 THEN y
           |       WHEN (x // $s) % 2 = 1 THEN 65535 - x ELSE x END AS y,
           |  d + ${s * s} * (CASE WHEN (x // $s) % 2 = 0
           |    THEN (y // $s) % 2 ELSE 3 - (y // $s) % 2 END) AS d
           |  FROM h$i)""".stripMargin
    }
    (init +: rounds).mkString(",\n")
  }
}
