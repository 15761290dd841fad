package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal visibility bridge: `ExpressionUtils.column/expression` are
  * `private[sql]` in Spark 4, and wrapping a custom Catalyst Expression
  * into a public `Column` (and back) is the one thing an external engine
  * library cannot do from its own package. Standard extension-library
  * pattern; no Spark internals are re-implemented here.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
