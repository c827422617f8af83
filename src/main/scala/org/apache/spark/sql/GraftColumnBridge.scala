package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the sql-private Column↔Expression conversions so graft's
  * custom Catalyst expressions can be exposed as Columns (the Spark 4
  * classic API hides `Column.expr`/`new Column(expr)` behind
  * `private[sql]`). Standard extension-library pattern. */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
