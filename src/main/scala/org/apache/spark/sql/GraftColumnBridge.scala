package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters — the
  * standard mechanism third-party Spark libraries use to build `Column`s
  * from custom Catalyst expressions without requiring every session to
  * register them through `SparkSessionExtensions` (which remains the SQL
  * entry point, see `graft.GraftExtensions`). Classic (non-Connect)
  * sessions only, which is all this library targets.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
