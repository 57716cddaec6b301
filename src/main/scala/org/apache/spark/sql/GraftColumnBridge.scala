package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the sql-private Column ↔ Expression converters — the
  * standard Spark-extension-library pattern for building Columns from
  * native Catalyst expressions without a SQL-string round-trip (the
  * public constructors went private with the Spark Connect split).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
