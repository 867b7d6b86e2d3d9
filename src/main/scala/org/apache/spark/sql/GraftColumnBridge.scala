package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the package-private Column ↔ Expression converters
  * (Spark 4 wraps Columns in ColumnNodes; `classic.ExpressionUtils` is
  * private[sql]). Lives in the spark.sql package solely to re-export the
  * two conversions our custom Catalyst expressions need.
  */
object GraftColumnBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
