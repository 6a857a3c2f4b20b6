package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4's Column wraps a ColumnNode rather than an Expression, and the
  * converters live in `private[sql]` ExpressionUtils. This bridge sits in
  * an `org.apache.spark.sql` subpackage (the standard technique used by
  * public Spark extension libraries) to expose the two conversions to
  * graft code.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
