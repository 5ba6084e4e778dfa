package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's package-private Expression↔Column conversions
  * (`org.apache.spark.sql.classic.ExpressionUtils` is private[sql]).
  * Lives in the spark.sql namespace solely to access them — the one
  * sanctioned way for third-party Catalyst expressions to surface as
  * Columns without going through the SQL parser.
  */
object bridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
