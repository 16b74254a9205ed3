package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between public `Column`s and Catalyst `Expression`s.
  *
  * Spark 4 moved `Column` to the api module and made the
  * Expression⇄Column conversions `private[sql]`; extension libraries
  * conventionally access them from within the `org.apache.spark.sql`
  * package namespace. This is the only file that lives outside `graft`.
  */
object ColumnShim {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
