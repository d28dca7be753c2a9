package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ⇄ Expression converters so graft
  * can expose custom Catalyst expressions as user-facing `Column`s
  * (Spark 4 moved these behind `org.apache.spark.sql.classic`).
  */
package object graftbridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
