package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark 4's `private[sql]` Column ↔ Expression converters so
  * graft's custom Catalyst expressions ([[graft.functions.LongDotProduct]])
  * can be used as ordinary `Column`s. Lives under `org.apache.spark.sql`
  * solely for the access qualifier; no Spark internals are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
