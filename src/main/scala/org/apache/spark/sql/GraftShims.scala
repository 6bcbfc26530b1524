package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's `private[sql]` Column⇄Expression converters so graft's
  * native Catalyst expressions (e.g. rolling_hash) can be exposed as
  * `Column`s. Lives in org.apache.spark.sql purely for access; no Spark
  * internals are modified.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
