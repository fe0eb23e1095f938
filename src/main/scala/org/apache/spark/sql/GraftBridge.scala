package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4.x's `private[sql]` Column <-> Expression conversions.
  *
  * Spark 4 moved `Column` to sql-api and made the Catalyst-expression
  * constructor internal (`org.apache.spark.sql.classic.ExpressionUtils`).
  * Graft defines custom Catalyst expressions (e.g. cosine similarity) and
  * needs to expose them as `Column`s; this object is the single, minimal
  * access point into the internal API.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
