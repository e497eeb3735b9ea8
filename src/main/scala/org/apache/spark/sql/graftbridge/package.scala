package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's package-private Expression↔Column converters —
  * needed to expose native Catalyst aggregates (graft's MinHash
  * TypedImperativeAggregate) as user-facing Columns on Spark 4, where
  * `new Column(expr)` no longer exists.
  */
package object graftbridge {
  def columnOf(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
