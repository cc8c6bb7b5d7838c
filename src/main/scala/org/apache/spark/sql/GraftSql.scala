package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Package-access bridge: lifts a custom Catalyst `Expression` into the
  * public `Column` API (and back). Spark 4 routes Column construction
  * through the sql-api ColumnNode layer; the converters live in
  * `classic.ExpressionUtils`, which is `private[sql]` — this is the single
  * sanctioned crossing point the graft engine uses, kept to two one-line
  * delegations so the internal surface we touch stays minimal.
  */
object GraftSql {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
