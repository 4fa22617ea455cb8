package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst-Expression bridge for Spark 4's reworked Column API.
  *
  * Spark 4 made `Column` backend-agnostic (it wraps a `ColumnNode`, not an
  * `Expression`); the classic-backend converters live in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is `private[sql]`.
  * This one-file shim inside the `org.apache.spark.sql` package re-exports
  * the two converters to graft — the standard extension-library technique
  * for plugging native expressions into the Column DSL.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
