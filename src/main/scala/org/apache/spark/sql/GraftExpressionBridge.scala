package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst-Expression bridge for graft's native expressions.
  * Spark 4 made the conversion `private[sql]` (`classic.ExpressionUtils`),
  * so this one-liner lives in the `org.apache.spark.sql` package — the
  * standard pattern for libraries shipping custom expressions without a
  * session extension.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
