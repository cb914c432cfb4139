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

/** Registers [[graft.GraftExtensions]]' SQL functions on an ALREADY
  * BUILT session — the path for sessions the library did not construct
  * (a harness hands query closures a bare session). `sessionState` is
  * `private[sql]`, hence this lives beside the bridge. Idempotent.
  */
object GraftFunctions {
  def ensureRegistered(spark: SparkSession): Unit =
    _root_.graft.GraftExtensions.functions.foreach { case (ident, info, builder) =>
      if (!spark.sessionState.functionRegistry.functionExists(ident)) {
        spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
      }
    }
}
