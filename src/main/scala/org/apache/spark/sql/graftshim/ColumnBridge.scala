package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the `private[sql]` Column↔Expression converters in
  * Spark 4's classic API — needed to expose custom Catalyst Expressions as
  * user-facing Columns. This is the same package-shim technique public
  * Spark extensions (e.g. xgboost4j-spark) use; nothing else from the
  * private surface is touched.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
