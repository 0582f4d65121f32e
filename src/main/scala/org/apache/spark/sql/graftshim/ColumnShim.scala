package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ↔ Expression converters. Custom
  * Catalyst expressions must be wrapped in a Column EAGERLY when they
  * carry per-call payloads (e.g. a centroid model): routing them through
  * the function registry + `call_function` defers resolution to analysis
  * time, where all lazily-composed calls would resolve against the last
  * registration. This is the supported conversion pair used by Spark's
  * own `functions` object, just not public outside `org.apache.spark.sql`.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
