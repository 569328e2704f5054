package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column constructor so graft's native
  * Catalyst expressions ([[graft.functions.FloatVecDot]]) can be used from
  * the DataFrame API directly, without a per-session function-registry
  * round trip. Standard extension-library technique (same approach Spark
  * connectors use); the SQL-string path via GraftExtensions also exists for
  * `spark.sql` users. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
