package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Expression↔Column conversions.
  *
  * Spark 4 made `Column` implementation-agnostic (ColumnNode); wrapping
  * a raw Catalyst `Expression` now goes through
  * `classic.ExpressionUtils`, which is package-private. This shim —
  * placed in the `org.apache.spark.sql` package, the conventional way
  * libraries expose custom native expressions — is the only
  * Spark-internal surface the engine touches.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
