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

  /** Re-wrap a DataFrame (typically just localCheckpoint'd) as a
    * brand-new leaf plan over its INTERNAL row RDD. Iterative
    * self-joins need fresh attribute ids each round, but
    * `createDataFrame(df.rdd, schema)` pays a full
    * InternalRow→Row→InternalRow codec round-trip per row per round;
    * `internalCreateDataFrame(queryExecution.toRdd, …)` reuses the
    * already-internal rows (for a checkpointed frame, the cached
    * blocks) at zero conversion cost. */
  def freshLeaf(df: Dataset[Row]): Dataset[Row] = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = false)
  }
}
