package graft.pipeline

import graft.functions.SketchExprs
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregation (LLM-pipeline / analytics
  * extension — bounded-state answers over unbounded-cardinality
  * groups, the only aggregation shape that survives 100 TB when the
  * answer itself would not fit an executor).
  */
object Sketches {

  /** Exclusive upper bound of [[portableHash48]]. */
  val Space48: Long = 1L << 48

  /** Portable 48-bit hash: the first 12 hex digits of md5 of the
    * value's string form — the repo-wide replayable hash convention
    * (`('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 12))::BIGINT` in
    * DuckDB). 48 bits keeps ~10^9 distinct values collision-sparse
    * while staying exactly representable everywhere. */
  def portableHash48(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 12), 16, 10).cast("long")

  /** Approximate distinct count of `valueCol` per group via a KMV
    * (bottom-k) sketch over the portable 48-bit hash. Output:
    * `(groupCols…, n_retained, kth_min, estimate)` — exact when a
    * group has fewer than k distinct values, `(k-1)·2^48/kth`
    * otherwise (relative error ~1/√(k−2)).
    *
    * Why not `approx_count_distinct`: Spark's HLL++ registers are
    * engine-internal, so nothing outside Spark can reproduce — or
    * audit — the estimate. The KMV state is a deterministic set (the
    * k smallest hashes), so the battery oracle replays n_retained,
    * kth_min AND the estimate bit-for-bit with a rank-≤-k window.
    *
    * Scale shape: one custom `TypedImperativeAggregate` with a
    * ≤k-long buffer; partial aggregation applies, so the shuffle
    * carries at most k longs per (partition, group) no matter how hot
    * the group — cardinality never crosses the wire. The same call
    * composes with a STREAMING input (Update mode): per-group state is
    * the bounded sketch buffer, each micro-batch refreshes the
    * estimate — SketchesSpec pins it. */
  def distinctCountSketch(df: DataFrame, groupCols: Seq[String],
                          valueCol: String, k: Int): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must name at least one column")
    val sketch = GraftColumnBridge.column(
      SketchExprs.KmvSketch(
        GraftColumnBridge.expression(portableHash48(col(valueCol))),
        k, Space48).toAggregateExpression())
    df.groupBy(groupCols.map(col): _*)
      .agg(sketch.as("__kmv"))
      .select(groupCols.map(col) :+
        col("__kmv.n_retained").as("n_retained") :+
        col("__kmv.kth_min").as("kth_min") :+
        col("__kmv.estimate").as("estimate"): _*)
  }

  /** Persistable sketch table: one sorted k-min hash array (`kmv`) per
    * fine-grained group — the form you store per day/shard/partition
    * so later rollups merge arrays instead of re-scanning history. */
  def sketchTable(df: DataFrame, groupCols: Seq[String],
                  valueCol: String, k: Int): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must name at least one column")
    val sketch = GraftColumnBridge.column(
      SketchExprs.KmvSketch(
        GraftColumnBridge.expression(portableHash48(col(valueCol))),
        k, Space48, emitState = true).toAggregateExpression())
    df.groupBy(groupCols.map(col): _*)
      .agg(sketch.as("kmv"))
  }

  /** Roll a [[sketchTable]] up to coarser groups: explode the stored
    * arrays and re-sketch — KMV union is "k smallest of the union of
    * retained hashes", so the merged estimate is EXACTLY what
    * sketching the coarser group directly would produce whenever every
    * fine sketch kept its full k (and a documented upper-bound
    * approximation when a fine group had fewer). `coarserCols` ⊆ the
    * sketch table's group columns (empty = grand total under a
    * constant group). Input rows are sketch rows, so this scans
    * k longs per fine group — rolling a year of daily sketches up
    * costs seconds, not a 100 TB re-scan. */
  def mergeSketches(sketches: DataFrame, coarserCols: Seq[String],
                    k: Int): DataFrame = {
    val grouped =
      if (coarserCols.nonEmpty) sketches
      else sketches.withColumn("__all", lit("all"))
    val keys = if (coarserCols.nonEmpty) coarserCols else Seq("__all")
    val sketch = GraftColumnBridge.column(
      SketchExprs.KmvSketch(
        GraftColumnBridge.expression(col("__hv")),
        k, Space48).toAggregateExpression())
    // explode_OUTER: a fine group whose sketch is empty (all-NULL
    // values) must still surface its coarse group — update() skips
    // the NULL hash, so such groups emit (0, null, 0.0) exactly as
    // direct sketching would
    grouped
      .select(keys.map(col) :+ explode_outer(col("kmv")).as("__hv"): _*)
      .groupBy(keys.map(col): _*)
      .agg(sketch.as("__kmv"))
      .select(coarserCols.map(col) :+
        col("__kmv.n_retained").as("n_retained") :+
        col("__kmv.kth_min").as("kth_min") :+
        col("__kmv.estimate").as("estimate"): _*)
  }
}
