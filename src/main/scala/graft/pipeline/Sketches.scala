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

  /** Scale-aware sketch pre-sizing: the smallest power-of-two counter
    * count that keeps a Space-Saving sketch over `itemCol` in its
    * EXACT regime (no eviction, `err = 0`) at THIS corpus's
    * cardinality, with `headroom`× slack over a cheap
    * `approx_count_distinct` pre-pass (HLL++, default 5% rsd — 2×
    * headroom swallows the estimator error with room to spare).
    *
    * Why a pre-pass instead of a constant: the round-10/11 scale
    * sweeps showed the same fixed `m` flipping regimes purely with
    * scale factor (exact at 1.5k distinct users, evicting at 15k) —
    * any hard-coded size is wrong at some scale. The pre-pass is one
    * map-side-partial HLL aggregation (a single column scan, ~KB over
    * the wire), after which `m` is sized for the data actually
    * present. Per-group sketches are covered a fortiori: a group's
    * distinct count never exceeds the global one.
    *
    * `cap` bounds the state: past it (hundreds of millions of distinct
    * values — the 100 TB regime) exactness is no longer the contract
    * and the sketch degrades gracefully to its ε = 1/m guarantee,
    * which is what a heavy-hitter query means at that cardinality. */
  def exactRegimeM(df: DataFrame, itemCol: String, mMin: Int = 4096,
                   headroom: Double = 2.0, cap: Int = 1 << 21): Int = {
    val approx = distinctPrePass(df, itemCol).head.getLong(0)
    regimeM(approx, mMin, headroom, cap)
  }

  /** The HLL++ cardinality pre-pass behind [[exactRegimeM]], exposed
    * so its plan shape is spec-pinned: ONE aggregation with a
    * map-side partial (each partition reduces its rows to a ~KB HLL
    * register set before the single-row exchange) — the whole corpus
    * crosses the wire as one sketch per partition, never as rows. */
  private[graft] def distinctPrePass(df: DataFrame, itemCol: String): DataFrame =
    df.agg(approx_count_distinct(col(itemCol)).as("__d"))

  /** The pure sizing arithmetic behind [[exactRegimeM]], split out so
    * the overflow/cap/headroom contract is unit-testable without a
    * billion-row DataFrame: smallest power of two >= approx×headroom,
    * floored at `mMin`, clamped at `cap`. */
  private[graft] def regimeM(approxDistinct: Long, mMin: Int,
                             headroom: Double, cap: Int): Int = {
    require(mMin >= 1 && Integer.bitCount(mMin) == 1,
      s"mMin=$mMin must be a positive power of two")
    require(headroom >= 1.0, s"headroom=$headroom must be >= 1")
    require(cap >= mMin, s"cap=$cap must be >= mMin=$mMin")
    require(cap <= (1 << 30),
      s"cap=$cap must be <= 2^30 (Int-sized counter arrays)")
    require(approxDistinct >= 0, s"approxDistinct=$approxDistinct")
    val target = math.ceil(approxDistinct * headroom).toLong
    // Long arithmetic: doubling an Int past 2^30 overflows to negative
    // and the loop never terminates (round-12 ADVICE).
    var m = mMin.toLong
    while (m < target && m < cap) m <<= 1
    math.min(m, cap.toLong).toInt
  }

  private[pipeline] def ssAgg(item: Column, weight: Column, errw: Column,
                              m: Int): Column =
    GraftColumnBridge.column(
      SketchExprs.SpaceSavingTopK(
        GraftColumnBridge.expression(item),
        GraftColumnBridge.expression(weight.cast("long")),
        GraftColumnBridge.expression(errw.cast("long")),
        m).toAggregateExpression())

  /** Top-`topK` most frequent `valueCol` values per group via the
    * Space-Saving sketch ([[graft.functions.SketchExprs.SpaceSavingTopK]]).
    * Output: `(groupCols…, rank, item, count, err)` — `count` is an
    * overestimate by at most `err` (exact, `err = 0`, whenever a
    * group's distinct cardinality stays within `m` per partial).
    *
    * Why not groupBy-count + window top-k (q_vocab_topk's shape): that
    * is EXACT but shuffles one row per DISTINCT value — at 100 TB a
    * URL/token/user column has billions of distinct values and the
    * count shuffle is the bottleneck. The sketch bounds the wire cost
    * at m counters per (partition, group): frequency crosses the
    * shuffle, cardinality never does. Size m ≥ distinct/ε for the
    * ε-guarantee; m ≥ a few × topK / tail-skew in practice. */
  def heavyHitters(df: DataFrame, groupCols: Seq[String],
                   valueCol: String, m: Int, topK: Int): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must name at least one column")
    require(topK >= 1 && topK <= m, s"need 1 <= topK=$topK <= m=$m")
    df.groupBy(groupCols.map(col): _*)
      .agg(ssAgg(col(valueCol).cast("string"), lit(1L), lit(0L), m)
        .as("__ss"))
      // OUTER explode: a group whose items were all NULL still
      // surfaces (with a NULL rank/item row) — consistent with
      // quantileSketch's n_retained=0 row, so downstream joins on
      // group keys never silently lose observed groups
      .select(groupCols.map(col) :+
        posexplode_outer(slice(col("__ss"), 1, topK)): _*)
      .select(groupCols.map(col) :+
        (col("pos") + 1).cast("int").as("rank") :+
        col("col.item").as("item") :+
        col("col.count").as("count") :+
        col("col.err").as("err"): _*)
  }

  /** Persistable heavy-hitter sketch table: the full m-counter
    * Space-Saving state per fine-grained group — store per day/shard,
    * roll up later with [[mergeHeavyHitters]] at m-counters-per-row
    * cost instead of a history re-scan. */
  def heavyHitterTable(df: DataFrame, groupCols: Seq[String],
                       valueCol: String, m: Int): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must name at least one column")
    df.groupBy(groupCols.map(col): _*)
      .agg(ssAgg(col(valueCol).cast("string"), lit(1L), lit(0L), m)
        .as("hh"))
  }

  /** Roll a [[heavyHitterTable]] up to coarser groups via the
    * PODS '12 re-insertion merge: each stored counter re-enters the
    * sketch as (weight = count, err = err), so common items sum their
    * counts and an evicted minimum adds its mass to the incoming
    * error bound. When no fine sketch ever evicted (err = 0
    * everywhere) and the union of items fits m, the rollup is exact —
    * identical to sketching the coarse group directly. */
  def mergeHeavyHitters(sketches: DataFrame, coarserCols: Seq[String],
                        m: Int, topK: Int): DataFrame = {
    require(topK >= 1 && topK <= m, s"need 1 <= topK=$topK <= m=$m")
    val grouped =
      if (coarserCols.nonEmpty) sketches
      else sketches.withColumn("__all", lit("all"))
    val keys = if (coarserCols.nonEmpty) coarserCols else Seq("__all")
    grouped
      .select(keys.map(col) :+ explode_outer(col("hh")).as("__c"): _*)
      .groupBy(keys.map(col): _*)
      .agg(ssAgg(col("__c.item"), col("__c.count"), col("__c.err"), m)
        .as("__ss"))
      .select(keys.map(col) :+
        posexplode_outer(slice(col("__ss"), 1, topK)): _*)
      .select(coarserCols.map(col) :+
        (col("pos") + 1).cast("int").as("rank") :+
        col("col.item").as("item") :+
        col("col.count").as("count") :+
        col("col.err").as("err"): _*)
  }

  private def cmAgg(item: Column, weight: Column,
                    depth: Int, width: Int): Column =
    GraftColumnBridge.column(
      SketchExprs.CmSketch(
        GraftColumnBridge.expression(item.cast("string")),
        GraftColumnBridge.expression(weight.cast("long")),
        depth, width).toAggregateExpression())

  /** Persistable Count-Min sketch table: one `depth·width` row-major
    * cell array (`cm`) per fine-grained group, counting occurrences of
    * `valueCol` weighted by `weightCol` (pass `lit(1)`-like column
    * name `null` → unit weights). The form you store per day/shard so
    * point-frequency queries and rollups never re-scan history.
    * Determinism: cellwise sums of portable hashes — a pure function
    * of the input multiset in every regime (no eviction, unlike
    * Space-Saving), so the oracle hash-checks cells at any scale. */
  def cmSketchTable(df: DataFrame, groupCols: Seq[String],
                    valueCol: String, depth: Int, width: Int,
                    weightCol: Option[String] = None): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must name at least one column")
    val w = weightCol.map(col).getOrElse(lit(1L))
    df.groupBy(groupCols.map(col): _*)
      .agg(cmAgg(col(valueCol), w, depth, width).as("cm"))
  }

  /** Roll a [[cmSketchTable]] up to coarser groups by cellwise sum —
    * CM's merge IS vector addition, so the rollup equals sketching the
    * coarse group directly, EXACTLY, in every regime. One shuffle of
    * `depth·width` cells per fine group (posexplode → sum → repack);
    * rolling a year of daily sketches costs seconds, never a
    * 100 TB re-scan. */
  def mergeCmSketches(sketches: DataFrame, coarserCols: Seq[String],
                      depth: Int, width: Int): DataFrame = {
    val grouped =
      if (coarserCols.nonEmpty) sketches
      else sketches.withColumn("__all", lit("all"))
    val keys = if (coarserCols.nonEmpty) coarserCols else Seq("__all")
    grouped
      .select(keys.map(col) :+ posexplode(col("cm")): _*)
      .groupBy((keys :+ "pos").map(col): _*)
      .agg(sum(col("col")).as("cell"))
      .groupBy(keys.map(col): _*)
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("cell")))),
        x => x.getField("cell")).as("cm"))
      .select((coarserCols.map(col) :+ col("cm")): _*)
  }

  /** Point-frequency estimates for literal `items` against every
    * sketch row of a [[cmSketchTable]]/[[mergeCmSketches]] output:
    * `est = min over rows r of cm[r·width + bucket_r(item)]` — the
    * classic CM read, never an underestimate for non-negative
    * weights. The buckets of a LITERAL item are driver-computable
    * (the same md5 convention DuckDB replays), so the lookup compiles
    * to `least(element_at…)` column arithmetic — no UDF, no join, no
    * shuffle; output one row per (sketch row × item). */
  def cmEstimates(sketches: DataFrame, groupCols: Seq[String],
                  items: Seq[String], depth: Int, width: Int): DataFrame = {
    require(items.nonEmpty, "need at least one queried item")
    val lookups = items.map { it =>
      val cells = (0 until depth).map { r =>
        element_at(col("cm"),
          r * width + (SketchExprs.cmHash48(r, it) % width).toInt + 1)
      }
      struct(lit(it).as("item"),
        (if (cells.size == 1) cells.head else least(cells: _*)).as("est"))
    }
    sketches
      .select(groupCols.map(col) :+ explode(array(lookups: _*)).as("__q"): _*)
      .select(groupCols.map(col) :+
        col("__q.item").as("item") :+ col("__q.est").as("est"): _*)
  }

  /** CM point estimate as a COLUMN over a dynamic item column — the
    * join-side form of [[cmEstimates]] for when the queried items are
    * a table, not literals: `sketchRow.join(queries)` then
    * `cmEstimateColumn(col("cm"), col("item"), d, w)`. Same md5 bucket
    * arithmetic as the aggregate's update path (spec-pinned), built
    * from codegen'd column functions — no UDF. */
  def cmEstimateColumn(cm: Column, item: Column,
                       depth: Int, width: Int): Column = {
    val cells = (0 until depth).map { r =>
      val h = conv(substring(md5(concat(lit(r.toString + ":"), item)
        .cast("binary")), 1, 12), 16, 10).cast("long")
      element_at(cm, (pmod(h, lit(width.toLong)) + r * width + 1).cast("int"))
    }
    if (cells.size == 1) cells.head else least(cells: _*)
  }

  private def bkAgg(hash: Column, value: Column, k: Int): Column =
    GraftColumnBridge.column(
      SketchExprs.BottomKSample(
        GraftColumnBridge.expression(hash),
        GraftColumnBridge.expression(value.cast("double")),
        k).toAggregateExpression())

  /** Project a bottom-k sample state array onto nearest-rank-below
    * quantile columns `q_<pct>`: sort the retained measures, index at
    * `floor(p·(n−1))` (0-based). `get` is null-safe, so an empty
    * group yields NULL quantiles. */
  private def quantileCols(state: Column, probs: Seq[Double]): Seq[Column] = {
    val vals = array_sort(transform(state, x => x.getField("v")))
    val n = size(vals)
    probs.map { p =>
      get(vals, floor(lit(p) * (n - 1).cast("double")).cast("int"))
        .as(f"q_${math.round(p * 100)}%d")
    }
  }

  /** Per-group quantiles of `valueCol` from a deterministic uniform
    * k-sample: the k rows whose portable 48-bit hash of `idCol` (a
    * unique row key) is smallest
    * ([[graft.functions.SketchExprs.BottomKSample]]). Output:
    * `(groupCols…, n_retained, q_<pct>…)`, nearest-rank-below
    * convention. Exact whenever a group has ≤ k rows; otherwise the
    * standard √k sampling error in rank — the price of a sample any
    * external engine can replay hash-for-hash (a KLL sketch is
    * tighter per byte but randomized, hence unauditable).
    *
    * Scale shape: one partial-aggregating shuffle of ≤ k (hash,
    * measure) pairs per (partition, group) — contrast
    * `percentile_approx` (same shape but engine-opaque state) and an
    * EXACT sort-based quantile, which shuffles every row. */
  def quantileSketch(df: DataFrame, groupCols: Seq[String],
                     valueCol: String, idCol: String, k: Int,
                     probs: Seq[Double]): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must name at least one column")
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
      s"probs must lie in [0, 1], got $probs")
    df.groupBy(groupCols.map(col): _*)
      .agg(bkAgg(portableHash48(col(idCol)), col(valueCol), k).as("__bk"))
      .select((groupCols.map(col) :+
        size(col("__bk")).as("n_retained")) ++
        quantileCols(col("__bk"), probs): _*)
  }

  /** Persistable quantile sketch table: one bottom-k (hash, measure)
    * array per fine-grained group. */
  def quantileSketchTable(df: DataFrame, groupCols: Seq[String],
                          valueCol: String, idCol: String,
                          k: Int): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must name at least one column")
    df.groupBy(groupCols.map(col): _*)
      .agg(bkAgg(portableHash48(col(idCol)), col(valueCol), k).as("qsk"))
  }

  /** Roll a [[quantileSketchTable]] up to coarser groups: bottom-k
    * union of the stored samples. Whenever every fine sketch retained
    * its whole group (or its full k), the merged sample is EXACTLY
    * the bottom-k of the coarse group — same determinism argument as
    * [[mergeSketches]]. */
  def mergeQuantileSketches(sketches: DataFrame, coarserCols: Seq[String],
                            k: Int, probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
      s"probs must lie in [0, 1], got $probs")
    val grouped =
      if (coarserCols.nonEmpty) sketches
      else sketches.withColumn("__all", lit("all"))
    val keys = if (coarserCols.nonEmpty) coarserCols else Seq("__all")
    grouped
      .select(keys.map(col) :+ explode_outer(col("qsk")).as("__s"): _*)
      .groupBy(keys.map(col): _*)
      .agg(bkAgg(col("__s.h"), col("__s.v"), k).as("__bk"))
      .select((coarserCols.map(col) :+
        size(col("__bk")).as("n_retained")) ++
        quantileCols(col("__bk"), probs): _*)
  }
}
