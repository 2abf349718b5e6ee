package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, Row}
import org.apache.spark.sql.functions._

/** Deterministic corpus ordering and sequence packing — the last mile
  * of a training-data pipeline: a reproducible global shuffle of the
  * corpus, and the packing of documents into fixed token-budget
  * training sequences over that order.
  *
  * Both need a GLOBAL total order and a GLOBAL prefix sum, which the
  * obvious `Window.orderBy(...)` computes by moving the corpus to ONE
  * partition — the classic scale-killer (Spark itself warns "No
  * Partition Defined for Window operation"). This implements the
  * two-phase alternative: range-partition by the order key, compute
  * per-partition counts/sums (one aggregate row per partition crosses
  * to the driver — bounded by the partition count, not the data),
  * broadcast the partition prefix offsets back, and finish with
  * per-partition windows. One range shuffle total; every window is
  * partition-local.
  *
  * The order key is the PORTABLE 48-bit md5 hash of a stable row key
  * (the repo-wide convention), tie-broken by the key itself — a fixed
  * pseudorandom permutation of row identities, so the "shuffle" is
  * deterministic under re-runs, repartitioning, and engine changes,
  * and any SQL engine replays rank and packing exactly with
  * `row_number()/sum() OVER (ORDER BY hash, key)`. Seeds give
  * independent permutations (epoch reshuffles: seed = epoch).
  *
  * The partitioned frame is pinned with a lazy localCheckpoint before
  * the stats pass: range boundaries come from a sampling job, so
  * without the pin the offsets job and the output job could see
  * DIFFERENT partitionings — the same frozen-plan discipline as the
  * dict store's id assignment. */
object Packing {

  private def ordKey(key: Column, seed: Long): Column =
    conv(substring(md5(concat(key.cast("string"),
      lit(":" + seed.toString)).cast("binary")), 1, 12), 16, 10)
      .cast("long")

  /** Range-partition `df` by the portable order key and return the
    * pinned frame plus each partition's (row, token) prefix offsets. */
  private def orderedWithOffsets(df: DataFrame, keyCol: String,
                                 tokenCol: Option[String], seed: Long)
      : (DataFrame, DataFrame) = {
    val spark = df.sparkSession
    Seq("__ord", "__pid", "__row_off", "__tok_off", "__prefix").foreach(c =>
      require(!df.columns.contains(c),
        s"input already has a $c column — rename it first"))
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val keyed = df.withColumn("__ord", ordKey(col(keyCol), seed))
    val parted = GraftColumnBridge.freshLeaf(
      keyed.repartitionByRange(n, col("__ord"), col(keyCol))
        .sortWithinPartitions(col("__ord"), col(keyCol))
        .withColumn("__pid", spark_partition_id())
        .localCheckpoint(eager = false))
    // ONE row per partition to the driver — bounded by the partition
    // count; this is the whole cross-partition coordination cost
    val stats = parted.groupBy(col("__pid"))
      .agg(count(lit(1)).as("cnt"),
        tokenCol.map(t => sum(col(t).cast("long")))
          .getOrElse(sum(lit(0L))).as("toks"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2)))
      .sortBy(_._1)
    var rowOff = 0L; var tokOff = 0L
    val offsets = stats.map { case (pid, cnt, toks) =>
      val o = (pid, rowOff, tokOff); rowOff += cnt; tokOff += toks; o
    }
    val s = spark
    import s.implicits._
    (parted, offsets.toSeq.toDF("__pid", "__row_off", "__tok_off"))
  }

  private def localWindow(keyCol: String) =
    org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(col("__ord"), col(keyCol))

  /** Deterministic global shuffle: adds `rankCol` = this row's
    * position (0-based, contiguous) in the portable-hash permutation
    * of the corpus. Reproducible training order: re-runs, appends
    * re-ranked with the same seed, and external engines all agree
    * (`row_number() OVER (ORDER BY hash, key) - 1`). One range
    * shuffle; no single-partition window. */
  def shuffleRank(df: DataFrame, keyCol: String, seed: Long = 0L,
                  rankCol: String = "shuffle_rank"): DataFrame = {
    val (parted, offsets) = orderedWithOffsets(df, keyCol, None, seed)
    parted
      .join(broadcast(offsets.drop("__tok_off")), "__pid")
      .withColumn(rankCol,
        row_number().over(localWindow(keyCol)) - 1 + col("__row_off"))
      .drop("__ord", "__pid", "__row_off")
  }

  /** Pack documents into fixed `budget`-token training sequences over
    * the deterministic shuffle order: documents concatenate in hash
    * order and the stream is cut every `budget` tokens (the standard
    * LM-pretraining concat-and-chunk — a document may straddle a cut;
    * `seq_offset` is where it starts inside its sequence). Adds
    * `seq_id` and `seq_offset`. Rows with a NULL token count are
    * DROPPED (they have no length to pack; filter or impute upstream
    * to keep them). Same two-phase shape as [[shuffleRank]]; the
    * oracle replay is `sum(tokens) OVER (ORDER BY hash, key ROWS
    * UNBOUNDED PRECEDING TO 1 PRECEDING)` then div/mod. */
  def packSequences(df: DataFrame, keyCol: String, tokenCol: String,
                    budget: Long, seed: Long = 0L): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val (parted, offsets) = orderedWithOffsets(
      df.filter(col(tokenCol).isNotNull), keyCol, Some(tokenCol), seed)
    val before = localWindow(keyCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    parted
      .join(broadcast(offsets), "__pid")
      .withColumn("__prefix",
        coalesce(sum(col(tokenCol).cast("long")).over(before), lit(0L)) +
          col("__tok_off"))
      // `div`, not `/`: long/long promotes to double, and at corpus
      // scale the prefix sum outgrows double's exact range
      .withColumn("seq_id", expr(s"__prefix div ${budget}L"))
      .withColumn("seq_offset", col("__prefix") % budget)
      .drop("__ord", "__pid", "__row_off", "__tok_off", "__prefix")
  }

  /** Per-group sequence packing: [[packSequences]] independently
    * inside each `groupCols` stratum (each mixture component packs
    * its own sequence stream — the usual shape when components carry
    * different sampling temperatures or epoch counts). `seq_id` is
    * unique only WITHIN a group; prepend the group columns for a
    * global key. Unlike the global form this needs no two-phase
    * trick: the window partitions by the group columns, so state and
    * sort stay per-stratum — one hash shuffle on the groups. A single
    * giant stratum degrades to one partition's worth of window work;
    * for that shape use the global [[packSequences]] per component
    * instead. */
  def packSequencesBy(df: DataFrame, groupCols: Seq[String], keyCol: String,
                      tokenCol: String, budget: Long,
                      seed: Long = 0L): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must name at least one column")
    require(budget > 0, s"token budget must be positive, got $budget")
    Seq("__ord", "__prefix").foreach(c =>
      require(!df.columns.contains(c),
        s"input already has a $c column — rename it first"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("__ord"), col(keyCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.filter(col(tokenCol).isNotNull)
      .withColumn("__ord", ordKey(col(keyCol), seed))
      .withColumn("__prefix",
        coalesce(sum(col(tokenCol).cast("long")).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"__prefix div ${budget}L"))
      .withColumn("seq_offset", col("__prefix") % budget)
      .drop("__ord", "__prefix")
  }

  /** Per-group packing for the shape [[packSequencesBy]] cannot
    * scale to: a SINGLE GIANT STRATUM. `packSequencesBy` puts each
    * group in one window partition — a 10-component mixture where one
    * component is 80% of a 100 TB corpus sorts most of the corpus on
    * one task. This form keeps the mixture semantics (every group
    * packs its own independent sequence stream; `seq_id` unique only
    * within a group) but runs the two-phase global scheme for ALL
    * groups at once: one range shuffle on the portable hash spreads
    * every group across every partition, per-(partition, group)
    * token sums come to the driver (bounded by partitions ×
    * components — mixture components are tens, never corpus-scale;
    * that product is the entire coordination cost), per-group prefix
    * offsets broadcast back, and the finishing windows partition by
    * (partition, group) — always parallel, skew-free under any
    * mixture imbalance. Same portable order key, so results are
    * IDENTICAL to `packSequencesBy` (and to [[packSequences]] run on
    * each group alone); group columns may be NULL (NULL is a group,
    * matching the window form — the offsets join is null-safe). */
  def packSequencesByGlobal(df: DataFrame, groupCols: Seq[String],
                            keyCol: String, tokenCol: String, budget: Long,
                            seed: Long = 0L): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must name at least one column")
    require(budget > 0, s"token budget must be positive, got $budget")
    Seq("__ord", "__pid", "__tok_off", "__prefix").foreach(c =>
      require(!df.columns.contains(c),
        s"input already has a $c column — rename it first"))
    val spark = df.sparkSession
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val keyed = df.filter(col(tokenCol).isNotNull)
      .withColumn("__ord", ordKey(col(keyCol), seed))
    // range by the GLOBAL order: each group's rows land in partition
    // order consistent with its own (__ord, key) order, so per-group
    // prefix sums compose from per-partition sums exactly as in the
    // single-stream case. Pinned for the same two-jobs reason.
    val parted = GraftColumnBridge.freshLeaf(
      keyed.repartitionByRange(n, col("__ord"), col(keyCol))
        .sortWithinPartitions(col("__ord"), col(keyCol))
        .withColumn("__pid", spark_partition_id())
        .localCheckpoint(eager = false))
    val g = groupCols.length
    val stats = parted
      .groupBy((col("__pid") +: groupCols.map(col)): _*)
      .agg(sum(col(tokenCol).cast("long")).as("__toks"))
      .collect() // partitions × components rows — the bounded stat pass
    // per-group running offsets in partition order
    val offsetRows = new java.util.ArrayList[Row]()
    stats.groupBy(r => r.toSeq.slice(1, 1 + g))
      .foreach { case (_, rs) =>
        var off = 0L
        rs.sortBy(_.getInt(0)).foreach { r =>
          offsetRows.add(Row.fromSeq(r.toSeq.take(1 + g) :+ off))
          off += r.getLong(1 + g)
        }
      }
    val offSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__pid",
        org.apache.spark.sql.types.IntegerType) +:
        groupCols.map(c => df.schema(c)) :+
        org.apache.spark.sql.types.StructField("__tok_off",
          org.apache.spark.sql.types.LongType))
    val offsets = spark.createDataFrame(offsetRows, offSchema)
    // null-safe equi-join (NULL group values must match their offsets)
    val offA = offsets.alias("__offs")
    val cond = (parted("__pid") === offA("__pid")) +: groupCols.map(c =>
      parted(c) <=> offA(c))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy((col("__pid") +: groupCols.map(col)): _*)
      .orderBy(col("__ord"), col(keyCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val joined = groupCols.foldLeft(
      parted.join(broadcast(offA), cond.reduce(_ && _))
        .drop(offA("__pid")))((d, c) => d.drop(offA(c)))
    joined
      .withColumn("__prefix",
        coalesce(sum(col(tokenCol).cast("long")).over(w), lit(0L)) +
          col("__tok_off"))
      .withColumn("seq_id", expr(s"__prefix div ${budget}L"))
      .withColumn("seq_offset", col("__prefix") % budget)
      .drop("__ord", "__pid", "__tok_off", "__prefix")
  }
}
