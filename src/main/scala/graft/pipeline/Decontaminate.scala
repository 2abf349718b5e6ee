package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: find (and drop)
  * training documents that overlap an evaluation/benchmark set at the
  * n-gram level — the standard eval-set decontamination pass every
  * large-model data pipeline runs before training. Overlap is defined
  * on `window`-token runs: a training document is contaminated when at
  * least `minHits` of its DISTINCT window hashes also occur anywhere in
  * the benchmark set.
  *
  * Hashes are the portable md5-prefix window hashes of
  * [[TextAnalysis.portableRollingFingerprintTable]] (keep = all), so an
  * external SQL engine can audit every decision bit-for-bit — the
  * DuckDB CORRECTNESS oracle replays the full pipeline, including every
  * window hash and the hit counts.
  *
  * Scale shape (100 TB corpus vs MB-scale benchmark): the training side
  * is fingerprinted MAP-ONLY (the window-hash expression fuses into the
  * scan, one generated pass per row); the benchmark fingerprint table is
  * tiny and BROADCAST, so the contamination check is a broadcast hash
  * join — the corpus is never shuffled, and post-scan work is
  * proportional to corpus fingerprints × an in-memory hash probe. The
  * only shuffle is the per-contaminated-doc aggregation, whose input is
  * already reduced to the matching fingerprints. If the "benchmark"
  * side is itself corpus-sized, pass `broadcastBench = false` and the
  * identical plan degrades to a shuffled join.
  */
object Decontaminate {

  /** Distinct portable window hashes per document: `(id, fp)` rows.
    * Documents shorter than `window` tokens hash their whole token run
    * (so short benchmark strings still match verbatim copies). */
  def fingerprintTable(df: DataFrame, idCol: String, textCol: String,
                       window: Int = 8): DataFrame =
    TextAnalysis.portableRollingFingerprintTable(
      df, idCol, textCol, window, keep = Int.MaxValue)

  /** Contamination report: one row per contaminated training document —
    * `(id, hits, bench_docs)` where `hits` is the number of distinct
    * window hashes shared with the benchmark set and `bench_docs` the
    * number of distinct benchmark documents hit. Only documents with
    * `hits >= minHits` are reported. */
  def report(train: DataFrame, trainId: String, trainText: String,
             bench: DataFrame, benchId: String, benchText: String,
             window: Int = 8, minHits: Int = 1,
             broadcastBench: Boolean = true): DataFrame = {
    val trainFps = fingerprintTable(train, trainId, trainText, window)
    val benchFps = fingerprintTable(bench, benchId, benchText, window)
      .select(col("fp"), col(benchId).as("__bench_id")).distinct()
    val benchSide = if (broadcastBench) broadcast(benchFps) else benchFps
    trainFps.join(benchSide, Seq("fp"))
      .groupBy(col(trainId))
      .agg(countDistinct(col("fp")).as("hits"),
        countDistinct(col("__bench_id")).as("bench_docs"))
      .filter(col("hits") >= minHits)
  }

  /** The benchmark's distinct window hashes as a sorted driver-side
    * array — the stateless-guard form for streams ([[graft.streaming
    * .StreamingOps.decontaminateStream]]). The collect is bounded by
    * the benchmark size, the same small-side contract as the batch
    * broadcast (eval sets are MBs; a corpus-sized "benchmark" should
    * use the joining [[clean]] instead). */
  def benchFingerprintSet(bench: DataFrame, benchId: String,
                          benchText: String, window: Int = 8): Array[Long] =
    fingerprintTable(bench, benchId, benchText, window)
      .select(col("fp")).distinct()
      .collect().map(_.getLong(0)).sorted

  /** The decontaminated corpus: training rows whose document shares
    * fewer than `minHits` distinct window hashes with the benchmark.
    * Rows with NULL text carry no fingerprints and always survive.
    *
    * Cheaper than filtering on [[report]]: at minHits = 1 contamination
    * is mere existence (a semi-join, no aggregation at all), and above
    * it only the fingerprint count is aggregated — never the
    * bench-doc count, whose second countDistinct would force an Expand
    * doubling the only shuffled stage of the pipeline. */
  def clean(train: DataFrame, trainId: String, trainText: String,
            bench: DataFrame, benchId: String, benchText: String,
            window: Int = 8, minHits: Int = 1,
            broadcastBench: Boolean = true): DataFrame = {
    val trainFps = fingerprintTable(train, trainId, trainText, window)
    val benchFps = fingerprintTable(bench, benchId, benchText, window)
      .select(col("fp")).distinct()
    val benchSide = if (broadcastBench) broadcast(benchFps) else benchFps
    val matched = trainFps.join(benchSide, Seq("fp"), "left_semi")
    val contaminated =
      if (minHits <= 1) matched.select(col(trainId)).distinct()
      else matched.groupBy(col(trainId))
        .agg(countDistinct(col("fp")).as("hits"))
        .filter(col("hits") >= minHits)
        .select(col(trainId))
    train.join(contaminated, Seq(trainId), "left_anti")
  }
}
