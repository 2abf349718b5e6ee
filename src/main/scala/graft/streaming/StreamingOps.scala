package graft.streaming

import graft.pipeline.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming variants of the pipeline operators.
  *
  * The reference is batch-only (SURVEY.md §2.9), so none of this is
  * parity surface — it is the streaming face of the training-data
  * pipeline: the same column expressions run incrementally with
  * watermarked state, so a 100 TB backfill and its live tail share one
  * code path (`readStream` in, `writeStream` out).
  */
object StreamingOps {

  /** Streaming exact dedup on a content fingerprint. State is scoped
    * by the event-time watermark (dropDuplicatesWithinWatermark), so
    * the dedup map cannot grow without bound on an infinite stream. */
  def dedupStream(docs: DataFrame, textCol: String, tsCol: String,
                  watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming curation: attach quality signals and keep rows above
    * threshold — map-only, fuses into the source scan incrementally. */
  def curateStream(docs: DataFrame, textCol: String,
                   minQuality: Double = 0.3): DataFrame =
    docs
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
      .withColumn("lang_pred", TextAnalysis.langId(col(textCol)))
      .withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)))
      .filter(col("quality") >= minQuality)

  /** Watermarked tumbling-window event aggregation (the events-table
    * shape): counts and value sums per (window, event_type). */
  def eventCounts(events: DataFrame, tsCol: String,
                  windowLen: String = "1 hour",
                  watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n"), col("total_value"))
}
