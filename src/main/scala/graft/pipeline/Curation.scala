package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation selection operators (LLM-pipeline extension —
  * SURVEY.md §2 has no reference counterpart).
  */
object Curation {

  /** Keep the top `k` rows of each group by `scoreCol` descending,
    * ties broken by ascending `tieCol` so the result is a function of
    * the data alone (a nondeterministic top-k would defeat
    * reproducible corpus builds). The canonical "best N documents per
    * domain/language" selection.
    *
    * Shape at scale: one hash shuffle on `groupCol` + an in-partition
    * sort — the same cost class as any groupBy. Rank is computed with
    * `row_number` over a bounded window; no state beyond the sort.
    * A group so hot it dwarfs a partition (a single domain holding a
    * double-digit percentage of 100 TB) should be pre-split upstream
    * (salt → per-salt top-k → re-top-k: top-k is
    * merge-decomposable); for real corpora groups are domains or
    * languages and fit comfortably. */
  def topKPerGroup(df: DataFrame, groupCol: String, scoreCol: String,
                   k: Int, tieCol: String): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(tieCol).asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Quantile threshold per group: keep rows whose `scoreCol` is at or
    * above their group's `q`-quantile (e.g. "top quartile of quality
    * within each language"). One aggregate + broadcast-joined
    * thresholds — groups are low-cardinality strata, so the threshold
    * TABLE is tiny either way; what `exact` controls is the
    * aggregation STATE: Spark's exact percentile buffers one counter
    * per distinct score value per group (unbounded for continuous
    * scores over billions of rows), while `exact = false` switches to
    * approx_percentile's bounded t-digest sketch — the scale path. */
  def aboveGroupQuantile(df: DataFrame, groupCol: String, scoreCol: String,
                         q: Double, exact: Boolean = true): DataFrame = {
    require(q >= 0 && q <= 1, s"quantile $q not in [0,1]")
    // functions, not expr(s"percentile($scoreCol, ...)"): string
    // interpolation broke on non-identifier column names
    val agg = if (exact) percentile(col(scoreCol), lit(q))
              else percentile_approx(col(scoreCol), lit(q), lit(10000))
    val thresholds = df.groupBy(col(groupCol).as("__g"))
      .agg(agg.as("__thr"))
    // null-safe join: a NULL stratum is still a group (topKPerGroup's
    // window keeps it; an inner equi-join would silently drop it)
    df.join(broadcast(thresholds), col(groupCol) <=> col("__g"))
      .filter(col(scoreCol) >= col("__thr"))
      .drop("__g", "__thr")
  }

  /** Corpus card: per-stratum composition summary in ONE aggregation —
    * document counts, token volume and mean, p50/p90 token lengths,
    * character volume. The report every corpus build publishes next to
    * the data; strata are composition units (language, source), so the
    * output is dashboard-sized. NULL-text rows count as documents but
    * contribute no tokens/chars (SQL aggregate NULL-skipping, mirrored
    * by the oracle).
    *
    * Exact percentiles buffer one counter per distinct token LENGTH
    * per stratum — lengths are small integers, so the state is bounded
    * by construction (unlike continuous scores, where
    * [[aboveGroupQuantile]]'s `exact = false` t-digest is the scale
    * path). */
  def corpusReport(df: DataFrame, strataCol: String, textCol: String,
                   tokenCount: Column => Column =
                     TextAnalysis.tokenCount): DataFrame = {
    // NULL text must contribute NULL tokens under ANY session config:
    // legacy non-ANSI sessions evaluate size(NULL) as -1, which would
    // corrupt totals/averages/percentiles (the hazard bm25 guards at
    // Search.scala:52); the explicit when() makes the scaladoc's
    // NULL-skipping contract independent of spark.sql.ansi.enabled.
    // `tokenCount` picks the accounting unit (whitespace default;
    // TextAnalysis.bpeTokenCount for subword-true reports).
    val ntok = when(col(textCol).isNotNull,
      tokenCount(col(textCol)))
    df.select(col(strataCol), ntok.as("__ntok"),
        length(col(textCol)).cast("long").as("__nchar"))
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__ntok")).as("total_tokens"),
        round(avg(col("__ntok")), 6).as("avg_tokens"),
        round(percentile(col("__ntok"), lit(0.5)), 6).as("p50_tokens"),
        round(percentile(col("__ntok"), lit(0.9)), 6).as("p90_tokens"),
        sum(col("__nchar")).as("total_chars"))
  }
}
