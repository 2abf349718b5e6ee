package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.QualityExprs

/** DataFrame face of the trained quality classifier
  * ([[graft.functions.QualityExprs]]): train a hashed n-gram Naive
  * Bayes model from YOUR labeled corpus with one aggregation, collect
  * the (bounded, [[QualityExprs.NumBuckets]]-long) weight table to the
  * driver, and score with the same map-only codegen expression the
  * committed default model uses.
  *
  *   val model   = Quality.trainQualityWeights(labeled, "text", "label")
  *   val weights = Quality.collectWeights(model)
  *   val scored  = Quality.scoreWith(docs, "text", weights)
  *
  * The training math is EXACTLY the committed-model derivation
  * (multinomial NB, add-one smoothing, weight = floor(Scale·ln(LR)
  * + 0.5) — Math.round written as floor(x+0.5) because both JVMs and
  * Spark's `floor`/`log` bottom out in the same Math.log/Math.floor),
  * pinned by QualityModelSpec: training on the committed seeds
  * reproduces [[QualityExprs.defaultWeights]] bit-for-bit.
  *
  * Scale shape: training is one explode + one bucket aggregation
  * (map-side partial — at most [[QualityExprs.NumBuckets]] groups);
  * the collect is bounded at NumBuckets rows (the
  * [[Dedup.spanBankSet]] small-side contract — the model is small by
  * construction, that is the point of hashing); scoring is map-only. */
object Quality {

  /** Train: `(bucket, weight)` for every bucket of the hashed feature
    * space, from a corpus with a boolean/integral `labelCol` (true/1 =
    * positive class). One shuffle (the bucket aggregation). */
  def trainQualityWeights(df: DataFrame, textCol: String,
                          labelCol: String): DataFrame = {
    val B = QualityExprs.NumBuckets
    val isPos = col(labelCol).cast(BooleanType)
    val counts = df
      // an unlabeled row is no training evidence at all — without this
      // filter the when/otherwise below would silently count NULL
      // labels as the NEGATIVE class and corrupt the model
      .filter(col(textCol).isNotNull && col(labelCol).isNotNull)
      .select(isPos.as("__pos"),
        explode(QualityExprs.qualityGramsCol(col(textCol))).as("bucket"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("__pos"), 1L).otherwise(0L)).as("__p"),
        sum(when(col("__pos"), 0L).otherwise(1L)).as("__n"))
    // class totals ride along as one broadcast row (grand totals of
    // the same aggregation — no second pass over the text). coalesce:
    // a corpus with no grams at all (all-NULL / whitespace text)
    // yields NULL sums, which would silently turn every weight NULL —
    // zero totals instead degrade to the all-baseWeight model
    val totals = counts.agg(
      coalesce(sum(col("__p")), lit(0L)).as("__pt"),
      coalesce(sum(col("__n")), lit(0L)).as("__nt"))
    val dense = df.sparkSession.range(0, B).select(col("id").cast(IntegerType)
        .as("bucket"))
      .join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("__p"), lit(0L)).as("__p"),
        coalesce(col("__n"), lit(0L)).as("__n"))
    dense.crossJoin(broadcast(totals))
      .select(col("bucket"),
        floor(lit(QualityExprs.Scale) * log(
          (col("__p") + 1.0) * (col("__nt") + B) /
            ((col("__n") + 1.0) * (col("__pt") + B))) + 0.5)
          .cast(LongType).as("weight"))
  }

  /** Driver-side weight array from a [[trainQualityWeights]] table —
    * bounded at [[QualityExprs.NumBuckets]] rows by construction.
    * Buckets absent from the table (a filtered/partial model) fall
    * back to the COMMITTED base weight of an untouched bucket. */
  def collectWeights(model: DataFrame): Array[Long] = {
    val w = Array.fill(QualityExprs.NumBuckets)(QualityExprs.baseWeight)
    model.select(col("bucket").cast(IntegerType),
        col("weight").cast(LongType))
      .collect().foreach { r =>
        require(!r.isNullAt(0) && !r.isNullAt(1),
          "model has a NULL bucket/weight row — not a trainQualityWeights table")
        val b = r.getInt(0)
        require(b >= 0 && b < QualityExprs.NumBuckets,
          s"model bucket $b outside [0, ${QualityExprs.NumBuckets})")
        w(b) = r.getLong(1)
      }
    w
  }

  /** Score every row map-only under `weights` (or the committed
    * default): adds `score` (long), `n_grams` (int) and `keep`
    * (the NB decision, score > 0). */
  def scoreWith(df: DataFrame, textCol: String,
                weights: Array[Long] = QualityExprs.defaultWeights): DataFrame = {
    val qs = QualityExprs.qualityModelScoreCol(col(textCol), weights)
    df.withColumn("__qs", qs)
      .withColumn("score", col("__qs.score"))
      .withColumn("n_grams", col("__qs.n_grams"))
      .withColumn("keep", col("__qs.score") > 0)
      .drop("__qs")
  }

  /** Convenience column: the committed-model score struct. */
  def qualityModelScore(text: Column): Column =
    QualityExprs.qualityModelScoreCol(text)
}
