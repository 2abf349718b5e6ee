package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and data mixing for training-data pipelines.
  *
  * Everything here is MAP-ONLY — a sampling decision is a pure
  * function of (stable key, seed), never of partitioning, task
  * scheduling or row order. That is the property `df.sample()` cannot
  * give you: Spark's sampler is seeded per-partition, so adding one
  * input file reshuffles every decision. Hash-based sampling keeps
  * decisions stable under repartitioning, incremental appends and
  * re-runs — the requirements of a reproducible 100 TB corpus build
  * (and of train/test splits that must never leak across runs).
  *
  * Two hash families:
  *  - [[bucket]]: `xxhash64` — codegen'd, one 64-bit mix per row; the
  *    production path.
  *  - [[portableBucket]]: first 8 hex digits of `md5` — ~3× slower but
  *    bit-identical SQL exists in every engine (DuckDB, Trino,
  *    Postgres), so cross-engine audits can replay the exact sample.
  *
  * The reference engine has no sampling surface (SURVEY.md §2 — its
  * only nondeterminism is rdf4j's SAMPLE aggregate); this family is
  * part of the LLM-pipeline extension mandate.
  */
object Sampling {

  /** Buckets per unit interval: rates resolve to 1/1e6 granularity. */
  val Buckets = 1000000L

  /** Deterministic bucket in [0, Buckets) from a stable key — the
    * production sampler (codegen'd xxhash64; pmod for a non-negative
    * remainder). Different seeds give independent samples. */
  def bucket(key: Column, seed: Long = 0L): Column =
    pmod(xxhash64(key, lit(seed)), lit(Buckets))

  /** Portable bucket: identical arithmetic is expressible in standard
    * SQL (`('0x' || substr(md5(key || ':' || seed), 1, 8))::BIGINT %
    * 1000000`), so an external engine can reproduce the sample row for
    * row. Key is taken as its string form. */
  def portableBucket(key: Column, seed: Long = 0L): Column =
    pmod(conv(substring(md5(concat(key.cast("string"),
      lit(":" + seed.toString)).cast("binary")), 1, 8), 16, 10)
      .cast("long"), lit(Buckets))

  /** Keep each row iff its bucket falls below `fraction` — a
    * deterministic Bernoulli sample, stable across runs/partitioning.
    * `portable = true` switches to the md5 bucket. */
  def deterministicSample(df: DataFrame, keyCol: String, fraction: Double,
                          seed: Long = 0L,
                          portable: Boolean = false): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction not in [0,1]")
    val b = if (portable) portableBucket(col(keyCol), seed)
            else bucket(col(keyCol), seed)
    // math.round, not toLong: truncation puts ~1.2% of 1e-6-granular
    // rates one bucket below the documented threshold (0.000249 * 1e6
    // = 248.99999999999997), breaking bit-identical external replay
    df.filter(b < lit(math.round(fraction * Buckets)))
  }

  /** Per-row weighted deterministic sample: keep each row with
    * probability `weightCol` (clamped to [0,1]; NULL or NaN weights drop),
    * decided by the row's key bucket alone — the quality-weighted
    * downsampling step of a corpus build ("keep high-quality docs,
    * thin the boilerplate"), stable across runs, partitioning and
    * appends like every sampler here. Map-only: no shuffle, fuses
    * into the scan.
    *
    * The threshold uses floor() on BOTH sides of the replay contract
    * (Scala's math.round is half-up, SQL round() half-away-from-zero
    * or half-even by engine — floor is the one alignment every engine
    * computes identically in IEEE doubles). */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
                     seed: Long = 0L, portable: Boolean = false): DataFrame = {
    val b = if (portable) portableBucket(col(keyCol), seed)
            else bucket(col(keyCol), seed)
    // NaN explicitly → 0: Spark orders NaN ABOVE all doubles, so a
    // NaN weight would sail through greatest/least and clamp to 1 —
    // an invalid score must mean keep-never, like NULL, not keep-always
    val w0 = col(weightCol).cast("double")
    val w = when(isnan(w0), 0.0)
      .otherwise(least(lit(1.0), greatest(lit(0.0), w0)))
    df.filter(b < floor(w * Buckets))
  }

  /** Temperature-based mixture plan: per-stratum keep rates that
    * reshape the corpus toward `q_s ∝ share_s^tau` (the multilingual /
    * multi-source rebalancing rule — tau = 1 keeps natural proportions,
    * tau → 0 approaches uniform, the τ ≈ 0.3–0.7 range upsamples rare
    * strata the way multilingual LLM corpus builds do) at an overall
    * `targetFraction` of the corpus. Returns `(strataCol, n, share,
    * rate)` with rate capped at 1 (a rare stratum cannot be upsampled
    * beyond itself without duplication — the capped mass is simply not
    * redistributed, the standard simple form). Rates are 6-dp rounded:
    * this is the auditable PLAN; apply it with [[temperatureSample]]
    * (or hand literal rates to [[stratifiedSample]]).
    *
    * One aggregation over the corpus; everything else is arithmetic on
    * the (tiny) stratum table. */
  /** Shared core of the temperature pair: per-stratum (n, share,
    * UNrounded rate). NULL strata are a group like any other. */
  private def rawTemperatureRates(df: DataFrame, strataCol: String,
                                  tau: Double,
                                  targetFraction: Double): DataFrame = {
    require(tau > 0, s"tau must be positive, got $tau")
    require(targetFraction > 0 && targetFraction <= 1,
      s"targetFraction $targetFraction not in (0,1]")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("n"))
    val totals = counts.agg(sum(col("n")).as("__total"),
      sum(pow(col("n").cast("double"), tau)).as("__powsum"))
    counts.crossJoin(broadcast(totals))
      .withColumn("share", col("n").cast("double") / col("__total"))
      // q_s = n^tau / powsum of the target mass; rate = kept_s / n_s
      .withColumn("rate", least(lit(1.0),
        pow(col("n").cast("double"), tau) / col("__powsum") *
          col("__total").cast("double") * targetFraction /
          col("n").cast("double")))
  }

  def temperatureRates(df: DataFrame, strataCol: String, tau: Double,
                       targetFraction: Double): DataFrame =
    rawTemperatureRates(df, strataCol, tau, targetFraction)
      .select(col(strataCol), col("n"),
        round(col("share"), 6).as("share"), round(col("rate"), 6).as("rate"))

  /** Apply a [[temperatureRates]] plan: deterministic per-row keep at
    * each stratum's rate, decided by the portable key bucket — the
    * same append-stable, engine-replayable contract as every sampler
    * here. The integer threshold is `round(rate · 1e6)` computed from
    * the UNrounded rate on both sides of the replay. The stratum-rate
    * table broadcasts back onto the corpus (strata are languages /
    * sources — a handful of rows); the corpus itself never shuffles. */
  def temperatureSample(df: DataFrame, strataCol: String, keyCol: String,
                        tau: Double, targetFraction: Double,
                        seed: Long = 0L): DataFrame = {
    val thresholds = rawTemperatureRates(df, strataCol, tau, targetFraction)
      .select(col(strataCol).as("__stratum"),
        round(col("rate") * Buckets).cast("long").as("__thr"))
    // null-SAFE join: a NULL stratum is a stratum (it was counted in
    // the totals its rate came from) — an equi-join would silently
    // delete its rows while still letting them dilute every rate
    df.join(broadcast(thresholds), col(strataCol) <=> col("__stratum"))
      .filter(portableBucket(col(keyCol), seed) < col("__thr"))
      .drop("__stratum", "__thr")
  }

  /** Disjoint deterministic split (train/validation/test): `weights`
    * are relative and need not sum to 1. Returns one DataFrame per
    * weight; every input row lands in exactly one split, decided by
    * its key alone — append new data and old rows never migrate. */
  def split(df: DataFrame, keyCol: String, weights: Seq[Double],
            seed: Long = 0L, portable: Boolean = false): Seq[DataFrame] = {
    require(weights.nonEmpty && weights.forall(_ > 0), "weights must be > 0")
    val total = weights.sum
    val cuts = weights.scanLeft(0.0)(_ + _)
      .map(w => math.round(w / total * Buckets)) // round: see deterministicSample
    val b = if (portable) portableBucket(col(keyCol), seed)
            else bucket(col(keyCol), seed)
    cuts.sliding(2).toSeq.map { case Seq(lo, hi) =>
      df.filter(b >= lit(lo) && b < lit(hi))
    }
  }

  /** Stratified sampling / data mixing: per-stratum keep rates (e.g.
    * language → rate, source → mixture weight). Rates compile to one
    * codegen'd CASE over the broadcast-free literal map — strata sets
    * are small (languages, domains) by construction; rows in strata
    * absent from `rates` keep `defaultRate`. This IS the "data
    * mixture" op: rates re-weight the corpus composition exactly and
    * reproducibly. */
  def stratifiedSample(df: DataFrame, strataCol: String,
                       rates: Map[String, Double], keyCol: String,
                       seed: Long = 0L, defaultRate: Double = 0.0,
                       portable: Boolean = false): DataFrame = {
    require((defaultRate +: rates.values.toSeq)
      .forall(r => r >= 0 && r <= 1), "rates must be in [0,1]")
    val b = if (portable) portableBucket(col(keyCol), seed)
            else bucket(col(keyCol), seed)
    val threshold = rates.toSeq.sortBy(_._1)
      .foldLeft(lit(math.round(defaultRate * Buckets))) { case (acc, (k, r)) =>
        when(col(strataCol) === lit(k), lit(math.round(r * Buckets)))
          .otherwise(acc) // round: see deterministicSample
      }
    df.filter(b < threshold)
  }

  /** Token-budget corpus composition: fill each stratum with documents
    * in deterministic hash order until `budget` tokens, keeping a row
    * iff the tokens of all hash-earlier rows in its stratum total
    * LESS THAN the budget (greedy fill — the boundary document may
    * overflow it, so strata are never left short by an unlucky large
    * tail). This is the "give me 10B tokens of French" op: exact token
    * accounting, reproducible row-for-row (`portable = true` replays
    * in any SQL engine via the md5 bucket and a window sum).
    *
    * Scale shape: ONE shuffle — a per-stratum window ordered by
    * (bucket, key). Strata are corpus-composition units (language,
    * source), so per-stratum sorts are the natural partitioning; for a
    * single giant stratum, pre-thin with [[deterministicSample]] at an
    * estimated rate first, then budget-fill the survivors.
    *
    * Unlike the rate samplers this is NOT append-stable: inserting a
    * document shifts the cumulative sums after its hash position. It is
    * deterministic for a given corpus — re-runs and repartitioning
    * cannot change the selection. */
  def tokenBudgetSample(df: DataFrame, strataCol: String, tokenCol: String,
                        keyCol: String, budget: Long, seed: Long = 0L,
                        portable: Boolean = false): DataFrame = {
    require(budget >= 0, s"budget $budget must be >= 0")
    import org.apache.spark.sql.expressions.Window
    val b = if (portable) portableBucket(col(keyCol), seed)
            else bucket(col(keyCol), seed)
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col("__tb_b"), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__tb_b", b)
      .withColumn("__tb_cum",
        coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .filter(col("__tb_cum") < budget)
      .drop("__tb_b", "__tb_cum")
  }
}
