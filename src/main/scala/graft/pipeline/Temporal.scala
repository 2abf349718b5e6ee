package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Temporal operators over keyed event streams (LLM-pipeline /
  * analytics extension — SURVEY.md §2 has no reference counterpart;
  * the brief names the as-of join as the canonical operator Spark
  * lacks natively).
  *
  * Both operators are ONE hash shuffle on the key followed by an
  * in-partition sort — the only shape that survives 100 TB of events.
  * The naive as-of formulations (a range join, or a join-then-rank
  * over all ≤-pairs) build O(left × right-history) intermediates;
  * this one never materializes a pair at all.
  */
object Temporal {

  /** As-of join: for each left row, the columns of the single most
    * recent right row with `right.timeCol <= left.timeCol` and the
    * same `keyCol` (ties at equal time match — the standard "price as
    * of the trade" semantics), optionally only when the right row is
    * within `tolerance` time units. Left rows with no match keep NULL
    * matched columns (left-outer semantics). `timeCol` must be
    * numeric on both sides (the battery convention: epoch nanos as
    * long), so the tolerance subtraction is exact integer arithmetic.
    *
    * Determinism: among right rows sharing the greatest admissible
    * time, the one with the largest `rightTieCol` wins, so the result
    * is a pure function of the data — no "arbitrary row at equal
    * timestamps" nondeterminism to break reproducible builds (or the
    * bit-exact external replay the battery oracle performs).
    *
    * NULL semantics follow the SQL equality-join convention: right
    * rows with a NULL key or NULL time can never be a match (they are
    * filtered before the union — without this, Spark's NULLS FIRST
    * sort order would carry a null-time payload to every early left
    * row, and NULL keys would attribute each other's data). Left rows
    * always survive; a NULL-key or NULL-time left row simply gets no
    * match.
    *
    * Shape at scale: both sides are tagged and UNIONED — never
    * joined — then a single running `last(..., ignoreNulls = true)`
    * window carries the latest right payload forward within each key
    * partition, ordered by (time, side, tie) with right rows sorted
    * before co-timed left rows. One exchange on the key, one sort, no
    * join node, no pair blow-up: cost is linear in |left| + |right|
    * regardless of how deep each key's right-side history runs. The
    * window frame is running (UNBOUNDED PRECEDING → CURRENT ROW), so
    * Spark evaluates it in a single streaming pass over each
    * partition — state is one row's payload, not the history. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               timeCol: String, rightCols: Seq[String],
               rightTieCol: String, tolerance: Option[Long] = None,
               rightPrefix: String = "asof_"): DataFrame = {
    require(rightCols.nonEmpty, "rightCols must name at least one column")
    require(!rightCols.contains(keyCol) && !rightCols.contains(timeCol),
      s"rightCols must not repeat the key/time columns ($keyCol, $timeCol)")
    tolerance.foreach(t => require(t > 0, s"tolerance must be positive, got $t"))
    val leftCols = left.columns.toSeq
    val outCols = rightCols.map(rightPrefix + _) :+ (rightPrefix + timeCol)
    require(!leftCols.exists(outCols.contains),
      s"prefixed output columns collide with left columns: " +
        outCols.filter(leftCols.contains).mkString(", "))
    // Carried payloads are typed STRUCTS (null literal of the same
    // struct type on the other side keeps unionByName exact — no
    // JSON/codec round-trip, nested/binary columns survive).
    val rightSchema = right.schema
    def rType(c: String) = rightSchema(rightSchema.fieldIndex(c)).dataType
    val rPayloadType = StructType(
      (rightCols :+ timeCol).map(c => StructField(rightPrefix + c, rType(c))) :+
        StructField("__tie", rType(rightTieCol)))
    val rPayload = struct(
      (rightCols :+ timeCol).map(c => col(c).as(rightPrefix + c)) :+
        col(rightTieCol).as("__tie"): _*)
    val lPayloadType = StructType(left.schema.fields)
    val taggedRight = right
      .filter(col(keyCol).isNotNull && col(timeCol).isNotNull)
      .select(
        col(keyCol), col(timeCol).as("__t"), lit(0).as("__side"),
        col(rightTieCol).as("__ord"),
        rPayload.as("__r"), lit(null).cast(lPayloadType).as("__l"))
    val taggedLeft = left.select(
      col(keyCol), col(timeCol).as("__t"), lit(1).as("__side"),
      lit(null).cast(rType(rightTieCol)).as("__ord"),
      lit(null).cast(rPayloadType).as("__r"),
      struct(leftCols.map(col): _*).as("__l"))
    // right rows sort BEFORE co-timed left rows (side 0 < 1) so equal
    // times match; among co-timed right rows the largest tie wins
    // (last() picks by window order alone — asc ties, latest wins).
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__t"), col("__side"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched0 = col("__m")
    val inTol = tolerance.map(t =>
      col("__t") - matched0.getField(rightPrefix + timeCol) <= t)
      .getOrElse(lit(true))
    taggedRight.unionByName(taggedLeft)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l"), when(matched0.isNotNull && inTol, matched0)
        .as("__match"))
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        outCols.map(c => col(s"__match.$c").as(c)): _*)
  }

  /** Stream-compatible as-of LOOKUP against a bounded dimension: the
    * same semantics as [[asofJoin]] (latest right row at or before
    * each left row's time, same key, largest-tie determinism, NULL
    * key/time right rows never match, optional tolerance) — but the
    * right side is packed into one sorted per-key history array and
    * broadcast, so the pick is a per-row probe with NO shuffle of the
    * left side at all. Stateless map-side work: composes with a
    * STREAMING left (append mode, no watermark, no stream-stream join
    * state) — the live face of the batch as-of join.
    *
    * The trade-off, stated plainly: the whole dimension must fit a
    * broadcast, and each probe scans the key's history (an
    * interpreted higher-order filter, not codegen). Right for
    * reference-data histories (prices per instrument, config
    * versions, exchange rates — thousands of keys × bounded
    * versions); wrong for a right side that is itself event-scale.
    * There, use [[asofJoin]]. */
  def asofLookup(left: DataFrame, dim: DataFrame, keyCol: String,
                 timeCol: String, rightCols: Seq[String],
                 rightTieCol: String, tolerance: Option[Long] = None,
                 rightPrefix: String = "asof_"): DataFrame = {
    require(rightCols.nonEmpty, "rightCols must name at least one column")
    require(!rightCols.contains(keyCol) && !rightCols.contains(timeCol),
      s"rightCols must not repeat the key/time columns ($keyCol, $timeCol)")
    tolerance.foreach(t => require(t > 0, s"tolerance must be positive, got $t"))
    val leftCols = left.columns.toSeq
    val outCols = rightCols.map(rightPrefix + _) :+ (rightPrefix + timeCol)
    require(!leftCols.exists(outCols.contains),
      s"prefixed output columns collide with left columns: " +
        outCols.filter(leftCols.contains).mkString(", "))
    // internal temp names must not be shadowed either (mirrors the
    // __salt guard in Skew.saltedJoin — fail loudly, never silently)
    val reserved = Seq("__hist", "__m0", "__m")
    val clash = (leftCols ++ dim.columns).filter(reserved.contains).distinct
    require(clash.isEmpty,
      s"input columns collide with asofLookup temp names: ${clash.mkString(", ")}")
    // sort key first, then tie, then payload: sort_array orders by
    // (t, tie) so element_at(-1) is the latest-then-largest-tie row
    val packed = dim
      .filter(col(keyCol).isNotNull && col(timeCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(
        col(timeCol).as("__t") +: col(rightTieCol).as("__tie") +:
          rightCols.map(c => col(c).as(rightPrefix + c)): _*))).as("__hist"))
    // try_element_at: an empty filtered history (no admissible row)
    // must yield NULL, not an ANSI out-of-bounds error. The probe is
    // materialized into ITS OWN column first — it is an interpreted
    // history scan, and referencing it from the tolerance/null checks
    // directly would re-run the scan per reference.
    val m0 = try_element_at(
      filter(col("__hist"), h => h.getField("__t") <= col(timeCol)),
      lit(-1))
    val probed = col("__m0")
    val inTol = tolerance.map(t =>
      col(timeCol) - probed.getField("__t") <= t).getOrElse(lit(true))
    left
      .join(broadcast(packed), Seq(keyCol), "left")
      .withColumn("__m0", m0)
      .withColumn("__m", when(probed.isNotNull && inTol, probed))
      .select(leftCols.map(col) ++
        rightCols.map(c => col(s"__m.$rightPrefix$c").as(rightPrefix + c)) :+
        col("__m.__t").as(rightPrefix + timeCol): _*)
  }

  /** Range (point-in-interval) join: every `(point, interval)` pair
    * with `loCol <= pointCol <= hiCol` (inclusive both ends), plus any
    * `keyCols` equality. All three bound columns must be integral
    * (days, epoch micros…, the battery convention).
    *
    * Shape at scale: Spark plans a raw BETWEEN join as
    * BroadcastNestedLoopJoin — O(|points| × |intervals|) comparisons
    * and a broadcast of one ENTIRE side, the canonical 100 TB
    * scale-killer. This operator bucketizes the axis instead: each
    * interval explodes to the `bucketWidth`-sized buckets it overlaps,
    * each point owns exactly ONE bucket, and the pair generation is a
    * plain hash equi-join on (keyCols…, bucket) — shuffled, AQE-skew-
    * splittable, no broadcast of a big side, no quadratic comparison.
    * The exact BETWEEN runs as a post-join filter. Each qualifying
    * pair is emitted exactly once (the point's bucket is unique), so
    * no dedup pass is needed. Pick `bucketWidth` near the typical
    * interval length: expansion is ~len/width+1 rows per interval,
    * while an over-wide bucket just grows the filtered-out join
    * fan-out. Intervals with `hi < lo` match nothing and are dropped
    * before exploding (Spark's `sequence` would otherwise run it
    * BACKWARDS and fabricate buckets). */
  def rangeJoin(points: DataFrame, intervals: DataFrame, pointCol: String,
                loCol: String, hiCol: String, bucketWidth: Long,
                keyCols: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val overlap = points.columns.toSet
      .intersect(intervals.columns.toSet) -- keyCols
    require(overlap.isEmpty,
      s"points and intervals share non-key columns: ${overlap.mkString(", ")}" +
        " — rename one side first")
    // floorDiv in exact math over the full long range: subtracting
    // pmod (always non-negative) lands on the floor multiple for any
    // sign, and the division runs in DECIMAL — double `/` would lose
    // exactness past 2^53 (a nanosecond axis is ~2^60)
    def floorDiv(c: Column): Column =
      ((c.cast("decimal(38,0)") - pmod(c, lit(bucketWidth)))
        / bucketWidth).cast("long")
    val p = points.withColumn("__bucket", floorDiv(col(pointCol)))
    val iv = intervals
      .filter(col(hiCol) >= col(loCol))
      .withColumn("__bucket", explode(sequence(
        floorDiv(col(loCol)), floorDiv(col(hiCol)))))
    p.join(iv, keyCols :+ "__bucket")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** Ordered-funnel analysis: how far each key progresses through
    * `steps` IN ORDER (signup → click → purchase…). A step counts as
    * reached when its earliest event is at or after the previous
    * step's earliest event — the standard first-touch funnel rule,
    * deterministic because only per-step MIN timestamps enter the
    * comparison. Returns one row per key: `(keyCol, funnel_depth)`
    * with depth in [0, steps.length]. Keys with no step-0 event score
    * 0 (rows whose `stepCol` matches no step contribute nothing).
    *
    * Scale shape: ONE groupBy over the events with a conditional MIN
    * per step (map-side partials absorb any hot key), then a pure
    * row-local depth computation — no joins, no windows, one
    * shuffle regardless of funnel length. */
  def funnel(events: DataFrame, keyCol: String, stepCol: String,
             timeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "steps must name at least one stage")
    require(steps.distinct == steps, s"steps repeat: ${steps.mkString(", ")}")
    val mins = steps.zipWithIndex.map { case (s, i) =>
      min(when(col(stepCol) === s, col(timeCol))).as(s"__t$i")
    }
    // depth = longest prefix with every step present and times
    // non-decreasing; folding 0→n-1 leaves the DEEPEST case outermost
    val agged = events.groupBy(col(keyCol)).agg(mins.head, mins.tail: _*)
    val depth = steps.indices.foldLeft(lit(0)) { (acc, i) =>
      val reached = (0 to i).map { j =>
        val present = col(s"__t$j").isNotNull
        if (j == 0) present
        else present && col(s"__t$j") >= col(s"__t${j - 1}")
      }.reduce(_ && _)
      when(reached, lit(i + 1)).otherwise(acc)
    }
    agged.select(col(keyCol), depth.cast("int").as("funnel_depth"))
  }

  /** Gap-based sessionization: events of one key belong to the same
    * session while consecutive events are at most `gap` time units
    * apart; a longer silence starts a new session. Returns one row per
    * session: `(keyCol, session_idx, session_start, session_end,
    * n_events, ...aggs)` where `session_idx` numbers a key's sessions
    * from 1 in time order — deterministic, so session identities are
    * stable across runs and engines. `timeCol` must be numeric (epoch
    * nanos by battery convention); `gap` is in the same unit.
    * NULL-key or NULL-time events belong to no session and are
    * dropped (without this, Spark's NULLS FIRST ordering would both
    * emit junk single-event sessions AND shift every real session's
    * index, breaking the stable-identity guarantee above).
    *
    * Shape at scale: the classic two-window one-shuffle form — lag to
    * flag session starts, running sum to assign indexes, then an
    * ordinary groupBy rollup. All three stages share the SAME hash
    * partitioning on the key, so Spark plans exactly one exchange;
    * state never exceeds the in-partition sort. Skew note: keys are
    * users/devices — a single key holding a partition-breaking share
    * of 100 TB of events indicates a bot you want quarantined
    * upstream, not a partitioning strategy. */
  def sessionize(events: DataFrame, keyCol: String, timeCol: String,
                 gap: Long, aggs: Seq[Column] = Nil): DataFrame = {
    require(gap > 0, s"gap must be positive, got $gap")
    val byTime = Window.partitionBy(col(keyCol)).orderBy(col(timeCol))
    val isStart = when(
      col(timeCol) - lag(col(timeCol), 1).over(byTime) <= gap, 0L)
      .otherwise(1L) // first event of a key: lag is NULL → <= is NULL → 1
    val runningIdx = sum(isStart).over(
      byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    events
      .filter(col(keyCol).isNotNull && col(timeCol).isNotNull)
      .withColumn("session_idx", runningIdx)
      .groupBy(col(keyCol), col("session_idx"))
      .agg(
        min(col(timeCol)).as("session_start"),
        (max(col(timeCol)).as("session_end") +:
          count(lit(1)).as("n_events") +: aggs): _*)
  }
}
