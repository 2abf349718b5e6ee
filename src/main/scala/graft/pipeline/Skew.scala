package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators. AQE's skew-join handling splits
  * oversized SORT-MERGE partitions at runtime, but it cannot help
  * when the skewed key's rows must still meet in ONE task downstream
  * (hash aggregate on the same key) or when a join shape falls outside
  * AQE's reach — there, salting is still the manual tool of record. */
object Skew {

  /** Equi-join with the left side's hot keys spread across `salts`
    * sub-partitions: left rows get a deterministic salt from their
    * full row content, the right side is replicated once per salt
    * value, and the join runs on (keys…, salt) — a key holding 20% of
    * 100 TB becomes `salts` tasks instead of one straggler. The
    * result multiset is IDENTICAL to the unsalted join (each left row
    * joins exactly one right replica).
    *
    * Supports `inner` and `left` joins — the two where replicating
    * the RIGHT side is sound. (A right/full outer join would need
    * unmatched right rows emitted once, not `salts` times; salt the
    * other side instead by symmetry.) Cost, stated plainly: the right
    * side shuffles `salts`× its size — salt the side whose opposite
    * is small, and size `salts` to the skew (hot-key share ×
    * partition count), not higher. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "need at least one join key")
    require(salts >= 2, s"salts must be >= 2, got $salts")
    val jt = joinType.toLowerCase match {
      case "inner" => "inner"
      case "left" | "left_outer" | "leftouter" => "left"
      case other => throw new IllegalArgumentException(
        s"saltedJoin supports inner/left joins, got '$other' — for a " +
          "right outer join, swap the sides and salt the other way")
    }
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "a __salt column already exists")
    // salt from a row-unique id, NOT row content: a hot key whose
    // rows are byte-identical (the common pre-enrichment shape) would
    // hash every copy to ONE salt and still meet in a single task.
    // Salt values don't affect the result (each left row joins exactly
    // the replica carrying its salt), so nondeterminism across retries
    // is harmless.
    val saltedLeft = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedLeft.join(replicatedRight, keys :+ "__salt", jt).drop("__salt")
  }

  /** Join keys rendered as ONE string for hot-key detection and
    * matching — the SAME expression on both sides, so type formatting
    * can never disagree. NULL components are encoded EXPLICITLY
    * (`concat_ws` silently drops them), otherwise composite keys like
    * ("a", NULL), (NULL, "a") and ("a") all collapse to "a" — their
    * pooled count could spuriously flag a cold key as hot and inflate
    * replication (safe direction, but wasteful). Numeric/temporal
    * casts never emit control characters, but a STRING key column
    * passes through cast unchanged, so both metacharacters are
    * escaped in each value — \u0000 as \u0000e, and the \u0001
    * separator as \u0000s — before the \u0000n… NULL sentinel is
    * applied. The encoding is injective for every input type: no
    * raw separator survives inside a component, and nothing can
    * forge the NUL-'n' sentinel. */
  private def keyString(keys: Seq[String]): Column =
    concat_ws("\u0001", keys.map(k =>
      coalesce(
        regexp_replace(
          regexp_replace(col(k).cast("string"), "\u0000", "\u0000e"),
          "\u0001", "\u0000s"),
        lit("\u0000null"))): _*)

  /** Detect hot join keys in ONE bounded-state pass: a Space-Saving
    * sketch ([[graft.functions.SketchExprs.SpaceSavingTopK]]) plus a
    * row count in the same aggregation. Returns the keys whose
    * sketched frequency is ≥ `minShare` of the rows. The sketch
    * OVERESTIMATES by at most `err`, so this returns a superset of
    * the truly-hot keys — exactly the safe direction for salting
    * (salting a lukewarm key costs a few replicas; missing a hot one
    * costs the straggler). That superset guarantee holds only while
    * `minShare ≥ 1/m` (Space-Saving retains every item above N/m and
    * can evict below it), so the precondition is enforced: size m to
    * the share you care about, not vice versa. At 100 TB this pass
    * shuffles m counters per partition, never the keys. */
  def detectHotKeys(df: DataFrame, keys: Seq[String], m: Int,
                    minShare: Double): Seq[String] = {
    require(keys.nonEmpty, "need at least one join key")
    require(minShare > 0 && minShare <= 1, s"minShare in (0,1], got $minShare")
    require(minShare * m >= 1.0,
      s"minShare=$minShare below 1/m=${1.0 / m}: Space-Saving only " +
        "guarantees retention of keys above N/m, so a key could be " +
        "hot by this floor yet evicted — raise m or the floor")
    val sketch = Sketches.ssAgg(keyString(keys), lit(1L), lit(0L), m)
    val row = df.agg(count(lit(1)).as("n"), sketch.as("ss")).head()
    val n = row.getLong(0)
    val floor = minShare * n
    row.getSeq[org.apache.spark.sql.Row](1)
      .filter(_.getLong(1) >= floor).map(_.getString(0))
  }

  /** [[saltedJoin]] with the replication bill scoped to the keys that
    * need it: ONE sketch pass over the left side finds keys holding
    * ≥ `hotShare` of its rows, hot left rows salt across `salts`
    * sub-partitions, and the right side replicates ONLY for hot keys
    * — cold keys join 1:1. Result multiset identical to the plain
    * join (same argument as saltedJoin; the salt picks which replica,
    * never whether a match exists). Falls back to the plain join when
    * nothing is hot.
    *
    * This is the production shape at scale: blanket salting multiplies
    * the ENTIRE right shuffle by `salts`, which is exactly the cost
    * that made someone reach for salting in the first place. Here the
    * right shuffles (1 + salts·hotKeyFraction)× instead. */
  def skewAwareJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                    salts: Int, joinType: String = "inner",
                    m: Int = 1024, hotShare: Double = 0.01): DataFrame = {
    require(keys.nonEmpty, "need at least one join key")
    require(salts >= 2, s"salts must be >= 2, got $salts")
    val jt = joinType.toLowerCase match {
      case "inner" => "inner"
      case "left" | "left_outer" | "leftouter" => "left"
      case other => throw new IllegalArgumentException(
        s"skewAwareJoin supports inner/left joins, got '$other' — for a " +
          "right outer join, swap the sides and salt the other way")
    }
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "a __salt column already exists")
    val hot = detectHotKeys(left, keys, m, hotShare)
    if (hot.isEmpty) left.join(right, keys, jt)
    else {
      // ≤ m hot-key strings ride into generated code as an InSet —
      // no extra join to tag rows
      val saltedLeft = left.withColumn("__salt",
        when(keyString(keys).isin(hot: _*),
          pmod(monotonically_increasing_id(), lit(salts.toLong)))
          .otherwise(lit(0L)))
      val replicatedRight = right.withColumn("__salt",
        explode(when(keyString(keys).isin(hot: _*),
          sequence(lit(0L), lit(salts.toLong - 1)))
          .otherwise(array(lit(0L)))))
      saltedLeft.join(replicatedRight, keys :+ "__salt", jt).drop("__salt")
    }
  }
}
