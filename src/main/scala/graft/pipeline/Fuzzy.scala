package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy string matching across tables — the entity-resolution /
  * record-linkage step (match customer records to supplier records,
  * dedupe name variants) the exact joins cannot express. */
object Fuzzy {

  /** Blocked fuzzy join: pairs from `left` × `right` that share every
    * `blockCols` value AND whose `leftCol`/`rightCol` strings are
    * within `maxDist` Levenshtein edits. Blocking is the standard
    * record-linkage contract: the quadratic comparison runs only
    * INSIDE a block (same nation, same zip, same phonetic key…), so
    * the caller controls the pair budget explicitly rather than
    * discovering an accidental cross join at 100 TB. Pairs whose
    * either string is NULL never match (SQL comparison semantics).
    *
    * Scale shape: one hash equi-join on the block keys — shuffled,
    * AQE-skew-splittable — with the edit-distance check fused as a
    * post-join filter using Spark's BANDED Levenshtein (the
    * `threshold` form abandons a pair the moment its running distance
    * exceeds `maxDist`: O(maxDist·len) per pair, not O(len²)). A hot
    * block degrades to that block's pair count — pick blocking keys
    * with bounded selectivity, or add a second key to split. */
  def blockedFuzzyJoin(left: DataFrame, right: DataFrame,
                       blockCols: Seq[String], leftCol: String,
                       rightCol: String, maxDist: Int): DataFrame = {
    require(blockCols.nonEmpty,
      "blocking keys are required — an unblocked fuzzy join is a cross " +
        "join; block on something (or lit(1) explicitly at toy scale)")
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val overlap = left.columns.toSet
      .intersect(right.columns.toSet) -- blockCols
    require(overlap.isEmpty,
      s"left and right share non-block columns: ${overlap.mkString(", ")}" +
        " — rename one side first")
    require(!left.columns.contains("edit_dist") &&
      !right.columns.contains("edit_dist"),
      "an edit_dist column already exists — rename it first, or the " +
        "output distance would silently overwrite it")
    left.join(right, blockCols)
      // banded levenshtein: returns -1 when the distance exceeds the
      // threshold, so >= 0 IS the within-distance predicate. The
      // filter pays one early-abandoning eval per CANDIDATE pair;
      // only the (rare) survivors pay the second eval that produces
      // the output distance — Catalyst has no cross-operator CSE, and
      // any single-projection form would be pushdown-rewritten back
      // into exactly this shape.
      .filter(levenshtein(col(leftCol), col(rightCol), maxDist) >= 0)
      .withColumn("edit_dist",
        levenshtein(col(leftCol), col(rightCol), maxDist))
  }
}
