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
                       rightCol: String, maxDist: Int,
                       collapseExact: Boolean = true): DataFrame = {
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
    // banded levenshtein: returns -1 when the distance exceeds the
    // threshold, so >= 0 IS the within-distance predicate. The
    // filter pays one early-abandoning eval per CANDIDATE pair;
    // only the (rare) survivors pay the second eval that produces
    // the output distance — Catalyst has no cross-operator CSE, and
    // any single-projection form would be pushdown-rewritten back
    // into exactly this shape.
    def verified(pairs: DataFrame): DataFrame = pairs
      .filter(levenshtein(col(leftCol), col(rightCol), maxDist) >= 0)
      .withColumn("edit_dist",
        levenshtein(col(leftCol), col(rightCol), maxDist))
    if (!collapseExact) verified(left.join(right, blockCols))
    else {
      // Exact-duplicate collapse BEFORE the quadratic verify — the
      // same "run exact first" discipline the near-dup banding
      // documents for mega-clusters, applied to record linkage: real
      // entity-resolution corpora repeat names verbatim across
      // records, and every d duplicated left values × d' duplicated
      // right values would pay d·d' Levenshtein evals for ONE
      // distinct comparison. Verify pairs of DISTINCT (block, value)
      // rows, then expand matches back to full rows with two hash
      // equi-joins — linear work. The round-13 10× sweep measured the
      // direct form at 126 s on a corpus with 10 verbatim copies per
      // name (90× the sf0.1 cost, pure duplicated-pair verification);
      // collapsed, candidate evals are scale-invariant in the
      // duplicate factor. Trade: 4 extra (small, distinct-sized)
      // shuffles — linear terms, the right price for deleting the
      // quadratic one. Opt out with collapseExact=false when values
      // are known unique and the extra exchanges matter.
      val lKey = blockCols :+ leftCol
      val rKey = blockCols :+ rightCol
      val pairs = verified(
        left.select(lKey.map(col): _*).distinct()
          .join(right.select(rKey.map(col): _*).distinct(), blockCols))
      left.join(pairs, lKey).join(right, rKey)
        // column order of the direct form: left ++ right ++ edit_dist
        .select((left.columns.map(col) ++
          right.columns.filterNot(blockCols.contains).map(col) :+
          col("edit_dist")).toIndexedSeq: _*)
    }
  }
}
