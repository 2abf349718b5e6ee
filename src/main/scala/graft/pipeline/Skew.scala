package graft.pipeline

import org.apache.spark.sql.DataFrame
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
}
