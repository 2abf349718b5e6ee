package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Seeded, driver-bounded query-id selection shared by the measurement
  * mains ([[AnnRecall]], [[SemanticDrift]]) — round-19: the old
  * `orderBy(vec_id).collect()` pulled one long PER CORPUS ROW to the
  * driver; fine at 10x (a few MB) but these mains are documented as
  * the tool a user runs on THEIR corpus to size parameters, and on a
  * billion-row embedding table that is a driver OOM.
  *
  * [[sampledSortedIds]] bounds the collect by filtering on a pure
  * function of the id — `xxhash64(vec_id, seed) % m == 0` with `m`
  * sized from a distributed count so the expected survivor set is
  * ≤ `capRows` — which is deterministic per (seed, id set) and
  * independent of partition layout (unlike `df.sample`, whose draw
  * depends on how rows land in partitions). Corpora already under the
  * cap keep the exact full-id behavior.
  *
  * [[proportionalPick]] then spreads `n` picks evenly over the whole
  * sorted survivor range via `i * len / n` index mapping (round-18
  * advice: the old `by(stride).take(n)` never sampled the tail when
  * `len % n != 0` — 1000 ids / 400 queries stopped at index 798). */
object QuerySelect {

  /** Deterministic bounded id sample: all ids when the table is under
    * `capRows`, else the seeded xxhash64-residue subset with expected
    * size ≈ `capRows`. Sorted ascending. */
  def sampledSortedIds(df: DataFrame, idCol: String, seed: Long,
                       capRows: Long = 100000L): Array[Long] = {
    val idL = col(idCol).cast("long")
    val n = df.count()
    val m = math.max(1L, n / capRows)
    val picked =
      if (m == 1L) df.select(idL)
      else df.select(idL).filter(pmod(xxhash64(idL, lit(seed)), lit(m)) === 0)
    picked.orderBy(col(idCol)).collect().map(_.getLong(0))
  }

  /** `n` evenly-spread picks over the full range of `ids` (sorted by
    * the caller): index `i -> i * len / n`, strictly increasing when
    * `len >= n`, so picks are distinct and the last lands within
    * `len / n` of the end. Returns all ids when `n >= ids.length`. */
  def proportionalPick(ids: Array[Long], n: Int): Seq[Long] = {
    require(n > 0, s"proportionalPick: n must be positive, got $n")
    if (n >= ids.length) ids.toSeq
    else (0 until n).map(i => ids((i.toLong * ids.length / n).toInt))
  }
}
