package graft

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Seeded floors for the [[SemanticDrift]] centroid-drift harness
  * (round-18): at ZERO drift the frozen-model incremental path and
  * the retrained arm must both recover essentially every planted
  * twin — the baseline the committed SEMANTIC_DRIFT artifact's curve
  * hangs off. A large mean shift is ALSO pinned: argmax-dot
  * assignment is a pure function of the vector, so a twin and its
  * drifted original still co-assign and twin recall survives — the
  * frozen model's drift cost shows up first as hot-cluster
  * concentration (max_cluster_share, reported not floored: it is the
  * operator's re-train signal, not a correctness property). */
class SemanticDriftSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark

  it should "recover planted twins at zero drift and keep twin recall under heavy drift" in {
    val seed = java.lang.Long.getLong("graft.fuzz.seed", 1335L)
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pts = SemanticDrift.measure(spark, emb, numPairs = 24,
      seed = seed, deltas = Seq(0.0, 2.0), k = 4, iters = 2,
      numPlanes = 2)
    val zero = pts.head
    val heavy = pts.last
    withClue(s"seed=$seed zero=$zero heavy=$heavy: ") {
      zero.recallFrozen should be >= 0.9
      zero.recallRetrained should be >= 0.9
      zero.sameClusterFrozen should be >= 0.9
      // pure mean shift moves twin AND original together: frozen twin
      // recall survives δ=2.0 (the curve's honest headline — the
      // drift cost is concentration, not missed twins)
      heavy.recallFrozen should be >= 0.85
      heavy.sameClusterFrozen should be >= 0.85
      heavy.maxClusterShareFrozen should (be > 0.0 and be <= 1.0)
    }
  }
}
