package graft

import graft.pipeline.PageRank
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** PageRank: hand-computed two-node exchange, mass conservation with
  * dangling nodes, hub dominance ordering, and determinism across
  * partitionings. */
class PageRankSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ranks(edges: Seq[(String, String)], iters: Int = 10) =
    PageRank.pageRank(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  "pageRank" should "match the hand-computed 2-cycle fixed point" in {
    // a ⇄ b: perfectly symmetric, every iteration keeps 0.5/0.5
    val m = ranks(Seq(("a", "b"), ("b", "a")))
    m("a") shouldBe 0.5 +- 1e-12
    m("b") shouldBe 0.5 +- 1e-12
  }

  it should "conserve total mass with dangling nodes" in {
    // c is dangling (no out-edges): its mass redistributes uniformly
    val m = ranks(Seq(("a", "b"), ("b", "c")))
    m.values.sum shouldBe 1.0 +- 1e-9
    m("c") should be > m("a") // chain end accumulates
  }

  it should "rank a hub above its spokes" in {
    val spokes = (1 to 8).map(i => (s"s$i", "hub"))
    val back = (1 to 8).map(i => ("hub", s"s$i"))
    val m = ranks(spokes ++ back)
    all(m.filterNot(_._1 == "hub").values) should be < m("hub")
  }

  it should "be deterministic across partitionings" in {
    val edges = (1 to 500).map(i => (s"n${i % 50}", s"n${(i * 13) % 50}"))
    val a = PageRank.pageRank(edges.toDF("src", "dst").repartition(1), 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = PageRank.pageRank(edges.toDF("src", "dst").repartition(17), 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // same nodes, values equal to float-noise (summation order differs)
    a.keySet shouldBe b.keySet
    a.foreach { case (k, v) => v shouldBe b(k) +- 1e-12 }
  }

  it should "broadcast dimension-sized rank tables and shuffle-join past the gate" in {
    // at a 100x graph the rank table is node-scale and must NOT be
    // broadcast once per iteration; broadcastNodeLimit gates the two
    // plan shapes — force each and pin it in the executed plan
    val edges = (1 to 200).map(i => (s"n${i % 40}", s"n${(i * 7) % 40}"))
      .toDF("src", "dst")
    def planOf(limit: Long): String =
      PageRank.pageRank(edges, iterations = 2, broadcastNodeLimit = limit)
        .queryExecution.executedPlan.toString
    // dimension-sized: the ranks⋈edges join broadcasts the rank side
    // (hash join keyed on node/src — not just the one-row dangling BNLJ)
    planOf(500000) should include("BroadcastHashJoin")
    // past the gate: no broadcast HASH join anywhere — every keyed join
    // shuffles (the one-row dangling mass still rides a nested-loop
    // broadcast, which is size-invariant and fine)
    planOf(0) should not include "BroadcastHashJoin"
    // both shapes must agree numerically
    val a = PageRank.pageRank(edges, 3).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = PageRank.pageRank(edges, 3, broadcastNodeLimit = 0).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    a.keySet shouldBe b.keySet
    a.foreach { case (k, v) => v shouldBe b(k) +- 1e-12 }
  }

  it should "reject malformed arguments" in {
    val e = Seq(("a", "b")).toDF("src", "dst")
    an[IllegalArgumentException] should be thrownBy
      PageRank.pageRank(e, iterations = 0)
    an[IllegalArgumentException] should be thrownBy
      PageRank.pageRank(e, damping = 1.0)
    an[IllegalArgumentException] should be thrownBy
      PageRank.pageRank(e.withColumn("x", e("src")))
  }
}
