package graft

import graft.pipeline.Clustering
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Connected-components clustering: checked against a driver-side
  * union-find oracle on adversarial shapes (long chains = worst-case
  * diameter, stars = worst-case degree skew, random graphs). */
class ClusteringSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Driver-side union-find oracle. */
  private def oracle(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Clustering.connectedComponents(pairs.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  "connectedComponents" should "resolve a long chain (worst-case diameter)" in {
    // path 0-1-2-...-99: min-propagation must cross 100 hops, which the
    // star rounds compress in O(log^2 n), not O(n), iterations
    val chain = (0L until 99L).map(i => (i, i + 1))
    val got = run(chain)
    got.values.toSet shouldBe Set(0L)
    got.keySet shouldBe (0L to 99L).toSet
  }

  it should "converge on a 2,000-node chain within the round budget" in {
    // diameter 2,000: naive min-propagation needs 2,000 rounds; the
    // star rounds must finish within the default maxRounds = 50
    val chain = (0L until 1999L).map(i => (i, i + 1))
    val got = run(chain)
    got.values.toSet shouldBe Set(0L)
    got.keySet should have size 2000
  }

  it should "keep separate components separate" in {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
    run(pairs) shouldBe oracle(pairs)
  }

  it should "handle hub skew (one node in every pair)" in {
    val hub = (1L to 500L).map(i => (0L, i))
    val got = run(hub)
    got.values.toSet shouldBe Set(0L)
    got.keySet should have size 501
  }

  it should "match the union-find oracle on a seeded random graph" in {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(400)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
    run(pairs) shouldBe oracle(pairs)
  }

  it should "ignore self-loops and survive an empty input" in {
    run(Seq((5L, 5L))) shouldBe Map.empty
    run(Seq.empty) shouldBe Map.empty
  }

  it should "work on string ids (any orderable type)" in {
    val pairs = Seq(("b", "c"), ("a", "b"), ("x", "y")).toDF("u", "v")
    val got = Clustering.connectedComponents(pairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    got shouldBe Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x")
  }

  "assignComponents" should "give singletons their own id" in {
    val df = Seq(1L, 2L, 3L, 9L).toDF("id")
    val pairs = Seq((1L, 2L)).toDF("a", "b")
    val got = Clustering.assignComponents(df, "id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 9L -> 9L)
  }

  it should "replace an existing component column instead of colliding" in {
    val df = Seq((1L, 99L), (2L, 99L)).toDF("id", "component")
    val got = Clustering.assignComponents(df, "id", Seq((1L, 2L)).toDF("a", "b"))
      .select("id", "component")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 1L, 2L -> 1L)
  }

  "nearDupClusters" should "keep identical docs clustered even when the bucket cap drops their LSH pairs" in {
    // 120 identical docs: every LSH bucket oversized at cap 50, so the
    // candidate pairs vanish — the exact-fingerprint chain must still
    // bind them into one cluster (the transitive-exact contract)
    val flood = (10L until 130L).map(i =>
      (i, "the same exact flooded document text repeated verbatim across the corpus"))
    val docs = (flood ++ Seq(
      (1L, "completely different content about spark query engines and columnar execution")))
      .toDF("doc_id", "text")
    val got = Clustering.nearDupClusters(docs, "doc_id", "text",
      threshold = 0.5, maxBucketSize = 50)
      .select("doc_id", "component")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (10L until 130L).foreach(i => got(i) shouldBe 10L)
    got(1L) shouldBe 1L
  }

  "nearDupClusters" should "cluster transitive near-dups to one representative" in {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (4L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (3L, "completely different content about spark query engines and columnar execution"))
      .toDF("doc_id", "text")
    val got = Clustering.nearDupClusters(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_id", "component")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got(1L) shouldBe 1L
    got(2L) shouldBe 1L // near-dup of 1 → same cluster
    got(4L) shouldBe 1L // exact dup of 1 → same cluster
    got(3L) shouldBe 3L // unrelated → own cluster
  }
}
