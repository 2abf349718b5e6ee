package graft

import graft.pipeline.Clustering
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** SemDeDup composition: in-cluster near-dups collapse transitively
  * to the min-id canonical, dissimilar cluster-mates survive, and the
  * paper's own approximation — a near-dup pair split across the
  * centroid boundary — is preserved (the planted decoy), plus the
  * portable variant's determinism. */
class SemanticDedupSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  // two explicit unit-ish centroids: cluster 0 ~ e0, cluster 1 ~ e1
  private val centroids = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0))

  private def run(rows: Seq[(Long, Seq[Float])], threshold: Double) =
    Clustering.semanticDedup(
      rows.toDF("id", "emb"), "id", "emb", centroids,
      threshold = threshold, numPlanes = 0)
      .select(col("id"), col("cluster"), col("component"), col("keep"))
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  behavior of "Clustering.semanticDedup"

  it should "collapse in-cluster near-dups to the min id and keep dissimilar cluster-mates" in {
    val rows = Seq(
      1L -> Seq(10f, 1f, 0f, 0f),      // cluster 0
      2L -> Seq(10.1f, 1.01f, 0f, 0f), // ~identical to 1 → pruned
      3L -> Seq(1f, 0.2f, 5f, 0f))     // cluster 0, dissimilar → kept
    val got = run(rows, 0.95)
    got(1L) shouldBe ((0L, 1L, true))
    got(2L)._1 shouldBe 0L
    got(2L)._2 shouldBe 1L // component min
    got(2L)._3 shouldBe false
    got(3L)._1 shouldBe 0L
    got(3L)._3 shouldBe true
  }

  it should "NOT merge a near-dup pair split across the centroid boundary (the documented SemDeDup approximation)" in {
    // cos(v4, v5) ≈ 0.9998 but v4 lands in cluster 0 (dot 5 > 4.9)
    // and v5 in cluster 1 — candidates never cross clusters, so both
    // survive; this is the paper's design and its blind spot, planted
    // here so the divergence stays documented-and-tested
    val rows = Seq(
      4L -> Seq(5f, 4.9f, 0f, 0f),
      5L -> Seq(4.9f, 5f, 0f, 0f))
    val got = run(rows, 0.95)
    got(4L) shouldBe ((0L, 4L, true))
    got(5L) shouldBe ((1L, 5L, true))
  }

  it should "walk transitive chains within a cluster (CC, not pairs)" in {
    // 6~7 and 7~8 pass the threshold; 6~8 alone would not — the
    // component must still merge all three onto id 6
    val a = Seq(1f, 10f, 0f, 0f)
    val b = Seq(1f, 10f, 2.2f, 0f)
    val c = Seq(1f, 10f, 4.4f, 0f)
    def cos(x: Seq[Float], y: Seq[Float]): Double = {
      val d = x.zip(y).map { case (p, q) => p.toDouble * q }.sum
      d / math.sqrt(x.map(v => v.toDouble * v).sum *
        y.map(v => v.toDouble * v).sum)
    }
    cos(a, b) should be >= 0.97
    cos(b, c) should be >= 0.97
    cos(a, c) should be < 0.97
    val got = run(Seq(6L -> a, 7L -> b, 8L -> c), 0.97)
    got(6L) shouldBe ((1L, 6L, true))
    got(7L) shouldBe ((1L, 6L, false))
    got(8L) shouldBe ((1L, 6L, false))
  }

  it should "drop NULL embeddings and keep singletons as their own component" in {
    val rows = Seq((9L, Seq(3f, 0f, 1f, 0f)), (10L, null))
      .toDF("id", "emb")
    val got = Clustering.semanticDedup(rows, "id", "emb", centroids,
      threshold = 0.95, numPlanes = 0)
    got.count() shouldBe 1L
    got.select("keep").as[Boolean].head() shouldBe true
  }

  behavior of "Clustering.portableSemanticDedup"

  it should "be deterministic and internally consistent on a replayable fixture" in {
    val rnd = new scala.util.Random(42)
    // 20 random base vectors; ids i, i+20, i+40 are tiny angular
    // perturbations of base i%20 → planted near-dup triplets
    val grouped = {
      val bases = (0 until 20).map(_ =>
        Array.fill(8)(rnd.nextGaussian().toFloat))
      (0L until 60L).map { i =>
        val b = bases((i % 20).toInt)
        i -> b.zipWithIndex.map { case (v, j) =>
          if (j == 0) v + (i / 20).toFloat * 1e-3f else v
        }.toSeq
      }
    }
    def runOnce() = Clustering.portableSemanticDedup(
      grouped.toDF("id", "emb"), "id", "emb", dim = 8,
      numCentroids = 4, threshold = 0.95, numPlanes = 2)
      .select("id", "cluster", "component", "keep")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    val r1 = runOnce()
    val r2 = runOnce()
    r1 shouldBe r2
    r1 should have length 60
    // keep ⇔ component == id, and components point at a kept row
    val byId = r1.map(r => r._1 -> r).toMap
    for ((id, _, comp, keep) <- r1) {
      keep shouldBe (comp == id)
      byId(comp)._4 shouldBe true
      // component representative is in the SAME cluster (pairs never
      // cross clusters)
      byId(comp)._2 shouldBe byId(id)._2
    }
    // the planted near-identical triplets must collapse when
    // co-clustered: at least SOME pruning happened
    r1.count(!_._4) should be > 0
  }

  it should "agree with a plain-Scala replay on randomized corpora" in {
    // independent formulation of the whole operator in the numPlanes=0
    // (paper-exact all-pairs-within-cluster) regime: argmax-dot
    // assignment, single-pass cosine mirroring VectorExprs.CosineSim
    // exactly (same accumulation order, same denom association — so
    // the comparison is bit-exact, no boundary tolerance needed),
    // union-find components
    val seed = java.lang.Long.getLong("graft.fuzz.seed", 1323L)
    val rnd = new scala.util.Random(seed)
    val dim = 8
    val k = 4
    val threshold = 0.9
    val cents = Clustering.portableSemanticCentroids(k, dim)
    val centArr = cents.map(_.toArray)
    // 60 random bases; every third id is a small perturbation of the
    // previous base → planted near-dups, some crossing cluster lines
    val vecs: IndexedSeq[(Long, Array[Float])] = {
      var last: Array[Float] = null
      (0L until 90L).map { i =>
        val v =
          if (i % 3 != 0 && last != null)
            last.zipWithIndex.map { case (x, j) =>
              if (j == (i % dim).toInt) x + rnd.nextFloat() * 1e-3f else x
            }
          else Array.fill(dim)(rnd.nextGaussian().toFloat)
        last = v
        i -> v
      }
    }
    def refAssign(v: Array[Float]): Int = {
      var best = 0; var bestDot = Double.NegativeInfinity; var c = 0
      while (c < k) {
        var s = 0.0; var i = 0
        while (i < dim) { s += centArr(c)(i) * v(i).toDouble; i += 1 }
        if (s > bestDot) { bestDot = s; best = c }
        c += 1
      }
      best
    }
    def refCos(a: Array[Float], b: Array[Float]): Double = {
      var xy = 0.0; var xx = 0.0; var yy = 0.0; var i = 0
      while (i < dim) {
        val x = a(i).toDouble; val y = b(i).toDouble
        xy += x * y; xx += x * x; yy += y * y; i += 1
      }
      xy / (math.sqrt(xx) * math.sqrt(yy))
    }
    val cluster = vecs.map { case (id, v) => id -> refAssign(v) }.toMap
    // union-find over all-pairs-within-cluster at the threshold
    val parent = scala.collection.mutable.Map(vecs.map(v => v._1 -> v._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (i <- vecs.indices; j <- (i + 1) until vecs.length) {
      val (ia, va) = vecs(i); val (ib, vb) = vecs(j)
      if (cluster(ia) == cluster(ib) && refCos(va, vb) >= threshold) {
        val (ra, rb) = (find(ia), find(ib))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    val expected = vecs.map { case (id, _) =>
      val comp = find(id)
      id -> ((cluster(id).toLong, comp, comp == id))
    }.toMap
    val got = Clustering.semanticDedup(
      vecs.map { case (id, v) => (id, v.toSeq) }.toDF("id", "emb"),
      "id", "emb", cents, threshold = threshold, numPlanes = 0)
      .select("id", "cluster", "component", "keep")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    withClue(s"seed=$seed: ") { got shouldBe expected }
  }
}
