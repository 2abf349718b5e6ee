package graft

import graft.pipeline.{Clustering, Dedup, Ivf}
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Round-18 portable entries: [[Ivf.portableTopK]] (the IVF family's
  * hash-checked form — frozen ±1 centroids, driver-ranked probe ring,
  * rounded-cosine top-k) and
  * [[Dedup.portableMinHashCandidatesAgainst]] (the minhash
  * incremental's hash-checked form). Each pinned against an
  * independent plain-Scala replay of the full decision chain, plus
  * the 100 TB plan shape of the incremental join. */
class Round18PortableSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  behavior of "Ivf.portableTopK"

  private val dim = 8
  private val nCents = 4
  private val nprobe = 2
  private val cents = Clustering.portableSemanticCentroids(nCents, dim)

  private def refAssign(v: Array[Float]): Int = {
    var best = 0; var bestDot = Double.NegativeInfinity; var c = 0
    while (c < nCents) {
      var s = 0.0; var i = 0
      while (i < dim) { s += cents(c)(i) * v(i).toDouble; i += 1 }
      if (s > bestDot) { bestDot = s; best = c }
      c += 1
    }
    best
  }
  private def refCos(a: Array[Float], q: Seq[Double]): Double = {
    var xy = 0.0; var xx = 0.0; var yy = 0.0; var i = 0
    while (i < dim) {
      val x = a(i).toDouble; val y = q(i)
      xy += x * y; xx += x * x; yy += y * y; i += 1
    }
    xy / (math.sqrt(xx) * math.sqrt(yy))
  }
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  it should "agree with a plain-Scala replay of assignment, probe ring and ranking" in {
    val seed = java.lang.Long.getLong("graft.fuzz.seed", 1335L)
    val rnd = new scala.util.Random(seed)
    val rows = (0 until 60).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val query = rows.head._2.map(_.toDouble).toSeq
    val k = 10
    val got = Ivf.portableTopK(
      rows.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding"),
      "vec_id", "embedding", query, k, nCents, nprobe)
      .as[(Long, Double)].collect().toSeq
    // independent replay: probe ring = top-nprobe centroids by dot
    // with the query (ties to the lower index), candidates = rows
    // assigned to a probed centroid, ranking = rounded cosine desc,
    // id asc
    val probes = cents.zipWithIndex.map { case (c, i) =>
      i -> c.zip(query).map { case (a, b) => a * b }.sum
    }.sortBy { case (i, d) => (-d, i) }.take(nprobe).map(_._1).toSet
    val expected = rows
      .filter { case (_, v) => probes(refAssign(v)) }
      .map { case (id, v) => (id, round6(refCos(v, query))) }
      .sortBy { case (id, c) => (-c, id) }.take(k)
    withClue(s"seed=$seed: ") {
      got shouldBe expected
      got should have length k.min(expected.length).toInt
      // the probe ring genuinely prunes: some corpus rows fall outside
      rows.count { case (_, v) => !probes(refAssign(v)) } should be > 0
    }
  }

  it should "return fewer than k rows rather than crossing unprobed clusters" in {
    // two tight clusters on opposite axes; query sits on one, nprobe=1
    val rows = Seq(
      (1L, Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (2L, Seq(0.99f, 0.01f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (3L, Seq(-1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)))
    val query = Seq(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val got = Ivf.portableTopK(rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding", query, 10, nCents, nprobe = 1)
      .as[(Long, Double)].collect()
    val probe = cents.zipWithIndex.map { case (c, i) =>
      i -> c.zip(query).map { case (a, b) => a * b }.sum
    }.maxBy { case (i, d) => (d, -i) }._1
    val inProbe = rows.map { case (id, v) =>
      id -> refAssign(v.toArray) }.filter(_._2 == probe).map(_._1).toSet
    got.map(_._1).toSet shouldBe inProbe
  }

  behavior of "Dedup.portableMinHashCandidatesAgainst"

  it should "match the full portable candidate set restricted to cross-side pairs" in {
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (4L, "completely different content about spark query engines and columnar execution"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (3L, "yet another unrelated snippet of text mentioning nothing in common at all"),
      (5L, "the quick brown fox jumps over the lazy dog near the river bank today"))
      .toDF("doc_id", "text")
    val got = Dedup.portableMinHashCandidatesAgainst(
      Dedup.portableMinHashSignTable(batch, "doc_id", "text"),
      Dedup.portableMinHashSignTable(corpus, "doc_id", "text"),
      numHashes = 32, bands = 8, threshold = 0.3)
      .as[(Long, Long, Double)].collect().toSet
    // the full-corpus portable form on the union, restricted to
    // cross-side pairs, must agree (same hash family, same banding):
    val full = Dedup.portableMinHashCandidates(corpus.unionByName(batch),
      "doc_id", "text", numHashes = 32, bands = 8, threshold = 0.3)
      .as[(Long, Long, Double)].collect()
      .flatMap { case (a, b, j) =>
        // normalize to (batch id = odd, corpus id = even)
        if (a % 2 == 1 && b % 2 == 0) Some((a, b, j))
        else if (b % 2 == 1 && a % 2 == 0) Some((b, a, j))
        else None
      }.toSet
    got shouldBe full
    got.map(p => (p._1, p._2)) should contain((1L, 0L))
    got.map(p => (p._1, p._2)) should contain((5L, 0L))
    got.exists(_._1 == 3L) shouldBe false
    // exact-dup pair carries jaccard 1.0
    got.find(p => p._1 == 5L && p._2 == 0L).get._3 shouldBe 1.0 +- 1e-12
  }

  it should "plan the corpus prune as a broadcast semi-join with no cartesian product" in {
    val corpus = Dedup.portableMinHashSignTable(
      (0 until 40 by 2).map(i =>
        (i.toLong, s"shared prefix words here plus unique tail token$i end"))
        .toDF("doc_id", "text"), "doc_id", "text")
    val batch = Dedup.portableMinHashSignTable(
      (1 until 40 by 2).map(i =>
        (i.toLong, s"shared prefix words here plus unique tail token${i - 1} end"))
        .toDF("doc_id", "text"), "doc_id", "text")
    val out = Dedup.portableMinHashCandidatesAgainst(batch, corpus,
      numHashes = 32, bands = 8, threshold = 0.3)
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    p should include("LeftSemi")
    p should include("Broadcast")
    p should not include "CartesianProduct"
  }
}
