package graft

import graft.functions.VectorExprs
import graft.pipeline.{Clustering, Dedup, Ivf, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Round-19 batch k-NN join (the round-18 verdict's one missing
  * pipeline operator): a query TABLE against the corpus, top-k per
  * query, in LSH ([[Similarity.knnJoin]]) and IVF ([[Ivf.knnJoin]])
  * forms. The portable variants are pinned against an independent
  * plain-Scala replay of the full decision chain (signature / probe
  * ring / assignment / rounded ranking), and each batch form is
  * pinned EQUIVALENT to the corresponding single-query path run in a
  * per-query loop — the semantics the batch join exists to
  * distribute. */
class Round19KnnJoinSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 8
  private val k = 4
  private val seed = java.lang.Long.getLong("graft.fuzz.seed", 1335L)
  private val rnd = new scala.util.Random(seed)
  private val corpus = (0 until 80).map(i =>
    (i.toLong, Seq.fill(dim)(rnd.nextGaussian().toFloat)))
  private val queries = corpus.filter(_._1 % 9 == 0)
  private def corpusDf = corpus.toDF("vec_id", "embedding")
  private def queryDf = queries.toDF("vec_id", "embedding")

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def cos(a: Seq[Float], q: Seq[Float]): Double = {
    var xy = 0.0; var xx = 0.0; var yy = 0.0; var i = 0
    while (i < dim) {
      val x = a(i).toDouble; val y = q(i).toDouble
      xy += x * y; xx += x * x; yy += y * y; i += 1
    }
    xy / (math.sqrt(xx) * math.sqrt(yy))
  }

  behavior of "Similarity.portableKnnJoin (LSH form)"

  it should "agree with a plain-Scala replay of ring, candidates and per-query ranking" in {
    val numPlanes = 4
    val planes = Dedup.portableHyperplanes(numPlanes, dim)
    def sig(v: Seq[Float]): Long =
      Similarity.signatureOfPlanes(v.map(_.toDouble), planes)
    val got = Similarity.portableKnnJoin(queryDf, "vec_id", "embedding",
      corpusDf, "vec_id", "embedding", k, dim, numPlanes)
      .as[(Long, Long, Double, Int)].collect().toSeq
      .sortBy(r => (r._1, r._4))
    val expected = queries.flatMap { case (qid, qv) =>
      val ring = (sig(qv) +: (0 until numPlanes)
        .map(b => sig(qv) ^ (1L << b))).toSet
      corpus.filter { case (_, cv) => ring(sig(cv)) }
        .map { case (cid, cv) => (cid, round6(cos(cv, qv))) }
        .sortBy { case (cid, c) => (-c, cid) }.take(k)
        .zipWithIndex.map { case ((cid, c), i) => (qid, cid, c, i + 1) }
    }.sortBy(r => (r._1, r._4))
    withClue(s"seed=$seed: ") {
      got shouldBe expected
      // every query found itself at rank 1 with cos 1 (query ⊆ corpus)
      queries.foreach { case (qid, _) =>
        got.find(r => r._1 == qid && r._4 == 1).map(_._2) shouldBe Some(qid)
      }
    }
  }

  it should "match the single-query probe-ring path run per query" in {
    val got = Similarity.knnJoin(queryDf, "vec_id", "embedding",
      corpusDf, "vec_id", "embedding", k, dim, numPlanes = 4)
      .select("qid", "id", "cos").as[(Long, Long, Double)].collect()
      .groupBy(_._1)
    queries.foreach { case (qid, qv) =>
      val single = Similarity.lshTopK(corpusDf, "vec_id", "embedding",
        qv.map(_.toDouble), k, numPlanes = 4)
        .as[(Long, Double)].collect().toSeq
      withClue(s"seed=$seed qid=$qid: ") {
        got(qid).toSeq.map(r => (r._2, r._3))
          .sortBy(r => (-r._2, r._1)) shouldBe single
      }
    }
  }

  behavior of "Ivf batch k-NN join (IVF form)"

  it should "agree with a plain-Scala replay of probe explosion, assignment and ranking" in {
    val nCents = 4; val nprobe = 2
    val cents = Clustering.portableSemanticCentroids(nCents, dim)
    def dots(v: Seq[Float]): Seq[(Int, Double)] =
      cents.zipWithIndex.map { case (c, i) =>
        i -> c.zip(v).map { case (a, b) => a * b.toDouble }.sum }
    def assign(v: Seq[Float]): Int =
      dots(v).minBy { case (i, d) => (-d, i) }._1
    val got = Ivf.portableKnnJoin(queryDf, "vec_id", "embedding",
      corpusDf, "vec_id", "embedding", k, dim, nCents, nprobe)
      .as[(Long, Long, Double, Int)].collect().toSeq
      .sortBy(r => (r._1, r._4))
    val expected = queries.flatMap { case (qid, qv) =>
      val probes = dots(qv).sortBy { case (i, d) => (-d, i) }
        .take(nprobe).map(_._1).toSet
      corpus.filter { case (_, cv) => probes(assign(cv)) }
        .map { case (cid, cv) => (cid, round6(cos(cv, qv))) }
        .sortBy { case (cid, c) => (-c, cid) }.take(k)
        .zipWithIndex.map { case ((cid, c), i) => (qid, cid, c, i + 1) }
    }.sortBy(r => (r._1, r._4))
    withClue(s"seed=$seed: ") { got shouldBe expected }
  }

  it should "match the single-query persisted-index path run per query" in {
    val idx = java.nio.file.Files
      .createTempDirectory("knn_join_ivf_idx").toString
    Ivf.buildIndex(corpusDf, "vec_id", "embedding", idx, k = 4, iters = 2)
    val got = Ivf.knnJoinIndex(spark, idx, queryDf, "vec_id", "embedding",
      k, nprobe = 2)
      .select("qid", "id", "cos").as[(Long, Long, Double)].collect()
      .groupBy(_._1)
    queries.foreach { case (qid, qv) =>
      val single = Ivf.queryIndex(spark, idx, qv.map(_.toDouble), k,
        nprobe = 2).as[(Long, Double)].collect().toSeq
      withClue(s"seed=$seed qid=$qid: ") {
        got(qid).toSeq.map(r => (r._2, r._3))
          .sortBy(r => (-r._2, r._1)) shouldBe single
      }
    }
  }

  behavior of "VectorExprs.nearestCentroids"

  it should "return top-n centroid ids by dot with ties to the lower index" in {
    // centroids on two axes; the vector ties centroids 0 and 1 exactly
    val cents = Seq(
      Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0),
      Seq(0.0, 0.0, 1.0, 0.0))
    val df = Seq((1L, Seq(0.5f, 0.5f, 0.1f, 0f))).toDF("id", "v")
    val got = df.select(
      VectorExprs.nearestCentroids(col("v"), cents, 2).as("p"))
      .as[Seq[Int]].head()
    got shouldBe Seq(0, 1) // tie between 0 and 1 -> lower index first
    val one = df.select(
      VectorExprs.nearestCentroids(col("v"), cents, 5).as("p"))
      .as[Seq[Int]].head()
    one shouldBe Seq(0, 1, 2) // n > k clamps to all centroids
  }

  it should "stay map-only in the probe explosion (no shuffle before the join)" in {
    // the probe ring must be generated per-row: the plan for the
    // exploded query side alone contains no Exchange
    val cents = Clustering.portableSemanticCentroids(4, dim)
    val q = queryDf.select(col("vec_id").as("qid"),
      col("embedding").as("__qe"))
      .withColumn("cid", explode(
        VectorExprs.nearestCentroids(col("__qe"), cents, 2)))
    val plan = q.queryExecution.executedPlan.toString()
    plan should not include "Exchange"
  }
}
