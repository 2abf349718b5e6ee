package graft

import graft.pipeline.Clustering
import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Incremental + streaming semantic dedup (round-17): the sign-table /
  * against-form / stream-face trio that completes the SemDeDup family's
  * incremental symmetry. Pins: against-form agreement with a
  * plain-Scala replay (assignment + buckets + cosine), the
  * never-cross-clusters contract, within-batch pair suppression,
  * single-surface-per-pair, and stream/batch parity. */
class SemanticIncrementalSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 8
  private val k = 4
  private val numPlanes = 2
  private val cents = Clustering.portableSemanticCentroids(k, dim)
  private val centArr = cents.map(_.toArray)
  private val planeArr =
    graft.pipeline.Dedup.portableHyperplanes(numPlanes, dim).map(_.toArray)

  // plain-Scala replay mirroring VectorExprs exactly (same accumulation
  // order — bit-exact, no tolerance needed)
  private def refAssign(v: Array[Float]): Long = {
    var best = 0; var bestDot = Double.NegativeInfinity; var c = 0
    while (c < k) {
      var s = 0.0; var i = 0
      while (i < dim) { s += centArr(c)(i) * v(i).toDouble; i += 1 }
      if (s > bestDot) { bestDot = s; best = c }
      c += 1
    }
    best.toLong
  }
  private def refBucket(v: Array[Float]): Long = {
    var b = 0L; var p = 0
    while (p < numPlanes) {
      var s = 0.0; var i = 0
      while (i < dim) { s += planeArr(p)(i) * v(i).toDouble; i += 1 }
      if (s > 0) b |= (1L << p)
      p += 1
    }
    b
  }
  private def refCos(a: Array[Float], b: Array[Float]): Double = {
    var xy = 0.0; var xx = 0.0; var yy = 0.0; var i = 0
    while (i < dim) {
      val x = a(i).toDouble; val y = b(i).toDouble
      xy += x * y; xx += x * x; yy += y * y; i += 1
    }
    xy / (math.sqrt(xx) * math.sqrt(yy))
  }

  private def fixture(seed: Long, n: Int): IndexedSeq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    var last: Array[Float] = null
    (0 until n).map { i =>
      val v =
        if (i % 3 != 0 && last != null)
          last.zipWithIndex.map { case (x, j) =>
            if (j == i % dim) x + rnd.nextFloat() * 1e-3f else x
          }
        else Array.fill(dim)(rnd.nextGaussian().toFloat)
      last = v
      i.toLong -> v
    }
  }

  private def expectedPairs(batch: Seq[(Long, Array[Float])],
                            corpus: Seq[(Long, Array[Float])],
                            threshold: Double): Set[(Long, Long, Long)] =
    (for {
      (idN, vn) <- batch
      (idC, vc) <- corpus
      if idN != idC
      if refAssign(vn) == refAssign(vc)
      if refBucket(vn) == refBucket(vc)
      if refCos(vn, vc) >= threshold
    } yield (idN, idC, refAssign(vn))).toSet

  behavior of "Clustering.semanticCandidatesAgainst"

  it should "agree with a plain-Scala replay on randomized corpora" in {
    val seed = java.lang.Long.getLong("graft.fuzz.seed", 1327L)
    val all = fixture(seed, 90)
    val corpus = all.filter(_._1 % 2 == 0)
    val batch = all.filter(_._1 % 2 == 1)
    val threshold = 0.9
    val corpusSigs = Clustering.portableSemanticSignTable(
      corpus.map { case (id, v) => (id, v.toSeq) }.toDF("id", "emb"),
      "id", "emb", dim, k, numPlanes)
    val newSigs = Clustering.portableSemanticSignTable(
      batch.map { case (id, v) => (id, v.toSeq) }.toDF("id", "emb"),
      "id", "emb", dim, k, numPlanes)
    val got = Clustering.semanticCandidatesAgainst(
      newSigs, corpusSigs, threshold, maxBucketSize = 0)
      .select("idNew", "idCorpus", "cluster")
      .as[(Long, Long, Long)].collect()
    withClue(s"seed=$seed: ") {
      // one (cluster, bucket) key per vector → a pair surfaces at most once
      got.length shouldBe got.toSet.size
      got.toSet shouldBe expectedPairs(batch, corpus, threshold)
      // within-batch duplicates are NOT reported: every pair is cross-side
      got.map(_._1).forall(_ % 2 == 1) shouldBe true
      got.map(_._2).forall(_ % 2 == 0) shouldBe true
    }
  }

  it should "never pair across clusters even at cosine ~1" in {
    // same decoy as SemanticDedupSpec: near-identical vectors split by
    // an explicit centroid boundary must NOT surface as a pair
    val cent2 = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0))
    val corpusSigs = Clustering.semanticSignTable(
      Seq((4L, Seq(5f, 4.9f, 0f, 0f))).toDF("id", "emb"),
      "id", "emb", cent2, numPlanes = 0)
    val newSigs = Clustering.semanticSignTable(
      Seq((5L, Seq(4.9f, 5f, 0f, 0f))).toDF("id", "emb"),
      "id", "emb", cent2, numPlanes = 0)
    Clustering.semanticCandidatesAgainst(newSigs, corpusSigs,
      threshold = 0.9, maxBucketSize = 0).count() shouldBe 0L
    // sanity: co-clustered they WOULD pair
    val sameCluster = Clustering.semanticSignTable(
      Seq((6L, Seq(5f, 0.1f, 0f, 0f))).toDF("id", "emb"),
      "id", "emb", cent2, numPlanes = 0)
    val near = Clustering.semanticSignTable(
      Seq((7L, Seq(5.1f, 0.1f, 0f, 0f))).toDF("id", "emb"),
      "id", "emb", cent2, numPlanes = 0)
    Clustering.semanticCandidatesAgainst(near, sameCluster,
      threshold = 0.9, maxBucketSize = 0).count() shouldBe 1L
  }

  it should "drop NULL embeddings at the sign table" in {
    val sigs = Clustering.semanticSignTable(
      Seq((1L, Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
        (2L, null.asInstanceOf[Seq[Float]])).toDF("id", "emb"),
      "id", "emb", cents, numPlanes)
    sigs.count() shouldBe 1L
    sigs.columns.toSeq shouldBe Seq("id", "emb", "cluster", "bucket")
  }

  it should "plan the corpus semi-join prune as a broadcast with no cartesian product" in {
    // the 100 TB shape: the corpus side must be pruned by a BROADCAST
    // semi-join on the batch's (cluster, bucket) key set BEFORE any
    // pair generation, and nothing in the operator may plan a
    // cartesian product
    val all = fixture(9L, 60)
    val corpusSigs = Clustering.portableSemanticSignTable(
      all.filter(_._1 % 2 == 0).map { case (id, v) => (id, v.toSeq) }
        .toDF("id", "emb"), "id", "emb", dim, k, numPlanes)
    val newSigs = Clustering.portableSemanticSignTable(
      all.filter(_._1 % 2 == 1).map { case (id, v) => (id, v.toSeq) }
        .toDF("id", "emb"), "id", "emb", dim, k, numPlanes)
    val out = Clustering.semanticCandidatesAgainst(newSigs, corpusSigs,
      threshold = 0.9, maxBucketSize = 0)
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    p should include("LeftSemi")
    p should include("Broadcast")
    p should not include "CartesianProduct"
  }

  behavior of "StreamingOps.semanticNearDupStream"

  it should "match semanticCandidatesAgainst on a single micro-batch" in {
    implicit val sqlCtx = spark.sqlContext
    val seed = java.lang.Long.getLong("graft.fuzz.seed", 1327L) + 1
    val all = fixture(seed, 60)
    val corpus = all.filter(_._1 % 2 == 0)
    val batch = all.filter(_._1 % 2 == 1)
    val threshold = 0.9
    val corpusSigs = Clustering.portableSemanticSignTable(
      corpus.map { case (id, v) => (id, v.toSeq) }.toDF("id", "emb"),
      "id", "emb", dim, k, numPlanes).cache()
    corpusSigs.count()
    val expected = Clustering.semanticCandidatesAgainst(
      Clustering.portableSemanticSignTable(
        batch.map { case (id, v) => (id, v.toSeq) }.toDF("id", "emb"),
        "id", "emb", dim, k, numPlanes),
      corpusSigs, threshold, maxBucketSize = 0)
      .select("idNew", "idCorpus", "cluster", "cos")
      .as[(Long, Long, Long, Double)].collect().toSet
    expected should not be empty // fixture must exercise the join
    val input = MemoryStream[(Long, Seq[Float])]
    val out = StreamingOps.semanticNearDupStream(
      input.toDF.toDF("id", "emb"), "id", "emb", corpusSigs, cents,
      numPlanes, threshold, portable = true)
    val q = out.writeStream.format("memory").queryName("sem_stream_out")
      .outputMode("append").start()
    try {
      input.addData(batch.map { case (id, v) => (id, v.toSeq) }: _*)
      q.processAllAvailable()
      val got = spark.table("sem_stream_out")
        .as[(Long, Long, Long, Double)].collect().toSet
      withClue(s"seed=$seed: ") { got shouldBe expected }
    } finally q.stop()
  }

  it should "match the repeated batch against-form across 3 micro-batches with corpus growth" in {
    // round-18 (verdict item #5): the multi-batch lifecycle. The
    // stream joins a STATIC corpus, so corpus growth follows the
    // span-cut restart discipline — stop, fold the batch's signatures
    // into the corpus, restart against the grown corpus. Proved here:
    // per-step AND cumulative stream output ≡ running
    // semanticCandidatesAgainst(batch_i, corpus_{i-1}) by hand, where
    // corpus_i = corpus_{i-1} ∪ signTable(batch_i). Exact set
    // equality, not approximate.
    implicit val sqlCtx = spark.sqlContext
    val seed = java.lang.Long.getLong("graft.fuzz.seed", 1327L) + 2
    val all = fixture(seed, 120)
    val corpus0 = all.filter(_._1 % 4 == 0)
    val batches = (1 to 3).map(r => all.filter(_._1 % 4 == r))
    val threshold = 0.9
    def sign(rows: Seq[(Long, Array[Float])]) =
      Clustering.portableSemanticSignTable(
        rows.map { case (id, v) => (id, v.toSeq) }.toDF("id", "emb"),
        "id", "emb", dim, k, numPlanes)

    var corpusSigs = sign(corpus0).cache(); corpusSigs.count()
    var corpusRows = corpus0
    val streamGot = scala.collection.mutable.Set.empty[(Long, Long, Long, Double)]
    val batchGot = scala.collection.mutable.Set.empty[(Long, Long, Long, Double)]
    batches.zipWithIndex.foreach { case (b, bi) =>
      // batch arm against the pre-fold corpus
      val expectedStep = Clustering.semanticCandidatesAgainst(
        sign(b), corpusSigs, threshold, maxBucketSize = 0)
        .select("idNew", "idCorpus", "cluster", "cos")
        .as[(Long, Long, Long, Double)].collect().toSet
      // stream arm: fresh query per step (restart discipline)
      val input = MemoryStream[(Long, Seq[Float])]
      val out = StreamingOps.semanticNearDupStream(
        input.toDF.toDF("id", "emb"), "id", "emb", corpusSigs, cents,
        numPlanes, threshold, portable = true)
      val qn = s"sem_stream_multi_$bi"
      val q = out.writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      val gotStep =
        try {
          input.addData(b.map { case (id, v) => (id, v.toSeq) }: _*)
          q.processAllAvailable()
          spark.table(qn).as[(Long, Long, Long, Double)].collect().toSet
        } finally q.stop()
      withClue(s"seed=$seed step=$bi: ") { gotStep shouldBe expectedStep }
      streamGot ++= gotStep; batchGot ++= expectedStep
      // fold: batch joins the corpus before the next micro-batch
      val prev = corpusSigs
      corpusRows = corpusRows ++ b
      corpusSigs = sign(corpusRows).cache(); corpusSigs.count()
      prev.unpersist()
    }
    // cumulative parity, and the fixture exercised pairs against BOTH
    // the original corpus and previously-folded batches
    withClue(s"seed=$seed: ") {
      streamGot.toSet shouldBe batchGot.toSet
      streamGot should not be empty
      val lastBatchIds = batches.last.map(_._1).toSet
      val foldedIds = (batches(0) ++ batches(1)).map(_._1).toSet
      streamGot.exists { case (n, c, _, _) =>
        lastBatchIds(n) && foldedIds(c) } shouldBe true
    }
    corpusSigs.unpersist()
  }
}
