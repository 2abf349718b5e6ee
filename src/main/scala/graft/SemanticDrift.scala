package graft

import graft.pipeline.{Clustering, Ivf}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Centroid-drift harness for FROZEN-model semantic dedup (round-18,
  * verdict item #3) — the operational question the
  * [[graft.pipeline.Clustering.semanticSignTable]] scaladoc raises but
  * nothing measured: how much pair recall does the
  * freeze-sign-once / [[Clustering.semanticCandidatesAgainst]]
  * lifecycle lose as the ingested distribution drifts away from the
  * one the centroids were trained on, and when does re-training pay?
  *
  * Protocol per drift magnitude δ (all seeded, deterministic):
  *  - train T0 centroids (real spherical k-means,
  *    [[Ivf.trainCentroids]]) on the base corpus and sign it ONCE —
  *    the frozen model;
  *  - construct a DRIFTED corpus appendix: `numPairs` base vectors
  *    moved by δ·‖x‖ along a fixed seeded unit direction (the batch
  *    distribution's mean shift), appended to the corpus by signing
  *    them against the FROZEN centroids (the documented incremental
  *    lifecycle — they are the documents that entered after T0);
  *  - the incoming batch is a near-identical TWIN of each drifted doc
  *    (seeded 1e-3 gaussian perturbation, cosine ≈ 1) — the planted
  *    ground-truth pair set;
  *  - frozen arm: [[Clustering.semanticCandidatesAgainst]] with the
  *    T0 model; retrained arm: re-train on corpus+appendix, re-sign
  *    both sides, same candidates call. Recall = fraction of planted
  *    twins surfaced.
  *
  * Also reported per δ, because they are the metrics an operator can
  * watch WITHOUT ground truth: `same_cluster` (twin pairs co-assigned
  * — the argmax-dot stability of the frozen model) and
  * `max_cluster_share` (the batch's hot-cluster concentration — the
  * bucket-blowup early-warning; a drifted batch collapsing into one
  * frozen cluster is the re-train signal even while recall holds).
  *
  * Usage: `sbt "runMain graft.SemanticDrift <sfDir> <outJson>"` —
  * committed per round as `SEMANTIC_DRIFT_r{N}.json`.
  * SemanticDriftSpec pins the zero-drift recall floor. */
object SemanticDrift {

  case class DriftPoint(delta: Double, recallFrozen: Double,
                        recallRetrained: Double, sameClusterFrozen: Double,
                        sameClusterRetrained: Double,
                        maxClusterShareFrozen: Double)

  /** One full frozen-vs-retrained measurement over `deltas`. `emb`
    * must carry (`vec_id`, `embedding: array<float>`). Driver-side
    * work is bounded: `numPairs` base vectors + the k×dim centroid
    * matrices; signing and candidate joins stay distributed. */
  def measure(spark: SparkSession, emb: DataFrame, numPairs: Int,
              seed: Long, deltas: Seq[Double], k: Int = 8, iters: Int = 3,
              numPlanes: Int = 4, threshold: Double = 0.9): Seq[DriftPoint] = {
    import spark.implicits._
    val base = emb.select(col("vec_id").cast("long").as("vec_id"),
      col("embedding")).filter(col("embedding").isNotNull)
    base.cache()
    val t0 = Ivf.trainCentroids(base, "embedding", k, iters)
    val corpusSigs0 = Clustering.semanticSignTable(base, "vec_id",
      "embedding", t0, numPlanes)
    corpusSigs0.cache(); corpusSigs0.count()

    // seeded base sample (even stride over the sorted actual id set —
    // the round-17-advice-proof selection) and fixed drift direction
    val allIds = base.select(col("vec_id")).orderBy(col("vec_id"))
      .collect().map(_.getLong(0))
    require(allIds.nonEmpty, "SemanticDrift: no non-null embedding rows")
    val stride = math.max(1, allIds.length / numPairs)
    val qids = allIds.indices.by(stride).take(numPairs).map(allIds(_)).toSeq
    val xs = base.filter(col("vec_id").isin(qids: _*))
      .as[(Long, Seq[Float])].collect().sortBy(_._1).map(_._2)
    val dim = xs.head.size
    val dirRnd = new scala.util.Random(seed)
    val u0 = Array.fill(dim)(dirRnd.nextGaussian())
    val un = math.sqrt(u0.map(x => x * x).sum)
    val u = u0.map(_ / un)
    val maxId = allIds.last

    deltas.zipWithIndex.map { case (delta, di) =>
      val rnd = new scala.util.Random(seed + 1000L * (di + 1))
      // drifted corpus appendix: x + δ·‖x‖·u (norm-relative shift so δ
      // is a distribution-scale-free magnitude)
      val zs = xs.map { x =>
        val nrm = math.sqrt(x.map(v => v.toDouble * v).sum)
        x.toArray.zipWithIndex.map { case (v, i) =>
          (v + delta * nrm * u(i)).toFloat }.toSeq
      }
      val zIds = zs.indices.map(i => maxId + 1L + i)
      val bIds = zs.indices.map(i => maxId + 1L + numPairs + i)
      // batch twins: cosine ≈ 1 copies of the drifted docs
      val bs = zs.map(_.map(v => (v + rnd.nextGaussian() * 1e-3).toFloat))
      val zdf = zIds.zip(zs).toDF("vec_id", "embedding")
      val bdf = bIds.zip(bs).toDF("vec_id", "embedding")
      val truth = zIds.zip(bIds).map { case (z, b) => (b, z) }.toSet

      def arm(cents: Seq[Seq[Double]]):
          (Double, Double, Double) = {
        val corpusSigs =
          (if (cents eq t0) corpusSigs0
           else Clustering.semanticSignTable(base, "vec_id", "embedding",
             cents, numPlanes))
            .unionByName(Clustering.semanticSignTable(zdf, "vec_id",
              "embedding", cents, numPlanes))
        val batchSigs = Clustering.semanticSignTable(bdf, "vec_id",
          "embedding", cents, numPlanes)
        val got = Clustering.semanticCandidatesAgainst(batchSigs,
          corpusSigs, threshold)
          .select(col("idNew").cast("long"), col("idCorpus").cast("long"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val recall = truth.count(got.contains).toDouble / truth.size
        // operator-visible metrics: twin co-assignment + batch
        // hot-cluster concentration under these centroids
        val zc = Clustering.semanticSignTable(zdf, "vec_id", "embedding",
          cents, numPlanes).select(col("id").cast("long"), col("cluster"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val bc = Clustering.semanticSignTable(bdf, "vec_id", "embedding",
          cents, numPlanes).select(col("id").cast("long"), col("cluster"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val same = truth.count { case (b, z) => bc(b) == zc(z) }
          .toDouble / truth.size
        val share = bc.values.groupBy(identity).values
          .map(_.size).max.toDouble / bc.size
        (recall, same, share)
      }

      val (rf, sf, shf) = arm(t0)
      val retrained = Ivf.trainCentroids(
        base.unionByName(zdf), "embedding", k, iters)
      val (rr, sr, _) = arm(retrained)
      DriftPoint(delta, rf, rr, sf, sr, shf)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outJson = args.lift(1).getOrElse("SEMANTIC_DRIFT.json")
    val numPairs = args.lift(2).map(_.toInt).getOrElse(400)
    val seed = args.lift(3).map(_.toLong).getOrElse(1335L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val deltas = Seq(0.0, 0.25, 0.5, 1.0, 2.0)
    val pts = measure(spark, emb, numPairs, seed, deltas)
    def row(f: DriftPoint => Double): String =
      pts.map(p => s""""${p.delta}": ${f(p)}""").mkString(", ")
    val json =
      s"""{"sf_dir": "$sfDir", "pairs": $numPairs, "seed": $seed,
         | "k": 8, "iters": 3, "planes": 4, "threshold": 0.9,
         | "recall_frozen": {${row(_.recallFrozen)}},
         | "recall_retrained": {${row(_.recallRetrained)}},
         | "same_cluster_frozen": {${row(_.sameClusterFrozen)}},
         | "same_cluster_retrained": {${row(_.sameClusterRetrained)}},
         | "max_cluster_share_frozen": {${row(_.maxClusterShareFrozen)}}}"""
        .stripMargin.replaceAll("\n", "")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson),
      json + "\n")
    println(json)
    spark.stop()
  }
}
