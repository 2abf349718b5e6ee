package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — a single scan with a
  *    distributed TakeOrderedAndProject (no full sort, no collect);
  *    the correctness baseline.
  *  - [[lshTopK]]: random-hyperplane-bucketed search — probes only the
  *    query's bucket ring (Hamming radius 1 over the signature), the
  *    scale path: bucket pruning turns a full scan into
  *    O(candidates-in-nearby-buckets).
  */
object Similarity {

  import Dedup.{cosine, hyperplanes}

  /** Exact cosine top-k against one query vector. */
  def bruteForceTopK(df: DataFrame, idCol: String, embCol: String,
                     query: Seq[Double], k: Int): DataFrame =
    df.select(col(idCol),
      cosine(col(embCol), typedLit(query)).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)

  /** Signature bucket id for one vector (column form). */
  def signature(emb: Column, numPlanes: Int, dim: Int): Column =
    Dedup.rhpSignature(emb, numPlanes, dim)

  /** Driver-side signature of a literal query vector under the given
    * plane matrix (sequential sum, so an external engine derives the
    * identical bucket from the same planes). */
  def signatureOfPlanes(query: Seq[Double], planes: Seq[Seq[Double]]): Long = {
    require(planes.size <= 64,
      s"RHP signature is a 64-bit word: at most 64 planes, got ${planes.size}")
    planes.zipWithIndex.map { case (p, i) =>
      if (p.zip(query).map { case (a, b) => a * b }.sum > 0) 1L << i else 0L
    }.sum
  }

  /** Driver-side signature of a literal query vector. */
  def signatureOf(query: Seq[Double], numPlanes: Int): Long =
    signatureOfPlanes(query, hyperplanes(numPlanes, query.size))

  /** Probe-ring search shared by [[lshTopK]] and [[portableLshTopK]]:
    * the query's bucket plus its Hamming-1 ring, exact cosine ranking
    * of the candidates. */
  private def lshTopKWith(df: DataFrame, idCol: String, embCol: String,
                          query: Seq[Double], k: Int,
                          planes: Seq[Seq[Double]],
                          roundCos: Boolean): DataFrame = {
    val numPlanes = planes.size
    val qSig = signatureOfPlanes(query, planes)
    val probes = qSig +: (0 until numPlanes).map(b => qSig ^ (1L << b))
    val cos = cosine(col(embCol), typedLit(query))
    df.select(col(idCol), col(embCol),
      graft.functions.VectorExprs.rhpSignature(col(embCol), planes)
        .as("bucket"))
      .filter(col("bucket").isin(probes: _*))
      .select(col(idCol),
        (if (roundCos) round(cos, 6) else cos).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** ANN top-k: probe the query's LSH bucket plus all buckets within
    * Hamming distance 1 of it, exact-rank the candidates. At scale the
    * bucketed table is the pre-computed "index" (bucket column persisted
    * + partitioned); the probe is a pushed-down IN-filter on it.
    *
    * Sizing `numPlanes`: consult the committed `ANN_RECALL_r*.json`
    * curves (README "Sizing ANN parameters") — the battery's
    * `numPlanes = 6` targets the near-dup regime (planted recall ≈1);
    * RETRIEVAL users want fewer planes (natural recall at sf0.1:
    * 4 → 0.54, 6 → 0.33, 8 → 0.225) or the IVF path's taller
    * `nprobe` knob. */
  def lshTopK(df: DataFrame, idCol: String, embCol: String,
              query: Seq[Double], k: Int, numPlanes: Int = 10): DataFrame =
    lshTopKWith(df, idCol, embCol, query, k,
      hyperplanes(numPlanes, query.size), roundCos = false)

  /** Driver-side signature of a literal query vector under the
    * portable ±1 planes ([[Dedup.portableHyperplanes]]). */
  def portableSignatureOf(query: Seq[Double], numPlanes: Int): Long =
    signatureOfPlanes(query,
      Dedup.portableHyperplanes(numPlanes, query.size))

  /** [[lshTopK]] with the md5-derived ±1 plane family and the ranking
    * on the 6-decimal-rounded cosine with id tie-break — deterministic
    * end-to-end, so an external engine replays the exact probe ring,
    * candidate set and ranking (the ANN family's hash-checked form;
    * ±1 × float dot products are exact in double, so buckets cannot
    * drift between engines). */
  def portableLshTopK(df: DataFrame, idCol: String, embCol: String,
                      query: Seq[Double], k: Int,
                      numPlanes: Int = 6): DataFrame =
    lshTopKWith(df, idCol, embCol, query, k,
      Dedup.portableHyperplanes(numPlanes, query.size), roundCos = true)

  /** All-pairs-free similarity join: for each left row, candidates from
    * the shared RHP bucket, exact cosine, keep pairs >= threshold.
    * Buckets over `maxBucketSize` drop out of candidate generation
    * (`<= 0` disables — see [[Dedup.embeddingCandidates]]). */
  def similarityJoin(df: DataFrame, idCol: String, embCol: String,
                     dim: Int, threshold: Double,
                     numPlanes: Int = 12,
                     maxBucketSize: Int = 100000): DataFrame =
    Dedup.embeddingCandidates(df, idCol, embCol, dim, numPlanes, threshold,
      maxBucketSize)

  // ----- batch k-NN join -----
  // The retrieval / hard-negative-mining shape (round-19): a query
  // TABLE joined against the corpus, top-k per query. The single-query
  // paths above compute the probe ring on the driver — right for one
  // vector, wrong for a million-row query table. Here everything is
  // map-side: the query side derives (bucket ⊕ Hamming-1 ring) as a
  // generated array column and explodes it, the corpus side signs
  // map-only, candidates come from ONE bucket equi-join (AQE
  // broadcasts the query side when small), and the per-query top-k is
  // a row_number window over (cos desc, id). No per-query driver
  // work, no collect of either table. A corpus row has exactly one
  // bucket and the ring's buckets are distinct, so each pair is
  // generated at most once — no dedup pass.

  /** Query side: (qid, __qe, bucket) with one row per probe-ring
    * bucket (the query's signature plus its Hamming-1 flips). */
  private def ringedQueries(queries: DataFrame, qIdCol: String,
                            qEmbCol: String,
                            planes: Seq[Seq[Double]]): DataFrame = {
    val numPlanes = planes.size
    val sig = graft.functions.VectorExprs.rhpSignature(col("__qe"), planes)
    queries.select(col(qIdCol).as("qid"), col(qEmbCol).as("__qe"))
      .filter(col("__qe").isNotNull)
      .withColumn("bucket", explode(array(
        sig +: (0 until numPlanes).map(b => sig.bitwiseXOR(lit(1L << b))): _*)))
  }

  /** Per-query top-k over bucket-equi-joined candidates. Both inputs
    * carry a `bucket` column; output `(qid, id, cos, rank)`. */
  private def knnScore(q: DataFrame, c: DataFrame, k: Int,
                       roundCos: Boolean): DataFrame = {
    val cos = cosine(col("__qe"), col("__ce"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos").desc, col("id"))
    q.join(c, "bucket")
      .select(col("qid"), col("id"),
        (if (roundCos) round(cos, 6) else cos).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Batch k-NN join: top-`k` corpus neighbors for EVERY query row.
    * Hot corpus buckets are capped like every LSH family
    * ([[Dedup.capBuckets]]; `<= 0` disables). Self-pairs (same id in
    * both tables) are kept — filter `qid = id` downstream if the query
    * table is a corpus subset. */
  def knnJoin(queries: DataFrame, qIdCol: String, qEmbCol: String,
              corpus: DataFrame, cIdCol: String, cEmbCol: String,
              k: Int, dim: Int, numPlanes: Int = 6,
              maxBucketSize: Int = 100000): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    knnScore(ringedQueries(queries, qIdCol, qEmbCol, planes),
      Dedup.capBuckets(
        corpus.select(col(cIdCol).as("id"), col(cEmbCol).as("__ce"),
          graft.functions.VectorExprs.rhpSignature(col(cEmbCol), planes)
            .as("bucket"))
          .filter(col("__ce").isNotNull),
        Seq("bucket"), maxBucketSize),
      k, roundCos = false)
  }

  /** [[knnJoin]] under the md5-derived ±1 planes with 6-decimal
    * rounded ranking — deterministic end-to-end, so an external engine
    * replays every query's probe ring, candidate set and per-query
    * row_number ranking (the batch family's hash-checked form). */
  def portableKnnJoin(queries: DataFrame, qIdCol: String, qEmbCol: String,
                      corpus: DataFrame, cIdCol: String, cEmbCol: String,
                      k: Int, dim: Int, numPlanes: Int = 6,
                      maxBucketSize: Int = 100000): DataFrame = {
    val planes = Dedup.portableHyperplanes(numPlanes, dim)
    knnScore(ringedQueries(queries, qIdCol, qEmbCol, planes),
      Dedup.capBuckets(
        corpus.select(col(cIdCol).as("id"), col(cEmbCol).as("__ce"),
          graft.functions.VectorExprs.rhpSignature(col(cEmbCol), planes)
            .as("bucket"))
          .filter(col("__ce").isNotNull),
        Seq("bucket"), maxBucketSize),
      k, roundCos = true)
  }

  /** Batch k-NN join against a persisted [[buildIndex]] index: corpus
    * signatures were computed once at build time, so the join reads
    * `(id, emb, bucket)` straight off the bucket-partitioned layout —
    * only the query side signs at query time. */
  def knnJoinIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                   queries: DataFrame, qIdCol: String, qEmbCol: String,
                   k: Int, maxBucketSize: Int = 100000): DataFrame = {
    val meta = readMeta(spark, path)
    val planes = hyperplanes(meta("numPlanes").toInt, meta("dim").toInt)
    val c = spark.read.parquet(path)
      .select(col(meta("idCol")).as("id"), col(meta("embCol")).as("__ce"),
        col("bucket"))
    knnScore(ringedQueries(queries, qIdCol, qEmbCol, planes),
      Dedup.capBuckets(c, Seq("bucket"), maxBucketSize),
      k, roundCos = false)
  }

  // ----- persisted index -----
  // The scale path: signatures are computed ONCE at build time and the
  // table is laid out partitioned BY bucket, so a query reads only the
  // ~numPlanes+1 probed partition directories (partition pruning — the
  // scan never touches the other 2^numPlanes buckets). lshTopK by
  // contrast recomputes every signature per query: right answer, wrong
  // cost at 100 TB.

  private def metaPath(path: String) = s"$path/_graft_ann_meta.json"

  /** Build a persisted ANN index at `path`: (id, emb, bucket=RHP
    * signature), partitioned by bucket, plus a sidecar recording
    * numPlanes/dim so queries can't probe with mismatched planes. */
  def buildIndex(df: DataFrame, idCol: String, embCol: String,
                 path: String, dim: Int, numPlanes: Int = 10,
                 filesPerBucket: Int = 1): Unit = {
    IndexMeta.requireSimpleCol(idCol); IndexMeta.requireSimpleCol(embCol)
    // cluster rows by bucket (plus a bounded salt for huge buckets)
    // before the partitioned write — otherwise every shuffle task
    // writes a sliver of every bucket directory: tasks × 2^numPlanes
    // tiny files, the classic partitioned-write small-file storm
    df.select(col(idCol), col(embCol),
      signature(col(embCol), numPlanes, dim).as("bucket"))
      .repartition(col("bucket"),
        pmod(xxhash64(col(idCol)), lit(math.max(1, filesPerBucket))))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)
    val meta = s"""{"numPlanes":$numPlanes,"dim":$dim,"idCol":"$idCol","embCol":"$embCol"}"""
    IndexMeta.write(df.sparkSession, metaPath(path), meta)
  }

  private def readMeta(spark: org.apache.spark.sql.SparkSession,
                       path: String): Map[String, String] =
    IndexMeta.fields(IndexMeta.read(spark, metaPath(path)))

  /** Top-k against a persisted index: prune to the query bucket plus
    * its Hamming-radius-1 ring, exact-rank only those candidates.
    * Recall characteristics (and how to size the build-time
    * `numPlanes`) are the committed `ANN_RECALL_r*.json` curves —
    * see README "Sizing ANN parameters": dedup regime ≈1.0 at the
    * battery's 6 planes, retrieval regime wants 4 (or IVF). */
  def queryIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                 query: Seq[Double], k: Int): DataFrame = {
    val meta = readMeta(spark, path)
    val numPlanes = meta("numPlanes").toInt
    val idCol = meta("idCol"); val embCol = meta("embCol")
    require(meta("dim").toInt == query.size,
      s"query dim ${query.size} != index dim ${meta("dim")}")
    val qSig = signatureOf(query, numPlanes)
    val probes = qSig +: (0 until numPlanes).map(b => qSig ^ (1L << b))
    spark.read.parquet(path)
      .filter(col("bucket").isin(probes: _*))
      .select(col(idCol), cosine(col(embCol), typedLit(query)).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }
}
