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

  /** Driver-side signature of a literal query vector. */
  def signatureOf(query: Seq[Double], numPlanes: Int): Long = {
    val planes = hyperplanes(numPlanes, query.size)
    planes.zipWithIndex.map { case (p, i) =>
      if (p.zip(query).map { case (a, b) => a * b }.sum > 0) 1L << i else 0L
    }.sum
  }

  /** ANN top-k: probe the query's LSH bucket plus all buckets within
    * Hamming distance 1 of it, exact-rank the candidates. At scale the
    * bucketed table is the pre-computed "index" (bucket column persisted
    * + partitioned); the probe is a pushed-down IN-filter on it. */
  def lshTopK(df: DataFrame, idCol: String, embCol: String,
              query: Seq[Double], k: Int, numPlanes: Int = 10): DataFrame = {
    val dim = query.size
    val qSig = signatureOf(query, numPlanes)
    val probes = qSig +: (0 until numPlanes).map(b => qSig ^ (1L << b))
    df.select(col(idCol), col(embCol),
      signature(col(embCol), numPlanes, dim).as("bucket"))
      .filter(col("bucket").isin(probes: _*))
      .select(col(idCol), cosine(col(embCol), typedLit(query)).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** All-pairs-free similarity join: for each left row, candidates from
    * the shared RHP bucket, exact cosine, keep pairs >= threshold. */
  def similarityJoin(df: DataFrame, idCol: String, embCol: String,
                     dim: Int, threshold: Double,
                     numPlanes: Int = 12): DataFrame =
    Dedup.embeddingCandidates(df, idCol, embCol, dim, numPlanes, threshold)
}
