package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full-text keyword search over a document corpus: BM25 scoring
  * (Robertson/Spärck Jones idf, the Lucene-standard formula) as pure
  * DataFrame transforms — the retrieval half of a training-data
  * curation stack (find documents about X, score corpus relevance to a
  * topic sheet, build seed sets for classifier bootstrapping).
  *
  * Scale shape (100 TB corpus, short query): the corpus pass is
  * map-only tokenize → explode → FILTER TO QUERY TERMS before anything
  * shuffles, so the only shuffled rows are (doc, query-term) hits —
  * proportional to the posting lists, not the corpus. Document-
  * frequency and corpus statistics are one-row/tiny aggregates
  * broadcast back; the final top-k is TakeOrderedAndProject, never a
  * full sort.
  *
  * Determinism: [[bm25TopK]] ranks on the score ROUNDED to 6 decimals
  * with doc id as tie-break, so float summation order and libm `ln`
  * last-ulp differences can neither reorder the result nor disagree
  * with an external replay (the DuckDB oracle reproduces the exact
  * same rounded scores and ranking).
  */
object Search {

  /** Per-(doc, term) BM25 contributions for `query`'s distinct tokens:
    * `(id, term, tf, dl)` — the term-filtered posting fragment. */
  private def postings(docs: DataFrame, idCol: String, textCol: String,
                       terms: Seq[String]): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), Dedup.tokens(col(textCol)).as("ts"))
      .select(col("id"), size(col("ts")).as("dl"), explode(col("ts")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("id", "dl", "term").agg(count(lit(1)).as("tf"))

  /** BM25 scores for every document matching at least one query term:
    * `(id, score)`, score unrounded. */
  def bm25(docs: DataFrame, idCol: String, textCol: String, query: String,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // lowercase via UTF8String so query terms case-fold EXACTLY like
    // the corpus tokens (Spark's `lower`), not via the JVM default
    // locale (tr_TR would fold "INDEX" to dotless-ı "ındex" and
    // silently match nothing)
    val terms = org.apache.spark.unsafe.types.UTF8String.fromString(query)
      .toLowerCase.toString.trim.split("\\s+").filter(_.nonEmpty)
      .distinct.toSeq
    require(terms.nonEmpty, "query must contain at least one token")
    // NULL-text rows carry no tokens and must not skew avgdl: without
    // the filter, legacy non-ANSI sessions evaluate size(NULL) as -1
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), Dedup.tokens(col(textCol)).as("ts"))
    // corpus stats: one row (document count + average doc length)
    val stats = base.select(size(col("ts")).as("dl"))
      .agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"))
    val tf = postings(docs, idCol, textCol, terms)
    val dft = tf.groupBy("term").agg(countDistinct(col("id")).as("df"))
    // constants folded driver-side so an external replay can inline the
    // identical round-trip literals
    val k1p1 = k1 + 1
    val omb = 1 - b
    tf.join(broadcast(dft), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("contrib",
        col("idf") * ((col("tf") * lit(k1p1)) /
          (col("tf") + lit(k1) * (lit(omb) + (lit(b) * col("dl")) / col("avgdl")))))
      .groupBy("id").agg(sum(col("contrib")).as("score"))
  }

  /** Top-`k` documents for `query`, ranked by `round(score, 6)` DESC
    * with the document id as deterministic tie-break. Output:
    * `(id, score)` with the rounded score. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               query: String, k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25(docs, idCol, textCol, query, k1, b)
      .select(col("id"), round(col("score"), 6).as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR '09)
    * of pre-ranked candidate lists: each list contributes
    * `1 / (rrfK + rank)` for the documents it ranked; documents
    * missing from a list contribute 0 from it. RRF is the standard
    * keyword-plus-vector fusion precisely because it needs NO score
    * calibration — ranks are scale-free, so a BM25 log-sum and a
    * cosine in [−1, 1] combine without tuning.
    *
    * `rankings` maps a label to a `(id, <label>_rank)` frame; output
    * is `(id, <label>_rank…, rrf)`, ordered by (rrf desc, id),
    * top `k`. Inputs are top-poolK lists — pool-sized, NOT
    * corpus-sized — so the fusion join is trivially small; all the
    * scale machinery lives in the rankers that produced the pools. */
  def rrfFuse(rankings: Seq[(String, DataFrame)], k: Int,
              rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(rrfK >= 1, s"rrfK must be >= 1, got $rrfK")
    val named = rankings.map { case (label, df) =>
      label -> df.select(col("id"), col("rank").as(s"${label}_rank"))
    }
    val joined = named.map(_._2).reduce(_.join(_, Seq("id"), "full_outer"))
    val rrf = named.map { case (label, _) =>
      coalesce(lit(1.0) / (lit(rrfK) + col(s"${label}_rank")), lit(0.0))
    }.reduce(_ + _)
    joined.withColumn("rrf", rrf)
      .orderBy(col("rrf").desc, col("id"))
      .limit(k)
  }

  /** Hybrid retrieval: BM25 keyword top-`poolK` fused with embedding
    * cosine top-`poolK` by [[rrfFuse]]. Output
    * `(id, kw_rank, vec_rank, rrf)` — a NULL rank means that ranker's
    * pool missed the document. The brute-force vector arm is the
    * REFERENCE ranker; at scale substitute the bucketed LSH / IVF
    * top-k ([[Similarity.portableLshTopK]], [[Ivf.queryIndex]]) —
    * fusion is rank-based, so swapping the arm changes nothing else.
    * Ranks are deterministic on both arms (rounded BM25 score + id
    * tie-break; cosine + id tie-break), so the fused list replays
    * externally. */
  def hybridTopK(docs: DataFrame, idCol: String, textCol: String,
                 query: String,
                 emb: DataFrame, embIdCol: String, embCol: String,
                 queryVec: Seq[Double], k: Int, poolK: Int,
                 rrfK: Int = 60,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1 && poolK >= k, s"need 1 <= k=$k <= poolK=$poolK")
    // pool-sized frames: the un-partitioned row_number window is k
    // rows on one task, not a corpus sort
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("id"))
    val kw = bm25TopK(docs, idCol, textCol, query, poolK, k1, b)
      .withColumn("rank", row_number().over(w))
    // rank the vector arm on the ROUNDED cosine (same discipline as
    // bm25TopK's rounded score): last-ulp disagreement between this
    // engine's codegen'd cosine and an external replayer's must not
    // be able to swap ranks and shift every fused score downstream
    val vw = org.apache.spark.sql.expressions.Window
      .orderBy(col("cos").desc, col("id"))
    val vec = emb
      .select(col(embIdCol).as("id"),
        round(Dedup.cosine(col(embCol), typedLit(queryVec)), 6).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(poolK)
      .withColumn("rank", row_number().over(vw))
    rrfFuse(Seq("kw" -> kw, "vec" -> vec), k, rrfK)
  }
}
