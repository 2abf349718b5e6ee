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
}
