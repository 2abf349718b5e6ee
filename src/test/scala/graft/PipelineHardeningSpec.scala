package graft

import graft.pipeline.{Clustering, Curation, Dedup, Ivf}
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Regressions for the round-6 pipeline/io review: corpus-side bucket
  * caps, signature-length guards, column-form signature parity, exact
  * dedup determinism, NULL strata/text handling, ragged IVF input. */
class PipelineHardeningSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  "minHashCandidatesAgainst" should "cap corpus-side hot buckets too" in {
    // 300-doc identical boilerplate cluster in the corpus: with the
    // cap, a batch doc matching the flood yields NO pairs (exact dedup
    // owns identical docs), while a batch near-dup of a NORMAL corpus
    // doc still surfaces
    val flood = (100L until 400L).map(i =>
      (i, "the same exact flooded document text repeated verbatim across the corpus"))
    val corpus = (flood ++ Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today")))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (11L, "the same exact flooded document text repeated verbatim across the corpus"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minHashCandidatesAgainst(
      Dedup.minHashSignTable(batch, "doc_id", "text"),
      Dedup.minHashSignTable(corpus, "doc_id", "text"),
      threshold = 0.5, maxBucketSize = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain((10L, 1L))
    pairs.count(_._1 == 11L) shouldBe 0 // flood bucket dropped
  }

  it should "fail loudly on a numHashes/signature-length mismatch" in {
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val sigs32 = Dedup.minHashSignTable(docs, "doc_id", "text", numHashes = 32)
    val sigs64 = Dedup.minHashSignTable(docs, "doc_id", "text", numHashes = 64)
    an[Exception] should be thrownBy
      Dedup.minHashCandidatesAgainst(sigs32, sigs64, numHashes = 64)
        .collect() // previously: silent degenerate all-pairs bands
  }

  "minHashSignature (Column form)" should "produce the signTable's mh values" in {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val viaTable = Dedup.minHashSignTable(docs, "doc_id", "text", numHashes = 16)
      .select("mh").head().getSeq[Long](0)
    val viaColumn = docs
      .select(Dedup.minHashSignature(
        Dedup.shingles(col("text"), 3), numHashes = 16).as("mh"))
      .head().getSeq[Long](0)
    viaColumn shouldBe viaTable
  }

  "exact dedup" should "break tieBreak ties deterministically by the remaining columns" in {
    val df = Seq(
      ("k", 5L, "zebra"), ("k", 5L, "apple"), ("k", 7L, "aaa"))
      .toDF("fp", "ts", "payload")
    val out = Dedup.exact(df, "fp", "ts").collect()
    out should have length 1
    out.head.getString(2) shouldBe "apple" // lexicographic min on tie
  }

  "aboveGroupQuantile" should "keep the NULL stratum" in {
    val df = Seq(
      (Some("en"), 10), (Some("en"), 20), (None, 1), (None, 9))
      .toDF("lang", "score")
    val out = Curation.aboveGroupQuantile(df, "lang", "score", 0.5)
      .collect().map(r => (Option(r.getString(0)), r.getInt(1))).toSet
    out should contain((None, 9)) // NULL group's own median gate
    out.exists(_._1.isEmpty) shouldBe true
  }

  it should "handle non-identifier column names" in {
    val df = Seq(("en", 10), ("en", 20), ("de", 5))
      .toDF("lang", "quality score")
    Curation.aboveGroupQuantile(df, "lang", "quality score", 0.5)
      .count() should be > 0L
  }

  "nearDupClusters" should "not chain NULL-text documents into one cluster" in {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, null.asInstanceOf[String]),
      (4L, null.asInstanceOf[String]),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val clusters = Clustering.nearDupClusters(df, "doc_id", "text")
      .collect().map(r => r.get(0) -> r.getAs[Any]("component")).toMap
    clusters(1L) shouldBe clusters(2L) // real duplicates cluster
    // failed-extraction docs are NOT duplicates of each other
    Set(clusters(3L), clusters(4L), clusters(5L)).size shouldBe 3
  }

  "IVF training" should "reject ragged embedding dimensionalities loudly" in {
    val df = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    an[IllegalArgumentException] should be thrownBy
      Ivf.trainCentroids(df, "embedding", k = 2, iters = 1)
  }
}
