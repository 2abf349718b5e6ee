package graft

import graft.pipeline.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Bigram LM quality score: hand-computed probabilities on a tiny
  * corpus, typical-vs-garbled ordering on a larger one, and absence
  * rules for short documents. */
class BigramLmSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  "bigramLogProbTable" should "match hand-computed smoothed probabilities" in {
    // corpus: "a b" ×3 and "a c" ×1 → V = {a,b,c} = 3, C(a)=4
    // P(b|a) = (3+0.1)/(4+0.3), P(c|a) = (1+0.1)/(4+0.3)
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c")
    ).toDF("doc_id", "text")
    val m = TextAnalysis.bigramLogProbTable(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logprob")))).toMap
    m should have size 4
    val pb = math.log((3 + 0.1) / (4 + 0.3))
    val pc = math.log((1 + 0.1) / (4 + 0.3))
    m(1L) shouldBe ((1L, BigDecimal(pb).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble))
    m(4L) shouldBe ((1L, BigDecimal(pc).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble))
  }

  it should "score typical text above garbled text" in {
    val common = "the model reads the data and the model writes the data"
    val docs: DataFrame = (
      (1 to 20).map(i => (i.toLong, common)) :+
        (100L, common) :+                         // typical doc
        (101L, "data the and reads writes model") // same words, garbled order
      ).toDF("doc_id", "text")
    val m = TextAnalysis.bigramLogProbTable(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("avg_logprob")).toMap
    m(100L) should be > m(101L)
  }

  it should "omit documents with fewer than two tokens" in {
    val docs = Seq(
      (1L, "only"), (2L, ""), (3L, null.asInstanceOf[String]),
      (4L, "two tokens")
    ).toDF("doc_id", "text")
    TextAnalysis.bigramLogProbTable(docs, "doc_id", "text")
      .collect().map(_.getAs[Long]("doc_id")).toSet shouldBe Set(4L)
  }

  it should "reject non-positive alpha" in {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    an[IllegalArgumentException] should be thrownBy
      TextAnalysis.bigramLogProbTable(docs, "doc_id", "text", alpha = 0.0)
  }
}
