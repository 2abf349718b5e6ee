package graft

import graft.pipeline.Dedup
import org.apache.spark.sql.DataFrame
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Cross-document repeated-span statistics: planted shared sentences
  * must be counted window-exactly, unique documents must score zero,
  * short-document whole-run spans must participate, and the
  * over-duplication filter must drop exactly the offenders. */
class RepeatedSpansSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  // 10-token sentence shared verbatim by docs 1 and 2 → exactly three
  // 8-token windows lie fully inside it; every other window of either
  // doc crosses into doc-unique filler and stays unique.
  private val shared =
    "large corpora repeat boilerplate sentences far more than anyone expects"

  private lazy val docs: DataFrame = Seq(
    (1L, s"one two three $shared"),
    (2L, s"$shared four five six"),
    (3L, "thirteen entirely unique filler tokens never appearing anywhere else in this corpus today"),
    (4L, "tiny pair of documents"),
    (5L, "tiny pair of documents"),
    (6L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  private def statsMap(df: DataFrame): Map[Long, (Long, Long, Double)] =
    df.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_windows"), r.getAs[Long]("dup_windows"),
          r.getAs[Double]("dup_frac")))).toMap

  "repeatedSpanStats" should "count planted shared windows exactly" in {
    val m = statsMap(Dedup.repeatedSpanStats(docs, "doc_id", "text"))
    m.keySet shouldBe Set(1L, 2L, 3L, 4L, 5L) // NULL text absent
    // 13 tokens → 6 windows; 3 fully inside the shared sentence
    m(1L) shouldBe ((6L, 3L, 0.5))
    m(2L) shouldBe ((6L, 3L, 0.5))
    m(3L) shouldBe ((6L, 0L, 0.0))
    // < window tokens → one whole-run span, shared by the twin
    m(4L) shouldBe ((1L, 1L, 1.0))
    m(5L) shouldBe ((1L, 1L, 1.0))
  }

  it should "respect minDocs" in {
    // every planted span occurs in exactly 2 docs; minDocs = 3 → none shared
    val m = statsMap(Dedup.repeatedSpanStats(docs, "doc_id", "text", minDocs = 3))
    m.values.map(_._2).sum shouldBe 0L
  }

  it should "reject minDocs < 2" in {
    an[IllegalArgumentException] should be thrownBy
      Dedup.repeatedSpanStats(docs, "doc_id", "text", minDocs = 1)
  }

  "dropOverDuplicated" should "drop offenders and keep NULL-text rows" in {
    val kept = Dedup.dropOverDuplicated(docs, "doc_id", "text", maxDupFrac = 0.6)
      .collect().map(_.getLong(0)).toSet
    kept shouldBe Set(1L, 2L, 3L, 6L) // the whole-copy twins go; NULL survives
  }

  it should "keep everything at maxDupFrac = 1.0" in {
    Dedup.dropOverDuplicated(docs, "doc_id", "text", maxDupFrac = 1.0)
      .count() shouldBe 6L
  }
}
