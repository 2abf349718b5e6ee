package graft

import graft.pipeline.TextAnalysis
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Context-window chunking: coverage, overlap, tail handling and
  * degenerate documents. */
class ChunkSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def chunks(text: String, chunk: Int, overlap: Int) =
    TextAnalysis.chunkTable(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", chunk, overlap)
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3))).toSeq
      .sortBy(_._1)

  private val ten = (1 to 10).map(i => s"t$i").mkString(" ")

  "chunkTable" should "emit overlapping chunks covering every token" in {
    chunks(ten, 8, 4) shouldBe Seq(
      (0L, (1 to 8).map(i => s"t$i").mkString(" "), 8L),
      (1L, (5 to 10).map(i => s"t$i").mkString(" "), 6L))
  }

  it should "not emit a chunk fully contained in its predecessor" in {
    // 8 tokens, chunk 8: one chunk only (start 5 would add no new content)
    chunks((1 to 8).map(i => s"t$i").mkString(" "), 8, 4) should have size 1
  }

  it should "keep a single short chunk for short documents" in {
    chunks("a b c", 8, 4) shouldBe Seq((0L, "a b c", 3L))
  }

  it should "emit nothing for empty or NULL text" in {
    chunks("   ", 8, 4) shouldBe empty
    TextAnalysis.chunkTable(
      Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      "doc_id", "text", 8, 4).count() shouldBe 0L
  }

  it should "produce disjoint chunks with zero overlap" in {
    chunks(ten, 4, 0) shouldBe Seq(
      (0L, "t1 t2 t3 t4", 4L),
      (1L, "t5 t6 t7 t8", 4L),
      (2L, "t9 t10", 2L))
  }

  it should "reject overlap >= chunkTokens" in {
    an[IllegalArgumentException] should be thrownBy
      TextAnalysis.chunkTable(
        Seq((1L, "x")).toDF("doc_id", "text"), "doc_id", "text", 8, 8)
  }
}
