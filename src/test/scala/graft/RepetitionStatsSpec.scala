package graft

import graft.pipeline.TextAnalysis
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Repetition/layout quality signals: hand-computed fractions on known
  * documents, degenerate shapes (empty, NULL, single-line), and the
  * cap on the bigram char fraction. */
class RepetitionStatsSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def statsOf(text: String): Row = {
    val df = Seq(Option(text)).toDF("text")
      .select(TextAnalysis.repetitionStats(col("text")).as("st"))
      .select("st.*")
    df.collect().head
  }

  "repetitionStats" should "compute hand-checked line and token signals" in {
    // lines: "alpha beta" ×2 (dup), "- bullet line", "ends here ..."
    val r = statsOf("alpha beta\nalpha beta\n- bullet line\nends here ...\n\n   \n")
    r.getInt(0) shouldBe 4                                  // n_lines
    r.getDouble(1) shouldBe 0.25 +- 1e-12                   // dup_line_frac
    r.getDouble(2) shouldBe (20.0 / 46.0) +- 1e-12          // dup_line_char_frac
    r.getDouble(3) shouldBe 0.25 +- 1e-12                   // bullet_line_frac
    r.getDouble(4) shouldBe 0.25 +- 1e-12                   // ellipsis_line_frac
    // tokens: alpha beta alpha beta - bullet line ends here ... (10)
    r.getDouble(5) shouldBe 0.2 +- 1e-12                    // top_token_frac
    // top bigram "alpha beta": 2 × 10 chars / (40 token chars + 9 seps)
    r.getDouble(6) shouldBe (20.0 / 49.0) +- 1e-12          // top_bigram_char_frac
  }

  it should "return zeros on empty text and one line without newlines" in {
    val z = statsOf("")
    z.getInt(0) shouldBe 0
    (1 to 6).foreach(i => z.getDouble(i) shouldBe 0.0)
    statsOf("no newlines here at all").getInt(0) shouldBe 1
  }

  it should "be NULL for NULL text" in {
    statsOf(null) // the struct row itself is null
    val df = Seq(Option.empty[String]).toDF("text")
      .select(TextAnalysis.repetitionStats(col("text")).as("st"))
    df.filter(col("st").isNull).count() shouldBe 1
  }

  it should "cap the bigram char fraction at 1 on degenerate repetition" in {
    // "a a a a": bigram "a a" occurs 3× overlapping → 9/7 uncapped
    statsOf("a a a a").getDouble(6) shouldBe 1.0
  }

  it should "trim spaces only, keeping SQL-trim parity on tab-padded lines" in {
    // the '\t' survives space-trimming, so the two lines differ
    val r = statsOf("line one\t\nline one")
    r.getInt(0) shouldBe 2
    r.getDouble(1) shouldBe 0.0
  }

  it should "match the published ellipsis and bullet markers" in {
    val r = statsOf("- first\n* second\n• third\ntrails …")
    r.getDouble(3) shouldBe 0.75 +- 1e-12
    r.getDouble(4) shouldBe 0.25 +- 1e-12
  }
}
