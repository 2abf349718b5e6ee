package graft

import graft.functions.{Bpe, BpeExprs}
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** BPE at a production-size merge table. The committed 48-merge vocab
  * is the (deliberately toy) oracle-replay model, and the driver's
  * synthetic corpus exhausts after ~90 merges — so this spec builds a
  * deterministic syllable-structured vocabulary large enough to train
  * ~8k merges and pins what matters at 100 TB: the trainer reaches
  * production size, encode stays a map-only plan, the per-executor
  * memo keeps per-row cost bounded, and tokens still reassemble the
  * text losslessly. */
class BpeScaleSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  // deterministic splitmix64 — the same mixer the fixtures use
  private def mix(x: Long): Long = {
    var h = x * 0x9E3779B97F4A7C15L
    h ^= h >>> 30; h *= 0xBF58476D1CE4E5B9L
    h ^= h >>> 27; h *= 0x94D049BB133111EBL
    h ^ (h >>> 31)
  }

  /** 24k distinct words built from a 480-syllable inventory (2–4
    * syllables each) — shared sub-structure like natural language, so
    * merges are reused across words instead of exhausting. */
  private val syllables: IndexedSeq[String] = {
    val on = Vector("b", "c", "d", "f", "g", "h", "j", "k", "l", "m",
      "n", "p", "r", "s", "t", "v", "w", "z", "st", "tr")
    val nuc = Vector("a", "e", "i", "o", "u", "ai", "ou", "ea")
    val cod = Vector("", "n", "r", "s")
    for { o <- on; v <- nuc; c <- cod.take(3) } yield o + v + c
  }
  private def word(i: Int): String = {
    val n = 2 + (mix(i * 3 + 1) & 3).toInt.min(2) // 2-4 syllables
    (0 until n).map(j =>
      syllables((mix(i.toLong * 7 + j) >>> 8 % syllables.size).toInt
        .abs % syllables.size)).mkString
  }
  private val vocabSize = 24000
  // Zipfian counts: head words dominate, like a real corpus
  private lazy val wordCounts: Seq[(String, Long)] =
    (0 until vocabSize).map(i => word(i) -> (1L + 200000L / (i + 1)))
      .groupBy(_._1).map { case (w, cs) => w -> cs.map(_._2).sum }.toSeq

  private lazy val big = Bpe.trainFromCounts(wordCounts, numMerges = 8192)

  // 20k rows of 40 words drawn rank-skewed from the vocabulary — the
  // encode corpus (~800k word instances), generated driver-side and
  // staged through parquet so the encode is measured as a real scan
  // (not folded into the optimizer by ConvertToLocalRelation)
  private lazy val texts = {
    val rows = (0 until 20000).map { id =>
      val sb = new StringBuilder
      var j = 0
      while (j < 40) {
        val r = mix(id.toLong * 131 + j)
        // skew toward low ranks: square a uniform [0,1) draw
        val u = ((r >>> 11).toDouble / (1L << 53).toDouble)
        val rank = (u * u * vocabSize).toInt.min(vocabSize - 1)
        if (j > 0) sb.append(' ')
        sb.append(word(rank))
        j += 1
      }
      (id.toLong, sb.toString)
    }
    val dir = java.nio.file.Files
      .createTempDirectory("bpe-scale-corpus").toString
    rows.toDF("id", "text").repartition(8)
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  "a production-size vocabulary" should "train to ~8k merges" in {
    big.merges.size shouldBe 8192
    // merge table round-trips through the SQL-literal form
    Bpe.parseMerges(Bpe.renderMerges(big)) shouldBe big
  }

  it should "encode map-only (zero exchanges) at any merge-table size" in {
    val enc = texts.select(
      BpeExprs.bpeTokenCountCol(col("text"), big).as("n_bpe"))
    graft.plans.ExchangeBudget.count(enc) shouldBe 0
  }

  it should "reassemble text losslessly at the large vocabulary" in {
    val sample = texts.limit(200)
      .select(col("text"),
        BpeExprs.bpeTokensCol(col("text"), big).as("toks"),
        BpeExprs.bpeTokenCountCol(col("text"), big).as("n"))
      .collect()
    sample.length shouldBe 200
    for (r <- sample) {
      val toks = r.getSeq[String](1)
      toks.size.toLong shouldBe r.getLong(2)
      toks.mkString shouldBe r.getString(0).split(" ").mkString
    }
    // the big vocab genuinely compresses: far fewer tokens than chars,
    // fewer even than 2 per word on this corpus
    val meanTokens = texts.select(
      BpeExprs.bpeTokenCountCol(col("text"), big).as("n"))
      .agg(org.apache.spark.sql.functions.avg(col("n"))).head.getDouble(0)
    // 40 words/row at ~8.5 chars/word: char-level would be ~340
    // tokens, word-level exactly 40 — 8k merges land ~2.4 subwords
    // per word, meaningful compression without collapsing to words
    meanTokens should be < 120.0
    meanTokens should be > 40.0
  }

  it should "stay within a sane per-row encode budget" in {
    // throughput pin: count-encode 20k rows x 40 words through the
    // 8192-merge table and bound amortized per-row cost. 2 ms/row is
    // ~20x observed steady state — loose enough to survive host
    // contention, tight enough to catch an accidental O(merges)
    // rescan per row (~100x)
    val enc = texts.select(
      BpeExprs.bpeTokenCountCol(col("text"), big).as("n_bpe"))
    enc.write.mode("overwrite").format("noop").save() // warm codegen+memo
    val t0 = System.nanoTime()
    enc.write.mode("overwrite").format("noop").save()
    val perRowMicros = (System.nanoTime() - t0) / 1e3 / 20000
    info(f"encode: $perRowMicros%.1f us/row (40 words/row, " +
      s"${big.merges.size} merges)")
    perRowMicros should be < 2000.0
  }
}
