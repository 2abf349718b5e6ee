package graft

import graft.functions.{Bpe, BpeModel}
import graft.pipeline.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** BPE subword tokenizer: encoder semantics (lowest-rank, leftmost,
  * one merge per step), trainer determinism + committed-vocab
  * reproducibility from the sf0.01 parquet, expression/driver parity,
  * and the chunk/budget integration points. */
class BpeSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val m = Bpe.committed

  // Independent reference encoder, written the way the DuckDB oracle
  // replays it: the word as a space-delimited symbol STRING, each step
  // a substring search for the lowest-rank ' a b ' pattern and a
  // leftmost single-occurrence splice. Any drift between the list
  // implementation and the SQL-shaped one is a correctness bug.
  private def refEncode(model: BpeModel, w: String): Seq[String] = {
    var state = " " + w.toCharArray.map(_.toString).mkString(" ") + " "
    val pats = model.merges.zipWithIndex.map { case ((a, b), r) =>
      (r, s" $a $b ", s" $a$b ")
    }
    var done = false
    while (!done) {
      pats.find { case (_, pat, _) => state.contains(pat) } match {
        case Some((_, pat, rep)) =>
          val i = state.indexOf(pat)
          state = state.substring(0, i) + rep + state.substring(i + pat.length)
        case None => done = true
      }
    }
    state.trim.split(" ").toSeq
  }

  "encodeWord" should "match hand-computed splits on corpus words" in {
    m.encodeWord("the").toSeq shouldBe Seq("t", "h", "e")
    m.encodeWord("row").toSeq shouldBe Seq("row")
    m.encodeWord("customer").toSeq shouldBe Seq("customer")
    m.encodeWord("query").toSeq shouldBe Seq("q", "u", "er", "y")
    m.encodeWord("spark").toSeq shouldBe Seq("s", "par", "k")
    m.encodeWord("x").toSeq shouldBe Seq("x")
    m.encodeWord("").toSeq shouldBe Seq()
  }

  it should "always concatenate back to the original word" in {
    val seed = sys.props.get("graft.fuzz.seed").map(_.toInt).getOrElse(12)
    val rnd = new scala.util.Random(seed)
    (1 to 500).foreach { _ =>
      val w = (1 to (1 + rnd.nextInt(12)))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      withClue(s"word=$w seed=$seed: ") {
        m.encodeWord(w).mkString shouldBe w
      }
    }
  }

  it should "agree with the SQL-shaped reference encoder on fuzzed words" in {
    val seed = sys.props.get("graft.fuzz.seed").map(_.toInt).getOrElse(12)
    val rnd = new scala.util.Random(seed + 1)
    (1 to 500).foreach { _ =>
      val w = (1 to (1 + rnd.nextInt(10)))
        .map(_ => ('a' + rnd.nextInt(6)).toChar).mkString // dense alphabet
      withClue(s"word=$w seed=$seed: ") {
        m.encodeWord(w).toSeq shouldBe refEncode(m, w)
      }
    }
  }

  it should "prefer the lowest-rank merge, leftmost occurrence" in {
    // ranks: (b,c)=0 first — "abc" must merge bc before ab exists
    val mm = BpeModel(Vector(("b", "c"), ("a", "bc"), ("a", "b")))
    mm.encodeWord("abc").toSeq shouldBe Seq("abc") // b c -> bc, a bc -> abc
    // leftmost: "abab" with only (a,b): both merge, left first
    val mm2 = BpeModel(Vector(("a", "b")))
    mm2.encodeWord("abab").toSeq shouldBe Seq("ab", "ab")
    // a merge can enable a LOWER-rank merge retroactively
    val mm3 = BpeModel(Vector(("x", "yz"), ("y", "z")))
    mm3.encodeWord("xyz").toSeq shouldBe Seq("xyz") // y z first, then x yz
  }

  "train" should "reproduce the committed vocabulary from sf0.01" in {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val trained = Bpe.train(docs, "text", numMerges = 48)
    trained.merges shouldBe m.merges
  }

  it should "break pair-count ties lexicographically" in {
    // "ab" and "cd" both appear once: (a,b) < (c,d) lexicographically
    val t = Bpe.trainFromCounts(Seq(("ab", 1L), ("cd", 1L)), 2)
    t.merges shouldBe Vector(("a", "b"), ("c", "d"))
  }

  it should "stop early when no pairs remain" in {
    val t = Bpe.trainFromCounts(Seq(("ab", 5L)), 10)
    t.merges shouldBe Vector(("a", "b"))
  }

  it should "cap the vocabulary at maxVocab by frequency" in {
    // 'zz' dominates; with maxVocab=1 only 'zz' trains -> merge (z,z)
    val docs = Seq("zz zz zz ab").toDF("text")
    val t = Bpe.train(docs, "text", numMerges = 5, maxVocab = 1)
    t.merges shouldBe Vector(("z", "z"))
  }

  "the expressions" should "match the driver-side encoder through codegen" in {
    val df = Seq(
      (1L, "The  Customer   ROW"), // mixed case + runs of spaces
      (2L, "spark query merge"),
      (3L, ""),
      (4L, null.asInstanceOf[String])).toDF("id", "text")
    val got = df.select(col("id"),
        TextAnalysis.bpeTokens(col("text")).as("toks"),
        TextAnalysis.bpeTokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> ((
        if (r.isNullAt(1)) null else r.getSeq[String](1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap

    def enc(t: String) = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      .flatMap(m.encodeWord).toSeq
    got(1L)._1 shouldBe enc("The  Customer   ROW")
    got(2L)._1 shouldBe enc("spark query merge")
    got(3L)._1 shouldBe Seq()
    got(3L)._2 shouldBe 0L
    got(4L)._1 shouldBe null
    got(4L)._2 shouldBe -1L // NULL in, NULL out
    got(1L)._2 shouldBe got(1L)._1.size.toLong
    got(2L)._2 shouldBe enc("spark query merge").size.toLong
  }

  it should "count exactly size(bpeTokens) over the corpus" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bad = docs.select(
        TextAnalysis.bpeTokenCount(col("text")).as("n"),
        org.apache.spark.sql.functions.size(
          TextAnalysis.bpeTokens(col("text"))).cast("long").as("sz"))
      .filter(col("n") =!= col("sz")).count()
    bad shouldBe 0L
  }

  "chunkTable with the BPE tokenizer" should "chunk subword streams" in {
    // "customer batch" -> [customer, batch]; "the query" -> 7 subwords
    val df = Seq((1L, "the query spark")).toDF("doc_id", "text")
    // subwords: t h e | q u er y | s par k  = 10 tokens
    val out = TextAnalysis.chunkTable(df, "doc_id", "text",
        chunkTokens = 8, overlap = 2,
        tokenizer = TextAnalysis.bpeTokens(_))
      .orderBy("chunk_idx")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    out.length shouldBe 2
    out(0) shouldBe ((0L, "t h e q u er y s", 8L))
    out(1) shouldBe ((1L, "y s par k", 4L)) // starts at token 7 (stride 6)
  }

  "corpusReport with BPE accounting" should "price tokens in subwords" in {
    val df = Seq(("en", "the row"), ("en", "customer")).toDF("lang", "text")
    val rep = graft.pipeline.Curation.corpusReport(df, "lang", "text",
        tokenCount = TextAnalysis.bpeTokenCount(_))
      .collect().head
    // "the row" = 4 subwords, "customer" = 1
    rep.getAs[Long]("total_tokens") shouldBe 5L
  }
}
