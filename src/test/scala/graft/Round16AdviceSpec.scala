package graft

import graft.pipeline.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Regressions for the round-15 review items: the incremental span
  * cut must honor `minDocs` ACROSS the batch/corpus union (a hash in
  * one corpus doc + one batch doc is two documents — below a
  * minDocs=3 bar — but the old distinct-fp semi-join cut it
  * unconditionally, so the documented batch-∪-corpus equivalence held
  * only at the default minDocs=2); `classify` and `classifyScored`
  * must share one gate core (they duplicated the best/second scan +
  * cutoff arithmetic verbatim — a constant tweak in one could
  * silently diverge the other); and the langid battery entries must
  * keep NULL-text documents the way their oracles do (Spark concat
  * and DuckDB || both yield NULL input, but the oracle's inner joins
  * then DROP the row while Spark classified it `und` — latent until
  * a generator change plants a NULL). */
class Round16AdviceSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  behavior of "removeRepeatedSpansAgainst minDocs union semantics"

  // one 8-token sentence, planted in controlled document counts
  private val s1 = "alpha beta gamma delta epsilon zeta eta theta"
  private val s2 = "one two three four five six seven eight"
  private val s3 = "red orange yellow green blue indigo violet ultraviolet"

  it should "NOT cut a hash below the union minDocs bar" in {
    // s1: 1 corpus doc + 1 batch doc = 2 distinct docs < minDocs 3
    val corpus = Seq((1L, s1)).toDF("doc_id", "text")
    val batch = Seq((100L, s"$s1 tail1 tail2 tail3")).toDF("doc_id", "text")
    val inv = Dedup.spanInventoryTable(corpus, "doc_id", "text")
    val out = Dedup.removeRepeatedSpansAgainst(
      inv, batch, "doc_id", "text", minDocs = 3).collect()
    out.length shouldBe 1
    out.head.getAs[Long]("removed_tokens") shouldBe 0L
    out.head.getAs[String]("text_clean") shouldBe s"$s1 tail1 tail2 tail3"
  }

  it should "cut when corpus + batch counts SUM to minDocs" in {
    // s2: 2 corpus docs + 1 batch doc = 3 ≥ 3 → cut, even though
    // neither side alone reaches the bar
    val corpus = Seq((1L, s2), (2L, s"intro $s2")).toDF("doc_id", "text")
    val batch = Seq((100L, s"$s2 tail1 tail2 tail3")).toDF("doc_id", "text")
    val inv = Dedup.spanInventoryTable(corpus, "doc_id", "text")
    val out = Dedup.removeRepeatedSpansAgainst(
      inv, batch, "doc_id", "text", minDocs = 3).collect()
    out.head.getAs[Long]("removed_tokens") shouldBe 8L
    out.head.getAs[String]("text_clean") shouldBe "tail1 tail2 tail3"
  }

  it should "match the batch rewrite over batch ∪ corpus at minDocs = 3" in {
    val corpus = Seq(
      (1L, s"$s1 filler one"), (2L, s"$s2 filler two"),
      (3L, s"start $s2"), (4L, s3)).toDF("doc_id", "text")
    val batch = Seq(
      (100L, s"$s1 middle $s2"),   // s1 union 2 (keep), s2 union 3 (cut)
      (101L, s"$s3 ending bits"),  // s3 union 2 (keep)
      (102L, "totally unique batch document with nothing shared anywhere")
    ).toDF("doc_id", "text")
    val inv = Dedup.spanInventoryTable(corpus, "doc_id", "text")
    val inc = Dedup.removeRepeatedSpansAgainst(
        inv, batch, "doc_id", "text", minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val whole = Dedup.removeRepeatedSpans(
        corpus.unionByName(batch), "doc_id", "text", minDocs = 3)
      .filter($"doc_id" >= 100L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    inc shouldBe whole
    inc(100L) shouldBe s"$s1 middle" // only s2 cut
    inc(101L) shouldBe s"$s3 ending bits"
  }

  it should "keep the default minDocs = 2 behavior byte-identical" in {
    val corpus = Seq((1L, s1), (2L, s3)).toDF("doc_id", "text")
    val batch = Seq((100L, s"$s1 then $s3 done")).toDF("doc_id", "text")
    val inv = Dedup.spanInventoryTable(corpus, "doc_id", "text")
    val out = Dedup.removeRepeatedSpansAgainst(inv, batch, "doc_id", "text")
      .collect().head
    out.getAs[String]("text_clean") shouldBe "then done"
    out.getAs[Long]("n_spans") shouldBe 2L
  }

  behavior of "classify / classifyScored shared gate"

  it should "agree on label for every probe and edge input" in {
    import graft.functions.LangIdExprs
    val inputs =
      LangIdExprs.outOfSetProbes.map(_._2) ++
        (0 until LangIdExprs.languages.length)
          .flatMap(li => Seq(LangIdExprs.seedText(li, 0),
            LangIdExprs.seedText(li, 1))) ++
        Seq("", "   ", "x", "1234 5678")
    for (t <- inputs) {
      val u = UTF8String.fromString(t)
      val scored = LangIdExprs.classifyScored(u)
      LangIdExprs.classify(u).toString shouldBe scored.getUTF8String(0).toString
    }
    // NULL routes both to und
    LangIdExprs.classify(null).toString shouldBe "und"
    LangIdExprs.classifyScored(null).getUTF8String(0).toString shouldBe "und"
  }

  behavior of "langid battery entries on NULL-text documents"

  it should "retain NULL-text rows with a seed-only classification" in {
    val dir = java.nio.file.Files.createTempDirectory("r16-nulltext").toString
    // shape-checked documents table: doc 17 has NULL text AND is a
    // %17 probe row (no doc text used), doc 1 has NULL text and a
    // seed prefix — both must SURVIVE with deterministic labels
    Seq(
      (1L, null.asInstanceOf[String], "en", "t", 0L),
      (17L, null.asInstanceOf[String], "en", "t", 0L),
      (2L, "plain english words the and of", "en", "t", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    for (q <- Seq("q_text_langid_ct", "q_text_langid_score")) {
      val out = SparkEntry.queries(q)(spark, dir)
      val rows = out.select("doc_id", "lang_pred").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      withClue(s"$q: ") {
        rows.keySet shouldBe Set(1L, 2L, 17L)
        // doc 1: seed text alone classifies (its seed language wins)
        rows(1L) should not be "und"
        // doc 17: the out-of-set probe → the und gate fires
        rows(17L) shouldBe "und"
      }
    }
  }
}
