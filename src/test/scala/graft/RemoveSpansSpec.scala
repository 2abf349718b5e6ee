package graft

import graft.pipeline.Dedup
import org.apache.spark.sql.DataFrame
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Duplicated-span REMOVAL ([[Dedup.removeRepeatedSpans]]): planted
  * shared sentences must be cut window-exactly from every carrier,
  * overlapping windows must merge into one span, distant spans must
  * stay separate, original case must survive the rewrite (the
  * fingerprints are lowercased, the output tokens are not), short
  * whole-run duplicates must empty out, and unique/NULL rows must
  * pass through. */
class RemoveSpansSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  // 10-token sentence shared verbatim by docs 1 and 2 (same fixture
  // as RepeatedSpansSpec, so the two operators' numbers cross-check:
  // dup_windows 3 there ⇒ one merged span here).
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

  private def rows(df: DataFrame): Map[Long, (String, Long, Long, Long)] =
    df.collect().map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[String]("text_clean"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("removed_tokens"), r.getAs[Long]("n_spans")))).toMap

  "removeRepeatedSpans" should "cut planted shared sentences exactly" in {
    val m = rows(Dedup.removeRepeatedSpans(docs, "doc_id", "text"))
    m.keySet shouldBe Set(1L, 2L, 3L, 4L, 5L, 6L) // rewrite keeps every row
    // doc 1: dup windows at 3,4,5 merge to one span [3, 12] — exactly
    // the 10 shared tokens; the unique prefix survives
    m(1L) shouldBe (("one two three", 13L, 10L, 1L))
    // doc 2: dup windows at 0,1,2 → span [0, 9]; the suffix survives
    m(2L) shouldBe (("four five six", 13L, 10L, 1L))
    // unique doc: untouched (already lowercase single-spaced)
    m(3L)._1 shouldBe docs.filter($"doc_id" === 3L).head.getString(1)
    m(3L)._3 shouldBe 0L
    m(3L)._4 shouldBe 0L
    // whole-run twins (< window tokens) empty out
    m(4L) shouldBe (("", 4L, 4L, 1L))
    m(5L) shouldBe (("", 4L, 4L, 1L))
    // NULL text passes through with zero counts
    m(6L) shouldBe ((null, 0L, 0L, 0L))
  }

  it should "respect minDocs" in {
    val m = rows(Dedup.removeRepeatedSpans(docs, "doc_id", "text", minDocs = 3))
    m.values.map(_._3).sum shouldBe 0L // nothing occurs in 3 docs
  }

  it should "preserve original case while fingerprinting lowercased" in {
    val cased = Seq(
      (7L, "Alpha Beta Gamma Delta Epsilon Zeta Eta Theta Tail7A End7 Stop7"),
      (8L, "alpha beta gamma delta epsilon zeta eta theta tail8 end8 stop8")
    ).toDF("doc_id", "text")
    val m = rows(Dedup.removeRepeatedSpans(cased, "doc_id", "text"))
    // the 8-token prefix matches case-insensitively → cut from both;
    // each survivor keeps ITS OWN original case
    m(7L) shouldBe (("Tail7A End7 Stop7", 11L, 8L, 1L))
    m(8L) shouldBe (("tail8 end8 stop8", 11L, 8L, 1L))
  }

  it should "keep distant duplicated spans separate" in {
    val a = "aa1 aa2 aa3 aa4 aa5 aa6 aa7 aa8"
    val b = "bb1 bb2 bb3 bb4 bb5 bb6 bb7 bb8"
    val mid = "u1 u2 u3 u4 u5 u6 u7 u8 u9"
    val multi = Seq(
      (9L, s"$a $mid $b"),                                  // both spans
      (10L, s"$a v1 v2 v3 v4 v5 v6 v7 v8 v9 v10 v11 v12"),  // shares A
      (11L, s"w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 $b")   // shares B
    ).toDF("doc_id", "text")
    val m = rows(Dedup.removeRepeatedSpans(multi, "doc_id", "text"))
    // doc 9: dup windows at 0 and 17, 17 > 0 + 8 → two islands
    m(9L) shouldBe ((mid, 25L, 16L, 2L))
  }

  it should "treat whitespace-only text as zero tokens" in {
    val ws = Seq((12L, "   "), (13L, "x y z")).toDF("doc_id", "text")
    val m = rows(Dedup.removeRepeatedSpans(ws, "doc_id", "text"))
    m(12L) shouldBe (("", 0L, 0L, 0L))
    m(13L) shouldBe (("x y z", 3L, 0L, 0L))
  }

  it should "reject bad parameters" in {
    an[IllegalArgumentException] should be thrownBy
      Dedup.removeRepeatedSpans(docs, "doc_id", "text", minDocs = 1)
    an[IllegalArgumentException] should be thrownBy
      Dedup.removeRepeatedSpans(docs, "doc_id", "text", window = 0)
  }

  "removeRepeatedSpansAgainst" should "match the batch form on batch ∪ corpus" in {
    // split the fixture: corpus = docs 1,3,4 — batch = docs 2,5,6.
    // Batch semantics: doc 2's shared sentence is in the corpus (doc 1)
    // → cut; doc 5's whole-run twin is in the corpus (doc 4) → cut;
    // the batch-internal path needs >= 2 batch docs, which no hash has.
    val corpus = docs.filter($"doc_id".isin(1L, 3L, 4L))
    val batch = docs.filter($"doc_id".isin(2L, 5L, 6L))
    val inv = Dedup.spanInventoryTable(corpus, "doc_id", "text")
    val m = rows(Dedup.removeRepeatedSpansAgainst(inv, batch, "doc_id", "text"))
    m.keySet shouldBe Set(2L, 5L, 6L)
    m(2L) shouldBe (("four five six", 13L, 10L, 1L))
    m(5L) shouldBe (("", 4L, 4L, 1L))
    m(6L) shouldBe ((null, 0L, 0L, 0L))
    // the full-batch rewrite agrees row-for-row on the batch docs
    val full = rows(Dedup.removeRepeatedSpans(docs, "doc_id", "text"))
    Seq(2L, 5L, 6L).foreach(id => m(id) shouldBe full(id))
  }

  it should "cut batch-internal duplicates with an empty corpus" in {
    val empty = Dedup.spanInventoryTable(
      docs.filter($"doc_id" < 0L), "doc_id", "text")
    val m = rows(Dedup.removeRepeatedSpansAgainst(empty, docs, "doc_id", "text"))
    // with nothing in the corpus, the incremental form IS the batch form
    rows(Dedup.removeRepeatedSpans(docs, "doc_id", "text")) shouldBe m
  }

  "removeSpansWithBank" should "match the joining form when the batch has no internal dups" in {
    val corpus = docs.filter($"doc_id".isin(1L, 3L, 4L))
    val batch = docs.filter($"doc_id".isin(2L, 5L, 6L))
    val inv = Dedup.spanInventoryTable(corpus, "doc_id", "text")
    val bank = Dedup.spanBankSet(inv)
    val viaBank = rows(Dedup.removeSpansWithBank(batch, "doc_id", "text", bank))
    val viaJoin = rows(Dedup.removeRepeatedSpansAgainst(inv, batch, "doc_id", "text"))
    viaBank shouldBe viaJoin
  }

  it should "cut nothing against an empty bank" in {
    val m = rows(Dedup.removeSpansWithBank(docs, "doc_id", "text", Array.empty))
    m.values.map(_._3).sum shouldBe 0L
  }

  "topSharedSpans" should "mine exactly the planted boilerplate with exemplar text" in {
    val out = Dedup.topSharedSpans(docs, "doc_id", "text", k = 10)
      .collect().map(r => (r.getAs[Long]("docs"), r.getAs[String]("span_text")))
    out.length shouldBe 4 // 3 shared-sentence windows + 1 whole-run twin
    out.foreach(_._1 shouldBe 2L)
    val sharedToks = shared.split(" ")
    val expected = (0 to 2).map(i =>
      sharedToks.slice(i, i + 8).mkString(" ")).toSet + "tiny pair of documents"
    out.map(_._2).toSet shouldBe expected
  }

  it should "order by share count with deterministic ties and honor k" in {
    val out = Dedup.topSharedSpans(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getAs[Long]("fp"), r.getAs[Long]("docs")))
    out.length shouldBe 2
    // all counts tie at 2 → the two smallest fps win, ascending
    out.map(_._1).toSeq shouldBe out.map(_._1).toSeq.sorted
  }

  it should "feed spanBankSet: mined spans cut everywhere" in {
    // mine the boilerplate, bank ONLY the whole-run twin span, cut:
    // docs 4/5 empty out, the shared sentence survives (not banked)
    val mined = Dedup.topSharedSpans(docs, "doc_id", "text", k = 10)
      .filter($"span_text" === "tiny pair of documents")
      .select($"fp").collect().map(_.getLong(0)).sorted
    val m = rows(Dedup.removeSpansWithBank(docs, "doc_id", "text", mined))
    m(4L) shouldBe (("", 4L, 4L, 1L))
    m(5L) shouldBe (("", 4L, 4L, 1L))
    m(1L)._3 shouldBe 0L // shared sentence NOT banked → untouched
  }

  "foldSpanInventory" should "sum doc counts per hash" in {
    val a = docs.filter($"doc_id".isin(1L, 3L))
    val b = docs.filter($"doc_id".isin(2L, 4L, 5L))
    val folded = Dedup.foldSpanInventory(
      Dedup.spanInventoryTable(a, "doc_id", "text"), b, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val whole = Dedup.spanInventoryTable(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    folded shouldBe whole
  }

  it should "agree with repeatedSpanStats on what is duplicated" in {
    // every doc's removed_tokens must be >= its dup_windows (each
    // shared window covers >= 1 removed token) and removed_tokens == 0
    // exactly when dup_windows == 0
    val stats = Dedup.repeatedSpanStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("dup_windows")).toMap
    val m = rows(Dedup.removeRepeatedSpans(docs, "doc_id", "text"))
    stats.foreach { case (id, dw) =>
      (m(id)._3 == 0L) shouldBe (dw == 0L)
    }
  }
}
