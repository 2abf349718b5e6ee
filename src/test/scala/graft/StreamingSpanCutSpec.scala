package graft

import graft.pipeline.Dedup
import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Streaming incremental span cut: single-batch parity with
  * [[Dedup.removeRepeatedSpansAgainst]] (the batch union-count
  * semantics, verbatim), cross-batch state carryover with the
  * documented append-mode asymmetry, and the dirty-row guards. */
class StreamingSpanCutSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  // a 10-token boilerplate run (> window) all fixtures share
  private val boiler = "please accept our cookie banner before you continue reading this"
  private def doc(prefix: String, withBoiler: Boolean, suffix: String) =
    (if (withBoiler) s"$prefix $boiler $suffix" else s"$prefix $suffix").trim

  behavior of "StreamingOps.spanCutAgainstStream"

  it should "match the batch operator exactly on a single micro-batch" in {
    implicit val sqlCtx = spark.sqlContext
    val window = 4
    // corpus: two docs sharing the boilerplate → inventory docs = 2
    val corpus = Seq(
      (1L, doc("alpha beta gamma delta", true, "one two three")),
      (2L, doc("epsilon zeta eta theta", true, "four five six")))
      .toDF("doc_id", "text")
    val inv = Dedup.spanInventoryTable(corpus, "doc_id", "text", window)
      .cache()
    inv.count()
    // batch: one doc carrying the corpus boilerplate, one clean, one
    // pair sharing a NEW span only within the batch, one NULL text
    val batchRows = Seq(
      (10L, doc("iota kappa lambda mu", true, "seven eight nine")),
      (11L, "totally original words that repeat nowhere at all today"),
      (12L, "shared fresh run of five tokens here plus unique tail x1"),
      (13L, "shared fresh run of five tokens here plus unique tail y2"),
      (14L, null.asInstanceOf[String]))
    val batchDf = batchRows.toDF("doc_id", "text")
    val expected = Dedup
      .removeRepeatedSpansAgainst(inv, batchDf, "doc_id", "text", window)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    // sanity on the fixture: the boilerplate doc lost tokens, the
    // original doc lost none, the in-batch pair lost their shared run
    expected.find(_._1 == 10L).get._4 should be > 0L
    expected.find(_._1 == 11L).get._4 shouldBe 0L
    expected.find(_._1 == 12L).get._4 should be > 0L
    expected.find(_._1 == 13L).get._4 should be > 0L

    val input = MemoryStream[(Long, String)]
    val out = StreamingOps.spanCutAgainstStream(
      input.toDF.toDF("doc_id", "text"), "doc_id", "text", inv, window)
    val q = out.writeStream.format("memory").queryName("span_cut_stream_out")
      .outputMode("append").start()
    try {
      input.addData(batchRows: _*)
      q.processAllAvailable()
      val got = spark.table("span_cut_stream_out")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) null else r.getString(1),
          r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      got shouldBe expected
    } finally q.stop()
  }

  it should "carry span state across batches with the append-mode asymmetry" in {
    implicit val sqlCtx = spark.sqlContext
    val window = 4
    val emptyInv = Seq.empty[(Long, Long)].toDF("fp", "docs")
    val input = MemoryStream[(Long, String)]
    val out = StreamingOps.spanCutAgainstStream(
      input.toDF.toDF("doc_id", "text"), "doc_id", "text", emptyInv, window)
    val q = out.writeStream.format("memory").queryName("span_cut_state_out")
      .outputMode("append").start()
    try {
      // batch 1: the boilerplate appears in ONE doc → under minDocs,
      // nothing cut
      input.addData((20L, doc("first unique preface words", true, "tail a b")))
      q.processAllAvailable()
      val r1 = spark.table("span_cut_state_out").collect()
        .map(r => (r.getLong(0), r.getLong(3))).toMap
      r1(20L) shouldBe 0L
      // batch 2: the same span arrives in a new doc — state pushes the
      // union count to 2, so THIS doc is cut; doc 20 is not retro-cut
      // (append contract, same as paragraphDedupStream)
      input.addData((21L, doc("second unique preface words", true, "tail c d")))
      q.processAllAvailable()
      val r2 = spark.table("span_cut_state_out").collect()
        .map(r => (r.getLong(0), r.getLong(3))).toMap
      r2(20L) shouldBe 0L
      r2(21L) should be > 0L
      r2 should have size 2 // each doc emitted exactly once
    } finally q.stop()
  }

  it should "drop NULL-id rows instead of killing the query" in {
    implicit val sqlCtx = spark.sqlContext
    val emptyInv = Seq.empty[(Long, Long)].toDF("fp", "docs")
    val input = MemoryStream[(String, String)]
    val out = StreamingOps.spanCutAgainstStream(
      input.toDF.toDF("doc_id", "text"), "doc_id", "text", emptyInv, 4)
    val q = out.writeStream.format("memory").queryName("span_cut_nullid_out")
      .outputMode("append").start()
    try {
      input.addData((null.asInstanceOf[String], "orphan doc text here"),
        ("d1", "kept doc text here"))
      q.processAllAvailable() // must not throw
      spark.table("span_cut_nullid_out").collect()
        .map(_.getString(0)).toSet shouldBe Set("d1")
    } finally q.stop()
  }

  it should "agree with the batch operator on randomized batched corpora" in {
    implicit val sqlCtx = spark.sqlContext
    val window = 3
    val seed = java.lang.Long.getLong("graft.fuzz.seed", 1322L)
    val rnd = new scala.util.Random(seed)
    val pool = Vector("aa bb cc dd ee", "ff gg hh ii jj", "kk ll mm nn oo",
      "pp qq rr ss tt")
    def randDoc(i: Long): String =
      (0 until 1 + rnd.nextInt(3)).map { _ =>
        if (rnd.nextBoolean()) pool(rnd.nextInt(pool.size))
        else (0 until 4 + rnd.nextInt(5))
          .map(_ => s"w${rnd.nextInt(50)}").mkString(" ")
      }.mkString(" ") + s" u$i" // unique tail keeps docs distinct
    val corpus = (0L until 6L).map(i => (i, randDoc(i))).toDF("doc_id", "text")
    val inv = Dedup.spanInventoryTable(corpus, "doc_id", "text", window).cache()
    inv.count()
    // ONE batch (the parity regime the operator guarantees); ids new
    val batch = (100L until 112L).map(i => (i, randDoc(i)))
    val expected = Dedup.removeRepeatedSpansAgainst(
      inv, batch.toDF("doc_id", "text"), "doc_id", "text", window)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val input = MemoryStream[(Long, String)]
    val out = StreamingOps.spanCutAgainstStream(
      input.toDF.toDF("doc_id", "text"), "doc_id", "text", inv, window)
    val q = out.writeStream.format("memory").queryName("span_cut_fuzz_out")
      .outputMode("append").start()
    try {
      input.addData(batch: _*)
      q.processAllAvailable()
      val got = spark.table("span_cut_fuzz_out")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      withClue(s"seed=$seed: ") { got shouldBe expected }
    } finally q.stop()
  }

  it should "agree with the batch operator per micro-batch across 3+ batches (folded-inventory differential)" in {
    // the multi-batch form of the differential above: an uninterrupted
    // stream's batch-N output must equal removeRepeatedSpansAgainst on
    // the inventory FOLDED over batches 1..N-1 — the same identity
    // SpanCutRestartSpec exploits for the state lifecycle, here run
    // against the BATCH operator as the reference instead of a second
    // stream, over seeded corpora (rotate with -Dgraft.fuzz.seed)
    implicit val sqlCtx = spark.sqlContext
    val window = 3
    val seed = java.lang.Long.getLong("graft.fuzz.seed", 1330L)
    val rnd = new scala.util.Random(seed)
    val pool = Vector("aa bb cc dd", "ee ff gg hh", "ii jj kk ll",
      "mm nn oo pp")
    def randDoc(i: Long): String =
      (0 until 1 + rnd.nextInt(3)).map { _ =>
        if (rnd.nextBoolean()) pool(rnd.nextInt(pool.size))
        else (0 until 3 + rnd.nextInt(4))
          .map(_ => s"w${rnd.nextInt(40)}").mkString(" ")
      }.mkString(" ") + s" u$i"
    val corpus = (0L until 4L).map(i => (i, randDoc(i))).toDF("doc_id", "text")
    val inv0 = Dedup.spanInventoryTable(corpus, "doc_id", "text", window)
      .cache()
    inv0.count()
    val batches = (0 until 4).map { b =>
      val base = 100L * (b + 1)
      (base until base + 4 + rnd.nextInt(4)).map(i => (i, randDoc(i)))
    }
    val input = MemoryStream[(Long, String)]
    val out = StreamingOps.spanCutAgainstStream(
      input.toDF.toDF("doc_id", "text"), "doc_id", "text", inv0, window)
    val q = out.writeStream.format("memory").queryName("span_cut_multi_out")
      .outputMode("append").start()
    try {
      var inv = inv0
      var cumCut = 0L
      batches.foreach { b =>
        val before = spark.table("span_cut_multi_out")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
            r.getLong(3), r.getLong(4))).toSet
        input.addData(b: _*)
        q.processAllAvailable()
        val got = spark.table("span_cut_multi_out")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
            r.getLong(3), r.getLong(4))).toSet -- before
        val expected = Dedup.removeRepeatedSpansAgainst(
          inv, b.toDF("doc_id", "text"), "doc_id", "text", window)
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
            r.getLong(3), r.getLong(4))).toSet
        withClue(s"seed=$seed batch base ${b.head._1}: ") {
          got shouldBe expected
        }
        cumCut += got.count(_._4 > 0)
        inv = Dedup.foldSpanInventory(
          inv, b.toDF("doc_id", "text"), "doc_id", "text", window).cache()
        inv.count()
      }
      // non-triviality: the shared pool guarantees live cross-batch cuts
      withClue(s"seed=$seed cut nothing across 4 batches: ")(
        cumCut should be > 0L)
    } finally q.stop()
  }
}
