package graft

import graft.pipeline.Dedup
import graft.streaming.StreamingOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Streaming span-cut STATE LIFECYCLE (round-17, verdict item #2): the
  * 100 TB deployment answer for [[StreamingOps.spanCutAgainstStream]]'s
  * NoTimeout state. Recipe: periodically stop the stream, fold the
  * processed documents into the persisted inventory with
  * [[Dedup.foldSpanInventory]], restart against the folded inventory
  * with a FRESH checkpoint (zero state). Parity is exact because batch
  * ids are new each batch (the incremental contract): the stream
  * state's per-hash distinct-doc count equals the delta the fold adds
  * to `docs`, so every post-restart union count
  * `batch + 0 + folded-corpus` equals the uninterrupted
  * `batch + state + corpus`. This spec drives the SAME seeded
  * micro-batches through (a) one uninterrupted stream and (b) a
  * fold-and-restart after EVERY batch, and requires identical output. */
class SpanCutRestartSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val window = 3

  private def collectRows(table: String): Set[(Long, String, Long, Long, Long)] =
    spark.table(table).collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) null else r.getString(1),
      r.getLong(2), r.getLong(3), r.getLong(4))).toSet

  private def randBatches(seed: Long): (DataFrame, Seq[Seq[(Long, String)]]) = {
    val rnd = new scala.util.Random(seed)
    val pool = Vector("aa bb cc dd", "ee ff gg hh", "ii jj kk ll",
      "mm nn oo pp", "qq rr ss tt")
    def randDoc(i: Long): String =
      (0 until 1 + rnd.nextInt(3)).map { _ =>
        if (rnd.nextBoolean()) pool(rnd.nextInt(pool.size))
        else (0 until 3 + rnd.nextInt(4))
          .map(_ => s"w${rnd.nextInt(40)}").mkString(" ")
      }.mkString(" ") + s" u$i" // unique tail keeps docs distinct
    val corpus = (0L until 5L).map(i => (i, randDoc(i))).toDF("doc_id", "text")
    // 3 micro-batches of fresh ids — shared pool spans recur across
    // batches, so state genuinely carries across the restart boundary
    val batches = Seq(
      (100L until 106L).map(i => (i, randDoc(i))),
      (200L until 206L).map(i => (i, randDoc(i))),
      (300L until 306L).map(i => (i, randDoc(i))))
    (corpus, batches)
  }

  it should "admit and cut identically after a fold-and-restart at every batch boundary" in {
    implicit val sqlCtx = spark.sqlContext
    val seed = java.lang.Long.getLong("graft.fuzz.seed", 1328L)
    val (corpus, batches) = randBatches(seed)
    val inv0 = Dedup.spanInventoryTable(corpus, "doc_id", "text", window)
      .cache()
    inv0.count()

    // (a) uninterrupted: one stream, one state, three batches
    val inputA = MemoryStream[(Long, String)]
    val outA = StreamingOps.spanCutAgainstStream(
      inputA.toDF.toDF("doc_id", "text"), "doc_id", "text", inv0, window)
    val qA = outA.writeStream.format("memory").queryName("restart_a")
      .outputMode("append").start()
    val uninterrupted = try {
      batches.map { b =>
        val before = collectRows("restart_a")
        inputA.addData(b: _*)
        qA.processAllAvailable()
        collectRows("restart_a") -- before
      }
    } finally qA.stop()

    // (b) fold-restart: a fresh stream + folded inventory per batch
    var inv = inv0
    val folded = batches.zipWithIndex.map { case (b, i) =>
      val input = MemoryStream[(Long, String)]
      val out = StreamingOps.spanCutAgainstStream(
        input.toDF.toDF("doc_id", "text"), "doc_id", "text", inv, window)
      val q = out.writeStream.format("memory").queryName(s"restart_b$i")
        .outputMode("append").start()
      val got = try {
        input.addData(b: _*)
        q.processAllAvailable()
        collectRows(s"restart_b$i")
      } finally q.stop()
      // snapshot-state-into-inventory: the documents this segment
      // processed fold in; the next segment restarts with zero state
      inv = Dedup.foldSpanInventory(
        inv, b.toDF("doc_id", "text"), "doc_id", "text", window).cache()
      inv.count()
      got
    }

    withClue(s"seed=$seed: ") {
      uninterrupted.head should not be empty
      folded shouldBe uninterrupted
    }
  }
}
