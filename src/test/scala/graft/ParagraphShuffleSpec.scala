package graft

import graft.pipeline.Dedup
import org.apache.spark.GraftListenerBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Scale evidence for the paragraph dedups: paragraph TEXT does not
  * cross shuffle exchanges — only (id, pos, fingerprint) ints do, so
  * the shuffled volume is sized by paragraph COUNT and duplicate
  * fraction, never by corpus text bytes. The previous shape semi-joined
  * and re-grouped the text-bearing frame (~2× corpus text over the
  * wire); this spec pins the rewrite by measuring actual shuffle-write
  * bytes against the corpus text volume with poorly-compressible
  * paragraphs, so a regression that routes text back through an
  * exchange fails loudly. */
class ParagraphShuffleSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  // pseudo-random hex paragraphs: ~4 bits/char of entropy, so lz4
  // cannot hide a shuffled-text regression behind compression
  private def para(doc: Int, k: Int): String = {
    val rnd = new scala.util.Random(doc * 31 + k)
    Seq.fill(12)(f"${rnd.nextLong()}%016x${rnd.nextLong()}%016x").mkString(" ")
  }

  // 500 docs × 6 paragraphs, each doc sharing one paragraph with its
  // predecessor and repeating one of its own — both dup classes present
  private lazy val corpus = (1 to 500).map { d =>
    val own = (0 to 3).map(k => para(d, k))
    val shared = para(math.max(1, d - 1), 0)
    (d.toLong, (own :+ shared :+ own.head).mkString("\n\n"))
  }.toDF("doc_id", "text")

  private def shuffleWireBytes(df: DataFrame): Long = {
    val wire = new java.util.concurrent.atomic.AtomicLong()
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) wire.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // materialize EVERY output row including the rebuilt text — a
      // count() would let Catalyst prune the text column and hide a
      // text-bearing exchange from the measurement
      df.queryExecution.executedPlan.execute()
        .foreachPartition((_: Iterator[_]) => ())
      GraftListenerBridge.waitUntilEmpty(spark.sparkContext)
      wire.get
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  "dedupParagraphs" should "shuffle a small fraction of the corpus text bytes" in {
    val textBytes =
      corpus.selectExpr("sum(length(text)) AS b").head().getLong(0)
    textBytes should be > 1000000L // the measurement needs real volume

    val out = Dedup.dedupParagraphs(corpus, "doc_id", "text")
    val wire = shuffleWireBytes(out)
    info(f"corpus text $textBytes%,d B, shuffled $wire%,d B " +
      f"(${wire.toDouble / textBytes * 100}%.1f%%)")
    // int-only election + broadcast removal join: measured ~2-4%; the
    // old text-bearing shape measured >100%. 30% is the loud floor.
    wire should be < (textBytes * 3 / 10)
    // and the result is still the dedup (first occurrence survives):
    // every shared paragraph exists exactly once corpus-wide
    val paras = out.select(explode(split(col("text"), "\n\n")).as("p"))
      .filter(trim(col("p")) =!= "")
    paras.count() shouldBe paras.distinct().count()
  }

  it should "keep the incremental form's batch text out of exchanges too" in {
    val fps = Dedup.paragraphFpTable(corpus, "text")
      .localCheckpoint(eager = true) // corpus state, built once
    val batch = (301 to 450).map { d =>
      val own = (0 to 3).map(k => para(d, k))
      // one paragraph the corpus already holds, one batch-internal dup
      (d.toLong, (own :+ para(1, 0) :+ para(math.max(301, d - 1), 1))
        .mkString("\n\n"))
    }.toDF("doc_id", "text")
    val textBytes =
      batch.selectExpr("sum(length(text)) AS b").head().getLong(0)

    val out = Dedup.dedupParagraphsAgainst(fps, batch, "doc_id", "text")
    val wire = shuffleWireBytes(out)
    info(f"batch text $textBytes%,d B, shuffled $wire%,d B " +
      f"(${wire.toDouble / textBytes * 100}%.1f%%)")
    wire should be < (textBytes * 3 / 10)
    // corpus-held paragraphs are gone from the batch output entirely
    out.filter(col("text").contains(para(1, 0))).count() shouldBe 0
  }
}
