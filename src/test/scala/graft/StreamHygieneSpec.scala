package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Round-11 streaming state-hygiene items: the 16-byte binary
  * fingerprint state key, the corpus compaction fold, and the default
  * watermarked pair-collapse on the stateless near-dup streams. */
class StreamHygieneSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  "paragraphDedupStream" should "key its state on the 16-byte binary digest" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val out = StreamingOps.paragraphDedupStream(
      input.toDF.toDF("doc_id", "text"), "doc_id", "text")
    val keyTypes = out.queryExecution.analyzed.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.FlatMapGroupsWithState =>
        f.groupingAttributes.map(_.dataType)
    }.flatten
    keyTypes shouldBe Seq(org.apache.spark.sql.types.BinaryType)
  }

  it should "hold exactly one state row per distinct paragraph" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val out = StreamingOps.paragraphDedupStream(
      input.toDF.toDF("doc_id", "text"), "doc_id", "text")
    val q = out.writeStream.format("memory").queryName("hyg_state_out")
      .outputMode("append").start()
    try {
      input.addData((1L, "alpha\n\nbeta"), (2L, "beta\n\ngamma"))
      q.processAllAvailable()
      input.addData((3L, "alpha\n\ndelta"))
      q.processAllAvailable()
      // 4 distinct paragraphs -> 4 keys, duplicates add NO state rows
      val state = q.lastProgress.stateOperators
      state.map(_.numRowsTotal).sum shouldBe 4L
    } finally q.stop()
  }

  "foldParagraphFps" should "compact stream survivors back into the corpus table" in {
    implicit val sqlCtx = spark.sqlContext
    val corpus0 = Seq((1L, "seeded\n\nshared")).toDF("doc_id", "text")
    val fps0 = graft.pipeline.Dedup.paragraphFpTable(corpus0, "text")
      .localCheckpoint(eager = true)

    // run 1: admit two fresh paragraphs
    val in1 = MemoryStream[(Long, String)]
    val out1 = StreamingOps.paragraphDedupStream(
      in1.toDF.toDF("doc_id", "text"), "doc_id", "text", Some(fps0))
    val q1 = out1.writeStream.format("memory").queryName("hyg_fold_run1")
      .outputMode("append").start()
    val survivors1 =
      try {
        in1.addData((10L, "shared\n\nfresh one"), (11L, "fresh two"))
        q1.processAllAvailable()
        spark.table("hyg_fold_run1").collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      } finally q1.stop()
    survivors1.map(_._3).toSet shouldBe Set("fresh one", "fresh two")

    // compact: fold the survivors into the fingerprint table
    val fps1 = graft.pipeline.Dedup.foldParagraphFps(fps0,
      survivors1.toSeq.toDF("doc_id", "pos", "para"))
      .localCheckpoint(eager = true)
    fps1.count() shouldBe 4L // 2 seeded + 2 folded, distinct

    // run 2 (fresh checkpoint, widened corpus): a REPLAY of run 1's
    // batch admits nothing — the folded paragraphs are corpus state
    // now, dropped by the anti-join before reaching stream state —
    // while genuinely new text still survives
    val in2 = MemoryStream[(Long, String)]
    val out2 = StreamingOps.paragraphDedupStream(
      in2.toDF.toDF("doc_id", "text"), "doc_id", "text", Some(fps1))
    val q2 = out2.writeStream.format("memory").queryName("hyg_fold_run2")
      .outputMode("append").start()
    try {
      in2.addData((10L, "shared\n\nfresh one"), (11L, "fresh two"),
        (12L, "fresh one\n\nbrand new"))
      q2.processAllAvailable()
      val rows2 = spark.table("hyg_fold_run2").collect()
        .map(r => (r.getLong(0), r.getString(2))).toSet
      rows2 shouldBe Set((12L, "brand new"))
      // batch parity on the same widened corpus
      val batch = graft.pipeline.Dedup.dedupParagraphsAgainst(fps1,
        Seq((12L, "fresh one\n\nbrand new")).toDF("doc_id", "text"),
        "doc_id", "text")
      batch.select("text").as[String].head() shouldBe "brand new"
    } finally q2.stop()
  }

  "nearDupStream" should "collapse multi-band pairs by default given event time" in {
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Dedup
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank today"))
      .toDF("doc_id", "text")
    val corpusSigs = Dedup.minHashSignTable(corpus, "doc_id", "text")
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    // identical text -> every band agrees -> 16 raw pair rows
    val dupText =
      "the quick brown fox jumps over the lazy dog near the river bank today"

    val inRaw = MemoryStream[(Long, String, java.sql.Timestamp)]
    val raw = StreamingOps.nearDupStream(
      inRaw.toDF.toDF("doc_id", "text", "ts"), "doc_id", "text",
      corpusSigs, tsCol = Some("ts"), collapsePairs = false)
    val qRaw = raw.writeStream.format("memory").queryName("hyg_nd_raw")
      .outputMode("append").start()
    val rawCount = try {
      inRaw.addData((1L, dupText, ts(1)))
      qRaw.processAllAvailable()
      spark.table("hyg_nd_raw").count()
    } finally qRaw.stop()
    rawCount shouldBe 16L // the opt-out keeps the per-band contract

    val inC = MemoryStream[(Long, String, java.sql.Timestamp)]
    val collapsed = StreamingOps.nearDupStream(
      inC.toDF.toDF("doc_id", "text", "ts"), "doc_id", "text",
      corpusSigs, tsCol = Some("ts"))
    val qC = collapsed.writeStream.format("memory").queryName("hyg_nd_col")
      .outputMode("append").start()
    try {
      inC.addData((1L, dupText, ts(1)), (2L, "unrelated words entirely", ts(2)))
      qC.processAllAvailable()
      val rows = spark.table("hyg_nd_col")
        .select("idNew", "idCorpus").as[(Long, Long)].collect()
      rows.toSeq shouldBe Seq((1L, 100L)) // exactly once
    } finally qC.stop()
  }

  "mediaNearDupStream" should "collapse combination-key pairs by default" in {
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Multimodal
    val png = Multimodal.syntheticImagePng(64, seed = 3)
    val corpus = Seq(("c1", "image", png)).toDF("media_id", "kind", "bytes")
    val corpusSigs = Multimodal.mediaSignTable(corpus)
      .localCheckpoint(eager = true)
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)

    val in = MemoryStream[(String, String, Array[Byte], java.sql.Timestamp)]
    val out = StreamingOps.mediaNearDupStream(
      in.toDF.toDF("media_id", "kind", "bytes", "ts"), corpusSigs,
      tsCol = Some("ts"))
    val q = out.writeStream.format("memory").queryName("hyg_media_col")
      .outputMode("append").start()
    try {
      // identical image -> all C(8,2)=28 combination keys agree;
      // collapsed output must carry the pair exactly once
      in.addData(("n1", "image", png, ts(1)))
      q.processAllAvailable()
      val rows = spark.table("hyg_media_col")
        .select("kind", "idNew", "idCorpus").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      rows.toSeq shouldBe Seq(("image", "n1", "c1"))
    } finally q.stop()
  }
}
