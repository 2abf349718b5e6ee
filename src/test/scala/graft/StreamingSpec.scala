package graft

import graft.rdf.{TermKind, TermSchema, XSD}
import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import java.sql.Timestamp

class StreamingSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  "streaming dedup" should "drop repeated fingerprints within the watermark" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val out = StreamingOps.dedupStream(
      input.toDF.toDF("id", "text", "event_ts"), "text", "event_ts")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "hello world", ts("2024-01-01 10:00:00")),
        (2L, "hello world", ts("2024-01-01 10:00:05")), // dup within watermark
        (3L, "different text", ts("2024-01-01 10:00:10")))
      q.processAllAvailable()
      val rows = spark.table("dedup_out").select("id").as[Long].collect().toSet
      rows should have size 2
      rows should contain(3L)
      rows.intersect(Set(1L, 2L)) should have size 1
    } finally q.stop()
  }

  "streaming paragraph dedup" should
    "suppress corpus and cross-batch paragraph dups exactly once" in {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((1L, "old\n\nCOMMON")).toDF("doc_id", "text")
    val fps = graft.pipeline.Dedup.paragraphFpTable(corpus, "text")
    val input = MemoryStream[(Long, String)]
    val out = StreamingOps.paragraphDedupStream(
      input.toDF.toDF("doc_id", "text"), "doc_id", "text", Some(fps))
    val q = out.writeStream.format("memory").queryName("para_dedup_out")
      .outputMode("append").start()
    try {
      // batch 1: COMMON already in the corpus; "fresh" contested
      // within the batch — the minimal (id, pos) occurrence must win
      input.addData((10L, "fresh\n\nCOMMON"), (11L, "fresh\n\nnewer"))
      q.processAllAvailable()
      def rows() = spark.table("para_dedup_out")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      rows() shouldBe Set((10L, 0, "fresh"), (11L, 1, "newer"))
      // batch 2: "fresh" and "newer" arrive again — state suppresses
      // both; only the genuinely new paragraph appears, exactly once
      input.addData((12L, "fresh\n\nbrand"), (13L, "newer"))
      q.processAllAvailable()
      rows() shouldBe Set((10L, 0, "fresh"), (11L, 1, "newer"),
        (12L, 1, "brand"))
      // batch parity: the survivors' (id, paragraph) pairs equal the
      // batch operator's on the same documents (positions re-index in
      // the batch form's rebuilt text, so parity is on content)
      val allDocs = Seq((10L, "fresh\n\nCOMMON"), (11L, "fresh\n\nnewer"),
        (12L, "fresh\n\nbrand"), (13L, "newer")).toDF("doc_id", "text")
      val batchPairs = graft.pipeline.Dedup
        .dedupParagraphsAgainst(fps, allDocs, "doc_id", "text")
        .select(col("doc_id"), explode(split(col("text"), "\n\n")).as("p"))
        .filter(trim(col("p")) =!= "")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      rows().map(r => (r._1, r._3)) shouldBe batchPairs
    } finally q.stop()
  }

  it should "drop NULL-id documents instead of killing the query" in {
    // a dirty row with no id cannot claim first-occurrence identity;
    // before the guard it NPE'd inside the state operator's minBy and
    // terminated the whole stream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val out = StreamingOps.paragraphDedupStream(
      input.toDF.toDF("doc_id", "text"), "doc_id", "text")
    val q = out.writeStream.format("memory").queryName("para_nullid_out")
      .outputMode("append").start()
    try {
      input.addData((null.asInstanceOf[String], "orphan para"), ("d1", "kept"))
      q.processAllAvailable() // must not throw
      spark.table("para_nullid_out").collect()
        .map(r => (r.getString(0), r.getString(2))).toSet shouldBe
        Set(("d1", "kept"))
    } finally q.stop()
  }

  it should "agree with the batch operator on randomized batched corpora" in {
    // seeded differential: random documents built from a small
    // paragraph pool (forcing corpus, cross-batch and within-batch
    // dups), fed in id order across micro-batches — the stream's
    // surviving (id, paragraph) pairs must equal the batch operator's
    // on the concatenation. -Dgraft.fuzz.seed explores new corpora.
    implicit val sqlCtx = spark.sqlContext
    val seed = sys.props.get("graft.fuzz.seed").map(_.toInt).getOrElse(7)
    val rnd = new scala.util.Random(seed)
    val pool = (0 until 12).map(i => s"para pool item $i " + ("x" * rnd.nextInt(8)))
    def doc(): String =
      (0 until 1 + rnd.nextInt(4)).map(_ => pool(rnd.nextInt(pool.size)))
        .mkString("\n\n")
    val corpus = (1L to 5L).map(i => (i, doc())).toDF("doc_id", "text")
    val fps = graft.pipeline.Dedup.paragraphFpTable(corpus, "text")
      .localCheckpoint(eager = true)
    val batches = (0 until 4).map(b =>
      ((10L + b * 10L) until (10L + b * 10L + 1 + rnd.nextInt(5)))
        .map(i => (i, doc())))
    val input = MemoryStream[(Long, String)]
    val out = StreamingOps.paragraphDedupStream(
      input.toDF.toDF("doc_id", "text"), "doc_id", "text", Some(fps))
    val q = out.writeStream.format("memory").queryName("para_fuzz_out")
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val streamPairs = spark.table("para_fuzz_out")
        .collect().map(r => (r.getLong(0), r.getString(2))).toSet
      val allDocs = batches.flatten.toDF("doc_id", "text")
      val batchPairs = graft.pipeline.Dedup
        .dedupParagraphsAgainst(fps, allDocs, "doc_id", "text")
        .select(col("doc_id"), explode(split(col("text"), "\n\n")).as("p"))
        .filter(trim(col("p")) =!= "")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      withClue(s"seed=$seed: ") { streamPairs shouldBe batchPairs }
      // non-triviality: the pool guarantees live dups to suppress
      val totalParas = batches.flatten
        .map(_._2.split("\n\n").count(_.trim.nonEmpty)).sum
      withClue(s"seed=$seed suppressed nothing: ")(
        streamPairs.size should be < totalParas)
    } finally q.stop()
  }

  "streaming media near-dup" should
    "flag stream media against the signed corpus per kind" in {
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Multimodal
    import org.apache.spark.sql.Row
    val corpus = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, "image", Multimodal.syntheticImagePng(64, 1), Row(64, 64, null, "png")),
        Row(2L, "audio", Multimodal.syntheticWavPcm(2, 16000f), Row(null, null, 16000, "wav")),
        Row(3L, "video", Multimodal.syntheticMjpegAvi(3, 1), Row(48, 48, null, "avi"))),
      Multimodal.mediaSchema)
    val sigs = Multimodal.mediaSignTable(corpus).localCheckpoint(eager = true)
    val input = MemoryStream[(Long, String, Array[Byte])]
    val out = StreamingOps.mediaNearDupStream(
      input.toDF.toDF("media_id", "kind", "bytes"), sigs)
    val q = out.writeStream.format("memory").queryName("media_nd_out")
      .outputMode("append").start()
    try {
      input.addData(
        (10L, "image", Multimodal.syntheticImagePng(32, 1)), // rescaled copy
        (11L, "audio", Multimodal.syntheticWavPcm(2, 8000f)), // resampled copy
        (12L, "video", Multimodal.syntheticMjpegAvi(3, 2)),  // frame-doubled
        (13L, "image", Multimodal.syntheticImagePng(64, 40)), // fresh content
        (14L, "audio", "notaudio".getBytes))                 // undecodable
      q.processAllAvailable()
      // a pair may surface once per agreeing combination key —
      // collapse to the pair set (the documented stateless contract)
      spark.table("media_nd_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet shouldBe
        Set(("image", 10L, 1L), ("audio", 11L, 2L), ("video", 12L, 3L))
    } finally q.stop()
  }

  "streaming decontamination" should "drop contaminated rows map-only" in {
    implicit val sqlCtx = spark.sqlContext
    val passage = "which spark operator shuffles the most data overall in production"
    val bench = Seq((201L, passage), (202L, "tiny eval string"))
      .toDF("bench_id", "text")
    val input = MemoryStream[(Long, String)]
    val out = StreamingOps.decontaminateStream(
      input.toDF.toDF("doc_id", "text"), "text", bench, "bench_id", "text")
    val q = out.writeStream.format("memory").queryName("decontam_out")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, s"a training doc embedding the question $passage plus extra words"),
        (2L, "an unrelated training document about parquet row groups"),
        (3L, "tiny eval string"),
        (4L, null.asInstanceOf[String]))
      q.processAllAvailable()
      val rows = spark.table("decontam_out").select("doc_id")
        .as[Long].collect().toSet
      rows shouldBe Set(2L, 4L) // 1 and 3 are contaminated; NULL survives
    } finally q.stop()
  }

  "streaming span cut" should "rewrite arriving docs against a span bank map-only" in {
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Dedup
    val boiler = "this content is provided as is without warranty of any kind either express"
    val bankSrc = Seq((300L, boiler)).toDF("doc_id", "text")
    // the inventory keeps EVERY window hash (no minDocs gate) — a
    // bank is a curated list, membership is the whole contract
    val bank = Dedup.spanBankSet(
      Dedup.spanInventoryTable(bankSrc, "doc_id", "text"))
    val input = MemoryStream[(Long, String)]
    val out = StreamingOps.spanCutStream(
      input.toDF.toDF("doc_id", "text"), "doc_id", "text", bank)
    val q = out.writeStream.format("memory").queryName("spancut_out")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, s"unique leading words $boiler unique trailing words"),
        (2L, "a clean document with no boilerplate in it at all today"))
      q.processAllAvailable()
      val rows = spark.table("spancut_out")
        .select("doc_id", "text_clean", "removed_tokens", "n_spans")
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      // 13-token boilerplate at positions 3..15: windows 3..8 are
      // fully inside it; windows 0..2 and 9+ cross into unique text.
      // Island [3, 8] → cut [3, min(8+8,19)-1=15]: exactly the
      // boilerplate; both unique flanks survive.
      rows(1L) shouldBe (("unique leading words unique trailing words", 13L, 1L))
      rows(2L)._2 shouldBe 0L
    } finally q.stop()
  }

  "streaming near-dup" should "flag stream docs against a signed static corpus" in {
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Dedup
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (101L, "completely different content about spark query engines and columnar execution"))
      .toDF("doc_id", "text")
    val corpusSigs = Dedup.minHashSignTable(corpus, "doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val out = StreamingOps.nearDupStream(
      input.toDF.toDF("doc_id", "text"), "doc_id", "text", corpusSigs,
      threshold = 0.5)
    val q = out.writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
        (2L, "nothing remotely similar to anything in the reference corpus at all"))
      q.processAllAvailable()
      val rows = spark.table("neardup_out")
        .select("idNew", "idCorpus").as[(Long, Long)].collect().toSet
      rows should contain((1L, 100L)) // near-dup across stream/static
      rows.exists(_._1 == 2L) shouldBe false
      rows.foreach { case (_, c) => c should be >= 100L } // corpus side only
    } finally q.stop()
  }

  "streaming embedding near-dup" should
    "flag stream vectors against a signed static corpus, with batch parity" in {
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Dedup
    val dim = 8
    def vec(base: Float, bump: Float): Seq[Float] =
      (0 until dim).map(i => if (i == 0) base + bump else base + i * 0.1f)
    val corpus = Seq(
      (100L, vec(1.0f, 0f)),
      (101L, vec(-2.0f, 0f))).toDF("vec_id", "embedding")
    val corpusSigs = Dedup.embeddingSignTable(
      corpus, "vec_id", "embedding", dim, numPlanes = 4, portable = true)
    // batch expectation over the same rows: the parity anchor
    val batchRows = Seq(
      (1L, vec(1.0f, 0.001f)),     // near-dup of 100
      (2L, Seq.fill(dim)(0.3f)),   // unrelated direction
      (3L, null.asInstanceOf[Seq[Float]]))
    val expected = Dedup.embeddingCandidatesAgainst(
      Dedup.embeddingSignTable(batchRows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", dim, numPlanes = 4, portable = true),
      corpusSigs, threshold = 0.95)
      .select("idNew", "idCorpus").as[(Long, Long)].collect().toSet
    expected should contain((1L, 100L))
    val input = MemoryStream[(Long, Seq[Float])]
    val out = StreamingOps.embeddingNearDupStream(
      input.toDF.toDF("vec_id", "embedding"), "vec_id", "embedding",
      corpusSigs, dim, numPlanes = 4, threshold = 0.95, portable = true)
    val q = out.writeStream.format("memory").queryName("emb_neardup_out")
      .outputMode("append").start()
    try {
      input.addData(batchRows.map { case (id, v) => (id, v) }: _*)
      q.processAllAvailable()
      val got = spark.table("emb_neardup_out")
        .select("idNew", "idCorpus").as[(Long, Long)].collect().toSet
      got shouldBe expected
    } finally q.stop()
  }

  "streaming curation" should "attach signals and filter incrementally" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val out = StreamingOps.curateStream(
      input.toDF.toDF("id", "text"), "text", minQuality = 0.2)
    val q = out.writeStream.format("memory").queryName("curate_out")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "the quick brown fox jumps over the lazy dog and runs to the river"),
        (2L, "!!!! ???? ####")) // punctuation garbage → filtered
      q.processAllAvailable()
      val rows = spark.table("curate_out")
      rows.count() shouldBe 1
      rows.select("lang_pred").head().getString(0) shouldBe "en"
      rows.select("n_tokens").head().getLong(0) shouldBe 14
    } finally q.stop()
  }

  it should "gate on the trained model score when asked" in {
    // the heuristic passes keyword-stuffed spam (real words, ok
    // length); the trained NB model is what catches it — Some(0) is
    // the NB decision boundary, and the stream stays a pure map
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val out = StreamingOps.curateStream(
      input.toDF.toDF("id", "text"), "text", minQuality = 0.2,
      minModelScore = Some(0L))
    val q = out.writeStream.format("memory").queryName("curate_model_out")
      .outputMode("append").start()
    try {
      val spam = "buy cheap watches best price discount watches free " +
        "shipping buy now limited offer sale sale sale click here today"
      val prose = "glaciers form where winter snowfall exceeds summer melt " +
        "so the accumulating snow compresses into dense ice that flows downhill"
      input.addData((1L, prose), (2L, spam))
      q.processAllAvailable()
      // sanity: BOTH pass the heuristic gate alone — the model is the
      // discriminating stage
      Seq(spam, prose).toDF("t")
        .select(graft.pipeline.TextAnalysis.qualityScore(col("t")))
        .as[Double].collect().foreach(_ should be >= 0.2)
      val rows = spark.table("curate_model_out")
      rows.select("id").as[Long].collect().toSeq shouldBe Seq(1L)
      rows.select("model_score").as[Long].head() should be > 0L
    } finally q.stop()
  }

  "the streaming curation chain" should
    "compose dedup → decontaminate → curate → sample with batch parity" in {
    // the q_pipeline_e2e chain's streaming face: the SAME operator
    // calls chain over a stream — dedup is the only stateful stage,
    // everything downstream stays map-only and fuses incrementally
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.{Dedup, Sampling, TextAnalysis}
    val passage = "which spark operator shuffles the most data overall in production today"
    val bench = Seq((900L, passage)).toDF("bench_id", "btext")
    // ids chosen against the portable sample buckets at fraction
    // 0.93: the dup pair (2,3) falls INSIDE the sample under either
    // survivor, so the paths' different dedup tie-breaks (arrival vs
    // min id) cannot leak into the sampler; 31 is the sampled-out doc
    val rows = Seq(
      (2L, "the quick brown fox jumps over the lazy dog and runs to the river",
        ts("2024-01-01 10:00:00")),
      (3L, "the quick brown fox jumps over the lazy dog and runs to the river",
        ts("2024-01-01 10:00:01")), // exact dup → one survives
      (5L, s"a long training document embedding $passage plus extra words here",
        ts("2024-01-01 10:00:02")), // contaminated → dropped
      (7L, "another clean document about parquet row groups and columnar reads",
        ts("2024-01-01 10:00:03")),
      (8L, "!!!! ???? ####", ts("2024-01-01 10:00:04")), // junk → dropped
      (31L, "a perfectly fine document that the deterministic sampler excludes",
        ts("2024-01-01 10:00:05"))) // bucket 985400 ≥ 930000 → sampled out

    val input = MemoryStream[(Long, String, Timestamp)]
    val chained = Sampling.deterministicSample(
      StreamingOps.curateStream(
        StreamingOps.decontaminateStream(
          StreamingOps.dedupStream(
            input.toDF.toDF("doc_id", "text", "event_ts"),
            "text", "event_ts"),
          "text", bench, "bench_id", "btext"),
        "text", minQuality = 0.2),
      "doc_id", fraction = 0.93, portable = true)
    chained.isStreaming shouldBe true
    val q = chained.writeStream.format("memory")
      .queryName("curation_chain_out").outputMode("append").start()
    val streamTexts = try {
      input.addData(rows: _*)
      q.processAllAvailable()
      spark.table("curation_chain_out").select("text").as[String]
        .collect().sorted.toSeq
    } finally q.stop()

    // batch replay of the same chain over the same rows (dedup keeps
    // ONE of each text group on both paths; compare surviving TEXTS —
    // arrival order picks the stream's survivor, min id the batch's)
    val batch = Sampling.deterministicSample(
      Dedup.exact(rows.toDF("doc_id", "text", "event_ts"), "text", "doc_id")
        .transform(d => graft.pipeline.Decontaminate.clean(
          d, "doc_id", "text", bench, "bench_id", "btext"))
        .withColumn("quality", TextAnalysis.qualityScore(col("text")))
        .filter(col("quality") >= 0.2),
      "doc_id", fraction = 0.93, portable = true)
    val batchTexts = batch.select("text").as[String].collect().sorted.toSeq
    streamTexts shouldBe batchTexts
    streamTexts.exists(_.contains("quick brown fox")) shouldBe true
    streamTexts.exists(_.contains(passage)) shouldBe false
  }

  "streaming event aggregation" should "count per window and type with watermark" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val out = StreamingOps.eventCounts(
      input.toDF.toDF("event_ts", "event_type", "value"), "event_ts")
    val q = out.writeStream.format("memory").queryName("events_out")
      .outputMode("complete").start()
    try {
      input.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 10:35:00"), "click", 2.0),
        (ts("2024-01-01 11:05:00"), "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("events_out")
        .select("event_type", "n", "total_value").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      rows shouldBe Set(("click", 2L, 3.0), ("view", 1L, 5.0))
    } finally q.stop()
  }

  "streaming SPARQL" should "run the stateless subset incrementally over a quad stream" in {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.{col, struct, lit}
    val input = MemoryStream[(String, String, String)]
    // build term-struct quads from a stream of (s, p, o-literal) strings
    def iri(c: org.apache.spark.sql.Column) = struct(
      lit(TermKind.IRI).as("kind"), c.as("lex"),
      lit("").as("dt"), lit("").as("lang"))
    def str(c: org.apache.spark.sql.Column) = struct(
      lit(TermKind.LITERAL).as("kind"), c.as("lex"),
      lit(XSD.string).as("dt"), lit("").as("lang"))
    val quadsStream = input.toDF.toDF("s0", "p0", "o0").select(
      iri(col("s0")).as("s"), iri(col("p0")).as("p"),
      str(col("o0")).as("o"),
      lit(null).cast(TermSchema.termType).as("g"))
    val out = StreamingOps.sparqlStream(quadsStream,
      """SELECT ?who ?greet
        |{ ?who <urn:p:says> ?greet .
        |  FILTER(STRSTARTS(?greet, "h"))
        |  BIND(UCASE(?greet) AS ?up) }""".stripMargin)
    val q = out.writeStream.format("memory").queryName("sparql_out")
      .outputMode("append").start()
    try {
      input.addData(
        ("urn:a", "urn:p:says", "hello"),
        ("urn:b", "urn:p:says", "goodbye"), // filtered out
        ("urn:c", "urn:p:other", "hello")) // wrong predicate
      q.processAllAvailable()
      val rows = spark.table("sparql_out").collect().map(r =>
        (r.getStruct(0).getString(1), r.getStruct(1).getString(1))).toSet
      rows shouldBe Set(("urn:a", "hello"))
    } finally q.stop()
  }

  it should "join a quad stream against a registered SERVICE dataset" in {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, struct, lit}
    import graft.io.QuadsIO
    import graft.rdf.{Iri, Lit, Quad}
    val E = "urn:ss:"
    graft.sparql.Sparql.registerService(E + "dim", QuadsIO.fromQuads(spark, Seq(
      Quad(Iri(E + "acme"), Iri(E + "city"), Lit("Springfield"), None))))
    try {
      val input = MemoryStream[(String, String)]
      def iri(c: org.apache.spark.sql.Column) = struct(
        lit(TermKind.IRI).as("kind"), c.as("lex"),
        lit("").as("dt"), lit("").as("lang"))
      val quadsStream = input.toDF.toDF("s0", "o0").select(
        iri(col("s0")).as("s"), iri(lit(E + "worksAt")).as("p"),
        iri(col("o0")).as("o"), lit(null).cast(TermSchema.termType).as("g"))
      // service side is STATIC → Spark plans a stream-static join
      val out = StreamingOps.sparqlStream(quadsStream,
        s"""SELECT ?p ?city
           |{ ?p <${E}worksAt> ?co .
           |  SERVICE <${E}dim> { ?co <${E}city> ?city } }""".stripMargin)
      val q = out.writeStream.format("memory").queryName("svc_out")
        .outputMode("append").start()
      try {
        input.addData((E + "alice", E + "acme"), (E + "bob", E + "unknown"))
        q.processAllAvailable()
        val rows = spark.table("svc_out").collect().map(r =>
          (r.getStruct(0).getString(1), r.getStruct(1).getString(1))).toSet
        rows shouldBe Set((E + "alice", "Springfield"))
      } finally q.stop()
    } finally graft.sparql.Sparql.unregisterService(E + "dim")
  }

  "streaming SPARQL aggregation" should
    "fold micro-batches into running groups, matching the batch replay" in {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, struct, lit}
    val input = MemoryStream[(String, String, String)]
    def iri(c: org.apache.spark.sql.Column) = struct(
      lit(TermKind.IRI).as("kind"), c.as("lex"),
      lit("").as("dt"), lit("").as("lang"))
    def intLit(c: org.apache.spark.sql.Column) = struct(
      lit(TermKind.LITERAL).as("kind"), c.as("lex"),
      lit(XSD.integer).as("dt"), lit("").as("lang"))
    def toQuads(df: org.apache.spark.sql.DataFrame) =
      df.toDF("s0", "p0", "v0").select(
        iri(col("s0")).as("s"), iri(col("p0")).as("p"),
        intLit(col("v0")).as("o"),
        lit(null).cast(TermSchema.termType).as("g"))
    val query =
      """SELECT ?p (COUNT(*) AS ?n) (SUM(?v) AS ?total)
        |{ ?s ?p ?v } GROUP BY ?p HAVING (COUNT(*) >= 2)""".stripMargin
    val out = StreamingOps.sparqlStreamAgg(toQuads(input.toDF), query)
    // complete mode: the sink holds the WHOLE running aggregate table
    val q = out.writeStream.format("memory").queryName("sparql_agg_out")
      .outputMode("complete").start()
    def decode() = spark.table("sparql_agg_out").collect().toSeq.map { r =>
      (r.getStruct(0).getString(1), // ?p lex
        graft.rdf.TermSchema.fromRow(r.getStruct(1)).get.asInstanceOf[graft.rdf.Lit].lex,
        graft.rdf.TermSchema.fromRow(r.getStruct(2)).get.asInstanceOf[graft.rdf.Lit].lex)
    }.toSet
    val b1 = Seq(("urn:a", "urn:p:x", "1"), ("urn:b", "urn:p:x", "2"),
      ("urn:c", "urn:p:y", "5"))
    val b2 = Seq(("urn:d", "urn:p:y", "7"), ("urn:e", "urn:p:x", "4"))
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      // y has 1 row so far — HAVING (stateless, post-agg) hides it
      decode() shouldBe Set(("urn:p:x", "2", "3"))
      input.addData(b2: _*)
      q.processAllAvailable()
      decode() shouldBe Set(("urn:p:x", "3", "7"), ("urn:p:y", "2", "12"))
      // batch parity: the same query over the concatenated batches
      // through the BATCH engine gives the same groups
      import graft.sparql.Sparql._
      import spark.implicits._
      val staticDf = toQuads((b1 ++ b2).toDF("s0", "p0", "v0"))
      val batchRows = staticDf.sparql(query).collect().toSeq.map { r =>
        (r.getStruct(0).getString(1),
          graft.rdf.TermSchema.fromRow(r.getStruct(1)).get.asInstanceOf[graft.rdf.Lit].lex,
          graft.rdf.TermSchema.fromRow(r.getStruct(2)).get.asInstanceOf[graft.rdf.Lit].lex)
      }.toSet
      decode() shouldBe batchRows
    } finally q.stop()
  }

  it should "reject unstreamable aggregate shapes at submission" in {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, struct, lit}
    val input = MemoryStream[(String, String, String)]
    def iri(c: org.apache.spark.sql.Column) = struct(
      lit(TermKind.IRI).as("kind"), c.as("lex"),
      lit("").as("dt"), lit("").as("lang"))
    val quads = input.toDF.toDF("s0", "p0", "o0").select(
      iri(col("s0")).as("s"), iri(col("p0")).as("p"),
      iri(col("o0")).as("o"), lit(null).cast(TermSchema.termType).as("g"))
    def rejects(q: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        StreamingOps.sparqlStreamAgg(quads, q)
      }
      e.getMessage should include(needle)
    }
    rejects("SELECT (COUNT(DISTINCT ?s) AS ?n) { ?s ?p ?o }", "DISTINCT")
    rejects(
      "SELECT ?p (COUNT(*) AS ?n) { ?s ?p ?o } GROUP BY ?p ORDER BY ?n",
      "ORDER BY")
    rejects(
      "SELECT ?p (COUNT(*) AS ?n) { ?s ?p ?o } GROUP BY ?p LIMIT 3",
      "ORDER BY / LIMIT")
    rejects("SELECT ?s ?p { ?s ?p ?o }", "GROUP BY")
    // the stateless body rules still apply under the aggregate
    rejects(
      """SELECT ?p (COUNT(*) AS ?n)
        |{ ?s ?p ?o . FILTER NOT EXISTS { ?o ?q ?z } } GROUP BY ?p""".stripMargin,
      "EXISTS")
  }

  "streaming CONSTRUCT" should "instantiate templates per micro-batch" in {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, struct, lit}
    val input = MemoryStream[(String, String)]
    def iri(c: org.apache.spark.sql.Column) = struct(
      lit(TermKind.IRI).as("kind"), c.as("lex"),
      lit("").as("dt"), lit("").as("lang"))
    val quadsStream = input.toDF.toDF("s0", "o0").select(
      iri(col("s0")).as("s"), iri(lit("urn:p:knows")).as("p"),
      iri(col("o0")).as("o"),
      lit(null).cast(TermSchema.termType).as("g"))
    val out = StreamingOps.constructStream(quadsStream,
      """CONSTRUCT { ?b <urn:p:knownBy> ?a . ?a <urn:p:linked> "y" }
        |WHERE { ?a <urn:p:knows> ?b }""".stripMargin)
    val q = out.writeStream.format("memory").queryName("construct_out")
      .outputMode("append").start()
    try {
      input.addData(("urn:x", "urn:y"))
      q.processAllAvailable()
      val rows = spark.table("construct_out").collect().map(r =>
        (r.getStruct(0).getString(1), r.getStruct(1).getString(1),
          r.getStruct(2).getString(1))).toSet
      rows shouldBe Set(
        ("urn:y", "urn:p:knownBy", "urn:x"),
        ("urn:x", "urn:p:linked", "y"))
    } finally q.stop()
    // blank-node templates need per-solution materialization → rejected
    an[IllegalArgumentException] should be thrownBy
      StreamingOps.constructStream(quadsStream,
        "CONSTRUCT { ?a <urn:p:via> [] } WHERE { ?a <urn:p:knows> ?b }")
  }

  it should "reject stateful operators at submission time" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val quads = input.toDF.selectExpr(
      "named_struct('kind', 0, 'lex', _1, 'dt', '', 'lang', '') as s",
      "named_struct('kind', 0, 'lex', _2, 'dt', '', 'lang', '') as p",
      "named_struct('kind', 0, 'lex', _2, 'dt', '', 'lang', '') as o",
      "cast(null as struct<kind:int,lex:string,dt:string,lang:string>) as g")
    an[IllegalArgumentException] should be thrownBy
      StreamingOps.sparqlStream(quads,
        "SELECT (COUNT(?s) AS ?n) { ?s ?p ?o }")
    an[IllegalArgumentException] should be thrownBy
      StreamingOps.sparqlStream(quads,
        "SELECT ?s { ?s ?p ?o } ORDER BY ?s")
    // EXISTS hides inside a FILTER expression, not the Op tree — must
    // still be rejected at submission
    an[IllegalArgumentException] should be thrownBy
      StreamingOps.sparqlStream(quads,
        "SELECT ?s { ?s ?p ?o FILTER EXISTS { ?s <urn:q> ?v } }")
  }

  "streaming N-Triples ingest" should "emit quads as files arrive" in {
    val dir = java.nio.file.Files.createTempDirectory("graft-ntstream")
    val out = StreamingOps.ntriplesStream(spark, dir.toString,
      skipMalformed = true)
    val q = out.writeStream.format("memory").queryName("nt_stream_out")
      .outputMode("append").start()
    try {
      java.nio.file.Files.writeString(dir.resolve("batch1.nt"),
        "<urn:ns:a> <urn:ns:p> \"v1\" .\nnot a triple\n")
      q.processAllAvailable()
      java.nio.file.Files.writeString(dir.resolve("batch2.nq"),
        "<urn:ns:b> <urn:ns:p> \"v2\" <urn:ns:g> .\n")
      q.processAllAvailable()
      val rows = spark.table("nt_stream_out")
        .select(col("s.lex"), col("o.lex"), col("g.lex")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      rows shouldBe Set(("urn:ns:a", "v1", null),
        ("urn:ns:b", "v2", "urn:ns:g"))
    } finally q.stop()
  }

  "streaming whole-file RDF ingest" should
    "emit quads as Turtle/TriX files arrive" in {
    val dir = java.nio.file.Files.createTempDirectory("graft-filestream")
    val out = StreamingOps.rdfFilesStream(spark, dir.toString)
    val q = out.writeStream.format("memory").queryName("rdffile_stream_out")
      .outputMode("append").start()
    try {
      java.nio.file.Files.writeString(dir.resolve("first.ttl"),
        "@prefix : <urn:fs:> . :a :p \"ttl\" .")
      q.processAllAvailable()
      java.nio.file.Files.writeString(dir.resolve("second.trix"),
        """<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/"><graph>
          |<uri>urn:fs:g</uri>
          |<triple><uri>urn:fs:b</uri><uri>urn:fs:p</uri>
          |<plainLiteral>trix</plainLiteral></triple></graph></TriX>"""
          .stripMargin)
      q.processAllAvailable()
      val rows = spark.table("rdffile_stream_out")
        .select(col("s.lex"), col("o.lex"), col("g.lex")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      rows shouldBe Set(("urn:fs:a", "ttl", null),
        ("urn:fs:b", "trix", "urn:fs:g"))
    } finally q.stop()
  }

  "streaming interval join" should
    "reject prefix collisions before any stream starts" in {
    val l = Seq((1L, ts("2024-01-01 10:00:00"), "x"))
      .toDF("user_id", "event_ts", "r_view") // collides with prefixed right
    val r = Seq((1L, ts("2024-01-01 10:00:00"), "v"))
      .toDF("user_id", "event_ts", "view")
    an[IllegalArgumentException] should be thrownBy
      StreamingOps.intervalJoinStream(l, r, "user_id", "event_ts",
        "-1 hour", "0 seconds", "2 hours")
    an[IllegalArgumentException] should be thrownBy
      StreamingOps.intervalJoinStream(r, l, "user_id", "event_ts",
        "-1 hour", "0 seconds", "2 hours") // right already prefixed
  }

  it should "pair events within the window and only those" in {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val views = MemoryStream[(Long, Timestamp, String)]
    val out = StreamingOps.intervalJoinStream(
      clicks.toDF.toDF("user_id", "event_ts", "click"),
      views.toDF.toDF("user_id", "event_ts", "view"),
      "user_id", "event_ts",
      lowerBound = "-1 hour", upperBound = "0 seconds",
      watermark = "2 hours")
    val q = out.writeStream.format("memory").queryName("ivj_out")
      .outputMode("append").start()
    try {
      views.addData(
        (1L, ts("2024-01-01 10:00:00"), "v-in"),      // 30 min before
        (1L, ts("2024-01-01 08:00:00"), "v-too-old"), // > 1h before
        (1L, ts("2024-01-01 11:00:00"), "v-after"),   // after the click
        (2L, ts("2024-01-01 10:00:00"), "v-other-user"))
      clicks.addData((1L, ts("2024-01-01 10:30:00"), "c1"))
      q.processAllAvailable()
      val rows = spark.table("ivj_out")
        .select("click", "r_view").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      rows shouldBe Set(("c1", "v-in"))
    } finally q.stop()
  }

  "streaming funnel" should
    "carry per-key state forward and honor late out-of-order events" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val out = StreamingOps.funnelStream(
      input.toDF.toDF("user_id", "step", "t"),
      "user_id", "step", "t", Seq("signup", "click", "buy"))
    // the emitted key keeps the INPUT's type, matching batch funnel —
    // stream output joins back to batch results with no cast
    out.schema("user_id").dataType shouldBe
      org.apache.spark.sql.types.LongType
    // keys whose string round-trip is lossy are rejected loudly
    an[IllegalArgumentException] should be thrownBy StreamingOps.funnelStream(
      input.toDF.toDF("user_id", "step", "t")
        .withColumn("user_id", col("user_id").cast("string").cast("binary")),
      "user_id", "step", "t", Seq("signup"))
    an[IllegalArgumentException] should be thrownBy StreamingOps.funnelStream(
      input.toDF.toDF("user_id", "step", "t")
        .withColumn("user_id", col("user_id").cast("double")),
      "user_id", "step", "t", Seq("signup"))
    val q = out.writeStream.format("memory").queryName("funnel_stream_out")
      .outputMode("update").start()
    def depths() = spark.table("funnel_stream_out")
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.last("funnel_depth").as("d"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("d"))
      .toMap
    try {
      input.addData((1L, "signup", 10L), (2L, "click", 5L))
      q.processAllAvailable()
      // batch 1: user 1 reached depth 1; user 2 clicked before any
      // signup → 0
      depths() shouldBe Map(1L -> 1, 2L -> 0)
      input.addData((1L, "click", 20L), (1L, "buy", 30L), (2L, "signup", 3L))
      q.processAllAvailable()
      // state carried across batches: user 1 completes; user 2's LATE
      // signup at t=3 lands before the click → depth 2
      depths() shouldBe Map(1L -> 3, 2L -> 2)
      input.addData((1L, "click", 5L)) // late event BREAKS user 1's order
      q.processAllAvailable()
      depths()(1L) shouldBe 1 // click min now precedes signup
    } finally q.stop()
  }

  "streaming sessionization" should
    "emit a session only after the watermark closes it" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val out = StreamingOps.sessionizeStream(
      input.toDF.toDF("user_id", "event_ts", "value"),
      "user_id", "event_ts", gap = "10 minutes", watermark = "30 minutes",
      aggs = Seq(org.apache.spark.sql.functions.sum(col("value"))
        .as("total_value")))
    val q = out.writeStream.format("memory").queryName("session_stream_out")
      .outputMode("append").start()
    try {
      input.addData(
        (7L, ts("2024-01-01 10:00:00"), 1.0),
        (7L, ts("2024-01-01 10:05:00"), 2.0), // merges: gap 5 min
        (8L, ts("2024-01-01 10:00:00"), 4.0))
      q.processAllAvailable()
      // sessions still open (watermark hasn't passed their close)
      spark.table("session_stream_out").count() shouldBe 0L
      // an event far in the future moves the watermark past 10:15+gap
      input.addData((9L, ts("2024-01-01 12:00:00"), 0.0))
      q.processAllAvailable()
      val rows = spark.table("session_stream_out")
        .collect().map(r => (r.getAs[Long]("user_id"),
          r.getAs[Long]("n_events"), r.getAs[Double]("total_value"),
          r.getAs[Timestamp]("session_start"))).toSet
      rows shouldBe Set(
        (7L, 2L, 3.0, ts("2024-01-01 10:00:00")), // merged 2-event session
        (8L, 1L, 4.0, ts("2024-01-01 10:00:00")))
    } finally q.stop()
  }
}
