package graft

import graft.functions.QualityExprs
import graft.pipeline.Quality
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Regressions for the four round-16 ADVICE items.
  *
  *  1. StreamingOps doc ordering (embeddingNearDupStream orphaning
  *     mediaNearDupStream's scaladoc) — structural, fixed by moving
  *     the def below mediaNearDupStream; nothing executable to pin.
  *  2. QualityScoreExpr now scores NULL text as (0, 0) through the
  *     EXPRESSION path too (was: nullSafeEval → NULL struct,
  *     contradicting score()'s documented contract).
  *  3. trainQualityWeights now ignores NULL-label rows (was: counted
  *     as the negative class, corrupting the model).
  *  4. spanCutAgainstStream's keyed passes stream their iterators once
  *     (no full-row Seq materialization) — behavior parity on a
  *     hot-hash batch pinned here; the memory bound is documentation.
  */
class Round17AdviceSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  behavior of "QualityScoreExpr NULL handling (advice #2)"

  it should "score NULL text as (0, 0) with keep=false through scoreWith" in {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, null.asInstanceOf[String]), (3L, "   ")).toDF("id", "text")
    val got = Quality.scoreWith(df, "text")
      .select("id", "score", "n_grams", "keep")
      .collect().map(r => r.getLong(0) ->
        ((r.isNullAt(1), r.getLong(1), r.getInt(2), r.getBoolean(3)))).toMap
    // NULL text is gram-free, not unscorable: non-NULL (0, 0), kept
    // in the frame (keep=false only because 0 > 0 fails)
    got(2L) shouldBe ((false, 0L, 0, false))
    got(3L) shouldBe ((false, 0L, 0, false))
    got(1L)._3 should be > 0
  }

  it should "agree between the interpreted eval and codegen paths on NULL" in {
    // codegen path (normal execution, shared session)
    val df = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
      .withColumn("qs", QualityExprs.qualityModelScoreCol(col("text")))
    val r1 = df.select("qs.score", "qs.n_grams").head()
    (r1.isNullAt(0), r1.getLong(0), r1.getInt(1)) shouldBe ((false, 0L, 0))
    // interpreted path: conf mutations isolated on a child session so
    // the shared TestSpark conf (wholeStage, factoryMode) is never
    // touched — suites run in parallel on it (round-17 advice #1)
    val iso = spark.newSession()
    iso.conf.set("spark.sql.codegen.wholeStage", "false")
    iso.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    import iso.implicits._
    val df2 = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
      .withColumn("qs", QualityExprs.qualityModelScoreCol(col("text")))
    val r2 = df2.select("qs.score", "qs.n_grams").head()
    (r2.isNullAt(0), r2.getLong(0), r2.getInt(1)) shouldBe ((false, 0L, 0))
    // and the shared session's codegen confs were left alone (defaults:
    // wholeStage on, factoryMode FALLBACK — not the isolated overrides)
    spark.conf.getOption("spark.sql.codegen.wholeStage")
      .foreach(_ should not be "false")
    spark.conf.getOption("spark.sql.codegen.factoryMode")
      .foreach(m => Seq("NO_CODEGEN", "CODEGEN_ONLY") should not contain m)
  }

  behavior of "trainQualityWeights NULL labels (advice #3)"

  it should "ignore NULL-label rows instead of counting them negative" in {
    val labeled = Seq(
      ("solid prose with verbs and varied words", true),
      ("curated encyclopedic writing about rivers", true),
      ("buy now click here cheap pills", false),
      ("$$$ win win win $$$ casino", false))
    val noise = Seq(
      ("this unlabeled crawl junk must not train anything",
        null.asInstanceOf[java.lang.Boolean]),
      ("neither must this one", null.asInstanceOf[java.lang.Boolean]))
    val clean = Quality.collectWeights(Quality.trainQualityWeights(
      labeled.toDF("text", "label"), "text", "label"))
    val withNulls = Quality.collectWeights(Quality.trainQualityWeights(
      (labeled.map { case (t, l) =>
        (t, l: java.lang.Boolean)
      } ++ noise).toDF("text", "label"), "text", "label"))
    withNulls shouldBe clean
    // and the fixture is sharp: counting the noise as NEGATIVE would
    // have moved at least one weight
    val corrupted = Quality.collectWeights(Quality.trainQualityWeights(
      (labeled.map { case (t, l) => (t, l: java.lang.Boolean) } ++
        noise.map { case (t, _) =>
          (t, java.lang.Boolean.FALSE)
        }).toDF("text", "label"), "text", "label"))
    corrupted should not be clean
  }

  behavior of "spanCutAgainstStream hot-hash batch (advice #4)"

  it should "match the batch operator when one span hash dominates the batch" in {
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Dedup
    import graft.streaming.StreamingOps
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val window = 4
    val boiler = "mega hot boilerplate span shared by every single document"
    val emptyInv = Seq.empty[(Long, Long)].toDF("fp", "docs")
    // 40 docs all carrying the same hot span → its hash concentrates
    // the whole batch in one group of pass 1
    val batch = (0L until 40L).map(i => (i, s"prefix$i $boiler tail$i"))
    val expected = Dedup.removeRepeatedSpansAgainst(
      emptyInv, batch.toDF("doc_id", "text"), "doc_id", "text", window)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val input = MemoryStream[(Long, String)]
    val out = StreamingOps.spanCutAgainstStream(
      input.toDF.toDF("doc_id", "text"), "doc_id", "text", emptyInv, window)
    val q = out.writeStream.format("memory").queryName("hot_hash_out")
      .outputMode("append").start()
    try {
      input.addData(batch: _*)
      q.processAllAvailable()
      val got = spark.table("hot_hash_out")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      got shouldBe expected
      // every doc lost its hot span
      got.forall(_._4 > 0) shouldBe true
    } finally q.stop()
  }
}
