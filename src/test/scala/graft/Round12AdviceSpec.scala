package graft

import graft.pipeline.Multimodal
import graft.plans.{ExchangeBudget, PlanLint}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Regressions for the round-11 advice items: structured exchange
  * counts (no detail-string parsing), stale budget keys, and the
  * degenerate zero-gradient perceptual signature. */
class Round12AdviceSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  "exchange counts" should "come from the structured count field, not the detail wording" in {
    // a reworded human-readable detail must NOT change the number the
    // budget check sees — only the structured field is read
    val reworded = Seq(PlanLint.Finding("exchange-count", "info", "plan",
      "shuffle exchanges observed: three", count = Some(3)))
    ExchangeBudget.fromFindings(reworded) shouldBe 3
    // and the real lint always populates the field consistently
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
      .groupBy("k").agg(count(lit(1)).as("n"))
    val fs = PlanLint.lint(df)
    val f = fs.find(_.rule == "exchange-count").get
    f.count shouldBe defined
    ExchangeBudget.fromFindings(fs) shouldBe f.count.get
    // a finding that LOST its structured count is a loud failure, not
    // a silent zero that would make every budget check pass vacuously
    an[Exception] should be thrownBy ExchangeBudget.fromFindings(
      Seq(PlanLint.Finding("exchange-count", "info", "plan", "3 shuffle exchange(s)")))
  }

  "budget check" should "surface stale budget keys for removed entries" in {
    val budget = Map("kept" -> 1, "renamed_away" -> 2, "deleted" -> 0)
    val actual = Map("kept" -> 1, "brand_new" -> 4)
    val diff = ExchangeBudget.check(budget, actual)
    diff.over shouldBe empty
    diff.unbudgeted shouldBe Seq("brand_new")
    diff.stale shouldBe Seq("deleted", "renamed_away")
    // stale keys are advisory — they never fail the clean gate
    diff.clean shouldBe true
  }

  private def solidPng(rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb))
    g.fillRect(0, 0, 32, 32)
    g.dispose()
    Multimodal.ImageCodec.encodePng(img)
  }

  "media near-dup" should "exclude degenerate zero-gradient signatures" in {
    // two DIFFERENT solid colors both dHash to 0L — without the guard
    // they'd pair at hamming 0 despite sharing no content
    val tex1 = Multimodal.syntheticImagePng(64, seed = 5)
    val tex2 = Multimodal.syntheticImagePng(48, seed = 5) // rescaled copy
    val media = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, "image", tex1, Row(null, null, null, "png")),
        Row(2L, "image", tex2, Row(null, null, null, "png")),
        Row(3L, "image", solidPng(0xFF0000), Row(null, null, null, "png")),
        Row(4L, "image", solidPng(0x0000FF), Row(null, null, null, "png"))),
      Multimodal.mediaSchema)
    // the solid fills really are the degenerate signature
    val sigs = Multimodal.imageDHash(media).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(r.length - 1)) None else Some(r.getLong(r.length - 1))))
      .toMap
    sigs(3L) shouldBe Some(0L)
    sigs(4L) shouldBe Some(0L)
    // candidates: only the textured rescale pair; no solid-color pair
    val pairs = Multimodal.imageNearDupCandidates(media)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs shouldBe Set((1L, 2L))
    // and the persistable sign table (incremental/streaming source)
    // drops the degenerate rows under the same contract
    Multimodal.mediaSignTable(media).select("id")
      .as[Long].collect().toSet shouldBe Set(1L, 2L)
  }
}
