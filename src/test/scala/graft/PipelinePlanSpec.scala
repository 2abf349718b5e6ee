package graft

import graft.pipeline.{Decontaminate, Scrub, Search, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Plan-shape assertions for the round-7 pipeline additions — the
  * 100 TB properties, not just the answers: the benchmark side of
  * decontamination broadcasts, the map-only signal operators plan ZERO
  * exchanges, and both top-k searches plan a distributed
  * TakeOrderedAndProject (never a full sort). Plans are inspected
  * AFTER execution so AQE's final plan is what is asserted. */
class PipelinePlanSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs: DataFrame = (1L to 60L)
    .map(i => (i, s"document $i about spark join window shuffle topic ${i % 7}"))
    .toDF("doc_id", "text")

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  "Decontaminate.report" should "broadcast the benchmark side" in {
    val bench = Seq((900L, "spark join window shuffle topic 3"))
      .toDF("bench_id", "text")
    val p = finalPlan(Decontaminate.report(
      docs, "doc_id", "text", bench, "bench_id", "text", window = 4))
    p should include("BroadcastHashJoin")
  }

  "scrubPii, repetitionStats and chunkTable" should "plan zero exchanges" in {
    val scrub = docs.select(col("doc_id"),
      Scrub.scrubPii(col("text")), Scrub.piiCounts(col("text")))
    val rep = docs.select(col("doc_id"),
      TextAnalysis.repetitionStats(col("text")))
    val chunk = TextAnalysis.chunkTable(docs, "doc_id", "text", 4, 1)
    Seq(scrub, rep, chunk).foreach { df =>
      finalPlan(df) should not include "Exchange"
    }
  }

  "bm25TopK" should "plan a distributed top-k, not a full sort" in {
    val p = finalPlan(Search.bm25TopK(docs, "doc_id", "text", "spark join", 5))
    p should include("TakeOrderedAndProject")
  }

  "vocabulary top-k" should "plan a distributed top-k after partial counts" in {
    val p = finalPlan(docs
      .select(org.apache.spark.sql.functions.explode(
        graft.pipeline.Dedup.tokens(col("text"))).as("tok"))
      .groupBy(col("tok"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc).limit(10))
    p should include("TakeOrderedAndProject")
  }

  "portableLshTopK" should "plan a distributed top-k over the probe ring" in {
    val emb = (1L to 40L)
      .map(i => (i, Array.fill(8)((i % 5).toFloat + 0.5f)))
      .toDF("vec_id", "embedding")
    val q = Seq.fill(8)(1.5)
    val p = finalPlan(graft.pipeline.Similarity.portableLshTopK(
      emb, "vec_id", "embedding", q, 5, numPlanes = 2))
    p should include("TakeOrderedAndProject")
  }
}
