package graft

import graft.pipeline.Decontaminate
import org.apache.spark.sql.DataFrame
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Benchmark decontamination: planted eval-set overlaps must be found
  * (at the window level, including short verbatim strings), clean
  * documents must survive, and the report/clean pair must agree. */
class DecontaminateSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  // 10-token benchmark passage (3 distinct 8-token windows) embedded
  // verbatim inside train docs 1 and 5; bench doc 202 is SHORT
  // (< window) and train doc 4 copies it exactly.
  private val benchPassage =
    "which spark operator shuffles the most data overall in production"

  private lazy val train: DataFrame = Seq(
    (1L, s"intro words before the question $benchPassage and trailing context here"),
    (2L, "a completely unrelated training document about parquet row groups and pruning"),
    (3L, null.asInstanceOf[String]),
    (4L, "tiny eval string"),
    (5L, s"another copy of the question $benchPassage appears in this one too")
  ).toDF("doc_id", "text")

  private lazy val bench: DataFrame = Seq(
    (201L, benchPassage),
    (202L, "tiny eval string")
  ).toDF("bench_id", "text")

  "report" should "flag documents sharing a window with the benchmark" in {
    val rep = Decontaminate.report(train, "doc_id", "text",
      bench, "bench_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rep.keySet shouldBe Set(1L, 4L, 5L)
    rep(1L)._1 should be >= 2L // the passage's three 8-token windows
    rep(1L)._2 shouldBe 1L     // hits bench doc 201 only
    rep(4L) shouldBe ((1L, 1L)) // short doc: whole-run hash vs bench 202
  }

  it should "respect minHits" in {
    // doc 4 shares exactly one window hash; minHits = 2 drops it
    val rep = Decontaminate.report(train, "doc_id", "text",
      bench, "bench_id", "text", minHits = 2)
      .collect().map(_.getLong(0)).toSet
    rep should contain(1L)
    rep should not contain 4L
  }

  "clean" should "honor minHits via the count-only aggregation path" in {
    // doc 4 has exactly one shared hash; docs 1 and 5 share three
    val kept = Decontaminate.clean(train, "doc_id", "text",
      bench, "bench_id", "text", minHits = 2)
      .collect().map(_.getLong(0)).toSet
    kept shouldBe Set(2L, 3L, 4L)
  }

  it should "drop contaminated rows and keep NULL-text rows" in {
    val kept = Decontaminate.clean(train, "doc_id", "text",
      bench, "bench_id", "text")
      .collect().map(_.getLong(0)).toSet
    kept shouldBe Set(2L, 3L)
  }

  it should "produce the same answer without the broadcast hint" in {
    val kept = Decontaminate.clean(train, "doc_id", "text",
      bench, "bench_id", "text", broadcastBench = false)
      .collect().map(_.getLong(0)).toSet
    kept shouldBe Set(2L, 3L)
  }

  it should "keep everything when the benchmark is empty" in {
    val kept = Decontaminate.clean(train, "doc_id", "text",
      bench.filter($"bench_id" < 0), "bench_id", "text")
      .count()
    kept shouldBe 5L
  }
}
