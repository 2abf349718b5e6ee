package graft

import graft.plans.PlanLint
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Plan lint: catches the shapes that die at scale (cartesian,
  * nested-loop, oversized broadcast, unpushed scan filters), stays
  * quiet on healthy plans, and lints a sample of battery entries. */
class PlanLintSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def errRules(fs: Seq[PlanLint.Finding]) =
    fs.filter(_.severity == "error").map(_.rule).toSet

  "PlanLint" should "flag a cartesian product and a nested-loop join" in {
    // both sides too big to broadcast → CartesianProduct / pair-wise
    // nested loop, the shapes that die at scale
    val bigA = spark.range(3000000).toDF("x")
    val bigB = spark.range(3000000).toDF("y")
    errRules(PlanLint.lint(bigA.crossJoin(bigB))) should
      contain atLeastOneOf ("cartesian-product", "nested-loop-join")
    val nonEqui = bigA.join(bigB, col("x") < col("y"))
    errRules(PlanLint.lint(nonEqui)) should
      contain atLeastOneOf ("cartesian-product", "nested-loop-join")
    an[AssertionError] should be thrownBy
      PlanLint.assertClean(bigA.crossJoin(bigB))
    // an explicit allow turns the same plan green — visibly, by rule name
    noException should be thrownBy PlanLint.assertClean(bigA.crossJoin(bigB),
      allowRules = Set("cartesian-product", "nested-loop-join"))
  }

  it should "demote a TINY-build-side nested loop to info" in {
    // the scalar-subquery / corpus-stats shape: a 1-row aggregate
    // cross-joined onto a table is O(1) extra work per row, not a
    // scale hazard — info, not error
    val corpus = spark.range(1000).toDF("x")
    val stats = corpus.agg(avg(col("x")).as("m"))
    val withStats = corpus.crossJoin(stats).filter(col("x") > col("m") - 10)
    errRules(PlanLint.lint(withStats)) shouldBe empty
    PlanLint.lint(withStats).filter(_.severity == "info")
      .map(_.rule) should contain("scalar-nested-loop")
  }

  it should "flag an oversized broadcast by its logical estimate" in {
    val big = spark.range(1000000).toDF("k").withColumn("pad", lit("x" * 100))
    val smallThreshold = 1024L // 1 KB: anything real exceeds it
    val j = spark.range(10).toDF("k").join(broadcast(big), Seq("k"))
    errRules(PlanLint.lint(j, maxBroadcastBytes = smallThreshold)) should
      contain("oversized-broadcast")
    // same join, sane threshold → clean
    errRules(PlanLint.lint(spark.range(10).toDF("k")
      .join(broadcast((1 to 5).toDF("k")), Seq("k")))) shouldBe empty
  }

  it should "warn on a filter above a scan that pushed nothing" in {
    val dir = java.nio.file.Files.createTempDirectory("graft-lint").toString
    (1 to 100).map(i => (i.toLong, s"w$i")).toDF("k", "w")
      .write.mode("overwrite").parquet(dir)
    val t = spark.read.parquet(dir)
    // unpushable predicate (function of the column) → warn
    val unpushed = t.filter(expr("length(w) > 2"))
    PlanLint.lint(unpushed).filter(_.severity == "warn")
      .map(_.rule) should contain("unpushed-scan-filter")
    // plain comparison pushes → no warn
    val pushed = t.filter(col("k") > 50)
    PlanLint.lint(pushed).filter(_.severity == "warn") shouldBe empty
  }

  it should "flag a partition-less window, demoting tiny inputs" in {
    import org.apache.spark.sql.expressions.Window
    // the packing/ranking scale-killer: a global row_number serializes
    // the corpus onto one task
    val big = spark.range(3000000).toDF("v")
      .withColumn("r", row_number().over(Window.orderBy(col("v"))))
    errRules(PlanLint.lint(big)) should contain("partitionless-window")
    // a real partition key → clean
    val parted = spark.range(3000000).toDF("v").withColumn("g", col("v") % 7)
      .withColumn("r", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v"))))
    errRules(PlanLint.lint(parted)) shouldBe empty
    // tiny input (a driver-bounded report frame) → info, not error
    val tiny = (1 to 20).map(i => (i, i * 2)).toDF("a", "b")
      .withColumn("r", row_number().over(Window.orderBy(col("a"))))
    errRules(PlanLint.lint(tiny)) shouldBe empty
    PlanLint.lint(tiny).filter(_.severity == "info")
      .map(_.rule) should contain("scalar-global-window")
    // and the two-phase packing operators stay clean by construction
    val docs = (1 to 50).map(i => (i.toLong, 10L)).toDF("id", "toks")
    errRules(PlanLint.lint(
      graft.pipeline.Packing.shuffleRank(docs, "id"))) shouldBe empty
  }

  it should "report exchange and codegen telemetry" in {
    val agg = (1 to 100).map(i => (i % 3, i)).toDF("g", "v")
      .groupBy("g").agg(sum("v"))
    val info = PlanLint.lint(agg).filter(_.severity == "info").map(_.rule)
    info should contain allOf ("exchange-count", "codegen-spans")
  }

  it should "see through materialized AQE query stages after execution" in {
    // after an action, AQE replaces exchanges with QueryStageExec
    // leaves whose subtree lives in .plan — the walk must descend or a
    // post-execution lint reports a falsely clean, exchange-free plan
    val agg = spark.range(1000).toDF("v").withColumn("g", col("v") % 7)
      .groupBy("g").agg(sum("v"))
    agg.count() // materialize the stages
    val exchanges = PlanLint.lint(agg)
      .find(f => f.rule == "exchange-count").get.detail
    exchanges should not startWith "0 "
  }

  it should "pass a sample of battery entries with zero error findings" in {
    val sf = "/root/testdata/sf0.001"
    for (name <- Seq("q1_agg", "q_salted_join", "q_skew_aware_join",
      "q_heavy_hitters", "q_quantile_sketch", "q_range_join",
      "q_props_variant", "q_bgp_join"))
      withClue(name) {
        noException should be thrownBy PlanLint.assertClean(
          SparkEntry.queries(name)(spark, sf))
      }
  }
}
