package graft

import graft.plans.ExchangeBudget
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** The per-entry shuffle budget: a quietly added exchange in a
  * previously N-shuffle plan must trip the checked-in ceiling — the
  * regression class PlanLint's error rules cannot see. */
class ExchangeBudgetSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  "ExchangeBudget.count" should "count shuffles through the AQE wrapper" in {
    val flat = spark.range(1000).toDF("x").select(col("x") * 2)
    ExchangeBudget.count(flat) shouldBe 0
    val agg = spark.range(1000).toDF("x")
      .groupBy(col("x") % 10).agg(sum("x"))
    ExchangeBudget.count(agg) shouldBe 1
  }

  it should "trip when a deliberate repartition adds an exchange" in {
    // the scenario the budget exists for: an entry that planned ONE
    // shuffle gains a second from a stray repartition — correctness
    // unchanged, wall time inside noise at test scale, a full extra
    // pass over the data at 100 TB
    def entry(extraShuffle: Boolean) = {
      val base = spark.range(10000).toDF("x")
      val src = if (extraShuffle) base.repartition(7) else base
      src.groupBy(col("x") % 100).agg(sum("x"))
    }
    val baseline = ExchangeBudget.count(entry(extraShuffle = false))
    val regressed = ExchangeBudget.count(entry(extraShuffle = true))
    regressed should be > baseline

    val budget = Map("q_scratch" -> baseline)
    ExchangeBudget.check(budget, Map("q_scratch" -> baseline)).clean shouldBe true
    val diff = ExchangeBudget.check(budget, Map("q_scratch" -> regressed))
    diff.clean shouldBe false
    diff.over shouldBe Seq(("q_scratch", regressed, baseline))
  }

  "ExchangeBudget.check" should "treat fewer shuffles as clean, skip crashes, surface unbudgeted" in {
    val budget = Map("a" -> 3, "b" -> 1)
    val diff = ExchangeBudget.check(budget,
      Map("a" -> 2,   // under ceiling: an improvement, not a violation
          "b" -> -1,  // lint crashed: already loud elsewhere, skip
          "c" -> 5))  // not yet baselined: surfaced, not failed
    diff.clean shouldBe true
    diff.over shouldBe empty
    diff.unbudgeted shouldBe Seq("c")
  }

  "ExchangeBudget.load/render" should "round-trip the budget file format" in {
    val counts = Map("q_b" -> 2, "q_a" -> 0, "q_c" -> 17)
    val f = java.nio.file.Files.createTempFile("graft-budget", ".json")
    java.nio.file.Files.writeString(f, ExchangeBudget.render(counts))
    ExchangeBudget.load(f) shouldBe counts
    // a lint-crash marker must never bake into the baseline as a
    // ceiling — once the crash is fixed the entry would flag forever
    java.nio.file.Files.writeString(f,
      ExchangeBudget.render(counts + ("q_crashed" -> -1)))
    ExchangeBudget.load(f) shouldBe counts
    // malformed values are loud AND name the entry, not zero/raw NFE
    for (bad <- Seq("""{"q_a": "two"}""", """{"q_a": 3.5}""")) {
      java.nio.file.Files.writeString(f, bad)
      (the[IllegalArgumentException] thrownBy ExchangeBudget.load(f))
        .getMessage should include("q_a")
    }
  }

  "exchange_budget.json" should "cover exactly the current battery" in {
    // the checked-in baseline must track the battery: a new entry
    // lands together with its budget line, a removed entry takes its
    // line along (stale ceilings would silently stop guarding)
    val path = java.nio.file.Paths.get("exchange_budget.json")
    assume(java.nio.file.Files.exists(path),
      "run from the repo root where the baseline is checked in")
    val budget = ExchangeBudget.load(path)
    val battery = SparkEntry.queries.keySet
    withClue("battery entries missing a budget line — re-baseline via PlanAudit: ") {
      (battery -- budget.keySet) shouldBe empty
    }
    withClue("budget lines for entries no longer in the battery: ") {
      (budget.keySet -- battery) shouldBe empty
    }
  }

  "exchange_budget_10x.json" should "cover exactly the current battery" in {
    // the sf1-equivalent overlay (round-14): plans legitimately shift
    // broadcast→shuffle as sides outgrow the threshold, so the 10×
    // bench gates against ITS OWN ceilings instead of flagging those
    // flips against the sf0.1 file (SPARK_GRAFT_EXCHANGE_BUDGET
    // selects it) — and it must track the battery the same way
    val path = java.nio.file.Paths.get("exchange_budget_10x.json")
    assume(java.nio.file.Files.exists(path),
      "run from the repo root where the overlay is checked in")
    val budget = ExchangeBudget.load(path)
    val battery = SparkEntry.queries.keySet
    withClue("battery entries missing a 10x budget line — re-baseline " +
      "via PlanAudit at the GenScale corpus: ") {
      (battery -- budget.keySet) shouldBe empty
    }
    withClue("10x budget lines for entries no longer in the battery: ") {
      (budget.keySet -- battery) shouldBe empty
    }
  }
}
