package graft.plans

import org.apache.spark.sql.DataFrame

import graft.rdf.Json

/** Per-entry shuffle-exchange budgets — the regression detector the
  * error-level lints cannot be. [[PlanLint]] catches the shapes that
  * die outright at scale (cartesians, fact-table broadcasts); what it
  * cannot see is a battery entry that used to plan ONE shuffle
  * quietly growing a second (a stray `repartition`, a join that lost
  * its broadcast, an aggregate that stopped fusing). Each of those is
  * a full extra pass over the data at 100 TB, invisible in a
  * correctness gate and easily inside the noise band of a wall-clock
  * medium. So the expected shuffle count per entry is CHECKED IN
  * (`exchange_budget.json`) and the bench diffs actuals against it on
  * every run.
  *
  * Budget semantics: a CEILING on `ShuffleExchangeLike` nodes in the
  * pre-execution physical plan, recorded at the bench scale (sf0.1,
  * where join-strategy choices are sized). Planning fewer shuffles
  * than budgeted is an improvement, not a violation — re-baseline by
  * regenerating the file (`SPARK_GRAFT_WRITE_BUDGET=path` on a bench
  * run) so the tighter plan becomes the new floor. An entry missing
  * from the file is reported as `unbudgeted`, not failed: new entries
  * land first, get baselined in the same commit. */
object ExchangeBudget {

  /** Shuffle exchanges a frame's physical plan would execute —
    * counted through AQE wrappers and reused-exchange references,
    * same traversal as the lints. */
  def count(df: DataFrame): Int = fromFindings(PlanLint.lint(df))

  /** Shuffle-exchange count out of a finding list already in hand (so
    * the bench's single untimed lint pass feeds both the error counts
    * and the budget diff — plans are not rebuilt twice). Reads the
    * finding's STRUCTURED `count` field — the lint always sets it on
    * exchange-count, so a missing finding (not a reworded detail) is
    * the only way to see the 0 default. */
  def fromFindings(fs: Seq[PlanLint.Finding]): Int =
    fs.collectFirst {
      case f if f.rule == "exchange-count" =>
        f.count.getOrElse(sys.error(
          "exchange-count finding lost its structured count field"))
    }.getOrElse(0)

  /** Load a `{"entry": maxShuffles, ...}` budget file. */
  def load(path: java.nio.file.Path): Map[String, Int] = {
    val text = new String(java.nio.file.Files.readAllBytes(path),
      java.nio.charset.StandardCharsets.UTF_8)
    new Json.JsonReader(text).parseDocument() match {
      case Json.JObj(fields) => fields.map {
        case (k, Json.JNum(raw)) =>
          k -> (try raw.toInt
          catch { case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"budget entry '$k': expected an integer, got $raw")
          })
        case (k, other) => throw new IllegalArgumentException(
          s"budget entry '$k': expected a number, got $other")
      }.toMap
      case other => throw new IllegalArgumentException(
        s"budget file must be one JSON object, got $other")
    }
  }

  final case class Diff(over: Seq[(String, Int, Int)], // (entry, actual, budget)
                        unbudgeted: Seq[String],
                        stale: Seq[String]) {
    def clean: Boolean = over.isEmpty
  }

  /** Diff measured counts against the checked-in ceilings. Entries
    * over budget are violations; entries absent from the budget are
    * surfaced separately (new entry awaiting baseline); budget keys
    * with no measured entry are `stale` — a renamed/removed battery
    * entry whose dead ceiling would otherwise silently accumulate (and
    * whose rename resets the real ceiling via the unbudgeted path).
    * Lint-crashed entries (actual < 0) are skipped — the crash marker
    * itself is already visible in the lint telemetry. */
  def check(budget: Map[String, Int], actual: Map[String, Int]): Diff = {
    val over = actual.toSeq.sortBy(_._1).collect {
      case (name, n) if n >= 0 && budget.get(name).exists(n > _) =>
        (name, n, budget(name))
    }
    val unbudgeted =
      actual.toSeq.sortBy(_._1).collect {
        case (name, n) if n >= 0 && !budget.contains(name) => name
      }
    val stale = (budget.keySet -- actual.keySet).toSeq.sorted
    Diff(over, unbudgeted, stale)
  }

  /** Render counts as the budget-file format (sorted, one entry per
    * line — diffs review cleanly). Lint-crash markers (negative
    * counts) are SKIPPED, never baked in as ceilings: a -1 baseline
    * would flag the entry forever once the crash is fixed, and hide
    * it meanwhile — the entry instead shows up `unbudgeted` on the
    * next clean run, forcing a real re-baseline. */
  def render(counts: Map[String, Int]): String =
    counts.toSeq.filter(_._2 >= 0).sortBy(_._1)
      .map { case (k, v) => s"""  "$k": $v""" }
      .mkString("{\n", ",\n", "\n}\n")
}
