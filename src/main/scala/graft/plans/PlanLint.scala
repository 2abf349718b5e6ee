package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec,
  ProjectExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec,
  ShuffleExchangeLike}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec,
  CartesianProductExec}

/** Plan linting — the ".explain and iterate until it's the plan you'd
  * want" discipline, as code. A plan that passes correctness on 60k
  * rows can still be the plan that dies at 100 TB: a cartesian
  * product, a broadcast of a fact table, a filter evaluated above a
  * scan that could have pruned row groups. These are visible in the
  * physical plan BEFORE running anything, so they are assertable in
  * tests — every operator here ships with its plan shape pinned, and
  * [[assertClean]] is the reusable form of that pin.
  *
  * Severities: `error` findings are shapes that do not survive scale
  * (cartesian/nested-loop joins, oversized broadcasts, partition-less
  * windows); `warn` is a smell worth a look (a filter directly above
  * a scan that pushed nothing); `info` is plan telemetry (exchange
  * and codegen-span counts) for tracking regressions across
  * versions. */
object PlanLint {

  /** `count` carries the measured quantity for counter-style findings
    * (exchange-count, codegen-spans) as a STRUCTURED field — consumers
    * like [[ExchangeBudget]] read it directly instead of parsing the
    * human-readable `detail`, which is free to reword. */
  final case class Finding(rule: String, severity: String, node: String,
                           detail: String, count: Option[Int] = None) {
    override def toString: String = s"[$severity] $rule at $node: $detail"
  }

  /** Collect over the physical plan INCLUDING what AQE wraps —
    * pre-execution (AdaptiveSparkPlanExec root) AND post-execution,
    * where materialized stages appear as QueryStageExec leaves whose
    * subtree lives in `.plan`, not `.children`, and reused exchanges
    * hide their original subtree the same way (plan.collect alone
    * stops at all three). */
  private[graft] def walk(p: SparkPlan): Seq[SparkPlan] =
    p +: (p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        walk(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        walk(r.child)
      case other => other.children.flatMap(walk)
    })

  /** Lint a frame's physical plan. `maxBroadcastBytes` bounds what a
    * broadcast build side may claim by its LOGICAL size estimate —
    * default 8× the classic 10 MB auto threshold, catching
    * `broadcast()` hints slapped onto fact tables (the single most
    * common way a working notebook job kills a production driver). */
  def lint(df: DataFrame,
           maxBroadcastBytes: Long = 80L * 1024 * 1024,
           smallBroadcastBytes: Long = 1024 * 1024): Seq[Finding] = {
    val nodes = walk(df.queryExecution.executedPlan)
    val findings = Seq.newBuilder[Finding]

    nodes.foreach {
      case c: CartesianProductExec =>
        findings += Finding("cartesian-product", "error", c.nodeName,
          "every row pair meets — O(|L|·|R|) work and one task can " +
            "receive a full copy of a side; restructure toward an " +
            "equi-join key or pre-aggregate")
      case b: BroadcastNestedLoopJoinExec =>
        // a TINY build side (a 1-row corpus-stats aggregate, a scalar
        // subquery) is the standard cross-join-with-a-scalar shape —
        // per-row work is O(1), not O(|build|); demote to info
        val buildChild = b.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildLeft => b.left
          case org.apache.spark.sql.catalyst.optimizer.BuildRight => b.right
        }
        val buildEst = walk(buildChild).collectFirst {
          case e: BroadcastExchangeExec =>
            e.child.logicalLink.map(_.stats.sizeInBytes)
        }.flatten
        if (buildEst.exists(_ <= smallBroadcastBytes))
          findings += Finding("scalar-nested-loop", "info", b.nodeName,
            s"non-equi ${b.joinType} join over a tiny (≤ " +
              s"$smallBroadcastBytes B estimated) broadcast side — the " +
              "scalar-subquery shape, fine as long as that side stays " +
              "tiny at scale")
        else
          findings += Finding("nested-loop-join", "error", b.nodeName,
            s"non-equi ${b.joinType} join evaluates the condition per " +
              "row pair against a broadcast copy; bucketize the " +
              "condition (range join) or derive an equi key")
      case e: BroadcastExchangeExec =>
        val est = e.child.logicalLink.map(_.stats.sizeInBytes)
        est.filter(_ > maxBroadcastBytes).foreach { sz =>
          findings += Finding("oversized-broadcast", "error", e.nodeName,
            s"build side estimates $sz bytes > $maxBroadcastBytes; a " +
              "broadcast ships to EVERY executor and materializes on " +
              "the driver — this side belongs in a shuffle join")
        }
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty =>
        // a window with no PARTITION BY moves the entire input to ONE
        // partition (Spark itself warns) — the packing/ranking
        // scale-killer the two-phase operators exist to avoid. A tiny
        // input (a driver-bounded report frame) is the one legitimate
        // shape: demote by the logical size estimate, read from the
        // nearest linked descendant (the window's direct child is a
        // planner-injected Sort/Exchange that carries no link).
        val est = walk(w.child)
          .flatMap(_.logicalLink).headOption.map(_.stats.sizeInBytes)
        if (est.exists(_ <= smallBroadcastBytes))
          findings += Finding("scalar-global-window", "info", w.nodeName,
            s"partition-less window over a tiny (≤ $smallBroadcastBytes B " +
              "estimated) input — fine while that input stays tiny at scale")
        else
          findings += Finding("partitionless-window", "error", w.nodeName,
            "window with no PARTITION BY serializes the whole input " +
              "onto one task; range-partition + per-partition windows " +
              "with broadcast prefix offsets (the Packing two-phase " +
              "shape), or partition by a real key")
      case f: FilterExec =>
        // the scan may sit under pass-through wrappers (ColumnarToRow,
        // InputAdapter, Project) — descend through single-child
        // non-filtering nodes only, so a Filter above a JOIN of scans
        // is not misattributed
        @annotation.tailrec
        def scanUnder(p: SparkPlan): Option[FileSourceScanExec] = p match {
          case s: FileSourceScanExec => Some(s)
          case _: ProjectExec | _: org.apache.spark.sql.execution.ColumnarToRowExec |
               _: org.apache.spark.sql.execution.InputAdapter |
               _: WholeStageCodegenExec if p.children.size == 1 =>
            scanUnder(p.children.head)
          case _ => None
        }
        val scanBelow = scanUnder(f.child)
        // IsNotNull pushes ride along with ANY predicate and prune
        // nothing by themselves — only count substantive pushdowns.
        // (pushedDownFilters itself is protected; the rendered
        // metadata entry is the stable public surface .explain uses.)
        def substantivePush(s: FileSourceScanExec): Boolean =
          s.metadata.getOrElse("PushedFilters", "[]")
            .stripPrefix("[").stripSuffix("]").split(", ")
            .exists(f => f.nonEmpty && !f.startsWith("IsNotNull"))
        scanBelow.filterNot(substantivePush).foreach { s =>
          findings += Finding("unpushed-scan-filter", "warn", s.nodeName,
            "a Filter sits directly above a scan that pushed nothing " +
              "substantive — if any conjunct is a plain comparison on " +
              "a stored column, rewrite it to reach the reader " +
              "(row-group pruning is the cheapest work a query can skip)")
        }
      case _ => ()
    }

    val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeLike])
    findings += Finding("exchange-count", "info", "plan",
      s"$shuffles shuffle exchange(s)", count = Some(shuffles))
    val spans = nodes.count(_.isInstanceOf[WholeStageCodegenExec])
    findings += Finding("codegen-spans", "info", "plan",
      s"$spans whole-stage codegen span(s)", count = Some(spans))
    findings.result()
  }

  /** Throw if the plan carries any `error` finding whose rule is not
    * explicitly allowed (e.g. a MINUS with disjoint domains is a
    * cartesian BY SPARQL SEMANTICS — allow it by name, visibly, at
    * the call site). Returns the findings for further assertions. */
  def assertClean(df: DataFrame,
                  allowRules: Set[String] = Set.empty,
                  maxBroadcastBytes: Long = 80L * 1024 * 1024): Seq[Finding] = {
    val fs = lint(df, maxBroadcastBytes)
    val bad = fs.filter(f => f.severity == "error" && !allowRules(f.rule))
    if (bad.nonEmpty) throw new AssertionError(
      s"plan lint failed:\n${bad.mkString("\n")}\n\nfull plan:\n" +
        df.queryExecution.executedPlan.toString)
    fs
  }
}
