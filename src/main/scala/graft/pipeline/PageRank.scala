package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over a directed edge list — the standard
  * importance measure for link/citation/reference graphs (Page et al.,
  * 1999). Fixed iteration count, NOT convergence-tested, on purpose:
  * the result is a pure function of (edges, iterations, damping), so
  * runs are reproducible and an external engine replays the exact
  * computation (the battery oracle unrolls the same iterations in
  * SQL — scores 6-dp rounded; cross-engine float-summation-order
  * differences sit ~1e-14, far under that).
  *
  * Per iteration: contribution = d · rank/outdeg summed over incoming
  * edges, plus (1−d)/N, plus d · (dangling mass)/N redistributed
  * uniformly (the standard dangling-node treatment, so total rank mass
  * stays 1 every iteration — asserted in the spec).
  *
  * Scale shape: outdegrees are computed ONCE and live with the rank
  * table; each iteration is one join of ranks to edges on src —
  * broadcast while the rank table is dimension-sized (shuffle-free
  * rounds), a hash shuffle join otherwise — plus one aggregation on
  * dst; the dangling mass is a one-row aggregate that broadcasts.
  * Each round's
  * rank table is re-leafed through a lazy local checkpoint (same
  * discipline as the SPARQL closure and CC), so lineage stays O(1)
  * across iterations. Hubs: a high-IN-degree node is one aggregation
  * group (map-side partial combine absorbs it); a high-OUT-degree
  * node is join fan-out, AQE-splittable — neither funnels a reducer. */
object PageRank {

  /** Ranks for every node appearing in `edges` (two columns:
    * src, dst). Returns `(node, rank)`. Self-loops count as ordinary
    * edges; parallel edges weight double — dedup upstream if that is
    * not intended. `broadcastNodeLimit` gates the per-iteration join
    * strategy: at or below it the rank table broadcasts (shuffle-free
    * rounds — right for dimension-sized graphs); above it the rounds
    * run as shuffle joins (right when the rank table is itself
    * data-scale). Set it to 0 to force shuffle joins when nodes carry
    * wide keys (a broadcast repeats EVERY iteration, so an oversized
    * rank relation would stress the driver once per round). */
  def pageRank(edges: DataFrame, iterations: Int = 10,
               damping: Double = 0.85,
               broadcastNodeLimit: Long = 500000): DataFrame = {
    require(edges.columns.length == 2,
      s"edges must have exactly two columns, got ${edges.columns.length}")
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1, s"damping $damping not in (0,1)")
    val Array(srcC, dstC) = edges.columns
    def leaf(df: DataFrame): DataFrame =
      org.apache.spark.sql.GraftColumnBridge.freshLeaf(
        df.localCheckpoint(eager = false))
    val e = leaf(edges
      .filter(col(srcC).isNotNull && col(dstC).isNotNull)
      .select(col(srcC).as("src"), col(dstC).as("dst")))
    val nodes = leaf(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct())
    val n = nodes.count().toDouble
    val outdeg = leaf(e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outdeg")))
    // rank table carries outdeg (null for dangling nodes) so the
    // iteration joins ranks⋈edges without re-touching the degree table
    var ranks = leaf(nodes.join(outdeg, Seq("node"), "left")
      .select(col("node"), lit(1.0 / n).as("rank"), col("outdeg")))
    // checkpointed leaves carry no stats, so the planner would
    // sort-merge the ranks⋈edges join blind. The node count is already
    // on the driver: broadcast the (node, rank, outdeg) side while it
    // is dimension-sized, fall back to the shuffle join for graphs
    // where a rank table is itself data-scale.
    val broadcastRanks = n <= broadcastNodeLimit
    for (i <- 1 to iterations) {
      val dangling = ranks.filter(col("outdeg").isNull)
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("__dm"))
      val active = ranks.filter(col("outdeg").isNotNull)
      val contribs = (if (broadcastRanks) broadcast(active) else active)
        .join(e, active("node") === e("src"))
        .select(col("dst").as("node"),
          (col("rank") / col("outdeg")).as("__c"))
        .groupBy(col("node"))
        .agg(sum(col("__c")).as("__in"))
      val next = ranks.select(col("node"), col("outdeg"))
        .join(if (broadcastRanks) broadcast(contribs) else contribs,
          Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (lit((1 - damping) / n) +
            lit(damping) * (coalesce(col("__in"), lit(0.0)) +
              col("__dm") / n)).as("rank"),
          col("outdeg"))
      // the LAST round stays un-checkpointed: one checkpoint saved,
      // and the caller-visible plan keeps the iteration's join shape
      // (the broadcast-vs-shuffle gate is spec-asserted on it)
      ranks = if (i == iterations) next else leaf(next)
    }
    ranks.select(col("node"), col("rank"))
  }
}
