package graft.sparql

import Algebra._

/** Algebra-level BGP join reordering (SURVEY.md §4 "optional custom
  * rule"): Catalyst won't reorder our joins without table statistics,
  * and quad-pattern selectivity is known structurally — more constant
  * positions ⇒ fewer matching quads (the classic RDF-store heuristic;
  * the reference executes joins strictly as parsed, Interpreter.scala:438).
  *
  * SPARQL BGP join is a commutative/associative multiset natural join,
  * so reordering the leaves of a maximal inner-Join tree cannot change
  * results — only the amount of intermediate data. Greedy order: start
  * from the most selective leaf, then repeatedly take the most
  * selective leaf CONNECTED to the variables bound so far (never
  * introducing a cross join the original plan didn't force).
  *
  * With [[QuadsStats]] (computed at ingest — see
  * [[graft.io.DictStore.encode]] — or on demand via
  * `QuadsStats.compute`), "most selective" means LOWEST ESTIMATED
  * ROWS from real per-predicate counts instead of the structural
  * constant-position heuristic — cost-based ordering in the style of
  * Stocker et al. (WWW'08). Stats influence only join order, never
  * results.
  */
object BgpOptimizer {

  def optimize(op: Op): Op = optimize(op, None)

  def optimize(op: Op, stats: Option[QuadsStats]): Op = op match {
    case j: Join =>
      val leaves = flatten(j).map(optimize(_, stats))
      order(leaves, stats).reduceLeft(Join(_, _))
    case LeftJoin(l, r, c) => LeftJoin(optimize(l, stats), optimize(r, stats), c)
    case Union(l, r) => Union(optimize(l, stats), optimize(r, stats))
    case Minus(l, r) => Minus(optimize(l, stats), optimize(r, stats))
    case Filter(c, e) => Filter(optimize(c, stats), mapExists(e, stats))
    case Extend(c, n, e) => Extend(optimize(c, stats), n, e)
    case Project(c, vs) => Project(optimize(c, stats), vs)
    case Distinct(c) => Distinct(optimize(c, stats))
    case Reduced(c) => Reduced(optimize(c, stats))
    case Group(c, k, a) => Group(optimize(c, stats), k, a)
    case Order(c, k) => Order(optimize(c, stats), k)
    case Slice(c, o, l) => Slice(optimize(c, stats), o, l)
    // SERVICE children evaluate against a DIFFERENT dataset — this
    // dataset's stats don't describe it, so order them structurally
    case Service(e, c, s) => Service(e, optimize(c, None), s)
    case alp: ArbitraryLengthPath => alp.copy(edge = optimize(alp.edge, stats))
    case leaf => leaf
  }

  private def mapExists(e: Expr, stats: Option[QuadsStats]): Expr = e match {
    case ExistsE(p, n) => ExistsE(optimize(p, stats), n)
    case FuncE(n, args) => FuncE(n, args.map(mapExists(_, stats)))
    case InE(x, l, n) => InE(mapExists(x, stats), l.map(mapExists(_, stats)), n)
    case other => other
  }

  private def flatten(op: Op): List[Op] = op match {
    case Join(l, r) => flatten(l) ++ flatten(r)
    case other => List(other)
  }

  /** Lower = more selective. Constant positions dominate; a constant
    * predicate alone is worth less than a constant subject/object
    * (predicates are low-cardinality in RDF). VALUES blocks are tiny
    * inline tables → most selective. */
  private def score(op: Op): Double = op match {
    case Values(_, rows) => -10 + rows.size.min(5)
    case Scan(s, p, o, _) =>
      val consts = Seq(s, p, o).count(_.isInstanceOf[T])
      val predConst = if (p.isInstanceOf[T]) 1 else 0
      10 - consts * 3 - predConst
    case Singleton => 100 // unit row: join it last, it constrains nothing
    case other => 8 - (3 min assuredVars(other).size)
  }

  /** Stats-based score: log10 of estimated rows, so Values/Singleton
    * special cases stay comparable on the same axis. Non-scan leaves
    * (paths, sub-groups) fall back to the structural score — their
    * cardinality isn't a single pattern's. */
  private def score(op: Op, stats: Option[QuadsStats]): Double =
    (op, stats) match {
      case (sc: Scan, Some(st)) => math.log10(st.estimate(sc) + 1.0)
      case _ => score(op)
    }

  private def order(leaves: List[Op], stats: Option[QuadsStats]): List[Op] = {
    def s(op: Op) = score(op, stats)
    if (leaves.size <= 2) return leaves.sortBy(s)
    val remaining = scala.collection.mutable.ListBuffer(leaves: _*)
    val out = scala.collection.mutable.ListBuffer.empty[Op]
    var bound = Set.empty[String]
    val first = remaining.minBy(s)
    remaining -= first
    out += first
    bound ++= vars(first)
    while (remaining.nonEmpty) {
      val connected = remaining.filter(l => (vars(l) intersect bound).nonEmpty)
      val next =
        if (connected.nonEmpty) connected.minBy(s)
        else remaining.minBy(s) // original plan was cross-joined too
      remaining -= next
      out += next
      bound ++= vars(next)
    }
    out.toList
  }
}
