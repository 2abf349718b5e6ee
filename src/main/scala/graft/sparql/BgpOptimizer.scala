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
  */
object BgpOptimizer {

  def optimize(op: Op): Op = op match {
    case j: Join =>
      val leaves = flatten(j).map(optimize)
      order(leaves).reduceLeft(Join(_, _))
    case LeftJoin(l, r, c) => LeftJoin(optimize(l), optimize(r), c)
    case Union(l, r) => Union(optimize(l), optimize(r))
    case Minus(l, r) => Minus(optimize(l), optimize(r))
    case Filter(c, e) => Filter(optimize(c), mapExists(e))
    case Extend(c, n, e) => Extend(optimize(c), n, e)
    case Project(c, vs) => Project(optimize(c), vs)
    case Distinct(c) => Distinct(optimize(c))
    case Reduced(c) => Reduced(optimize(c))
    case Group(c, k, a) => Group(optimize(c), k, a)
    case Order(c, k) => Order(optimize(c), k)
    case Slice(c, o, l) => Slice(optimize(c), o, l)
    case Service(e, c, s) => Service(e, optimize(c), s)
    case alp: ArbitraryLengthPath => alp.copy(edge = optimize(alp.edge))
    case leaf => leaf
  }

  private def mapExists(e: Expr): Expr = e match {
    case ExistsE(p, n) => ExistsE(optimize(p), n)
    case FuncE(n, args) => FuncE(n, args.map(mapExists))
    case InE(x, l, n) => InE(mapExists(x), l.map(mapExists), n)
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
  private def score(op: Op): Int = op match {
    case Values(_, rows) => -10 + rows.size.min(5)
    case Scan(s, p, o, _) =>
      val consts = Seq(s, p, o).count(_.isInstanceOf[T])
      val predConst = if (p.isInstanceOf[T]) 1 else 0
      10 - consts * 3 - predConst
    case Singleton => 100 // unit row: join it last, it constrains nothing
    case other => 8 - (3 min assuredVars(other).size)
  }

  private def order(leaves: List[Op]): List[Op] = {
    if (leaves.size <= 2) return leaves.sortBy(score)
    val remaining = scala.collection.mutable.ListBuffer(leaves: _*)
    val out = scala.collection.mutable.ListBuffer.empty[Op]
    var bound = Set.empty[String]
    val first = remaining.minBy(score)
    remaining -= first
    out += first
    bound ++= vars(first)
    while (remaining.nonEmpty) {
      val connected = remaining.filter(l => (vars(l) intersect bound).nonEmpty)
      val next =
        if (connected.nonEmpty) connected.minBy(score)
        else remaining.minBy(score) // original plan was cross-joined too
      remaining -= next
      out += next
      bound ++= vars(next)
    }
    out.toList
  }
}
