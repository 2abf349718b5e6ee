package graft.io

import graft.rdf.{Term, TermSchema}
import graft.sparql.{Algebra, BgpOptimizer, Compiler, ExprCompiler, Sparql, SparqlParser}
import graft.sparql.Algebra._
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dictionary-encoded quad store — the classic scale architecture of
  * native RDF engines (RDF-3X, Jena TDB, Virtuoso): every distinct term
  * maps to one 8-byte integer id, quads are stored as four long
  * columns, and basic graph patterns execute as equi-joins over longs
  * with the term structs joined back in ("late materialization") only
  * for the variables the rest of the query actually needs.
  *
  * Why this matters at 100 TB: the term-struct quad table shuffles
  * ~4 strings per column through every BGP join; the encoded table
  * shuffles 8 bytes. Join keys hash/compare as single longs instead of
  * 4-field structs, shuffle volume drops roughly by the average term
  * length (~20-40×), and min/max pruning on sorted long columns is far
  * tighter than on strings. The dictionary is built ONCE at ingest; the
  * per-query cost is one driver-side constant lookup (a filtered dict
  * scan) plus one materialization join per surviving output variable —
  * both independent of the BGP's intermediate cardinalities, which is
  * where the narrow representation wins.
  *
  * The reference engine has no counterpart (it ships rdf4j `Value`
  * object graphs through every GroupByKey —
  * /root/reference/src/main/scala/es/jolivar/scio/sparql/Interpreter.scala:299-947);
  * this is a Spark-first design choice, not a port.
  *
  * Layout under `path/`:
  *  - `dict/`  parquet `(id: long, term: struct)` — ids are
  *    `monotonically_increasing_id` assigned once at encode and frozen
  *    by the write (collision-free by construction, unlike hash ids,
  *    which at ~10^11 distinct terms would see birthday collisions);
  *  - `quads/` parquet `(s,p,o: long, g: long nullable)`, repartitioned
  *    by (p, s) and sorted within partitions — same
  *    vertical-partitioning-lite layout as [[QuadsIO.writeParquet]], so
  *    a constant-predicate scan touches few row groups and long min/max
  *    pruning does the rest.
  *
  * Query execution ([[DictStore.sparql]]): the optimized algebra tree
  * is rewritten bottom-up — every maximal id-safe subtree compiles to
  * an id-space pipeline and re-enters the tree as an
  * [[Algebra.Materialized]] leaf carrying term-struct columns for
  * exactly the variables referenced outside it (unused midpoints are
  * pruned BEFORE materialization; pruning a column never changes bag
  * cardinality, so this is safe under any ancestor including
  * DISTINCT). Id-safe ([[isExtBlock]] + dedicated cases): BGP blocks;
  * OPTIONAL / MINUS spines and bag UNIONs (absent vars pad as NULL
  * ids); joins above them when shared vars are assured both sides —
  * including fully-defined VALUES probe lists, which join as local
  * long relations (solution compatibility is term identity, which IS
  * id equality);
  * FILTER [NOT] EXISTS over BGP patterns (long semi/anti joins);
  * EVERY SPARQL aggregate (keys decode post-agg; COUNT/SAMPLE over
  * plain vars run on bare ids, MIN/MAX over plain vars compare
  * dict-joined sort keys, and SUM/AVG/GROUP_CONCAT plus any aggregate
  * over a computed expression hybrid-decode their inputs into the
  * shared Compiler.aggAccumulator); ORDER BY + LIMIT top-k (sort on
  * skeys — dict-joined or computed — and decode k rows);
  * DISTINCT/REDUCED (dedup before decode); `+`/`*` closures
  * (per-round frontier joins on longs); term-identity filters as
  * long predicates; and ANY other scalar FILTER, OPTIONAL condition
  * or BIND via the HYBRID decode — only the expression's variables
  * join their terms back in and it evaluates through the standard
  * ExprCompiler, so value semantics are shared code, not a
  * re-implementation; zero-length paths in every endpoint shape
  * (var-var enumerates scoped nodes in id space; constant ends bind
  * from the literal — the term may be dict-absent — with named graphs
  * enumerated in id space), and `*` with a constant end as
  * Distinct(zero ∪ id-space `+` closure). The one remaining
  * standard-compiler fallback: BOTH-constant `*`/`+` existence probes
  * (a driver-bounded boolean over one closure; no variable to carry
  * ids for). The fast path can never change semantics, only the plan
  * under it.
  */
final class DictStore private (val spark: SparkSession,
                               val dict: DataFrame,
                               val idQuads: DataFrame,
                               val stats: Option[graft.sparql.QuadsStats],
                               lookupDict: Option[DataFrame] = None) {

  /** Term-struct view of the store: the four id columns joined back
    * against the dictionary (g via left join — NULL g is the default
    * graph, not a term). Residual operators that genuinely need term
    * structs (property paths, EXISTS subpatterns, GRAPH enumeration)
    * compile against this; Catalyst pushes their constant-term filters
    * through the join onto the dict scan. */
  lazy val decodedQuads: DataFrame = {
    def d(i: Int) = dict.select(col("id").as(s"__di$i"), col("term").as(s"__dt$i"))
    idQuads
      .join(d(0), col("s") === col("__di0"))
      .join(d(1), col("p") === col("__di1"))
      .join(d(2), col("o") === col("__di2"))
      .join(d(3), col("g") === col("__di3"), "left_outer")
      .select(col("__dt0").as("s"), col("__dt1").as("p"),
        col("__dt2").as("o"), col("__dt3").as("g"))
  }

  /** Decode the store back to a term-struct quads DataFrame (export /
    * re-encode path). */
  def decode(): DataFrame = decodedQuads

  /** Execute a SPARQL query with the id-space BGP fast path. Query
    * forms and result schemas match [[Sparql.QuadsOps.sparql]].
    * FROM / FROM NAMED apply as a pre-transform of the LONG quad
    * table ([[withDataset]]), so dataset-scoped queries keep the full
    * fast path. */
  def sparql(query: String): DataFrame = SparqlParser.parseAny(query) match {
    case SparqlParser.SelectQuery(op, ds) =>
      val st = withDataset(ds)
      Compiler.run(st.decodedQuads, st.rewrite(BgpOptimizer.optimize(op, stats)))
    case SparqlParser.AskQuery(op, ds) =>
      val st = withDataset(ds)
      Compiler.runAsk(st.decodedQuads, st.rewrite(BgpOptimizer.optimize(op, stats)))
    case SparqlParser.ConstructQuery(template, op, ds) =>
      val st = withDataset(ds)
      Compiler.runConstruct(st.decodedQuads, template,
        st.rewrite(BgpOptimizer.optimize(op, stats)))
    case _ => Sparql.QuadsOps(decodedQuads).sparql(query)
  }

  /** The dataset-scoped view of this store: [[Sparql.applyDataset]]'s
    * graph selection and default-graph retag transplanted to the long
    * quad table — FROM graphs filter by g id and retag to NULL (the
    * default graph), FROM NAMED restricts the named graphs, bag
    * semantics throughout. Graph names resolve by LEXICAL like the
    * term-struct path (a lex-pruned dict lookup); only graph-name
    * terms can occupy the g position, so lex-based ids are exact. */
  private def withDataset(ds: SparqlParser.DatasetSpec): DictStore =
    if (ds.isEmpty) this
    else {
      def ids(sel: Seq[Term]): Seq[Long] = {
        val lexes = sel.map(_.lex).distinct
        lookupDict.getOrElse(dict)
          .filter(col("term.lex").isin(lexes: _*))
          .select(col("id")).collect().map(_.getLong(0)).toSeq
      }
      def graphs(sel: Seq[Term]) = {
        val selIds = ids(sel)
        idQuads.filter(col("g").isNotNull &&
          (if (selIds.isEmpty) lit(false) else col("g").isin(selIds: _*)))
      }
      val default =
        if (ds.from.isEmpty) None
        else Some(graphs(ds.from)
          .withColumn("g", lit(null).cast(LongType)))
      val named =
        if (ds.fromNamed.isEmpty) None else Some(graphs(ds.fromNamed))
      val scoped = (default ++ named).reduceOption(_ union _)
        .getOrElse(idQuads.limit(0))
      new DictStore(spark, dict, scoped, stats, lookupDict)
    }

  // ----- the BGP block rewriter -----

  /** Replace every maximal Scan/Join-only subtree with a Materialized
    * leaf compiled in id space. SERVICE children are untouched (they
    * evaluate against a different dataset); EXISTS patterns are left to
    * the standard compiler (their correlated-filter lifting inspects
    * pattern structure). */
  private[graft] def rewrite(root: Op): Op = {
    val totalRefs = countRefs(root)
    // output variables of the whole query stay materialized even when
    // nothing inside the tree references them again (CONSTRUCT
    // templates, DESCRIBE targets and pre-binding read them by name)
    val keepAlways = Algebra.vars(root)
    // COUNT(DISTINCT *) counts distinct over ALL visible columns
    // without naming any variable, so reference counting cannot see
    // it — pruning a midpoint would shrink its distinct key. Disable
    // pruning for the whole query when one exists anywhere.
    val noPrune = usesDistinctStar(root)
    // vars a materialized subtree must keep: everything, or just those
    // referenced again outside `scope` (shared by the block and
    // Filter-EXISTS cases so the pruning rule cannot diverge)
    def keepFor(scope: Op, produced: List[String]): List[String] =
      if (noPrune) produced
      else {
        val scopeRefs = countRefs(scope)
        produced.filter(v =>
          keepAlways.contains(v) ||
            totalRefs.getOrElse(v, 0) > scopeRefs.getOrElse(v, 0))
      }
    def go(op: Op): Op = op match {
      case b if isBlock(b) || isExtBlock(b) =>
        val keep = keepFor(b, Algebra.varsOrdered(b))
        Materialized(compileExtBlock(b, keep), keep,
          assuredIdVars(b) intersect keep.toSet)
      case Join(l, r) => Join(go(l), go(r))
      case LeftJoin(l, r, c) => LeftJoin(go(l), go(r), c)
      case Union(l, r) => Union(go(l), go(r))
      case Minus(l, r) => Minus(go(l), go(r))
      case Group(c, keys, aggs) if groupCountEligible(c, keys, aggs) =>
        // group keys over assured vars stay assured; aggregate
        // outputs can be NULL (empty-group SAMPLE, poisoned SUM)
        Materialized(compileGroupCountIds(c, keys, aggs),
          keys ++ aggs.map(_._1), keys.toSet intersect assuredIdVars(c))
      // ORDER BY vars + LIMIT directly over a block: top-k in id
      // space — sort keys join in from the dictionary, the limit runs
      // over (skey, id) rows, and only the surviving k rows decode
      case sl @ Slice(Order(c, keys), off, lim)
        if orderSliceEligible(c, keys, off, lim) =>
        val keep = keepFor(sl, Algebra.varsOrdered(c))
        Materialized(compileTopKIds(c, keys, off, lim.get, keep), keep,
          assuredIdVars(c) intersect keep.toSet)
      // plain SELECT stacks Slice(Project(Order(block))) — same top-k,
      // the projection fixing exactly which vars decode
      case Slice(Project(Order(c, keys), vs), off, lim)
        if vs.forall(Algebra.vars(c).contains) &&
          orderSliceEligible(c, keys, off, lim) =>
        Materialized(compileTopKIds(c, keys, off, lim.get, vs), vs,
          assuredIdVars(c) intersect vs.toSet)
      // DISTINCT/REDUCED directly over a (projected) block: dedup on
      // long tuples, decode only the SURVIVING rows (bijection ⇒ id
      // distinctness ≡ term distinctness, NULLs included)
      case Distinct(Project(c, vs))
        if idSource(c).isDefined && vs.forall(Algebra.vars(c).contains) =>
        Materialized(compileDistinctIds(c, vs), vs,
          assuredIdVars(c) intersect vs.toSet)
      case Reduced(Project(c, vs))
        if idSource(c).isDefined && vs.forall(Algebra.vars(c).contains) =>
        Materialized(compileDistinctIds(c, vs), vs,
          assuredIdVars(c) intersect vs.toSet)
      case Distinct(c) if idSource(c).isDefined =>
        val vs = Algebra.varsOrdered(c)
        Materialized(compileDistinctIds(c, vs), vs,
          assuredIdVars(c) intersect vs.toSet)
      case Reduced(c) if idSource(c).isDefined =>
        val vs = Algebra.varsOrdered(c)
        Materialized(compileDistinctIds(c, vs), vs,
          assuredIdVars(c) intersect vs.toSet)
      case f @ Filter(c, e) => filterEligible(c, e) match {
        case Some(conjs) =>
          val keep = keepFor(f, Algebra.varsOrdered(c))
          Materialized(compileFilterIds(c, conjs, keep), keep,
            assuredIdVars(c) intersect keep.toSet)
        case None => Filter(go(c), e)
      }
      // BIND over a block: the expression's vars hybrid-decode, the
      // bound value computes as a term column riding the id frame, and
      // the block still materializes late (SPARQL scoping guarantees
      // the bound name is fresh in the group pattern)
      case ex @ Extend(c, n, e)
        if isExtBlock(c) && !hasExists(e) && !Algebra.vars(c).contains(n) =>
        // the bound name is NOT assured (the expression may error)
        val keep = keepFor(ex, Algebra.varsOrdered(c) :+ n)
        Materialized(compileExtendIds(c, n, e, keep), keep,
          assuredIdVars(c) intersect keep.toSet)
      case Extend(c, n, e) => Extend(go(c), n, e)
      case Project(c, vs) => Project(go(c), vs)
      case Distinct(c) => Distinct(go(c))
      case Reduced(c) => Reduced(go(c))
      case Group(c, k, a) => Group(go(c), k, a)
      case Order(c, k) => Order(go(c), k)
      case Slice(c, o, l) => Slice(go(c), o, l)
      case alp: ArbitraryLengthPath if alpEligible(alp) =>
        val (df, vs) = compileAlpIds(alp)
        Materialized(df, vs, vs.toSet) // path endpoints bind every row
      // `*` with ONE constant end: split into zero ∪ plus. ALP output
      // is set-semantics over its bindings, so Distinct(Union(·,·)) is
      // exact; the zero branch binds the (possibly dict-absent)
      // constant from its literal, and the plus branch closes in id
      // space — the closure, the expensive part, keeps 8-byte keys
      case alp: ArbitraryLengthPath
        if alp.includeZero && isBlock(alp.edge) &&
          List(alp.s, alp.o).count {
            case T(_) => true; case _ => false } == 1 =>
        go(Distinct(Union(ZeroLengthPath(alp.s, alp.o, alp.g),
          alp.copy(includeZero = false))))
      case alp: ArbitraryLengthPath => alp.copy(edge = go(alp.edge))
      case ZeroLengthPath(V(sv), V(ov), g) =>
        val (df, vs) = compileZeroLengthIds(sv, ov, g)
        Materialized(df, vs, vs.toSet)
      // constant-end zero-length: a driver-built constant row — the
      // term may be ABSENT from the data and hence the dictionary, so
      // the binding comes from the literal, not an id; only the
      // named-graph enumeration (under GRAPH ?g) touches the store,
      // and it runs in id space with a k-row decode
      case zl: ZeroLengthPath =>
        val (df, vs) = compileZeroLengthConstIds(zl)
        Materialized(df, vs, vs.toSet)
      case leaf => leaf // Scan handled by isBlock; Service/Values/… stay
    }
    go(root)
  }

  /** A BGP block: a Join tree whose every leaf is a Scan. */
  private def isBlock(op: Op): Boolean = op match {
    case _: Scan => true
    case Join(l, r) => isBlock(l) && isBlock(r)
    case _ => false
  }

  /** Extended id-space block: a spine of condition-free OPTIONAL and
    * MINUS nodes whose left arm is itself an extended block and whose
    * right arm is a pure BGP — at 100 TB these are exactly the
    * shuffles that want 8-byte keys, so they should not force the
    * whole query back onto term structs. Soundness guards, per node:
    *  - every variable shared between the arms is ASSURED on both
    *    sides (right is a BGP, so its vars are assured by definition;
    *    the left-side check excludes vars introduced by an inner
    *    OPTIONAL), which reduces SPARQL's compat join / MINUS
    *    domain-overlap semantics to plain long equality — no NULL
    *    matches-anything cases can arise;
    *  - at least one shared variable (a shared-nothing OPTIONAL is a
    *    cross product and a shared-nothing MINUS is the identity —
    *    both stay on the standard compiler);
    *  - OPTIONAL conditions must be EXISTS-free scalars (evaluated on
    *    the merged row via hybrid-decoded term columns, see the
    *    LeftJoin case of [[idsOf]]). */
  private def isExtBlock(op: Op): Boolean = op match {
    case b if isBlock(b) => true
    case LeftJoin(l, r, None) => isExtSpine(l, r)
    // a conditioned OPTIONAL stays in id space two ways: a right-only
    // term-identity conjunct pre-filters the right pattern (the merged
    // row's value IS the right row's value), and ANY other scalar
    // conjunct without a nested EXISTS evaluates on the merged row
    // during the join through hybrid-decoded term columns — the same
    // ExprCompiler.bool the standard compiler's joinCompat uses
    case LeftJoin(l, r, Some(cond)) =>
      isExtSpine(l, r) && conjunctsOf(cond).map(normNeg).forall(e =>
        (idPred(r, e) && exprVarsOf(e).subsetOf(Algebra.vars(r))) ||
          !hasExists(e))
    case Minus(l, r) => isExtSpine(l, r)
    // bag UNION works on ids directly (absent vars pad as NULL longs)
    case Union(l, r) => isExtBlock(l) && isExtBlock(r)
    // Joins ABOVE unions/optionals are id-safe only when every shared
    // var is assured on BOTH sides — a possibly-null shared var needs
    // SPARQL compat semantics (NULL matches anything), which a long
    // equi-join would get wrong; those stay on the standard compiler.
    // A fully-defined VALUES may sit on either side as a probe list
    // when ALL its vars are shared with the data side: SPARQL solution
    // compatibility is TERM identity, i.e. id equality, and a constant
    // absent from the dictionary maps to sentinel -1, which no real id
    // equals — the row correctly never joins. (Values-only vars are
    // excluded because an unmatched -1 could never decode back to its
    // term; two VALUES may not join each other — both sides could map
    // DIFFERENT absent terms to -1 and falsely match.)
    case Join(l, r) =>
      def dataSide(x: Op) = isExtBlock(x)
      def valuesSide(x: Op, other: Op) = idSafeValues(x) &&
        Algebra.vars(x).subsetOf(Algebra.vars(other))
      val ok = (dataSide(l) && dataSide(r)) ||
        (dataSide(l) && valuesSide(r, l)) ||
        (dataSide(r) && valuesSide(l, r))
      ok && {
        val shared = Algebra.vars(l).intersect(Algebra.vars(r))
        shared.subsetOf(assuredIdVars(l)) && shared.subsetOf(assuredIdVars(r))
      }
    case _ => false
  }

  /** A VALUES block with no UNDEF anywhere — only then is every cell a
    * constant term the dictionary can (fail to) resolve; an UNDEF cell
    * needs compat NULL-matches-anything semantics. */
  private def idSafeValues(op: Op): Boolean = op match {
    case Values(_, rows) => rows.forall(_.forall(_.isDefined))
    case _ => false
  }

  private def isExtSpine(l: Op, r: Op): Boolean =
    isExtBlock(l) && isBlock(r) && {
      val shared = Algebra.vars(l).intersect(Algebra.vars(r))
      shared.nonEmpty && shared.subsetOf(assuredIdVars(l))
    }

  /** Vars bound in EVERY row of an extended block: all vars of pure
    * BGPs; an OPTIONAL's right-only vars and a UNION's one-branch
    * vars are merely possible. */
  private def assuredIdVars(op: Op): Set[String] = op match {
    case b if isBlock(b) => Algebra.vars(b)
    case LeftJoin(l, _, _) => assuredIdVars(l)
    case Minus(l, _) => assuredIdVars(l)
    case Union(l, r) => assuredIdVars(l).intersect(assuredIdVars(r))
    case Join(l, r) => assuredIdVars(l) ++ assuredIdVars(r)
    case v: Values if idSafeValues(v) => Algebra.vars(v)
    // a filter only DROPS rows: whatever was assured below it stays
    // assured in the survivors
    case Filter(c, _) => assuredIdVars(c)
    case _ => Set.empty
  }

  /** Any DISTINCT aggregate over `*` (expr = None) in the tree — the
    * one shape whose result depends on columns no variable reference
    * names (see [[rewrite]]). */
  private def usesDistinctStar(op: Op): Boolean = {
    def ex(e: Expr): Boolean = e match {
      case AggE(_, true, None, _) => true
      case AggE(_, _, eo, _) => eo.exists(ex)
      case FuncE(_, args) => args.exists(ex)
      case InE(x, l, _) => ex(x) || l.exists(ex)
      case ExistsE(p, _) => usesDistinctStar(p)
      case _ => false
    }
    op match {
      case Join(l, r) => usesDistinctStar(l) || usesDistinctStar(r)
      case LeftJoin(l, r, c) =>
        usesDistinctStar(l) || usesDistinctStar(r) || c.exists(ex)
      case Union(l, r) => usesDistinctStar(l) || usesDistinctStar(r)
      case Minus(l, r) => usesDistinctStar(l) || usesDistinctStar(r)
      case Filter(c, e) => usesDistinctStar(c) || ex(e)
      case Extend(c, _, e) => usesDistinctStar(c) || ex(e)
      case Project(c, _) => usesDistinctStar(c)
      case Distinct(c) => usesDistinctStar(c)
      case Reduced(c) => usesDistinctStar(c)
      case Group(c, _, aggs) =>
        usesDistinctStar(c) || aggs.exists(a => ex(a._2))
      case Order(c, keys) => usesDistinctStar(c) || keys.exists(k => ex(k._1))
      case Slice(c, _, _) => usesDistinctStar(c)
      case Service(_, c, _) => usesDistinctStar(c)
      case alp: ArbitraryLengthPath => usesDistinctStar(alp.edge)
      case _ => false
    }
  }

  /** Every variable reference anywhere in the tree, counted — the
    * pruning test is "does v occur more often in the whole query than
    * inside this block", which is occurrence-exact even when the same
    * name appears both inside and outside. */
  private def countRefs(op: Op): Map[String, Int] =
    refs(op).groupBy(identity).map { case (k, v) => (k, v.size) }

  private def refs(op: Op): List[String] = {
    def pos(x: VarOrTerm) = x match { case V(n) => List(n); case _ => Nil }
    def gs(g: GraphSpec) = g match { case GraphVar(n) => List(n); case _ => Nil }
    def ex(e: Expr): List[String] = e match {
      case VarE(n) => List(n)
      case ConstE(_) => Nil
      case FuncE(_, args) => args.flatMap(ex)
      case InE(x, l, _) => ex(x) ++ l.flatMap(ex)
      case ExistsE(p, _) => refs(p)
      case AggE(_, _, e2, _) => e2.toList.flatMap(ex)
    }
    op match {
      case Scan(s, p, o, g) => pos(s) ++ pos(p) ++ pos(o) ++ gs(g)
      case Singleton => Nil
      case Values(vs, _) => vs
      case Join(l, r) => refs(l) ++ refs(r)
      case LeftJoin(l, r, c) => refs(l) ++ refs(r) ++ c.toList.flatMap(ex)
      case Union(l, r) => refs(l) ++ refs(r)
      case Minus(l, r) => refs(l) ++ refs(r)
      case Filter(c, e) => refs(c) ++ ex(e)
      case Extend(c, n, e) => refs(c) ++ (n :: ex(e))
      case Project(c, vs) => refs(c) ++ vs
      case Distinct(c) => refs(c)
      case Reduced(c) => refs(c)
      case Group(c, keys, aggs) =>
        refs(c) ++ keys ++ aggs.flatMap { case (n, a) => n :: ex(a) }
      case Order(c, keys) => refs(c) ++ keys.flatMap { case (e, _) => ex(e) }
      case Slice(c, _, _) => refs(c)
      case Service(e, c, _) => pos(e) ++ refs(c)
      case Materialized(_, vs, _) => vs
      case ZeroLengthPath(s, o, g) => pos(s) ++ pos(o) ++ gs(g)
      case ArbitraryLengthPath(s, o, e, is, io, _, g) =>
        pos(s) ++ pos(o) ++ refs(e) ++ List(is, io) ++ gs(g)
    }
  }

  // ----- id-space transitive paths -----

  /** The ALP shapes this DIRECT id-space compile expresses: a
    * pure-BGP edge pattern, at least one variable endpoint
    * (both-constant is an existence probe the standard compiler
    * handles), and no zero-length with a constant endpoint — that
    * shape is instead SPLIT by the rewriter into
    * Distinct(ZeroLengthPath ∪ `+`-closure), whose plus branch lands
    * back here. */
  private def alpEligible(alp: ArbitraryLengthPath): Boolean = {
    val constEnds = List(alp.s, alp.o).count { case T(_) => true; case _ => false }
    isBlock(alp.edge) && constEnds < 2 && !(alp.includeZero && constEnds > 0)
  }

  /** ALP closure entirely in id space: the shared scaffolding
    * ([[graft.sparql.Compiler.alpPaths]]/`alpFinish` over
    * `transitiveClosure`) runs with dictionary-id constants and node
    * domains, so the semi-naive rounds join and shuffle single longs
    * and the dictionary joins back in ONCE, after convergence. The
    * subtle path semantics (backward walk, per-graph closure, cycle
    * queries, zero-length domains) exist only in the shared code. */
  private def compileAlpIds(alp: ArbitraryLengthPath): (DataFrame, List[String]) = {
    val endTerms = List(alp.s, alp.o).collect { case T(t) => t }
    val gTerms = alp.g match { case GraphTerm(t) => List(t); case _ => Nil }
    val consts = constIdsOf(
      (scanConstTerms(allScans(alp.edge)) ++ endTerms ++ gTerms).distinct)
    def cid(t: Term): Long = consts.getOrElse(t, -1L)
    val cidCol: Term => Column = t => lit(cid(t))

    val gSel = (alp.g match {
      case GraphVar(n) => Some(n)
      case _ => None
    }).map(n => col(n).as("g")).toSeq
    val edgeFrame = flattenJoins(alp.edge).map(scanIds(_, consts))
      .reduceLeft { (l, r) =>
        val shared = l.columns.intersect(r.columns).toSeq
        if (shared.isEmpty) l.crossJoin(r) else l.join(r, shared)
      }
    val edges = GraftColumnBridge.freshLeaf(
      edgeFrame
        .select(gSel ++ Seq(col(alp.innerS).as("src"),
          col(alp.innerO).as("dst")): _*)
        .dropDuplicates()
        .localCheckpoint(eager = false))

    val paths = graft.sparql.Compiler.alpPaths(alp, edges, cidCol,
      () => idGraphNodes(alp.g, cid),
      _ => throw new IllegalStateException(
        "zero-length with a constant endpoint is ineligible in id space"))
    val (df, names) = graft.sparql.Compiler.alpFinish(paths, alp, cidCol)
    (materialize(df, names), names)
  }

  /** All node ids (subject or object position) of the scoped graph —
    * zero-length path domain, shared by the ALP and ZeroLengthPath
    * id-space compilers. */
  private def idGraphNodes(g: GraphSpec, cid: Term => Long): DataFrame = {
    val scoped = g match {
      case DefaultGraph => idQuads.filter(col("g").isNull)
      case GraphTerm(t) => idQuads.filter(col("g") === lit(cid(t)))
      case GraphVar(_) => idQuads.filter(col("g").isNotNull)
    }
    g match {
      case GraphVar(_) =>
        scoped.select(col("s").as("node"), col("g"))
          .union(scoped.select(col("o").as("node"), col("g")))
          .dropDuplicates()
      case _ =>
        scoped.select(col("s").as("node"))
          .union(scoped.select(col("o").as("node")))
          .dropDuplicates()
    }
  }

  /** Constant-end (and both-constant) zero-length path: ≤ 1 row per
    * graph context, built on the driver from the LITERAL term — a
    * zero-length path binds a constant to itself even when the term
    * is absent from the data, and an absent term has no dictionary
    * id, so the binding must come from the literal. Under GRAPH ?g
    * the named-graph set enumerates in id space (distinct over one
    * long column) and decodes k rows. Mirrors the standard compiler's
    * `compileZeroLength` constant cases exactly, including the
    * empty-but-typed frame for unequal constant ends. */
  private def compileZeroLengthConstIds(
      zl: ZeroLengthPath): (DataFrame, List[String]) = {
    val ec = new graft.sparql.ExprCompiler(_ => graft.sparql.TermFns.nullTerm)
    val gVar = zl.g match { case GraphVar(n) => Some(n); case _ => None }
    val binds: List[(String, Column)] = (zl.s, zl.o) match {
      case (T(_), T(_)) => Nil // row presence decided below
      case (V(sv), T(t)) => List(sv -> ec.termCol(t))
      case (T(t), V(ov)) => List(ov -> ec.termCol(t))
      case (V(_), V(_)) => throw new IllegalStateException(
        "var-var zero-length is compiled by compileZeroLengthIds")
    }
    val names = gVar.toList ++ binds.map(_._1)
    val bothConstEmpty = (zl.s, zl.o) match {
      case (T(ts), T(to)) => ts != to
      case _ => false
    }
    val base: DataFrame = gVar match {
      case Some(n) =>
        // named graphs in id space; decode the k surviving graph terms
        materialize(idQuads.filter(col("g").isNotNull)
          .select(col("g").as(n)).dropDuplicates(), List(n))
      case None => spark.range(1).toDF()
    }
    val rows = if (bothConstEmpty) base.limit(0) else base
    val df = binds.foldLeft(rows) { case (d, (v, c)) => d.withColumn(v, c) }
    (df.select(names.map(col): _*), names)
  }

  /** Var-var zero-length path: every node of the scoped graph bound
    * to itself, entirely in id space. */
  private def compileZeroLengthIds(sv: String, ov: String,
                                   g: GraphSpec): (DataFrame, List[String]) = {
    val cids = constIdsOf(g match { case GraphTerm(t) => List(t); case _ => Nil })
    val nodes = idGraphNodes(g, t => cids.getOrElse(t, -1L))
    val gVar = g match { case GraphVar(n) => Some(n); case _ => None }
    val gSel = gVar.map(_ => col("g")).toList
    val names = gVar.toList ++ (if (sv == ov) List(sv) else List(sv, ov))
    val df0 =
      if (sv == ov) nodes.select(gSel :+ col("node").as(sv): _*)
      else nodes.select(gSel ++ List(col("node").as(sv), col("node").as(ov)): _*)
    val df = gVar.map(n => df0.withColumnRenamed("g", n)).getOrElse(df0)
    (materialize(df, names), names)
  }

  // ----- id-space block compilation -----

  /** Compile a Scan/Join tree entirely in id space, then join the dict
    * back in once per kept variable. The flattened leaf order is the
    * BgpOptimizer's (selectivity-greedy, connected); joins are plain
    * long equi-joins — every variable in a BGP is assured, so no
    * compat conditions and no null-safe comparisons are needed. */
  /** Compile an extended block ([[isExtBlock]]) in id space: pure BGP
    * sub-blocks reduce as long equi-joins; OPTIONAL becomes a
    * left-outer join (unmatched right → NULL long ids), MINUS a
    * left-anti join — both on the shared assured vars, so SPARQL
    * compat is plain equality. One dict lookup covers the constants
    * of ALL scans in the spine. */
  /** All constants an extended block's id compilation needs: scan
    * constants plus ConstE terms inside OPTIONAL conditions. */
  private def blockConsts(op: Op): Map[Term, Long] =
    constIdsOf((scanConstTerms(allScans(op)) ++ condConstTerms(op)).distinct)

  private def condConstTerms(op: Op): List[Term] = op match {
    case LeftJoin(l, r, c) =>
      condConstTerms(l) ++ condConstTerms(r) ++
        c.toList.flatMap(conjunctsOf).flatMap {
          case FuncE(_, args) => args.collect { case ConstE(t) => t }
          case _ => Nil
        }
    case Join(l, r) => condConstTerms(l) ++ condConstTerms(r)
    case Minus(l, r) => condConstTerms(l) ++ condConstTerms(r)
    case Union(l, r) => condConstTerms(l) ++ condConstTerms(r)
    case Values(_, rows) => rows.flatten.flatten
    case _ => Nil
  }

  private def idOperand(x: Expr, consts: Map[Term, Long]): Column = x match {
    case VarE(v) => col(v)
    case ConstE(t) => lit(consts.getOrElse(t, -1L))
    case other => throw new IllegalStateException(s"not an id operand: $other")
  }

  private def exprVarsOf(e: Expr): Set[String] = e match {
    case VarE(n) => Set(n)
    case ConstE(_) => Set.empty
    case FuncE(_, args) => args.flatMap(exprVarsOf).toSet
    case InE(x, l, _) => (x :: l).flatMap(exprVarsOf).toSet
    case ExistsE(p, _) => Algebra.vars(p)
    case AggE(_, _, eo, _) => eo.toList.flatMap(exprVarsOf).toSet
  }

  /** Term-IDENTITY predicate over `scope`'s vars: sameTerm for any
    * operands; `=` only against a constant IRI (see [[filterEligible]]
    * for why literal `=` cannot be an id predicate). */
  private def idPred(scope: Op, e: Expr): Boolean = e match {
    case FuncE("SAMETERM", List(a, b)) =>
      List(a, b).exists(_.isInstanceOf[VarE]) && List(a, b).forall {
        case VarE(v) => Algebra.vars(scope).contains(v)
        case ConstE(_) => true
        case _ => false
      }
    case FuncE("=", List(VarE(v), ConstE(_: graft.rdf.Iri))) =>
      Algebra.vars(scope).contains(v)
    case FuncE("=", List(ConstE(_: graft.rdf.Iri), VarE(v))) =>
      Algebra.vars(scope).contains(v)
    case _ => false
  }

  private def compileExtBlock(block: Op, keep: List[String]): DataFrame =
    materialize(idsOf(block, blockConsts(block)), keep,
      Algebra.vars(block) -- assuredIdVars(block))

  /** The id-space frame of an extended block, shared by the block,
    * EXISTS and ALP compilers. */
  private def idsOf(op: Op, consts: Map[Term, Long],
                    typedWanted: Set[String] = Set.empty): DataFrame = op match {
    case b if isBlock(b) =>
      // each typed-wanted var is carried by exactly ONE scan (its
      // first object-position binding, falling back to a subject-
      // position binding on v6 stores): join equality makes every
      // binding agree on the value, and a second copy would otherwise
      // enter the equi-join key set, where NULL keys drop rows
      var remaining = typedWanted
      flattenJoins(b).map { sc =>
        val tvO = sc.o match {
          case V(n) if remaining.contains(n) => remaining -= n; Some(n)
          case _ => None
        }
        val tvS = sc.s match {
          case V(n) if hasSubjSidecar && remaining.contains(n) =>
            remaining -= n; Some(n)
          case _ => None
        }
        scanIds(sc, consts, tvO, tvS)
      }.reduceLeft { (l, r) =>
        val shared = l.columns.intersect(r.columns).toSeq
        if (shared.isEmpty) l.crossJoin(r) else l.join(r, shared)
      }
    case LeftJoin(l, r, cond) =>
      // right-only conditions pre-filter the right side BEFORE the
      // join (equivalent because they reference no left var: matched
      // rows see the same verdict, unmatched left rows pad with NULLs
      // either way): term-identity ones as long comparisons, numeric/
      // temporal-vs-constant ones on the typed sidecar (zero dict
      // joins — the OPTIONAL face of the typed FILTER fast path).
      // Everything else evaluates on the MERGED row during the join
      // (guarded eligible in isExtBlock).
      val conjs = cond.toList.flatMap(conjunctsOf).map(normNeg)
      def rightOnly(e: Expr) = exprVarsOf(e).subsetOf(Algebra.vars(r))
      val (preConjs, rest) = conjs.partition(e => idPred(r, e) && rightOnly(e))
      val rTypedObjVars: Set[String] = typedSidecarVars(r)
      val (typedPre, mergedConjs) = rest.partition(e =>
        rightOnly(e) && typedEligible(e, rTypedObjVars))
      val typedPreVars = typedPre.flatMap(typedShape).map(_._1).distinct
      val ld = idsOf(l, consts)
      val rd0 = idsOf(r, consts, typedPreVars.toSet)
      var rd = preConjs.foldLeft(rd0) {
        case (acc, FuncE(_, List(a, b))) =>
          acc.filter(idOperand(a, consts) === idOperand(b, consts))
        case (_, other) =>
          throw new IllegalStateException(s"not id-expressible: $other")
      }
      typedPre.foreach(e => rd = rd.filter(typedCond(e)))
      if (typedPreVars.nonEmpty)
        rd = rd.drop(typedPreVars.flatMap(v =>
          Seq(tcCol(v), tdCol(v), teCol(v), ttCol(v))): _*)
      val shared = ld.columns.intersect(rd.columns).toSeq
      if (mergedConjs.isEmpty) ld.join(rd, shared, "left_outer")
      else {
        // hybrid decode on the owning side: shared vars read the left
        // copy (join equality makes the sides agree on matched rows),
        // right-only vars the right copy — the merged-row resolver of
        // the standard compiler's joinCompat, restricted to the vars
        // the condition actually references
        val condVars = mergedConjs.flatMap(exprVarsOf).distinct
        val lNullable = Algebra.vars(l) -- assuredIdVars(l)
        val ldD = decodeVars(ld,
          condVars.filter(ld.columns.contains), lNullable)
        val rdD = decodeVars(rd,
          condVars.filter(v => !ld.columns.contains(v) &&
            rd.columns.contains(v)), Set.empty) // right is a BGP: assured
        val rename = shared.map(v => v -> s"__rj_$v").toMap
        val rdR = rename.foldLeft(rdD) { case (d, (v, rv)) =>
          d.withColumnRenamed(v, rv) }
        val keyConds = shared.map(v => ldD(v) === rdR(rename(v)))
        val ec = new ExprCompiler(n =>
          if (ldD.columns.contains(tvCol(n))) ldD(tvCol(n))
          else if (rdR.columns.contains(tvCol(n))) rdR(tvCol(n))
          else graft.sparql.TermFns.nullTerm)
        val joinCond = (keyConds :+ mergedConjs.map(ec.bool).reduce(_ && _))
          .reduce(_ && _)
        val outCols = (ld.columns ++ rd.columns).distinct.toIndexedSeq
        ldD.join(rdR, joinCond, "left_outer")
          .select(outCols.map(v =>
            (if (ld.columns.contains(v)) ldD(v) else rdR(v)).as(v)): _*)
      }
    case Minus(l, r) =>
      val (ld, rd) = (idsOf(l, consts), idsOf(r, consts))
      val shared = ld.columns.intersect(rd.columns).toSeq
      ld.join(rd.select(shared.map(col): _*), shared, "left_anti")
    case Union(l, r) =>
      val (ld, rd) = (idsOf(l, consts), idsOf(r, consts))
      val allCols = (ld.columns ++ rd.columns).distinct.toIndexedSeq
      def pad(df: DataFrame) = df.select(allCols.map(c =>
        (if (df.columns.contains(c)) col(c)
         else lit(null).cast(LongType)).as(c)): _*)
      pad(ld).unionByName(pad(rd))
    case Join(l, r) => // mixed join above unions/optionals (guarded assured)
      val (ld, rd) = (idsOf(l, consts), idsOf(r, consts))
      val shared = ld.columns.intersect(rd.columns).toSeq
      if (shared.isEmpty) ld.crossJoin(rd) else ld.join(rd, shared)
    case Values(vs, rows) => // probe list as a local long relation
      val schema = StructType(vs.map(StructField(_, LongType, nullable = false)))
      val data = new java.util.ArrayList[org.apache.spark.sql.Row]()
      rows.foreach { r =>
        data.add(org.apache.spark.sql.Row(
          r.map(t => consts.getOrElse(t.get, -1L)): _*))
      }
      spark.createDataFrame(data, schema)
    case other => throw new IllegalStateException(s"not an ext block: $other")
  }

  // ----- id-space aggregation -----

  /** Every SPARQL aggregate over a plain variable stays in id space:
    * the groupBy shuffle carries long keys and only the (group-sized,
    * post-agg) key and witness columns decode through the dictionary.
    *  - COUNT/SAMPLE are representation-blind — COUNT(?v) counts bound
    *    rows (id NULL-ness ⇔ term NULL-ness) and the dict is a
    *    bijection, so distinct ids ⇔ distinct terms; SAMPLE may return
    *    ANY group value by spec, and a decoded first-id IS one.
    *  - MIN/MAX compare the SAME total-order sort key as the standard
    *    compiler, joined in from a dictionary projection (the key is
    *    injective on terms, so the id tiebreak is inert); only the
    *    group-sized winners decode.
    *  - SUM/AVG/GROUP_CONCAT — and ANY aggregate over a computed
    *    expression — genuinely consume term values, so their input
    *    variables hybrid-decode pre-agg and the value feeds the SHARED
    *    [[graft.sparql.Compiler.aggAccumulator]]; the group keys stay
    *    8-byte longs through the shuffle, and keys still decode only
    *    post-agg.
    *  - DISTINCT SUM/AVG transplants the standard compiler's pre-dedup
    *    side pass: the dedup runs on LONG tuples (for a plain var the
    *    id is the distinctness witness — bijection again) and only the
    *    already-deduplicated stream decodes for accumulation.
    * Only nested-EXISTS aggregate expressions fall back. */
  private val aggFuncs =
    Set("COUNT", "SUM", "AVG", "MIN", "MAX", "SAMPLE", "GROUP_CONCAT")

  private def groupCountEligible(c: Op, keys: List[String],
                                 aggs: List[(String, AggE)]): Boolean =
    aggs.nonEmpty && idSource(c).isDefined &&
      keys.forall(Algebra.vars(c).contains) &&
      aggs.forall { case (_, a) =>
        aggFuncs.contains(a.func) &&
          (a.expr match {
            case None => a.func == "COUNT" // COUNT(*) / COUNT(DISTINCT *)
            case Some(e) => !hasExists(e) // any scalar expr hybrid-decodes
          })
      }

  /** Join the dictionary's sort key in for each of `vars` (as column
    * `__sk_<var>`): the dict side is a projection `(id, sortKey(term))`
    * computed on the fly — never persisted, so it always reflects the
    * session's time zone, exactly like the standard compiler's row-side
    * sortKey. LEFT OUTER for vars an OPTIONAL may have left NULL. */
  private def joinSortKeys(df0: DataFrame, vars: List[String],
                           nullable: Set[String]): DataFrame = {
    // a var whose term is ALREADY hybrid-decoded derives its sort key
    // from that column — one dict join per var, never two
    val (derivable, joinable) =
      vars.partition(v => df0.columns.contains(tvCol(v)))
    val joined = joinDictCols(df0, joinable, nullable,
      graft.sparql.TermFns.sortKey, skCol)
    derivable.foldLeft(joined)((d, v) =>
      d.withColumn(skCol(v), graft.sparql.TermFns.sortKey(col(tvCol(v)))))
  }

  private def skCol(v: String): String = s"__sk_$v"

  /** One dict join per var, projecting `proj(term)` as `name(var)` —
    * LEFT OUTER where an OPTIONAL may have left the id NULL (unbound
    * stays unbound). Shared by the term decode ([[decodeVars]]) and
    * the sort-key join ([[joinSortKeys]]), so the two cannot drift. */
  private def joinDictCols(df0: DataFrame, vars: List[String],
                           nullable: Set[String], proj: Column => Column,
                           name: String => String): DataFrame = {
    var df = df0
    // ONE canonical dict-side subtree for every var (fixed alias
    // names; the per-var name is a rename ABOVE the join): the N
    // per-var joins then reference plan-identical subtrees, so
    // Spark's ReuseExchange materializes the dict scan + broadcast
    // hash relation ONCE per query instead of once per decoded var
    // (round-20: two full-dict broadcast builds per 2-var entry).
    val d = dict.select(col("id").as("__ji"), proj(col("term")).as("__jv"))
    vars.foreach { v =>
      df = df.join(d, col(v) === col("__ji"),
        if (nullable.contains(v)) "left_outer" else "inner")
        .drop("__ji")
        .withColumnRenamed("__jv", name(v))
    }
    df
  }

  private def compileGroupCountIds(c: Op, keys: List[String],
                                   aggs: List[(String, AggE)]): DataFrame = {
    val nullable = Algebra.vars(c) -- assuredIdVars(c)
    // fast paths that never touch term values: COUNT/SAMPLE over a
    // plain block var run on ids, MIN/MAX over one on dict sort keys
    def plainVar(a: AggE): Option[String] = a.expr match {
      case Some(VarE(v)) if Algebra.vars(c).contains(v) => Some(v)
      case _ => None
    }
    // DISTINCT SUM/AVG takes the standard compiler's pre-dedup side
    // pass, transplanted to id space (see below)
    val (distAggs, aggs1) = aggs.partition { case (_, a) =>
      a.distinct && (a.func == "SUM" || a.func == "AVG") }
    val (countAggs, rest) = aggs1.partition { case (_, a) =>
      a.func == "COUNT" && (a.expr.isEmpty || plainVar(a).isDefined) }
    val (sampleAggs, rest2) = rest.partition { case (_, a) =>
      a.func == "SAMPLE" && plainVar(a).isDefined }
    val (mmAggs, valueAggs) = rest2.partition { case (_, a) =>
      (a.func == "MIN" || a.func == "MAX") && plainVar(a).isDefined }
    // SUM/AVG/GROUP_CONCAT — and ANY aggregate over a computed
    // expression — consume term values: hybrid-decode the referenced
    // vars and feed the standard ExprCompiler value into the SHARED
    // accumulator. Group keys stay longs either way.
    val mmVars = mmAggs.map(a => plainVar(a._2).get).distinct
    val valueVars = valueAggs
      .flatMap(a => a._2.expr.toList.flatMap(exprVarsOf))
      .filter(Algebra.vars(c).contains).distinct
    // an eligible FILTER below the group stays in id space too: the
    // aggregation then groups long keys over the filtered frame and
    // only the GROUP results decode
    val (base, conjs) = idSource(c).getOrElse(
      throw new IllegalStateException(s"not an id source: $c"))
    val df0 =
      if (conjs.nonEmpty) filterIdsFrame(base, conjs)
      else idsOf(base, blockConsts(base))
    // value decode FIRST so joinSortKeys can derive a var's sort key
    // from its already-decoded term instead of a second dict join
    val df = joinSortKeys(decodeVars(df0, valueVars, nullable),
      mmVars, nullable)
    val tvEc = tvExprCompiler(df)
    def countCol(a: AggE): Column = a.expr match {
      case None =>
        if (a.distinct) count_distinct(struct(df.columns.map(col): _*))
        else count(lit(1))
      case Some(VarE(v)) =>
        if (a.distinct) count_distinct(col(v)) else count(col(v))
      case other => throw new IllegalStateException(s"not countable: $other")
    }
    val aggCols =
      countAggs.map { case (n, a) =>
        graft.sparql.TermFns.intTerm(countCol(a)).as(n) } ++
      sampleAggs.map { case (n, a) =>
        first(col(plainVar(a).get), ignoreNulls = true).as(n) // a member id
      } ++
      mmAggs.map { case (n, a) =>
        val v = plainVar(a).get
        // same shape as the standard compiler's min(struct(sortKey,
        // term)): NULL-out unbound rows so min/max skip them
        val kt = when(col(v).isNotNull,
          struct(col(skCol(v)).as("k"), col(v).as("t")))
        (if (a.func == "MIN") min(kt) else max(kt)).as(n)
      } ++
      valueAggs.map { case (n, a) =>
        Compiler.aggAccumulator(Some(tvEc.value(a.expr.get)), Nil, a).as(n)
      }
    var grouped =
      if (aggCols.isEmpty) {
        // all aggregates went to the DISTINCT side path; SPARQL still
        // returns one solution per group (one total when ungrouped,
        // even over an empty match) — same seeding as compileGroup
        if (keys.isEmpty) df.sparkSession.range(1).select()
        else df.select(keys.map(col): _*).dropDuplicates()
      }
      else if (keys.isEmpty) df.agg(aggCols.head, aggCols.tail: _*)
      else df.groupBy(keys.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
    // DISTINCT SUM/AVG side pass in id space: dedup (long keys, value)
    // FIRST — for a plain var the value is its 8-byte id (the dict
    // bijection makes id-distinctness ≡ term-distinctness), for a
    // computed expression the hybrid-evaluated term — then aggregate
    // the deduped stream non-distinct through the shared accumulator
    // and join back on the long keys (null-safe: an optional group key
    // can be a NULL id)
    distAggs.foreach { case (n, a) =>
      val (dedup, valueCol) = plainVar(a) match {
        case Some(v) =>
          val d = df0.select((keys :+ v).distinct.map(col): _*).dropDuplicates()
          (d, col(v))
        case None =>
          val vs = a.expr.toList.flatMap(exprVarsOf)
            .filter(Algebra.vars(c).contains).distinct
          val withTv = decodeVars(df0, vs, nullable)
          val d = withTv
            .select(keys.map(col) :+
              tvExprCompiler(withTv).value(a.expr.get).as("__v"): _*)
            .dropDuplicates()
          (d, col("__v"))
      }
      // a plain-var dedup carries ids: decode the value for the
      // accumulator (LEFT OUTER — unbound contributes like standard)
      val (sideIn, vCol) = plainVar(a) match {
        case Some(v) => (decodeVars(dedup, List(v), Set(v)), col(tvCol(v)))
        case None => (dedup, valueCol)
      }
      val side =
        if (keys.isEmpty)
          sideIn.agg(Compiler.aggAccumulator(Some(vCol), Nil,
            a.copy(distinct = false)).as(n))
        else sideIn.groupBy(keys.map(col): _*)
          .agg(Compiler.aggAccumulator(Some(vCol), Nil,
            a.copy(distinct = false)).as(n))
      grouped =
        if (keys.isEmpty) grouped.crossJoin(side)
        else {
          val renamed = keys.foldLeft(side)((d, k) =>
            d.withColumnRenamed(k, s"__k_$k"))
          val cond = keys.map(k => grouped(k) <=> renamed(s"__k_$k"))
            .reduce(_ && _)
          grouped.join(renamed, cond, "inner")
            .drop(keys.map(k => s"__k_$k"): _*)
        }
    }
    // unwrap the min/max witness to a bare id; finish value aggregates
    // to their term columns (shared finisher)
    val unwrapped0 = mmAggs.foldLeft(grouped) { case (d, (n, _)) =>
      d.withColumn(n, col(n).getField("t"))
    }
    val unwrapped = (valueAggs ++ distAggs).foldLeft(unwrapped0) {
      case (d, (n, a)) => d.withColumn(n, Compiler.aggFinish(col(n), a))
    }
    // keys AND witness ids decode; counts/value aggregates are already
    // terms. Witnesses decode LEFT OUTER: an all-NULL group has no
    // min/max and SAMPLE of it is unbound.
    materialize(unwrapped, keys ++ sampleAggs.map(_._1) ++ mmAggs.map(_._1),
      nullable ++ sampleAggs.map(_._1) ++ mmAggs.map(_._1),
      carry = countAggs.map(_._1) ++ valueAggs.map(_._1) ++ distAggs.map(_._1))
  }

  // ----- id-space ORDER BY + LIMIT (top-k with late decode) -----

  /** Top-k over a block is id-expressible when every sort key is an
    * EXISTS-free scalar and the window is Int-sized: plain-variable
    * keys take their sort key from a dictionary projection, computed
    * keys hybrid-decode their variables and sort on
    * sortKey(ExprCompiler.value) — the same key the standard
    * compiler's ORDER BY builds. The sort total-orders (skey, id)
    * rows, the limit keeps offset+k of them, and the dictionary
    * decodes ONLY those — at scale this turns a full-result decode +
    * TakeOrdered over term structs into a TakeOrdered over longs plus
    * a k-row join. */
  /** An op the id compiler can turn into a raw ID frame: an extended
    * block, or an eligible FILTER directly above one. The filter's
    * conjunct list rides along so a consumer can reason about what
    * survives it (the sidecar ORDER BY's class pin). */
  private def idSource(op: Op): Option[(Op, List[Expr])] = op match {
    case Filter(c, e) => filterEligible(c, e).map(cs => (c, cs))
    case b if isExtBlock(b) => Some((b, Nil))
    case _ => None
  }

  private def orderSliceEligible(c: Op, keys: List[(Expr, Boolean)],
                                 off: Long, lim: Option[Long]): Boolean =
    idSource(c).isDefined && keys.nonEmpty &&
      keys.forall { case (e, _) => !hasExists(e) } &&
      lim.exists(l => off >= 0 && l >= 0 && off + l > 0 &&
        off + l <= Int.MaxValue)

  private def compileTopKIds(c: Op, keys: List[(Expr, Boolean)],
                             off: Long, lim: Long,
                             keep: List[String]): DataFrame = {
    val (base, conjs) = idSource(c).getOrElse(
      throw new IllegalStateException(s"not an id source: $c"))
    val nullable = Algebra.vars(base) -- assuredIdVars(base)
    val blockVars = Algebra.vars(base)
    def isPlain(e: Expr): Boolean = e match {
      case VarE(v) => blockVars.contains(v)
      case _ => false
    }
    // sidecar threshold top-k: when the PRIMARY sort key is a plain
    // object var with sidecar columns, the lexicographic order lets a
    // first-key boundary prune regardless of what the later keys are
    // — a row strictly worse than the k-th best on key 1 cannot enter
    // the top-k whatever its tie-breaks do
    val typedObjVars: Set[String] =
      if (hasSidecarSortCols && isBlock(base))
        allScans(base).flatMap(_.o match {
          case V(n) => Some(n); case _ => None
        }).toSet
      else Set.empty
    keys match {
      case (VarE(v), asc) :: _
        if blockVars.contains(v) && typedObjVars.contains(v) &&
          thresholdTopKEnabled(base) =>
        return compileThresholdTopK(base, conjs, v, asc, keys,
          off, lim, keep, nullable, blockVars)
      case _ => ()
    }
    val df0 =
      if (conjs.nonEmpty) filterIdsFrame(base, conjs)
      else idsOf(base, blockConsts(base))
    finishTopK(df0, keys, off, lim, keep, nullable, blockVars)
  }

  /** The common top-k tail: join/derive REAL sort keys onto an id
    * frame, TakeOrdered off+lim rows, decode only those, re-establish
    * the order on the carried keys, slice. Shared by the plain id
    * top-k (whole frame) and the threshold top-k (boundary
    * candidates only). */
  private def finishTopK(df0: DataFrame, keys: List[(Expr, Boolean)],
                         off: Long, lim: Long, keep: List[String],
                         nullable: Set[String],
                         blockVars: Set[String]): DataFrame = {
    def isPlain(e: Expr): Boolean = e match {
      case VarE(v) => blockVars.contains(v)
      case _ => false
    }
    val sortVars = keys.collect { case (VarE(v), _) if isPlain(VarE(v)) => v }
      .distinct
    val exprKeys = keys.map(_._1).filterNot(isPlain).distinct
    val exprVars = exprKeys.flatMap(exprVarsOf)
      .filter(blockVars.contains).distinct
    // expr-var decode FIRST so joinSortKeys can derive a plain sort
    // var's key from its already-decoded term instead of a second join
    var df = joinSortKeys(decodeVars(df0, exprVars, nullable),
      sortVars, nullable)
    val tvEc = tvExprCompiler(df)
    val exprSk = exprKeys.zipWithIndex.map { case (e, i) =>
      e -> s"__ske_$i" }.toMap
    exprSk.foreach { case (e, n) =>
      df = df.withColumn(n, graft.sparql.TermFns.sortKey(tvEc.value(e))) }
    df = df.drop(exprVars.map(tvCol): _*)
    // NULL skey ⇔ unbound var; Spark's default NULLS FIRST (asc) /
    // NULLS LAST (desc) coincides with the standard compiler's rank-0
    // unbound row, which sorts before every bound term (computed keys
    // are never NULL — sortKey itself maps unbound to rank 0)
    def sortCols = keys.map { case (e, asc) =>
      val k = if (isPlain(e)) {
        val VarE(v) = e: @unchecked; col(skCol(v))
      } else col(exprSk(e))
      if (asc) k.asc else k.desc
    }
    val topIds = df.orderBy(sortCols: _*).limit((off + lim).toInt)
    // decode the k rows, re-establish the order on the CARRIED skeys
    // (materialization joins do not preserve row order), then slice
    val decoded = materialize(topIds, keep, nullable,
      carry = sortVars.map(skCol) ++ exprSk.values.toList)
    val ordered = decoded.orderBy(sortCols: _*)
      .select(keep.filter(decoded.columns.contains).map(col): _*)
    (if (off > 0) ordered.offset(off.toInt) else ordered).limit(lim.toInt)
  }

  /** Exact ORDER BY + LIMIT that never touches the dictionary until
    * ~k rows remain — the sidecar threshold top-k.
    *
    * Rows whose sort-key prefix the sidecar can RECONSTRUCT are
    * "known": numerics (rank 3 — `o_num` carries the same
    * decimal(38,12) the sort key's num field holds, the saturation
    * legs reproduce from `o_dbl`, with NaN and bad lexicals on
    * DEC_MIN exactly like TermMath.sortKey's Java-semantics
    * `NaN >= 0 == false` branch, which Spark's NaN-largest `>=` would
    * get wrong) and — under the UTC gate — well-formed date/dateTimes
    * (rank 4; num/dbl derive from `o_ts`, and ANY monotone rounding
    * of the epoch double preserves the embedding because the true num
    * is itself a monotone function of dbl there). Everything else
    * (strings, IRIs, booleans, malformed temporals: the sidecar holds
    * only NULLs for them) is "unknown" and becomes an UNCONDITIONAL
    * candidate — at most |non-comparable objects| extra rows, zero on
    * the warehouse shapes this exists for.
    *
    * Phase 1 takes the k-th best KNOWN surrogate of the PRIMARY key
    * as the boundary. Because the surrogate is an order-embedding of
    * the full primary sort key (which only appends lexical
    * tie-breaks), and the later keys only ever break primary-key
    * ties, every true top-k row either beats the boundary, ties it,
    * or is unknown. Phase 2 refilters the frame to `unknown OR key <=
    * boundary` (>= for DESC), hands the survivors to the common
    * [[finishTopK]] tail — which joins REAL sort keys for ALL the
    * query's keys on just those rows — re-sorts, and decodes: the
    * dict joins see k+ties+unknown rows instead of every row. Cost
    * shape at scale: two narrow scans (ids + three fixed-width
    * sidecar columns, filters pushed both times), one TakeOrdered
    * over longs, no full-frame shuffle or join anywhere before the
    * cut. */
  private def compileThresholdTopK(base: Op, conjs: List[Expr], v: String,
                                   asc: Boolean, keys: List[(Expr, Boolean)],
                                   off: Long, lim: Long, keep: List[String],
                                   nullable: Set[String],
                                   blockVars: Set[String]): DataFrame = {
    val df0raw = filterIdsFrame(base, conjs, keepTyped = Set(v))
    val DEC = graft.sparql.TermFns.DEC
    val satMax = lit(graft.functions.TermMath.decSatMaxBD).cast(DEC)
    val satMin = lit(graft.functions.TermMath.decSatMinBD).cast(DEC)
    // o_ts keys are usable only when the session zone matches the
    // encode zone (both UTC) — otherwise temporal rows fall back to
    // unknown, which stays exact, just with more candidates
    val tsUsable = df0raw.columns.contains(ttCol(v)) &&
      spark.sessionState.conf.sessionLocalTimeZone == "UTC"
    val tsCol = if (tsUsable) col(ttCol(v))
                else lit(null).cast(org.apache.spark.sql.types.TimestampType)
    val isNum = col(tcCol(v)) >= 1
    val known = isNum || tsCol.isNotNull
    val numKey =
      when(col(teCol(v)).isNotNull, col(teCol(v)))
        .when(isnan(col(tdCol(v))), satMin)
        .when(col(tdCol(v)) >= 0, satMax)
        .otherwise(satMin)
    val keyCols: Seq[Column] = Seq(
      when(isNum, lit(3)).otherwise(lit(4)),
      when(isNum, numKey)
        .otherwise(tsCol.cast(org.apache.spark.sql.types.DoubleType).cast(DEC)),
      when(isNum, coalesce(col(tdCol(v)), lit(Double.NegativeInfinity)))
        .otherwise(tsCol.cast(org.apache.spark.sql.types.DoubleType)))
    val kn = keyCols.indices.map(i => s"__thk_$i")
    var df = df0raw.withColumn("__thknown", known)
    kn.zip(keyCols).foreach { case (n, k) => df = df.withColumn(n, k) }
    df = df.drop(Seq(tcCol(v), tdCol(v), teCol(v), ttCol(v)): _*)
    val k1 = (off + lim).toInt
    val keyStruct = struct(kn.map(col): _*)
    // the boundary: the k-th best KNOWN surrogate — worst of the
    // phase-1 TakeOrdered under the sort direction. One bounded
    // driver fetch (a single aggregated row), so the threshold rides
    // into phase 2 as a LITERAL.
    val bRow = df.filter(col("__thknown")).select(keyStruct.as("k"))
      .orderBy(kn.map(n => if (asc) col(n).asc else col(n).desc): _*)
      .limit(k1)
      .agg((if (asc) max(col("k")) else min(col("k"))).as("b"))
      .head()
    val candCond =
      if (bRow.isNullAt(0)) !col("__thknown") // no known rows at all
      else {
        val b = bRow.getStruct(0)
        val bLit = struct(
          lit(b.getInt(0)).as(kn(0)),
          lit(b.getDecimal(1)).cast(DEC).as(kn(1)),
          lit(b.getDouble(2)).as(kn(2)))
        !col("__thknown") ||
          (if (asc) keyStruct <= bLit else keyStruct >= bLit)
      }
    val cand = df.filter(candCond).drop("__thknown").drop(kn: _*)
    finishTopK(cand, keys, off, lim, keep, nullable, blockVars)
  }

  /** Project-then-distinct on long tuples; the dict joins in after
    * the dedup, so it sees only surviving rows. An eligible FILTER
    * below the distinct stays in id space the same way. */
  private def compileDistinctIds(c: Op, vs: List[String]): DataFrame = {
    val (base, conjs) = idSource(c).getOrElse(
      throw new IllegalStateException(s"not an id source: $c"))
    val df =
      if (conjs.nonEmpty) filterIdsFrame(base, conjs)
      else idsOf(base, blockConsts(base))
    materialize(df.select(vs.map(col): _*).dropDuplicates(),
      vs, Algebra.vars(c) -- assuredIdVars(c))
  }

  // ----- id-space FILTER [NOT] EXISTS -----

  private def conjunctsOf(e: Expr): List[Expr] = e match {
    case FuncE("&&", args) => args.flatMap(conjunctsOf)
    case other => List(other)
  }

  private def normNeg(e: Expr): Expr = e match {
    case FuncE("!", List(inner)) => normNeg(inner) match {
      case ExistsE(p, n) => ExistsE(p, !n)
      case o => FuncE("!", List(o))
    }
    case o => o
  }

  /** Any [NOT] EXISTS anywhere inside a scalar expression — such a
    * conjunct needs the standard compiler's correlated-subpattern
    * machinery and blocks the hybrid decode. */
  private def hasExists(e: Expr): Boolean = e match {
    case _: ExistsE => true
    case FuncE(_, args) => args.exists(hasExists)
    case InE(x, l, _) => hasExists(x) || l.exists(hasExists)
    case AggE(_, _, eo, _) => eo.exists(hasExists)
    case _ => false
  }

  /** Decompose an EXISTS pattern that is a BGP join tree with
    * interior FILTERs into (the pure block, each filter conjunct
    * tagged with the variable scope of its position's child) —
    * the id-space mirror of the standard compiler's
    * [[graft.sparql.Compiler]] compileExists strip. The position
    * scope decides local-vs-correlated downstream AND gates
    * eligibility: a local conjunct that references a SIBLING
    * branch's variable would evaluate unbound at its position but
    * bound after the block join, so such patterns fall back. */
  private def stripFilters(op: Op): Option[(Op, List[(Expr, Set[String])])] =
    op match {
      case Filter(c, e) => stripFilters(c).map { case (c2, cs) =>
        (c2, cs ++ conjunctsOf(e).map(normNeg)
          .map(x => (x, Algebra.vars(c2))))
      }
      case Join(a, b) =>
        for ((a2, ca) <- stripFilters(a); (b2, cb) <- stripFilters(b))
          yield (Join(a2, b2), ca ++ cb)
      case s: Scan => Some((s, Nil))
      case _ => None
    }

  /** An EXISTS pattern the id path can run: strips to a pure block
    * whose shared vars with the outer child are assured there, with
    * every stripped conjunct an EXISTS-free scalar that does not
    * reach outside its position scope except toward the OUTER query
    * (the correlated case — those evaluate on the merged row inside
    * the semi/anti join, exactly like the standard compiler's lifted
    * conjuncts). */
  private def existsEligible(c: Op, p: Op): Boolean =
    stripFilters(p).exists { case (cleaned, tagged) =>
      val shared = Algebra.vars(c).intersect(Algebra.vars(cleaned))
      shared.nonEmpty && shared.subsetOf(assuredIdVars(c)) &&
        tagged.forall { case (e, scope) =>
          !hasExists(e) && {
            val siblingRefs =
              (exprVarsOf(e) -- scope).intersect(Algebra.vars(cleaned))
            val correlated =
              (exprVarsOf(e) -- scope).intersect(Algebra.vars(c)).nonEmpty
            // correlated conjuncts evaluate post-join over the full
            // scope (sibling refs included, same as the standard
            // env); a LOCAL one evaluates at its position, so any
            // sibling reference would diverge — fall back
            correlated || siblingRefs.isEmpty
          }
        }
    }

  /** FILTER conditions the id-space path can take whole — every
    * conjunct must be one of:
    *  - [NOT] EXISTS over a BGP (with optional interior scalar
    *    FILTERs, correlated or not — see [[existsEligible]]) sharing
    *    ≥1 assured var with the (extended-block) child → a long
    *    semi/anti join; correlated conjuncts join the condition on
    *    hybrid-decoded term columns, the exact shape the standard
    *    compiler uses on term structs;
    *  - a term-IDENTITY scalar test: `sameTerm(x, y)` for any
    *    operands (sameTerm IS term identity, i.e. id equality), or
    *    `=` between a variable and a constant IRI. The IRI
    *    restriction matters: IRIs have no value-space aliasing,
    *    whereas "1"^^xsd:int = "01"^^xsd:int holds across DIFFERENT
    *    terms, so literal `=` is NOT id equality. The error cases
    *    coincide too: `=` on an unbound var or a literal/IRI mix
    *    errors → row dropped, exactly what a NULL/failed id equality
    *    does. These stay long predicates on the scan;
    *  - ANY other scalar expression without a nested EXISTS — the
    *    HYBRID decode: only the variables the condition references
    *    join their terms back in (id → term, a dict-sized side), the
    *    predicate evaluates through the SAME ExprCompiler.bool the
    *    standard compiler uses (so value-space equality, comparisons,
    *    casts, regex, error→NULL→drop are identical by construction),
    *    and the term columns drop again before any downstream join.
    *    At scale this filters early over longs-plus-one-term instead
    *    of forcing the whole query back onto term structs. */
  private def filterEligible(c: Op, cond: Expr): Option[List[Expr]] = {
    val cs = conjunctsOf(cond).map(normNeg)
    val ok = cs.nonEmpty && isExtBlock(c) && cs.forall {
      case ExistsE(p, _) => existsEligible(c, p)
      case e => idPred(c, e) || !hasExists(e)
    }
    if (ok) Some(cs) else None
  }

  /** Decode term columns for `vars` (as `__tv_<var>`) so a scalar
    * condition can evaluate in the middle of an id-space pipeline. */
  private def decodeVars(df0: DataFrame, vars: List[String],
                         nullable: Set[String]): DataFrame =
    joinDictCols(df0, vars.filterNot(v => df0.columns.contains(tvCol(v))),
      nullable, identity, tvCol)

  private def tvCol(v: String): String = s"__tv_$v"

  /** ExprCompiler whose variables resolve to the `__tv_` decoded term
    * columns (vars without one are unbound, exactly like the standard
    * compiler's missing-column case). */
  private def tvExprCompiler(df: DataFrame): ExprCompiler =
    new ExprCompiler(n =>
      if (df.columns.contains(tvCol(n))) col(tvCol(n))
      else graft.sparql.TermFns.nullTerm)

  // ----- typed-sidecar FILTER fast path -----
  // Numeric/temporal comparisons of an object-position variable
  // against a CONSTANT evaluate on the sidecar columns persisted at
  // encode (o_cls/o_dbl/o_dec/o_ts) — zero dict joins, and the
  // resulting predicates are plain column comparisons Spark pushes
  // into the parquet scan. Boolean algebra is kept branch-equal to
  // TermMath.valueCmp/valueEq: exact-exact compares decimal(38,12),
  // any-float compares full-precision doubles (Spark's NaN-largest /
  // -0.0=0.0 ordering IS Double.compare's), every error leg lands on
  // NULL or FALSE — both drop, like the hybrid's error→drop. The
  // constant pins the comparable class, which is what makes this
  // safe: var-var forms (strings? booleans?) and `!=` (an IRI != 5
  // is TRUE under RDFterm-equal, but a sidecar NULL would drop it)
  // stay on the hybrid path.
  private def tcCol(v: String): String = s"__tc_$v"
  private def tdCol(v: String): String = s"__td_$v"
  private def teCol(v: String): String = s"__te_$v"
  private def ttCol(v: String): String = s"__tt_$v"

  /** Whether ORDER BY + LIMIT should take the threshold path. The
    * threshold's win is avoiding the dict sort-key JOIN before the
    * cut — which only matters when the dict side would NOT broadcast;
    * when it fits under `autoBroadcastJoinThreshold` the plain top-k
    * is one broadcast-join job, strictly cheaper than the threshold's
    * extra boundary job and second scan. So `auto` (the default)
    * mirrors Spark's own broadcast decision on the dict's plan-stats
    * size — AND requires a single-scan base block: phase 1's boundary
    * job re-executes the id frame, so a multi-scan block pays its
    * star join TWICE, which the round-14 30× measurement showed
    * costs more than the avoided dict join (TOPK_REGIME_r14.json:
    * shuffle.multi_key_decode always 2.59 s vs never 2.18 s, while
    * shuffle.single_key is parity-to-win and the win grows with dict
    * size). `spark.graft.topk.threshold` = always/never overrides —
    * the differential specs and the scale-path battery entry pin the
    * threshold machinery with `always` regardless of toy dict sizes. */
  private def thresholdTopKEnabled(base: Op): Boolean =
    spark.conf.get("spark.graft.topk.threshold", "auto") match {
      case "always" => true
      case "never" => false
      case _ =>
        val bt = spark.sessionState.conf.autoBroadcastJoinThreshold
        (bt <= 0 || dictSizeEstimate > BigInt(bt)) &&
          allScans(base).size == 1
    }
  private lazy val dictSizeEstimate: BigInt =
    dict.queryExecution.optimizedPlan.stats.sizeInBytes

  /** The sidecar decimal column: v5 stores persist `o_num` (decimal
    * for ANY numeric — the name doubles as the layout-version
    * signal), v4 the exact-only `o_dec`. The FILTER fast path works
    * on both (its exact-exact branch only reads cls-1 rows, where the
    * two are identical); the sidecar ORDER BY fast path needs the
    * float rows' decimals and is gated on [[hasSidecarSortCols]]. */
  private def decColName: String =
    if (idQuads.columns.contains("o_num")) "o_num" else "o_dec"
  private def hasSidecarSortCols: Boolean =
    idQuads.columns.contains("o_num")
  /** v6 stores also persist the typed sidecar for the SUBJECT
    * position (`s_cls`/`s_dbl`/`s_num`, plus `s_ts` on UTC encodes —
    * `s_num` is the version signal): generalized-RDF literal subjects
    * get the same join-free scan-pushed FILTER path as objects. */
  private def hasSubjSidecar: Boolean =
    idQuads.columns.contains("s_num")

  /** Vars a typed FILTER conjunct may target inside `b`: every
    * object-position scan var (v4+), plus subject-position scan vars
    * on v6 stores. A var bound in either position carries the same
    * TERM, so either sidecar yields the identical comparable value —
    * the claim in [[idsOf]] just picks one source per var. */
  private def typedSidecarVars(b: Op): Set[String] =
    if (idQuads.columns.contains("o_dbl") && isBlock(b))
      allScans(b).flatMap { sc =>
        (sc.o match { case V(n) => List(n); case _ => Nil }) ++
          (sc.s match {
            case V(n) if hasSubjSidecar => List(n); case _ => Nil
          })
      }.toSet
    else Set.empty

  /** (var, op, constant literal, constIsLeftOperand) when `e` has the
    * typed-comparable shape. `=` is included (numeric-equal /
    * dateTime-equal are the only hybrid branches a numeric/temporal
    * constant can reach with TRUE); `!=` is NOT (see above). */
  private def typedShape(e: Expr): Option[(String, String, graft.rdf.Lit, Boolean)] =
    e match {
      case FuncE(op @ ("<" | "<=" | ">" | ">=" | "="),
                 List(VarE(v), ConstE(t: graft.rdf.Lit))) =>
        Some((v, op, t, false))
      case FuncE(op @ ("<" | "<=" | ">" | ">=" | "="),
                 List(ConstE(t: graft.rdf.Lit), VarE(v))) =>
        Some((v, op, t, true))
      case _ => None
    }

  private def typedEligible(e: Expr, objVars: Set[String]): Boolean =
    typedShape(e).exists { case (v, _, t, _) =>
      objVars.contains(v) && (
        graft.rdf.XSD.numeric.contains(t.dt) ||
          ((t.dt == graft.rdf.XSD.date || t.dt == graft.rdf.XSD.dateTime) &&
            idQuads.columns.contains("o_ts") &&
            spark.sessionState.conf.sessionLocalTimeZone == "UTC"))
    }

  /** Compile a typed-eligible conjunct against the carried sidecar
    * columns (see [[typedEligible]] for the semantics argument). */
  private def typedCond(e: Expr): Column = {
    val (v, op, t, constLeft) = typedShape(e).getOrElse(
      throw new IllegalStateException(s"not typed-eligible: $e"))
    def cmp(a: Column, b: Column): Column = op match {
      case "<" => a < b
      case "<=" => a <= b
      case ">" => a > b
      case ">=" => a >= b
      case "=" => a === b
    }
    def vc(varSide: Column, constSide: Column): Column =
      if (constLeft) cmp(constSide, varSide) else cmp(varSide, constSide)
    val cls = col(tcCol(v))
    if (graft.rdf.XSD.numeric.contains(t.dt)) {
      val cDbl = lit(t.lex).try_cast(DoubleType)
      if (graft.rdf.XSD.exactNumeric.contains(t.dt)) {
        val cDec = lit(t.lex).try_cast(graft.sparql.TermFns.DEC)
        (cls === 2 && vc(col(tdCol(v)), cDbl)) ||
          (cls === 1 && vc(col(teCol(v)), cDec))
      } else // float constant: any numeric var compares as double
        cls >= 1 && vc(col(tdCol(v)), cDbl)
    } else // date/dateTime constant (zone gated in typedEligible)
      vc(col(ttCol(v)), lit(t.lex).try_cast(TimestampType))
  }

  private def compileFilterIds(child: Op, conjs: List[Expr],
                               keep: List[String]): DataFrame =
    materialize(filterIdsFrame(child, conjs), keep,
      Algebra.vars(child) -- assuredIdVars(child))

  /** Everything [[compileFilterIds]] does short of the final decode:
    * the filtered ID frame, for consumers that keep working in id
    * space above the filter (top-k, group-by). `keepTyped` names vars
    * whose sidecar columns (`__tc_/__td_/__te_/__tt_`) must survive on
    * the frame (sidecar ORDER BY keys) instead of being dropped after
    * the typed conjuncts apply. */
  private def filterIdsFrame(child: Op, conjs: List[Expr],
                             keepTyped: Set[String] = Set.empty): DataFrame = {
    val (existsConjs, scalarConjs) = conjs.partition(_.isInstanceOf[ExistsE])
    // term-identity predicates run as long comparisons ON THE SCAN;
    // numeric/temporal comparisons against a constant run on the
    // TYPED OBJECT SIDECAR (zero dict joins, parquet-pushable);
    // everything else is a hybrid conjunct evaluated on decoded terms
    val (idConjs, rest) = scalarConjs.partition(idPred(child, _))
    val typedObjVars: Set[String] = typedSidecarVars(child)
    val (typedConjs, hybridConjs) =
      rest.partition(typedEligible(_, typedObjVars))
    val typedVars = typedConjs.flatMap(typedShape).map(_._1).distinct.toSet ++
      (keepTyped intersect typedObjVars)
    val condTerms = conjs.flatMap {
      case ExistsE(p, _) => scanConstTerms(allScans(p))
      case FuncE(_, args) => args.collect { case ConstE(t) => t }
      case _ => Nil
    }
    val consts = constIdsOf((scanConstTerms(allScans(child)) ++
      condConstTerms(child) ++ condTerms).distinct)
    val nullable = Algebra.vars(child) -- assuredIdVars(child)
    var df = idsOf(child, consts, typedVars)
    idConjs.foreach {
      case FuncE(_, List(a, b)) =>
        df = df.filter(idOperand(a, consts) === idOperand(b, consts))
      case other => throw new IllegalStateException(s"not id-expressible: $other")
    }
    typedConjs.foreach(e => df = df.filter(typedCond(e)))
    if (typedVars.nonEmpty)
      df = df.drop((typedVars -- keepTyped).toSeq.flatMap(v =>
        Seq(tcCol(v), tdCol(v), teCol(v), ttCol(v))): _*)
    if (hybridConjs.nonEmpty) {
      val condVars = hybridConjs.flatMap(exprVarsOf)
        .filter(Algebra.vars(child).contains).distinct
      val decoded = decodeVars(df, condVars, nullable)
      val ec = tvExprCompiler(decoded)
      df = decoded.filter(hybridConjs.map(ec.bool).reduce(_ && _))
        .drop(condVars.map(tvCol): _*)
    }
    existsConjs.foreach {
      case ExistsE(p, negated) =>
        val (cleaned, tagged) = stripFilters(p).getOrElse(
          throw new IllegalStateException(s"ineligible EXISTS pattern: $p"))
        val cleanedVars = Algebra.vars(cleaned)
        val leftVars = Algebra.vars(child)
        // the standard compiler's partition rule: a conjunct reaching
        // outside its position scope toward the outer query lifts
        // into the join condition; everything else filters the
        // subpattern at its position (eligibility guaranteed no
        // local conjunct references a sibling branch, so evaluating
        // locals on the joined block frame is position-equivalent)
        val (corr, local) = tagged.partition { case (e, scope) =>
          (exprVarsOf(e) -- scope).intersect(leftVars).nonEmpty
        }
        var pd = idsOf(cleaned, consts)
        if (local.nonEmpty) {
          val lv = local.flatMap(t => exprVarsOf(t._1))
            .filter(cleanedVars.contains).distinct
          val dec = decodeVars(pd, lv, Set.empty) // pure block: assured
          val ec = tvExprCompiler(dec)
          pd = dec.filter(local.map(t => ec.bool(t._1)).reduce(_ && _))
            .drop(lv.map(tvCol): _*)
        }
        if (corr.isEmpty) {
          val shared = df.columns.intersect(pd.columns).toSeq
          df = df.join(pd.select(shared.map(col): _*), shared,
            if (negated) "left_anti" else "left_semi")
        } else {
          // correlated semi/anti join: long equality on the shared
          // assured vars carries the join, the lifted conjuncts
          // evaluate on hybrid-decoded term columns from BOTH frames
          // (sub side wins name resolution, like the standard env)
          val corrEs = corr.map(_._1)
          val corrVars = corrEs.flatMap(exprVarsOf).distinct
          val subCorrVars = corrVars.filter(cleanedVars.contains)
          val outerCorrVars = corrVars.filter(v =>
            !cleanedVars.contains(v) && df.columns.contains(v))
          val shared = df.columns.intersect(pd.columns).toSeq
          val pdD = decodeVars(pd, subCorrVars, Set.empty)
          val dfD = decodeVars(df, outerCorrVars, nullable)
          val pdR = pdD.columns.foldLeft(pdD)((d, v) =>
            d.withColumnRenamed(v, s"__ex_$v"))
          val keyConds = shared.map(v => dfD(v) === pdR(s"__ex_$v"))
          val ec = new ExprCompiler(n =>
            if (pdD.columns.contains(tvCol(n))) pdR(s"__ex_${tvCol(n)}")
            else if (dfD.columns.contains(tvCol(n))) dfD(tvCol(n))
            else graft.sparql.TermFns.nullTerm)
          val joinCond = (keyConds ++ corrEs.map(ec.bool)).reduce(_ && _)
          df = dfD.join(pdR, joinCond,
            if (negated) "left_anti" else "left_semi")
            .drop(outerCorrVars.map(tvCol): _*)
        }
      case other => throw new IllegalStateException(s"not an EXISTS: $other")
    }
    df
  }

  /** BIND in id space: decode the expression's variables, compute the
    * bound TERM column on the id frame (same ExprCompiler value as the
    * standard compiler's Extend), drop the decoded inputs, and late-
    * materialize everything else. The computed column is already a
    * term, so it rides through [[materialize]] as `carry`. */
  private def compileExtendIds(c: Op, n: String, e: Expr,
                               keep: List[String]): DataFrame = {
    val nullable = Algebra.vars(c) -- assuredIdVars(c)
    val condVars = exprVarsOf(e).toList.filter(Algebra.vars(c).contains)
    val df = decodeVars(idsOf(c, blockConsts(c)), condVars, nullable)
    val bound = df.withColumn(n, tvExprCompiler(df).value(e))
      .drop(condVars.map(tvCol): _*)
    materialize(bound, keep.filterNot(_ == n), nullable,
      carry = if (keep.contains(n)) List(n) else Nil)
  }

  private def flattenJoins(op: Op): List[Scan] = op match {
    case s: Scan => List(s)
    case Join(l, r) => flattenJoins(l) ++ flattenJoins(r)
    case other => throw new IllegalStateException(s"not a BGP leaf: $other")
  }

  /** Every Scan leaf of an extended block (constant-lookup scope). */
  private def allScans(op: Op): List[Scan] = op match {
    case s: Scan => List(s)
    case Join(l, r) => allScans(l) ++ allScans(r)
    case LeftJoin(l, r, _) => allScans(l) ++ allScans(r)
    case Minus(l, r) => allScans(l) ++ allScans(r)
    case Union(l, r) => allScans(l) ++ allScans(r)
    case Filter(c, _) => allScans(c)
    case _ => Nil
  }

  /** One driver-side dict lookup for ALL constants of the block: a
    * single filtered scan of the dictionary (pushable term-struct
    * equality), collected to a Map. A constant absent from the dict
    * maps to id -1, which no quad carries — the scan legitimately
    * returns empty. */
  private def constIds(leaves: List[Scan]): Map[Term, Long] =
    constIdsOf(scanConstTerms(leaves))

  private def scanConstTerms(leaves: List[Scan]): List[Term] =
    leaves.flatMap { sc =>
      List(sc.s, sc.p, sc.o).collect { case T(t) => t } ++
        (sc.g match { case GraphTerm(t) => List(t); case _ => Nil })
    }.distinct

  private def constIdsOf(terms: List[Term]): Map[Term, Long] =
    if (terms.isEmpty) Map.empty
    else lookupFrame(terms).collect().flatMap { r =>
      TermSchema.fromRow(r.getStruct(0)).map(_ -> r.getLong(1))
    }.toMap

  /** The (term, id) rows for a constant set, as a pruned dict scan.
    * Term equality is decomposed into LEAF-field predicates
    * (kind/lex/dt/lang conjunctions, OR'd per constant): unlike
    * whole-struct equality — which Spark lists as pushed but parquet
    * cannot evaluate against row-group statistics — every leaf
    * comparison is genuinely parquet-prunable, so on a lex-clustered
    * dictionary (both ingest paths range-partition + sort by
    * `term.lex`) the per-query driver lookup touches the few row
    * groups whose lex range covers the constants instead of scanning
    * the term-count-sized dictionary. Bucketed stores read the
    * lex-clustered `dict_by_lex` sidecar (same ids — phase 2
    * re-buckets the same frozen rows); the id-bucketed table itself
    * has no lex locality. */
  private[graft] def lookupFrame(terms: List[Term]): DataFrame = {
    import graft.rdf.{BNode, Iri, Lit, TermKind}
    def leafEq(t: Term): Column = {
      val (kind, dt, lang) = t match {
        case _: Iri => (TermKind.IRI, "", "")
        case _: BNode => (TermKind.BNODE, "", "")
        case l: Lit => (TermKind.LITERAL, l.dt, l.lang)
      }
      col("term.kind") === lit(kind) && col("term.lex") === lit(t.lex) &&
        col("term.dt") === lit(dt) && col("term.lang") === lit(lang)
    }
    lookupDict.getOrElse(dict)
      .filter(terms.map(leafEq).reduce(_ || _))
      .select(col("term"), col("id"))
  }

  /** One quad-pattern scan over the long-encoded table: constant
    * positions filter as long equality (pushed to parquet, pruned by
    * the (p,s)-sorted layout), variables project as long columns named
    * by the variable, repeated variables equate positionally. */
  private def scanIds(sc: Scan, consts: Map[Term, Long],
                      typedVar: Option[String] = None,
                      typedSubjVar: Option[String] = None): DataFrame = {
    var df = idQuads
    def id(t: Term): Long = consts.getOrElse(t, -1L)
    sc.g match {
      case DefaultGraph => df = df.filter(col("g").isNull)
      case GraphTerm(t) => df = df.filter(col("g") === lit(id(t)))
      case GraphVar(_) => df = df.filter(col("g").isNotNull)
    }
    Seq("s" -> sc.s, "p" -> sc.p, "o" -> sc.o).foreach {
      case (c, T(t)) => df = df.filter(col(c) === lit(id(t)))
      case _ => ()
    }
    val varPos = Algebra.scanVarPositions(sc.s, sc.p, sc.o, sc.g)
    Algebra.repeatedVarPairs(varPos).foreach { case (c1, c2) =>
      df = df.filter(col(c1) === col(c2))
    }
    // typed sidecar carry: project the object (or, on v6 stores,
    // subject) value columns under per-var names so a typed FILTER
    // evaluates right above this scan. Both positions' sidecars hold
    // the same function of the TERM, so a var may be fed from either
    // binding — the per-var column names make the source transparent
    // to typedCond.
    val typedCols = typedVar.toSeq.flatMap { n =>
      Seq(col("o_cls").as(tcCol(n)), col("o_dbl").as(tdCol(n)),
        col(decColName).as(teCol(n))) ++
        (if (idQuads.columns.contains("o_ts"))
          Seq(col("o_ts").as(ttCol(n))) else Nil)
    } ++ typedSubjVar.toSeq.flatMap { n =>
      Seq(col("s_cls").as(tcCol(n)), col("s_dbl").as(tdCol(n)),
        col("s_num").as(teCol(n))) ++
        (if (idQuads.columns.contains("s_ts"))
          Seq(col("s_ts").as(ttCol(n))) else Nil)
    }
    df.select(Algebra.firstOccurrence(varPos)
      .map { case (n, c) => col(c).as(n) }.toIndexedSeq ++ typedCols: _*)
  }

  /** Late materialization: swap each kept long column for its term
    * struct via one dict join per variable (inner — every id in the
    * store exists in the dict by construction; LEFT OUTER for vars an
    * OPTIONAL may have left NULL, preserving the row with an unbound
    * term). Pruned variables' long columns are dropped entirely. At
    * extreme scale the dict side of these joins should be a bucketed
    * table on `id`; with plain parquet AQE picks broadcast when the
    * dict is small enough. */
  private def materialize(idDf: DataFrame, keep: List[String],
                          nullable: Set[String] = Set.empty,
                          carry: List[String] = Nil): DataFrame = {
    var df = idDf
    // canonical dict-side subtree (fixed alias names) for the same
    // ReuseExchange sharing as [[joinDictCols]]: one dict scan + one
    // broadcast build per query, not per materialized var
    val d = dict.select(col("id").as("__mid"), col("term").as("__mt"))
    keep.foreach { v =>
      if (df.columns.contains(v)) {
        df = df.join(d, col(v) === col("__mid"),
            if (nullable.contains(v)) "left_outer" else "inner")
          .drop(v, "__mid")
          .withColumnRenamed("__mt", v)
      }
    }
    // `carry`: already-term columns to keep as-is (aggregate outputs)
    df.select((keep.filter(df.columns.contains) ++ carry).map(col): _*)
  }
}

object DictStore {

  /** Scale-adaptive write partition count for the PLAIN store layouts
    * (round-20, guide §6): size output files toward
    * `spark.graft.store.targetFileBytes` (default 128 MB) using the
    * optimizer's size estimate, clamped to [1, shuffle.partitions].
    * A fixed `shuffle.partitions`-way write scattered a 6 MB store
    * over 32 ~180 KB files of ~12 row groups each; every later scan
    * then paid 32 tasks x per-task reader setup x 12 per-row-group
    * inits — measured 4.2x the CPU of the same scan over sensibly
    * sized files. At scale the estimate grows and the count rises
    * toward shuffle.partitions, so production stores keep many
    * target-sized files. Bucketed layouts are untouched — their
    * bucket count is the layout contract that buys shuffle-free
    * joins. */
  private def sizedParts(df: DataFrame): Int = {
    val spark = df.sparkSession
    val target = spark.conf.getOption("spark.graft.store.targetFileBytes")
      .map(_.toLong).getOrElse(128L * 1024 * 1024)
    val cap = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val n = est / target + (if (est % target == 0) 0 else 1)
    if (n < 1) 1 else if (n > cap) cap else n.toInt
  }

  /** One-time ingest: build the dictionary over every distinct term of
    * `quads`, encode the four positions to long ids, and persist both
    * under `path`. The four encode joins are the one-time cost that
    * buys every later query its narrow joins; AQE broadcasts the dict
    * side when it fits. */
  def encode(quads: DataFrame, path: String): DictStore = {
    val spark = quads.sparkSession
    // ids assigned once, then frozen by the write: everything downstream
    // (including the quads encode below) reads the PERSISTED dict, so
    // monotonically_increasing_id's task-retry nondeterminism can never
    // produce two views of the same id space. CRITICAL: no shuffle may
    // sit between the id assignment and the write — the assignment
    // stage must BE the write stage, so each task's (id, term) file is
    // internally consistent and exactly one attempt per task commits.
    // (The lex range-partition + sort sit BEFORE the assignment inside
    // that same stage: they make per-query constant lookups prune by
    // row-group lex ranges — see [[DictStore.lookupFrame]].)
    val parts = sizedParts(quads)
    lexClusteredIds(quads, parts)
      .write.mode(SaveMode.Overwrite).option("compression", "zstd")
      .parquet(s"$path/dict")
    val dict = spark.read.parquet(s"$path/dict")
    encodeIds(quads, dict)
      .repartition(parts, col("p"), col("s"))
      .sortWithinPartitions("p", "s")
      .write.mode(SaveMode.Overwrite).option("compression", "zstd")
      .parquet(s"$path/quads")
    // ANALYZE at ingest: per-predicate stats for cost-based join
    // ordering, persisted as a sidecar so every later load gets them
    // free (the one groupBy here is noise next to the encode joins)
    graft.sparql.QuadsStats.write(spark,
      graft.sparql.QuadsStats.compute(quads), s"$path/stats")
    load(spark, path)
  }

  /** Every distinct term of the four quad positions (NULL g is the
    * default graph, not a term). Shared by both ingest layouts. */
  private def distinctTerms(quads: DataFrame): DataFrame =
    quads.select(col("s").as("term"))
      .unionByName(quads.select(col("p").as("term")))
      .unionByName(quads.select(col("o").as("term")))
      .unionByName(quads.filter(col("g").isNotNull).select(col("g").as("term")))
      .distinct()

  /** The frozen-id dict frame both ingest layouts write: distinct
    * terms range-partitioned and sorted by `term.lex` (so files carry
    * tight lex min/max for lookup pruning), with ids assigned INSIDE
    * the write stage (after the range shuffle — see the retry-safety
    * comments at the call sites). */
  private def lexClusteredIds(quads: DataFrame, parts: Int): DataFrame =
    distinctTerms(quads)
      .repartitionByRange(parts, col("term.lex"))
      .sortWithinPartitions(col("term.lex"))
      .select(monotonically_increasing_id().as("id"), col("term"))

  /** The four encode joins against a FROZEN dict (s/p/o inner, g left
    * outer), plus the TYPED OBJECT SIDECAR: four narrow columns
    * carrying the object literal's comparable value so numeric and
    * temporal FILTER conditions run in id space with ZERO dict joins
    * — and, because they are plain typed columns, push into the
    * parquet scan as row-group filters (the round-11 #6 item).
    *
    *  - `o_cls` 0 = not numeric, 1 = exact (integer/decimal family),
    *    2 = float/double — mirrors TermMath.numClass, which picks
    *    decimal vs double comparison semantics;
    *  - `o_dbl` Spark double cast of the lexical for ANY numeric
    *    (full-precision — NOT derived from o_dec, whose scale-12
    *    rounding would diverge from parseDouble on long fractions);
    *  - `o_num` decimal(38,12) cast for ANY numeric (NULL on
    *    overflow/bad lexical — exactly TermSortKey's saturation
    *    condition; v4 stores wrote the exact-only `o_dec`, which
    *    still serves the FILTER fast path but not ORDER BY);
    *  - `o_ts` timestamp for date/dateTime literals, cast in the
    *    ENCODE session's zone — the compile side only uses it when
    *    the query session zone matches (both pinned UTC here).
    *
    * Cost at 100 TB: fixed-width nullable columns, NULL for every
    * IRI/string object, so they RLE to near nothing and column
    * pruning skips them unless a filter references them. Stores
    * written before this sidecar existed load fine — the fast path
    * just stays off ([[DictStore.hasTypedCols]]). */
  private def encodeIds(quads: DataFrame, dict: DataFrame): DataFrame = {
    import graft.sparql.TermFns
    def d(i: Int) = dict.select(col("id").as(s"__ei$i"), col("term").as(s"__et$i"))
    val o = col("__et2")
    val sb = col("__et0")
    // o_ts/s_ts are only written when the encode session zone is UTC:
    // a zone-less date lexical casts differently per zone, and an
    // ABSENT column (fast path off) is honest where an all-NULL one
    // would wrongly drop rows at query time
    val tsCols =
      if (quads.sparkSession.sessionState.conf.sessionLocalTimeZone == "UTC")
        Seq(TermFns.ts(o).as("o_ts"), TermFns.ts(sb).as("s_ts"))
      else Nil
    def clsOf(t: Column): Column =
      when(TermFns.isFloating(t), lit(2))
        .when(TermFns.isExactNumeric(t), lit(1))
        .otherwise(lit(0)).cast("int")
    quads
      .join(d(0), col("s") === col("__et0"))
      .join(d(1), col("p") === col("__et1"))
      .join(d(2), col("o") === col("__et2"))
      .join(d(3), col("g") === col("__et3"), "left_outer")
      .select(Seq(col("__ei0").as("s"), col("__ei1").as("p"),
        col("__ei2").as("o"), col("__ei3").as("g"),
        clsOf(o).as("o_cls"),
        TermFns.numD(o).as("o_dbl"),
        // v5: decimal for ANY numeric (v4 wrote exact-only as o_dec —
        // the column NAME is the layout version signal: o_num stores
        // additionally support the sidecar ORDER BY fast path, whose
        // sort key needs the float rows' decimals too)
        TermFns.numDec(o).as("o_num"),
        // v6: the SAME sidecar for the SUBJECT position (s_num is the
        // version signal). Generalized-RDF quads can carry literal
        // subjects, and the reference scans-and-filters every pattern
        // position identically — these three (plus s_ts above) give
        // numeric/temporal subject FILTERs the identical zero-dict-
        // join, parquet-pushed fast path objects got in v5. On plain
        // IRI-subject corpora they are all-NULL fixed-width columns:
        // they RLE to nothing and column pruning skips them unless a
        // filter references them — the same 100 TB cost argument as
        // the object sidecar.
        clsOf(sb).as("s_cls"),
        TermFns.numD(sb).as("s_dbl"),
        TermFns.numDec(sb).as("s_num")) ++
        tsCols: _*)
  }

  /** Open a persisted store (stats sidecar optional — stores written
    * before ANALYZE-at-ingest still load, with structural ordering). */
  def load(spark: SparkSession, path: String): DictStore =
    new DictStore(spark,
      spark.read.parquet(s"$path/dict"),
      spark.read.parquet(s"$path/quads"),
      try Some(graft.sparql.QuadsStats.read(spark, s"$path/stats"))
      catch { case _: org.apache.spark.sql.AnalysisException => None })

  /** Incremental ingest: append `quads` to the persisted store at
    * `path` WITHOUT rewriting what's there — the 100 TB maintenance
    * op for a growing corpus. Terms already in the dictionary keep
    * their ids; unseen terms get fresh ids ABOVE the current ceiling
    * (offset + the same in-write-stage assignment rule as encode, so
    * task retries cannot fork the id space), written as NEW dict
    * files. The encoded quads (typed sidecar included) land as new
    * files under the same (p, s) partition scheme, and the stats
    * sidecar merges additively ([[graft.sparql.QuadsStats.merge]] —
    * counts exact, ndv union-bounded). Queries against the appended
    * store match a from-scratch encode of the union exactly: ids
    * differ, results cannot, because ids never leave the store.
    *
    * Crash consistency is job-granular and self-healing: a dict
    * append that committed without its quads append is re-absorbed on
    * retry (the anti-join finds those terms present and reuses their
    * ids); a failed quads job leaves nothing visible.
    *
    * Plain-parquet layout only ([[appendBucketed]] is the bucketed
    * twin); pre-v5 stores (`o_dec`
    * sidecar) must re-encode first, and a store carrying `o_ts`
    * (UTC-encoded) requires a UTC append session — appends never mix
    * sidecar schemas inside one directory. */
  def append(quads: DataFrame, path: String): DictStore = {
    val spark = quads.sparkSession
    require(!bucketedMarkerExists(spark, path),
      s"$path is a bucketed store: use DictStore.appendBucketed")
    val existing = spark.read.parquet(s"$path/quads")
    require(existing.columns.contains("o_num"),
      s"$path is a pre-v5 store (o_dec sidecar): re-encode before appending")
    require(!existing.columns.contains("o_ts") ||
        spark.sessionState.conf.sessionLocalTimeZone == "UTC",
      s"$path carries o_ts (UTC-encoded): append needs a UTC session")
    val dict0 = spark.read.parquet(s"$path/dict")
    val base = dict0.agg(max(col("id"))).head().getLong(0) + 1L
    val parts = sizedParts(quads) // batch-sized, not a fixed fan-out
    distinctTerms(quads)
      .join(dict0.select(col("term")), Seq("term"), "left_anti")
      .repartitionByRange(parts, col("term.lex"))
      .sortWithinPartitions(col("term.lex"))
      .select((monotonically_increasing_id() + lit(base)).as("id"),
        col("term"))
      .write.mode(SaveMode.Append).option("compression", "zstd")
      .parquet(s"$path/dict")
    val dict = spark.read.parquet(s"$path/dict")
    encodeIds(quads, dict)
      .select(existing.columns.map(col).toIndexedSeq: _*) // schema-exact
      .repartition(parts, col("p"), col("s"))
      .sortWithinPartitions("p", "s")
      .write.mode(SaveMode.Append).option("compression", "zstd")
      .parquet(s"$path/quads")
    // legacy stores (written before the stats sidecar existed) stay
    // sidecar-less — consistent with load()'s tolerance; writing
    // batch-only stats here would silently undercount the store
    readStats(spark, path).foreach { prior =>
      graft.sparql.QuadsStats.write(spark, graft.sparql.QuadsStats.merge(
        prior, graft.sparql.QuadsStats.compute(quads)), s"$path/stats")
    }
    // drop any cached listings of the grown directories (the session
    // file-status cache otherwise serves the pre-append file set)
    spark.catalog.refreshByPath(s"$path/dict")
    spark.catalog.refreshByPath(s"$path/quads")
    load(spark, path)
  }

  /** Compact a PLAIN store after appends. Each [[append]] lands one
    * file set per batch, so file counts grow linearly with batches
    * and the dict's lex-range file pruning loosens (a term range now
    * spans one file per batch). This rewrites the quads back to the
    * encode layout — hash(p, s) partitions, (p, s)-sorted files — and
    * the dictionary back to tight lex-range files. Ids are FROZEN
    * rows here, so the rewrite is pure movement; nothing is
    * reassigned. The directory swap (write `<sub>_compacting`, rename
    * live → `<sub>_old`, rename new → live, delete old) is NOT
    * atomic: run it offline, like every table-maintenance op here. A
    * dead previous run's leftovers are cleared on entry. */
  def compact(spark: SparkSession, path: String): Unit = {
    require(!bucketedMarkerExists(spark, path),
      s"$path is a bucketed store: its files are catalog-owned; re-encode")
    val hconf = spark.sparkContext.hadoopConfiguration
    def swapWrite(sub: String)(write: (DataFrame, String) => Unit): Unit = {
      val live = new org.apache.hadoop.fs.Path(s"$path/$sub")
      val fs = live.getFileSystem(hconf)
      val tmp = new org.apache.hadoop.fs.Path(s"$path/${sub}_compacting")
      val old = new org.apache.hadoop.fs.Path(s"$path/${sub}_old")
      fs.delete(tmp, true); fs.delete(old, true) // dead-run leftovers
      write(spark.read.parquet(live.toString), tmp.toString)
      require(fs.rename(live, old), s"swap failed: $live -> $old")
      require(fs.rename(tmp, live), s"swap failed: $tmp -> $live")
      fs.delete(old, true)
      spark.catalog.refreshByPath(live.toString)
    }
    swapWrite("quads") { (df, out) =>
      df.repartition(sizedParts(df), col("p"), col("s"))
        .sortWithinPartitions("p", "s")
        .write.option("compression", "zstd").parquet(out)
    }
    swapWrite("dict") { (df, out) =>
      df.repartitionByRange(sizedParts(df), col("term.lex"))
        .sortWithinPartitions(col("term.lex"))
        .write.option("compression", "zstd").parquet(out)
    }
  }

  /** [[compact]] for the BUCKETED layout. [[appendBucketed]] adds one
    * file per bucket per batch; Spark keeps bucket pruning and
    * shuffle-free joins across that, but stops assuming per-bucket
    * SORTEDNESS once a bucket holds more than one file — this rewrite
    * restores one sorted file per bucket for both tables (and tight
    * lex files for `dict_by_lex`). The catalog tables are EXTERNAL,
    * so the dance is: write a temp table with the same bucket spec
    * next to the live directory, drop the catalog entries (files
    * survive), swap the directories, and let [[loadBucketed]]
    * re-create the entries over the new files. Not atomic — offline
    * maintenance, like every rewrite op here. */
  def compactBucketed(spark: SparkSession, path: String): Unit = {
    val buckets = """"buckets"\s*:\s*(\d+)""".r
      .findFirstMatchIn(readTextFile(spark, s"$path/bucketed.json"))
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalArgumentException(
        s"$path/bucketed.json: no bucket count — not a bucketed store"))
    loadBucketed(spark, path)
    val base = tableBase(path)
    val hconf = spark.sparkContext.hadoopConfiguration
    def swapTable(sub: String, table: String, bucketCol: String,
                  sortCols: Seq[String]): Unit = {
      val live = new org.apache.hadoop.fs.Path(s"$path/$sub")
      val fs = live.getFileSystem(hconf)
      val tmp = new org.apache.hadoop.fs.Path(s"$path/${sub}_compacting")
      val old = new org.apache.hadoop.fs.Path(s"$path/${sub}_old")
      spark.sql(s"DROP TABLE IF EXISTS ${table}_cmp")
      fs.delete(tmp, true); fs.delete(old, true) // dead-run leftovers
      // read the FILES, not the catalog table: a bucketed-scan child
      // lets the optimizer drop the repartition below the bucketed
      // write, and the surviving task layout need not align rows to
      // one task per bucket — a plain parquet scan keeps the shuffle,
      // whose hash IS the bucket-id hash, giving one file per bucket
      spark.read.parquet(live.toString)
        .repartition(buckets, col(bucketCol))
        .write.option("compression", "zstd")
        .option("path", tmp.toString)
        .bucketBy(buckets, bucketCol)
        .sortBy(sortCols.head, sortCols.tail: _*)
        .saveAsTable(s"${table}_cmp")
      // drop BOTH catalog entries (external: files stay), swap dirs
      spark.sql(s"DROP TABLE ${table}_cmp")
      spark.sql(s"DROP TABLE $table")
      require(fs.rename(live, old), s"swap failed: $live -> $old")
      require(fs.rename(tmp, live), s"swap failed: $tmp -> $live")
      fs.delete(old, true)
    }
    swapTable("quads", s"${base}_quads", "s", Seq("p", "s"))
    swapTable("dict", s"${base}_dict", "id", Seq("id"))
    // the lex copy compacts like the plain layout's dictionary
    val lexLive = new org.apache.hadoop.fs.Path(s"$path/dict_by_lex")
    val lfs = lexLive.getFileSystem(hconf)
    val lexTmp = new org.apache.hadoop.fs.Path(s"$path/dict_by_lex_compacting")
    val lexOld = new org.apache.hadoop.fs.Path(s"$path/dict_by_lex_old")
    lfs.delete(lexTmp, true); lfs.delete(lexOld, true)
    val lexDf = spark.read.parquet(lexLive.toString)
    lexDf
      .repartitionByRange(sizedParts(lexDf), col("term.lex"))
      .sortWithinPartitions(col("term.lex"))
      .write.option("compression", "zstd").parquet(lexTmp.toString)
    require(lfs.rename(lexLive, lexOld), s"swap failed: $lexLive")
    require(lfs.rename(lexTmp, lexLive), s"swap failed: $lexTmp")
    lfs.delete(lexOld, true)
    spark.catalog.refreshByPath(s"$path/dict_by_lex")
    loadBucketed(spark, path) // re-create the catalog entries
    ()
  }

  /** [[append]] for the BUCKETED layout — incremental ingest for the
    * 100 TB shape. Phase 1 freezes unseen-term ids in `dict_by_lex`
    * exactly like [[append]] (offset above the ceiling, in-write-stage
    * assignment). Phase 2 routes the frozen new rows into the
    * id-bucketed dict table and the encoded quads into the s-bucketed
    * quads table as APPENDED bucket files — Spark accepts appends that
    * repeat the table's bucket spec; bucket pruning and shuffle-free
    * joins survive (with >1 file per bucket Spark just stops assuming
    * per-bucket sortedness, which only the sort-merge fast path used).
    * Phase 2 derives its row set by ANTI-JOINING `dict_by_lex` against
    * the bucketed dict, NOT from this call's batch — so a phase-1
    * commit whose phase 2 died is healed by the retry. Re-running a
    * FULLY-committed append re-adds the batch (bag semantics: quad
    * multiplicity is data, the store cannot distinguish a retry from
    * a genuine re-ingest) — same contract as [[append]]. */
  def appendBucketed(quads: DataFrame, path: String): DictStore = {
    val spark = quads.sparkSession
    val buckets = """"buckets"\s*:\s*(\d+)""".r
      .findFirstMatchIn(readTextFile(spark, s"$path/bucketed.json"))
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalArgumentException(
        s"$path/bucketed.json: no bucket count — not a bucketed store"))
    loadBucketed(spark, path) // attach catalog tables if absent
    val base = tableBase(path)
    val existing = spark.table(s"${base}_quads")
    require(existing.columns.contains("o_num"),
      s"$path is a pre-v5 store (o_dec sidecar): re-encode before appending")
    require(!existing.columns.contains("o_ts") ||
        spark.sessionState.conf.sessionLocalTimeZone == "UTC",
      s"$path carries o_ts (UTC-encoded): append needs a UTC session")
    val parts = sizedParts(quads) // batch-sized, not a fixed fan-out
    val dictLex0 = spark.read.parquet(s"$path/dict_by_lex")
    val base0 = dictLex0.agg(max(col("id"))).head().getLong(0) + 1L
    distinctTerms(quads)
      .join(dictLex0.select(col("term")), Seq("term"), "left_anti")
      .repartitionByRange(parts, col("term.lex"))
      .sortWithinPartitions(col("term.lex"))
      .select((monotonically_increasing_id() + lit(base0)).as("id"),
        col("term"))
      .write.mode(SaveMode.Append).option("compression", "zstd")
      .parquet(s"$path/dict_by_lex")
    spark.catalog.refreshByPath(s"$path/dict_by_lex")
    // phase 2 self-heals: whatever the lex copy has that the bucketed
    // table lacks routes in, whether frozen by this call or a dead one
    spark.read.parquet(s"$path/dict_by_lex")
      .join(spark.table(s"${base}_dict").select(col("id")),
        Seq("id"), "left_anti")
      .repartition(buckets, col("id"))
      .write.mode(SaveMode.Append).option("compression", "zstd")
      .option("path", s"$path/dict")
      .bucketBy(buckets, "id").sortBy("id")
      .saveAsTable(s"${base}_dict")
    spark.catalog.refreshTable(s"${base}_dict")
    encodeIds(quads, spark.table(s"${base}_dict"))
      .select(existing.columns.map(col).toIndexedSeq: _*) // schema-exact
      .repartition(buckets, col("s"))
      .write.mode(SaveMode.Append).option("compression", "zstd")
      .option("path", s"$path/quads")
      .bucketBy(buckets, "s").sortBy("p", "s")
      .saveAsTable(s"${base}_quads")
    spark.catalog.refreshTable(s"${base}_quads")
    // same legacy-store tolerance as the plain-layout append
    readStats(spark, path).foreach { prior =>
      graft.sparql.QuadsStats.write(spark, graft.sparql.QuadsStats.merge(
        prior, graft.sparql.QuadsStats.compute(quads)), s"$path/stats")
    }
    loadBucketed(spark, path)
  }

  // ----- bucketed layout -----

  /** Catalog identifier for a bucketed store's tables: derived from the
    * store path so re-attach is deterministic, suffixed to keep two
    * paths with the same sanitized form apart. */
  private def tableBase(path: String): String = {
    val clean = path.replaceAll("[^A-Za-z0-9_]", "_").toLowerCase
    val tail = if (clean.length > 96) clean.takeRight(96) else clean
    f"graft_bkt_${tail}_${path.hashCode & 0x7fffffff}%08x"
  }

  /** One-time ingest into a BUCKETED layout — the 100 TB shape of the
    * store. Two differences from [[encode]]'s plain-parquet layout,
    * both invisible to query semantics (the class runs unchanged over
    * the catalog tables):
    *
    *  - `dict` is bucketed on `id`: every late-materialization join
    *    (and the [[DictStore.decodedQuads]] view) joins the dictionary
    *    on `id`, so a bucketed dict side arrives pre-partitioned and
    *    NEVER re-shuffles — at scale the dictionary is term-count-sized
    *    (~10^11 rows for 100 TB of triples), which would otherwise be
    *    the largest exchange of every query. Only the (intermediate-
    *    result-sized, id-only) probe side moves.
    *  - `quads` is bucketed on `s` and sorted by `(p, s)` within each
    *    bucket: the subject–subject joins of star-shaped BGPs — the
    *    dominant join shape in entity-centric queries — see BOTH sides
    *    pre-partitioned on `s` and plan with zero exchanges, while the
    *    within-bucket `(p, s)` sort keeps constant-predicate row-group
    *    pruning as tight as the plain layout's `(p, s)` clustering.
    *
    * Spark's bucketing metadata lives in the session catalog, so the
    * tables register under a path-derived name with their data at
    * `path/{dict,quads}` (external) — [[loadBucketed]] re-attaches a
    * fresh session to the same files. In production this catalog is the
    * metastore; locally it is the session's, and re-attach recreates
    * the table entries from the layout metadata persisted in
    * `path/bucketed.json`. */
  def encodeBucketed(quads: DataFrame, path: String,
                     buckets: Int = 32): DictStore = {
    val spark = quads.sparkSession
    val base = tableBase(path)
    // TWO-phase dict write. Ids must freeze in a write whose stage IS
    // the assignment stage (see encode()): with a repartition between
    // monotonically_increasing_id and the bucketed write, an upstream
    // stage retry would re-assign ids for rows routed to not-yet-
    // committed bucket files while already-committed files keep the
    // old assignment — a silently non-bijective dictionary. So phase 1
    // freezes (id, term) exactly like encode(), and phase 2 re-buckets
    // the FROZEN copy (pure deterministic routing, retry-safe). The
    // phase-1 copy is lex-clustered and KEPT as `dict_by_lex`: it is
    // the pruned per-query constant-lookup side (the id-bucketed table
    // has no lex locality), and its ids are identical by construction.
    lexClusteredIds(quads, sizedParts(quads))
      .write.mode(SaveMode.Overwrite).option("compression", "zstd")
      .parquet(s"$path/dict_by_lex")
    spark.read.parquet(s"$path/dict_by_lex")
      .repartition(buckets, col("id"))
      .write.mode(SaveMode.Overwrite).option("compression", "zstd")
      .option("path", s"$path/dict")
      .bucketBy(buckets, "id").sortBy("id")
      .saveAsTable(s"${base}_dict")
    val dict = spark.table(s"${base}_dict")
    // the encode-join output is a deterministic row set and the
    // repartition routes by hash(s) — no assignment nondeterminism, so
    // the quads can bucket in one pass
    encodeIds(quads, dict)
      .repartition(buckets, col("s"))
      .write.mode(SaveMode.Overwrite).option("compression", "zstd")
      .option("path", s"$path/quads")
      .bucketBy(buckets, "s").sortBy("p", "s")
      .saveAsTable(s"${base}_quads")
    graft.sparql.QuadsStats.write(spark,
      graft.sparql.QuadsStats.compute(quads), s"$path/stats")
    writeTextFile(spark, s"$path/bucketed.json", s"""{"buckets": $buckets}""")
    loadBucketed(spark, path)
  }

  /** Re-attach a bucketed store: if the catalog already has the
    * tables, use them; otherwise recreate the (external) table entries
    * over the existing files — the bucket spec in the CREATE must match
    * the writer's for Spark to trust the file-name bucket ids, which
    * `bucketed.json` guarantees. */
  def loadBucketed(spark: SparkSession, path: String): DictStore = {
    val buckets = """"buckets"\s*:\s*(\d+)""".r
      .findFirstMatchIn(readTextFile(spark, s"$path/bucketed.json"))
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalArgumentException(
        s"$path/bucketed.json: no bucket count — not a bucketed store"))
    val base = tableBase(path)
    val termSql = graft.rdf.TermSchema.termType.sql
    if (!spark.catalog.tableExists(s"${base}_dict"))
      spark.sql(
        s"""CREATE TABLE ${base}_dict (id BIGINT, term $termSql)
           |USING PARQUET
           |CLUSTERED BY (id) SORTED BY (id) INTO $buckets BUCKETS
           |LOCATION '$path/dict'""".stripMargin)
    if (!spark.catalog.tableExists(s"${base}_quads"))
      spark.sql(
        s"""CREATE TABLE ${base}_quads (s BIGINT, p BIGINT, o BIGINT, g BIGINT)
           |USING PARQUET
           |CLUSTERED BY (s) SORTED BY (p, s) INTO $buckets BUCKETS
           |LOCATION '$path/quads'""".stripMargin)
    new DictStore(spark,
      spark.table(s"${base}_dict"),
      spark.table(s"${base}_quads"),
      try Some(graft.sparql.QuadsStats.read(spark, s"$path/stats"))
      catch { case _: org.apache.spark.sql.AnalysisException => None },
      // lex-clustered lookup sidecar (absent on stores written before
      // it existed — the bucketed table answers lookups unpruned then)
      try Some(spark.read.parquet(s"$path/dict_by_lex"))
      catch { case _: org.apache.spark.sql.AnalysisException => None })
  }

  // marker I/O goes through the Hadoop FileSystem of the store path —
  // a bucketed store can live on any filesystem Spark writes to
  // (hdfs://, s3a://, file:…), not just the driver's local disk
  private def hadoopFs(spark: SparkSession, p: String) = {
    val hp = new org.apache.hadoop.fs.Path(p)
    (hp.getFileSystem(spark.sparkContext.hadoopConfiguration), hp)
  }

  /** Layout-dispatch guard for [[append]]/[[compact]]: MUST resolve
    * through the store path's own filesystem — a `java.io.File`
    * check is silently false for hdfs://.../s3a://... stores, which
    * would let a plain append write non-bucketed files into a
    * bucketed store's catalog-owned directories (bucket ids are
    * derived from file names, so that corrupts the bucket contract
    * without any error). */
  private def bucketedMarkerExists(spark: SparkSession,
                                   path: String): Boolean = {
    val (fs, hp) = hadoopFs(spark, s"$path/bucketed.json")
    fs.exists(hp)
  }

  /** Stats sidecar of an existing store, `None` when it predates the
    * sidecar — the same tolerance [[load]]/[[loadBucketed]] apply.
    * MISSING is the only tolerated state (checked via the store
    * path's filesystem, like [[bucketedMarkerExists]]): a sidecar
    * that exists but cannot be read (corrupt files, permissions)
    * propagates, because swallowing it would make append silently
    * stop updating stats — indistinguishable from a legacy store,
    * leaving permanently undercounted CBO estimates. */
  private def readStats(spark: SparkSession,
                        path: String): Option[graft.sparql.QuadsStats] = {
    val statsPath = s"$path/stats"
    val (fs, hp) = hadoopFs(spark, statsPath)
    if (!fs.exists(hp)) None
    else Some(graft.sparql.QuadsStats.read(spark, statsPath))
  }

  private def writeTextFile(spark: SparkSession, p: String,
                            text: String): Unit = {
    val (fs, hp) = hadoopFs(spark, p)
    val out = fs.create(hp, true)
    try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readTextFile(spark: SparkSession, p: String): String = {
    val (fs, hp) = hadoopFs(spark, p)
    val in = fs.open(hp)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

}
