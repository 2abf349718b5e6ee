package graft.sparql

import graft.rdf.{BNode, Iri, Lit, RDF, Term, XSD}
import Algebra._

import scala.collection.mutable

/** SPARQL 1.1 SELECT parser → [[Algebra]] IR.
  *
  * From-scratch recursive descent (the reference delegates parsing to
  * rdf4j, Interpreter.scala:196-201 — SURVEY.md §7.1 makes this the one
  * component with no reference implementation to study). Grammar subset:
  * the full surface the reference executes — PREFIX/BASE, SELECT
  * [DISTINCT|REDUCED] with expression projections, BGPs with `;`/`,`
  * lists and the `a` keyword, blank-node syntax, FILTER (incl. EXISTS /
  * NOT EXISTS), OPTIONAL, UNION, MINUS, GRAPH, BIND, VALUES, GROUP
  * BY/HAVING with the 7 aggregates, ORDER BY/LIMIT/OFFSET, and property
  * paths (desugared here, like rdf4j's parser does — SURVEY.md §2.8;
  * `*`/`+` become [[Algebra.ArbitraryLengthPath]], which the reference
  * cannot run at all).
  */
final class SparqlParser(input: String) {
  private var pos = 0
  private val prefixes = mutable.Map.empty[String, String]
  private var base = ""
  private var anonCounter = 0

  // ---------- low-level lexing ----------
  private def err(msg: String): Nothing = {
    val start = math.max(0, pos - 40)
    val ctx = input.substring(start, math.min(input.length, pos + 40))
    throw new IllegalArgumentException(s"SPARQL parse error at $pos: $msg near ...$ctx...")
  }
  private def eof: Boolean = pos >= input.length
  private def peek: Char = if (eof) '\u0000' else input.charAt(pos)
  private def peekAt(o: Int): Char =
    if (pos + o >= input.length) '\u0000' else input.charAt(pos + o)

  private def skipWs(): Unit = {
    var go = true
    while (go && !eof) {
      val c = input.charAt(pos)
      if (c == '#') { while (!eof && input.charAt(pos) != '\n') pos += 1 }
      else if (c.isWhitespace) pos += 1
      else go = false
    }
  }
  private def expect(c: Char): Unit = {
    skipWs(); if (peek != c) err(s"expected '$c'"); pos += 1
  }
  private def isIdentChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  /** Case-insensitive keyword match (not followed by an ident char). */
  private def peekKw(kw: String): Boolean = {
    skipWs()
    input.regionMatches(true, pos, kw, 0, kw.length) &&
      (pos + kw.length >= input.length || !isIdentChar(input.charAt(pos + kw.length)))
  }
  private def tryKw(kw: String): Boolean = {
    if (peekKw(kw)) { pos += kw.length; true } else false
  }
  private def expectKw(kw: String): Unit =
    if (!tryKw(kw)) err(s"expected $kw")

  private def freshVar(): String = { anonCounter += 1; s"_anon$anonCounter" }

  /** True iff the char at pos+offset ends the `a` keyword (PN_PREFIX
    * may contain '-' and interior '.', and `a:x`/`a-b:x` are prefixed
    * names, not the keyword). */
  private def aKeywordBoundary(offset: Int): Boolean = {
    val c = peekAt(offset)
    if (isIdentChar(c) || c == ':' || c == '-') false
    else if (c == '.' && peekAt(offset + 1).isLetterOrDigit) false
    else true
  }

  // ---------- entry ----------
  def parseQuery(): Op = parseAnyQuery() match {
    case SparqlParser.SelectQuery(op, _) => op
    case other => err(s"expected a SELECT query, got ${other.getClass.getSimpleName}")
  }

  /** Dataset clauses of the (top-level) query being parsed. */
  private var datasetSpec: SparqlParser.DatasetSpec = SparqlParser.NoDataset

  /** True iff `kw` is here as a KEYWORD, not the prefix of a prefixed
    * name (PN_PREFIX may contain '-' and interior '.', so `NAMED:g`,
    * `NAMED-x:g` and `NAMED.x:g` are all names, not the keyword). */
  private def kwNotPrefix(kw: String): Boolean =
    peekKw(kw) && {
      val c = peekAt(kw.length)
      !(c == ':' || c == '-' ||
        (c == '.' && isIdentChar(peekAt(kw.length + 1))))
    }

  /** Shared `FROM`/`USING` DatasetClause* loop: `kw NAMED? iri` repeated
    * (SPARQL §13.2 dataset clauses; Update §3.1.3 USING clauses). */
  private def parseDatasetLike(kw: String): SparqlParser.DatasetSpec = {
    val from = mutable.ArrayBuffer.empty[Term]
    val named = mutable.ArrayBuffer.empty[Term]
    var go = true
    while (go) {
      skipWs()
      if (kwNotPrefix(kw)) {
        pos += kw.length
        skipWs()
        val isNamed = kwNotPrefix("NAMED") && { pos += 5; true }
        skipWs()
        val iri =
          if (peek == '<') Iri(parseIriRef()) else Iri(parsePrefixedIri())
        if (isNamed) named += iri else from += iri
      } else go = false
    }
    SparqlParser.DatasetSpec(from.toList, named.toList)
  }

  private def parseDatasetClauses(): Unit =
    datasetSpec = parseDatasetLike("FROM")

  /** Full query-form entry: SELECT | ASK | CONSTRUCT (the reference is
    * SELECT-only, Interpreter.scala:196-201 — ASK/CONSTRUCT are the
    * cheap capability superset SURVEY.md §2.11 anticipated). */
  def parseAnyQuery(): SparqlParser.Query = {
    parsePrologue()
    val q: SparqlParser.Query =
      if (peekKw("SELECT")) {
        val op = parseSelect()
        SparqlParser.SelectQuery(op, datasetSpec)
      }
      else if (tryKw("ASK")) {
        parseDatasetClauses()
        tryKw("WHERE")
        val (p, fs) = parseGroupPattern()
        SparqlParser.AskQuery(applyFilters(p, fs), datasetSpec)
      } else if (tryKw("CONSTRUCT")) {
        // grammar rule 10, second alternative: `CONSTRUCT DatasetClause*
        // WHERE '{' TriplesTemplate? '}'` — the group doubles as
        // template and pattern (plain triples only, so templateQuads'
        // flatten rejects anything else loudly)
        skipWs()
        val shorthand = peek != '{'
        val explicitTemplate =
          if (shorthand) Nil else parseConstructTemplate()
        parseDatasetClauses()
        if (shorthand) expectKw("WHERE")
        else tryKw("WHERE") // WhereClause ::= 'WHERE'? GroupGraphPattern
        val (p, fs) = parseGroupPattern()
        val template =
          if (shorthand) {
            if (fs.nonEmpty) err("FILTER not allowed in CONSTRUCT WHERE shorthand")
            // template triples (default graph) mirror the pattern
            templateQuads(p, requireGround = false).map(q => (q.s, q.p, q.o))
          } else explicitTemplate
        var op = applyFilters(p, fs)
        // solution modifiers on the WHERE solutions
        val orderKeys = mutable.ArrayBuffer.empty[(Expr, Boolean)]
        if (tryKw("ORDER")) {
          expectKw("BY")
          var go = true
          while (go) {
            skipWs()
            if (tryKw("ASC")) { expect('('); orderKeys += parseExpr() -> true; expect(')') }
            else if (tryKw("DESC")) { expect('('); orderKeys += parseExpr() -> false; expect(')') }
            else if (peek == '?' || peek == '$') orderKeys += VarE(parseVarName()) -> true
            else go = false
          }
        }
        if (orderKeys.nonEmpty) op = Order(op, orderKeys.toList)
        var offset = 0L
        var limit: Option[Long] = None
        var sawSlice = false
        var go = true
        while (go) {
          if (tryKw("LIMIT")) { skipWs(); limit = Some(parseInteger()); sawSlice = true }
          else if (tryKw("OFFSET")) { skipWs(); offset = parseInteger(); sawSlice = true }
          else go = false
        }
        if (sawSlice) op = Slice(op, offset, limit)
        SparqlParser.ConstructQuery(template, op, datasetSpec)
      } else if (tryKw("DESCRIBE")) {
        skipWs()
        var star = false
        val targets = mutable.ArrayBuffer.empty[VarOrTerm]
        if (!eof && peek == '*') { pos += 1; star = true }
        else {
          var go = true
          while (go) {
            skipWs()
            if (!eof && (peek == '?' || peek == '$')) targets += V(parseVarName())
            else if (!eof && peek == '<') targets += T(Iri(parseIriRef()))
            else if (!eof && (peek == ':' || peek.isLetter) && !peekKw("WHERE") &&
                     !peekKw("LIMIT") && !peekKw("OFFSET") && !peekKw("FROM"))
              targets += T(Iri(parsePrefixedIri()))
            else go = false
          }
          if (targets.isEmpty) err("DESCRIBE needs resources or *")
        }
        parseDatasetClauses()
        skipWs()
        val hasWhere = peekKw("WHERE") || (!eof && peek == '{')
        var op: Option[Op] =
          if (hasWhere) {
            tryKw("WHERE")
            val (p, fs) = parseGroupPattern()
            Some(applyFilters(p, fs))
          } else None
        // SolutionModifier is independent of WhereClause in the grammar
        var offset = 0L
        var limit: Option[Long] = None
        var sawSlice = false
        var go2 = true
        while (go2) {
          if (tryKw("LIMIT")) { skipWs(); limit = Some(parseInteger()); sawSlice = true }
          else if (tryKw("OFFSET")) { skipWs(); offset = parseInteger(); sawSlice = true }
          else go2 = false
        }
        if (sawSlice) op match {
          case Some(o) => op = Some(Slice(o, offset, limit))
          case None =>
            // constants-only DESCRIBE has ONE implicit solution; only
            // LIMIT 0 / OFFSET>0 change anything (→ no solutions)
            if (limit.contains(0L) || offset > 0) {
              targets.clear(); star = false
            }
        }
        if ((star || targets.exists(_.isInstanceOf[V])) && op.isEmpty)
          err("DESCRIBE with variables requires a WHERE clause")
        SparqlParser.DescribeQuery(targets.toList, star, op, datasetSpec)
      } else err("expected SELECT, ASK, CONSTRUCT or DESCRIBE")
    skipWs()
    if (!eof) err("trailing content after query")
    q
  }

  /** SPARQL 1.1 Update request: one or more operations separated by
    * ';' (Update ::= Prologue (Update1 (';' Update)?)? — each
    * operation may carry its own prologue, and prefixes accumulate
    * across the request). Data/pattern forms (§3.1): INSERT DATA |
    * DELETE DATA | DELETE WHERE | DELETE tpl? INSERT tpl? WHERE.
    * Graph management (§3.2): LOAD, CLEAR, DROP, CREATE, ADD, COPY,
    * MOVE. Templates and quad data reuse the group-pattern grammar
    * (so full triple syntax incl. GRAPH blocks and prefixed names
    * works) restricted to plain quad patterns — FILTER/OPTIONAL/… in
    * a template is an error, and DATA forms additionally require
    * ground (variable-free) quads. */
  def parseUpdateReq(): List[SparqlParser.Update] = {
    val out = mutable.ListBuffer.empty[SparqlParser.Update]
    var go = true
    while (go) {
      parsePrologue()
      skipWs()
      if (eof) go = false // empty request / trailing ';' is grammatical
      else {
        out += parseUpdate1()
        skipWs()
        if (!eof && peek == ';') pos += 1 else go = false
      }
    }
    skipWs()
    if (!eof) err("trailing content after update")
    out.toList
  }

  private def parseUpdate1(): SparqlParser.Update = {
    skipWs()
    // WITH <g>: default graph for the Modify form's templates and
    // (absent USING) its WHERE pattern
    val withGraph: Option[Term] =
      if (tryKw("WITH")) {
        skipWs()
        Some(Iri(if (peek == '<') parseIriRef() else parsePrefixedIri()))
      } else None

    // USING / USING NAMED clauses (FROM-style dataset for WHERE)
    def parseUsing(): SparqlParser.DatasetSpec = parseDatasetLike("USING")

    val u: SparqlParser.Update =
      if (tryKw("INSERT")) {
        if (tryKw("DATA")) {
          if (withGraph.isDefined) err("WITH is not allowed on DATA forms")
          SparqlParser.InsertData(parseQuadData(mintBNodes = true))
        } else {
          val ins = parseQuadTemplate()
          val using = parseUsing()
          expectKw("WHERE")
          val (p, fs) = parseGroupPattern()
          SparqlParser.Modify(Nil, ins, applyFilters(p, fs), using, withGraph)
        }
      } else if (tryKw("DELETE")) {
        if (tryKw("DATA")) {
          if (withGraph.isDefined) err("WITH is not allowed on DATA forms")
          SparqlParser.DeleteData(parseQuadData())
        } else if (peekKw("WHERE")) { // DELETE WHERE { pattern }
          expectKw("WHERE")
          val (p, fs) = parseGroupPattern()
          val tpl = templateQuads(p, requireGround = false)
          if (fs.nonEmpty) err("FILTER not allowed in DELETE WHERE shorthand")
          SparqlParser.Modify(tpl, Nil, p, SparqlParser.NoDataset, withGraph)
        } else {
          val del = parseQuadTemplate()
          val ins = if (tryKw("INSERT")) parseQuadTemplate() else Nil
          val using = parseUsing()
          expectKw("WHERE")
          val (p, fs) = parseGroupPattern()
          SparqlParser.Modify(del, ins, applyFilters(p, fs), using, withGraph)
        }
      } else if (withGraph.isDefined)
        err("WITH is only allowed on the DELETE/INSERT (Modify) form")
      else if (tryKw("LOAD")) {
        val silent = tryKw("SILENT")
        val doc = parseConstIri()
        val into =
          if (tryKw("INTO")) { expectKw("GRAPH"); Some(parseConstIri()) }
          else None
        SparqlParser.Load(doc, into, silent)
      } else if (tryKw("CLEAR")) {
        val silent = tryKw("SILENT")
        SparqlParser.Clear(parseGraphRefAll(), silent)
      } else if (tryKw("DROP")) {
        val silent = tryKw("SILENT")
        SparqlParser.Drop(parseGraphRefAll(), silent)
      } else if (tryKw("CREATE")) {
        val silent = tryKw("SILENT")
        expectKw("GRAPH")
        SparqlParser.Create(parseConstIri(), silent)
      } else if (tryKw("ADD")) {
        val (src, dst, silent) = parseSrcDst()
        SparqlParser.AddGraph(src, dst, silent)
      } else if (tryKw("COPY")) {
        val (src, dst, silent) = parseSrcDst()
        SparqlParser.CopyGraph(src, dst, silent)
      } else if (tryKw("MOVE")) {
        val (src, dst, silent) = parseSrcDst()
        SparqlParser.MoveGraph(src, dst, silent)
      } else
        err("expected an update operation (INSERT, DELETE, LOAD, " +
          "CLEAR, DROP, CREATE, ADD, COPY or MOVE)")
    u
  }

  private def parseConstIri(): Term = {
    skipWs()
    Iri(if (peek == '<') parseIriRef() else parsePrefixedIri())
  }

  /** GraphRefAll ::= 'GRAPH' iri | 'DEFAULT' | 'NAMED' | 'ALL'. The
    * bare keywords use kwNotPrefix so prefixed names like `DEFAULT:x`
    * never shadow them (and are a parse error here anyway). */
  private def parseGraphRefAll(): SparqlParser.GraphRef = {
    skipWs()
    if (kwNotPrefix("DEFAULT")) { pos += 7; SparqlParser.DefaultRef }
    else if (kwNotPrefix("NAMED")) { pos += 5; SparqlParser.AllNamedRef }
    else if (kwNotPrefix("ALL")) { pos += 3; SparqlParser.AllGraphsRef }
    else { expectKw("GRAPH"); SparqlParser.NamedRef(parseConstIri()) }
  }

  /** GraphOrDefault ::= 'DEFAULT' | 'GRAPH'? iri. */
  private def parseGraphOrDefault(): SparqlParser.GraphRef = {
    skipWs()
    if (kwNotPrefix("DEFAULT")) { pos += 7; SparqlParser.DefaultRef }
    else {
      if (kwNotPrefix("GRAPH")) pos += 5
      SparqlParser.NamedRef(parseConstIri())
    }
  }

  private def parseSrcDst(): (SparqlParser.GraphRef, SparqlParser.GraphRef, Boolean) = {
    val silent = tryKw("SILENT")
    val src = parseGraphOrDefault()
    expectKw("TO")
    val dst = parseGraphOrDefault()
    (src, dst, silent)
  }

  private def templateQuads(op: Op, requireGround: Boolean,
                            mintBNodes: Boolean = false): List[SparqlParser.QuadTpl] = {
    def flatten(o: Op): List[Scan] = o match {
      case s: Scan => List(s)
      case Join(l, r) => flatten(l) ++ flatten(r)
      case Singleton => Nil
      case other =>
        err(s"only plain quad patterns allowed here, got ${other.getClass.getSimpleName}")
    }
    // §3.1.1: blank nodes in INSERT DATA mint FRESH nodes per
    // operation (labels never join with existing store bnodes) —
    // substitute each distinct label with one fresh term; DELETE DATA
    // (mintBNodes = false) rejects them per the same section
    val minted = mutable.Map.empty[String, Term]
    def subst(x: VarOrTerm): VarOrTerm = x match {
      case V(n) if mintBNodes && n.startsWith("_anonbn_") =>
        T(minted.getOrElseUpdate(n, graft.rdf.BNode(
          "ins" + java.util.UUID.randomUUID.toString.replace("-", ""))))
      case other => other
    }
    flatten(op).map { s0 =>
      val s = Scan(subst(s0.s), subst(s0.p), subst(s0.o), s0.g)
      if (requireGround && Seq(s.s, s.p, s.o).exists {
        case V(n) => if (n.startsWith("_anonbn_"))
          err("blank nodes are not allowed in DELETE DATA") else true
        case _ => false
      }) err("DATA forms require ground (variable-free) quads")
      s.g match {
        case GraphVar(_) if requireGround =>
          err("DATA forms require a constant GRAPH")
        case _ => ()
      }
      SparqlParser.QuadTpl(s.s, s.p, s.o, s.g)
    }
  }

  private def parseQuadTemplate(): List[SparqlParser.QuadTpl] = {
    val (p, fs) = parseGroupPattern()
    if (fs.nonEmpty) err("FILTER not allowed in an update template")
    templateQuads(p, requireGround = false)
  }

  private def parseQuadData(mintBNodes: Boolean = false): List[SparqlParser.QuadTpl] = {
    val (p, fs) = parseGroupPattern()
    if (fs.nonEmpty) err("FILTER not allowed in quad data")
    templateQuads(p, requireGround = true, mintBNodes = mintBNodes)
  }

  /** CONSTRUCT template: plain triples only (vars, IRIs, literals,
    * blank-node labels — no property paths). */
  private def parseConstructTemplate(): List[(VarOrTerm, VarOrTerm, VarOrTerm)] = {
    expect('{')
    val out = mutable.ArrayBuffer.empty[(VarOrTerm, VarOrTerm, VarOrTerm)]
    skipWs()
    while (peek != '}') {
      val subj = parseTermOrVar()
      var go = true
      while (go) {
        skipWs()
        val verb: VarOrTerm =
          if (peek == '?' || peek == '$') V(parseVarName())
          else if (peek == 'a' && aKeywordBoundary(1)) {
            pos += 1; T(Iri(RDF.typ))
          } else parseTermOrVar()
        var objGo = true
        while (objGo) {
          out += ((subj, verb, parseTermOrVar()))
          skipWs()
          if (peek == ',') pos += 1 else objGo = false
        }
        skipWs()
        if (peek == ';') {
          pos += 1
          skipWs()
          if (peek == '.' || peek == '}') go = false
        } else go = false
      }
      skipWs()
      if (peek == '.') { pos += 1; skipWs() }
      else if (peek != '}') err("expected '.' or '}' in CONSTRUCT template")
    }
    pos += 1
    out.toList
  }

  private def parsePrologue(): Unit = {
    var go = true
    while (go) {
      skipWs()
      if (tryKw("PREFIX")) {
        skipWs()
        val colon = input.indexOf(':', pos)
        if (colon < 0) err("expected prefix name")
        val name = input.substring(pos, colon).trim
        pos = colon + 1
        prefixes(name) = parseIriRef()
      } else if (tryKw("BASE")) base = parseIriRef()
      else go = false
    }
  }

  // ---------- SELECT query ----------
  private sealed trait SelectItem
  private final case class SelectVar(name: String) extends SelectItem
  private final case class SelectExpr(expr: Expr, as: String) extends SelectItem

  private def parseSelect(sub: Boolean = false): Op = {
    expectKw("SELECT")
    val distinct = tryKw("DISTINCT")
    val reduced = !distinct && tryKw("REDUCED")
    skipWs()
    var star = false
    val items = mutable.ArrayBuffer.empty[SelectItem]
    if (peek == '*') { pos += 1; star = true }
    else {
      var go = true
      while (go) {
        skipWs()
        if (peek == '?' || peek == '$') items += SelectVar(parseVarName())
        else if (peek == '(') {
          pos += 1
          val e = parseExpr()
          expectKw("AS")
          val v = { skipWs(); parseVarName() }
          expect(')')
          items += SelectExpr(e, v)
        } else go = false
      }
      if (items.isEmpty) err("empty SELECT list")
    }
    skipWs()
    if (sub) {
      if (peekKw("FROM")) err("dataset clauses (FROM) are not allowed in a sub-select")
    } else parseDatasetClauses()
    tryKw("WHERE")
    val (pattern0, filters) = parseGroupPattern()
    var op = applyFilters(pattern0, filters)

    // solution modifiers
    val groupKeys = mutable.ArrayBuffer.empty[String]
    val groupPreExtends = mutable.ArrayBuffer.empty[(String, Expr)]
    var hasGroupBy = false
    if (tryKw("GROUP")) {
      expectKw("BY")
      hasGroupBy = true
      var go = true
      while (go) {
        skipWs()
        if (peek == '?' || peek == '$') groupKeys += parseVarName()
        else if (peek == '(') {
          pos += 1
          val e = parseExpr()
          val name =
            if (tryKw("AS")) { skipWs(); parseVarName() } else freshVar()
          expect(')')
          groupPreExtends += name -> e
          groupKeys += name
        } else go = false
      }
      if (groupKeys.isEmpty) err("empty GROUP BY")
    }
    var having: Option[Expr] = None
    if (tryKw("HAVING")) {
      expect('(')
      having = Some(parseExpr())
      expect(')')
    }
    val orderKeys = mutable.ArrayBuffer.empty[(Expr, Boolean)]
    if (tryKw("ORDER")) {
      expectKw("BY")
      var go = true
      while (go) {
        skipWs()
        if (tryKw("ASC")) { expect('('); orderKeys += parseExpr() -> true; expect(')') }
        else if (tryKw("DESC")) { expect('('); orderKeys += parseExpr() -> false; expect(')') }
        else if (peek == '?' || peek == '$') orderKeys += VarE(parseVarName()) -> true
        else if (peek == '(') { pos += 1; orderKeys += parseExpr() -> true; expect(')') }
        else go = false
      }
    }
    var offset = 0L
    var limit: Option[Long] = None
    var sawSlice = false
    var go = true
    while (go) {
      if (tryKw("LIMIT")) { skipWs(); limit = Some(parseInteger()); sawSlice = true }
      else if (tryKw("OFFSET")) { skipWs(); offset = parseInteger(); sawSlice = true }
      else go = false
    }

    // ----- aggregate lifting -----
    val aggs = mutable.LinkedHashMap.empty[AggE, String]
    def lift(e: Expr): Expr = e match {
      case a: AggE =>
        VarE(aggs.getOrElseUpdate(a, freshVar()))
      case FuncE(n, as) => FuncE(n, as.map(lift))
      case InE(x, l, neg) => InE(lift(x), l.map(lift), neg)
      case other => other
    }
    def hasAgg(e: Expr): Boolean = e match {
      case _: AggE => true
      case FuncE(_, as) => as.exists(hasAgg)
      case InE(x, l, _) => hasAgg(x) || l.exists(hasAgg)
      case _ => false
    }
    val grouping = hasGroupBy || having.isDefined ||
      items.exists { case SelectExpr(e, _) => hasAgg(e); case _ => false }

    groupPreExtends.foreach { case (n, e) => op = Extend(op, n, e) }

    var projected: List[String] = Nil
    if (grouping) {
      val liftedItems = items.toList.map {
        case SelectVar(n) => SelectVar(n)
        case SelectExpr(e, as) => SelectExpr(lift(e), as)
      }
      val liftedHaving = having.map(lift)
      val liftedOrder = orderKeys.toList.map { case (e, asc) => (lift(e), asc) }
      val keys =
        if (hasGroupBy) groupKeys.toList
        else Nil // implicit single group
      // §18.2.4: with grouping, a projected variable must be a GROUP
      // BY key, an aggregate, or an expression over those (possibly
      // via an earlier select alias) — anything else is a query
      // error; padding it with NULLs would be a silent wrong answer
      val legal = mutable.Set[String](keys: _*) ++= aggs.values
      def plainVars(e: Expr): Set[String] = e match {
        case VarE(n) => Set(n)
        case FuncE(_, as) => as.flatMap(plainVars).toSet
        case InE(x, l, _) => plainVars(x) ++ l.flatMap(plainVars)
        case _ => Set.empty // constants; EXISTS correlates downstream
      }
      liftedItems.foreach {
        case SelectVar(n) =>
          if (!legal.contains(n))
            err(s"SELECT ?$n: not a GROUP BY key or aggregate (§18.2.4)")
        case SelectExpr(e, as) =>
          val bad = plainVars(e) -- legal
          if (bad.nonEmpty)
            err(s"SELECT expression ?$as references " +
              bad.toSeq.sorted.map("?" + _).mkString(", ") +
              ": not GROUP BY keys or aggregates (§18.2.4)")
          legal += as
      }
      op = Group(op, keys, aggs.map { case (a, n) => n -> a }.toList)
      liftedHaving.foreach(h => op = Filter(op, h))
      liftedItems.foreach {
        case SelectExpr(VarE(x), as) if x == as => ()
        case SelectExpr(e, as) => op = Extend(op, as, e)
        case SelectVar(_) => ()
      }
      projected = liftedItems.map {
        case SelectVar(n) => n
        case SelectExpr(VarE(x), as) if x == as => as
        case SelectExpr(_, as) => as
      }
      op = applyTail(op, projected, liftedOrder, distinct, reduced)
    } else {
      if (star) projected = varsOrdered(op).filterNot(_.startsWith("_anon"))
      else {
        items.foreach {
          case SelectExpr(e, as) => op = Extend(op, as, e)
          case SelectVar(_) => ()
        }
        projected = items.toList.map {
          case SelectVar(n) => n
          case SelectExpr(_, as) => as
        }
      }
      op = applyTail(op, projected, orderKeys.toList, distinct, reduced)
    }
    if (sawSlice) op = Slice(op, offset, limit)
    op
  }

  /** Order/Project/Distinct staging. Plain queries sort BELOW the
    * projection (sort keys may use non-projected vars); DISTINCT /
    * REDUCED queries dedup first and sort ON TOP of the deduped
    * projection — dropDuplicates destroys ordering, so sorting below it
    * would silently unsort (and mis-slice) the result. SPARQL restricts
    * ORDER BY under DISTINCT to projected expressions, so the hoist is
    * semantics-preserving. */
  private def applyTail(op0: Op, projected: List[String],
                        orderKeys: List[(Expr, Boolean)],
                        distinct: Boolean, reduced: Boolean): Op = {
    var op = op0
    if (distinct || reduced) {
      op = Project(op, projected)
      op = if (distinct) Distinct(op) else Reduced(op)
      if (orderKeys.nonEmpty) op = Order(op, orderKeys)
    } else {
      if (orderKeys.nonEmpty) op = Order(op, orderKeys)
      op = Project(op, projected)
    }
    op
  }

  private def parseInteger(): Long = {
    skipWs()
    val start = pos
    while (!eof && peek.isDigit) pos += 1
    if (pos == start) err("expected integer")
    input.substring(start, pos).toLong
  }

  private def parseVarName(): String = {
    skipWs()
    if (peek != '?' && peek != '$') err("expected variable")
    pos += 1
    val start = pos
    while (!eof && isIdentChar(peek)) pos += 1
    if (pos == start) err("empty variable name")
    input.substring(start, pos)
  }

  // ---------- group graph pattern ----------
  /** Graph context for Scans produced inside GRAPH blocks. */
  private var graphCtx: GraphSpec = DefaultGraph

  /** Returns (pattern-with-inner-scopes-resolved, group-level filters).
    * Filters are returned unapplied so OPTIONAL can move them into the
    * join condition (spec: LeftJoin(A, P, C) for OPTIONAL {P FILTER C}). */
  private def parseGroupPattern(): (Op, List[Expr]) = {
    expect('{')
    skipWs()
    if (peekKw("SELECT")) { // SubSelect: a full query nested in braces
      val op = parseSelect(sub = true)
      skipWs()
      expect('}')
      return (op, Nil)
    }
    var current: Op = null
    val filters = mutable.ArrayBuffer.empty[Expr]
    def join(x: Op): Unit = { current = if (current == null) x else Join(current, x) }

    var go = true
    while (go) {
      skipWs()
      if (peek == '}') { pos += 1; go = false }
      else if (tryKw("FILTER")) {
        filters += parseConstraint()
      } else if (tryKw("OPTIONAL")) {
        val (inner, innerFilters) = parseGroupPattern()
        val left = if (current == null) Singleton else current
        val cond = andAll(innerFilters)
        current = LeftJoin(left, inner, cond)
      } else if (tryKw("MINUS")) {
        val (inner, innerFilters) = parseGroupPattern()
        val left = if (current == null) Singleton else current
        current = Minus(left, applyFilters(inner, innerFilters))
      } else if (tryKw("GRAPH")) {
        skipWs()
        val saved = graphCtx
        graphCtx =
          if (peek == '?' || peek == '$') GraphVar(parseVarName())
          else parseGraphTerm()
        val (inner, innerFilters) = parseGroupPattern()
        graphCtx = saved
        join(applyFilters(inner, innerFilters))
      } else if (tryKw("SERVICE")) {
        skipWs()
        val silent = tryKw("SILENT")
        skipWs()
        val endpoint = parseTermOrVar() match {
          case v @ V(_) => v
          case t @ T(_: graft.rdf.Iri) => t
          case other => err(s"SERVICE endpoint must be an IRI or variable, got $other")
        }
        // the service pattern runs against the REMOTE dataset's default
        // graph — an enclosing GRAPH context does not leak in (§2.1)
        val saved = graphCtx
        graphCtx = DefaultGraph
        val (inner, innerFilters) = parseGroupPattern()
        graphCtx = saved
        join(Service(endpoint, applyFilters(inner, innerFilters), silent))
      } else if (tryKw("BIND")) {
        expect('(')
        val e = parseExpr()
        expectKw("AS")
        val v = { skipWs(); parseVarName() }
        expect(')')
        val base = if (current == null) Singleton else current
        current = Extend(base, v, e)
      } else if (tryKw("VALUES")) {
        join(parseValues())
      } else if (peek == '{') {
        // GroupOrUnionGraphPattern
        var u = unionBranch()
        while (tryKw("UNION")) u = Union(u, unionBranch())
        join(u)
      } else {
        // triples block
        val ops = parseTriplesSameSubject()
        if (ops.isEmpty) err("expected graph pattern element")
        ops.foreach(join)
      }
      skipWs()
      if (peek == '.') pos += 1
    }
    (if (current == null) Singleton else current, filters.toList)
  }

  private def unionBranch(): Op = {
    val (inner, fs) = parseGroupPattern()
    applyFilters(inner, fs)
  }

  private def applyFilters(op: Op, filters: List[Expr]): Op =
    andAll(filters).map(Filter(op, _)).getOrElse(op)

  private def andAll(es: List[Expr]): Option[Expr] =
    es.reduceOption((a, b) => FuncE("&&", List(a, b)))

  private def parseConstraint(): Expr = {
    skipWs()
    if (peekKw("EXISTS")) { pos += 6; ExistsE(unionBranch(), negated = false) }
    else if (peekKw("NOT")) {
      pos += 3; expectKw("EXISTS"); ExistsE(unionBranch(), negated = true)
    } else if (peek == '(') {
      pos += 1
      val e = parseExpr()
      expect(')')
      e
    } else {
      // BuiltInCall / FunctionCall constraint form: FILTER regex(...)
      parsePrimaryExpr()
    }
  }

  private def parseGraphTerm(): GraphSpec = {
    parseTermOrVar() match {
      case T(t) => GraphTerm(t)
      case V(_) => err("unexpected variable as graph name")
    }
  }

  private def parseValues(): Op = {
    skipWs()
    if (peek == '(') {
      pos += 1
      val vars = mutable.ArrayBuffer.empty[String]
      skipWs()
      while (peek == '?' || peek == '$') { vars += parseVarName(); skipWs() }
      expect(')')
      expect('{')
      val rows = mutable.ArrayBuffer.empty[List[Option[Term]]]
      skipWs()
      while (peek == '(') {
        pos += 1
        val row = mutable.ArrayBuffer.empty[Option[Term]]
        skipWs()
        while (peek != ')') {
          if (tryKw("UNDEF")) row += None
          else row += Some(parseConstTerm())
          skipWs()
        }
        pos += 1
        if (row.size != vars.size) err("VALUES row arity mismatch")
        rows += row.toList
        skipWs()
      }
      expect('}')
      Values(vars.toList, rows.toList)
    } else {
      val v = parseVarName()
      expect('{')
      val rows = mutable.ArrayBuffer.empty[List[Option[Term]]]
      skipWs()
      while (peek != '}') {
        if (tryKw("UNDEF")) rows += List(None)
        else rows += List(Some(parseConstTerm()))
        skipWs()
      }
      pos += 1
      Values(List(v), rows.toList)
    }
  }

  // ---------- triples + property paths ----------
  /** One TriplesSameSubject production → list of pattern Ops. */
  private def parseTriplesSameSubject(): List[Op] = {
    val ops = mutable.ArrayBuffer.empty[Op]
    skipWs()
    if (peek == '[' || peek == '(') {
      val subj =
        if (peek == '[') parseBlankNodePropertyList(ops)
        else parseCollection(ops)
      skipWs()
      // `[ :p :o ] .` / `(1 2) :p :o` — the property list after a
      // bracketed/collection subject is optional (the node already
      // supplied triples); the next element may also be another
      // pattern keyword or group, no dot required
      val nextIsElement = peek == '.' || peek == '}' || peek == '{' || eof ||
        Seq("FILTER", "OPTIONAL", "MINUS", "GRAPH", "BIND", "VALUES")
          .exists(peekKw)
      if (!nextIsElement) parsePredicateObjectList(subj, ops)
    } else {
      parsePredicateObjectList(parseTermOrVar(), ops)
    }
    ops.toList
  }

  private def parsePredicateObjectList(subj: VarOrTerm,
                                       ops: mutable.ArrayBuffer[Op]): Unit = {
    var go = true
    while (go) {
      skipWs()
      if (peek == '?' || peek == '$') {
        val p = V(parseVarName())
        parseObjectList(subj, Left(p), ops)
      } else {
        val path = parsePath()
        parseObjectList(subj, Right(path), ops)
      }
      skipWs()
      if (peek == ';') {
        pos += 1
        skipWs()
        if (peek == '.' || peek == '}' || peek == ']' || eof) go = false
      } else go = false
    }
  }

  private def parseObjectList(subj: VarOrTerm, verb: Either[V, Path],
                              ops: mutable.ArrayBuffer[Op]): Unit = {
    var go = true
    while (go) {
      skipWs()
      val obj: VarOrTerm =
        if (peek == '[') parseBlankNodePropertyList(ops)
        else if (peek == '(') parseCollection(ops)
        else parseTermOrVar()
      verb match {
        case Left(pv)    => ops += Scan(subj, pv, obj, graphCtx)
        case Right(path) => ops += pathToOp(subj, path, obj)
      }
      skipWs()
      if (peek == ',') pos += 1 else go = false
    }
  }

  /** `[ p o ; ... ]` — returns the fresh variable standing for the blank
    * node (query blank nodes are just non-projectable variables). */
  private def parseBlankNodePropertyList(ops: mutable.ArrayBuffer[Op]): VarOrTerm = {
    expect('[')
    val v = V(freshVar())
    skipWs()
    if (peek != ']') parsePredicateObjectList(v, ops)
    expect(']')
    v
  }

  /** `( item … )` in a pattern position — SPARQL collections desugar
    * to fresh-variable rdf:first/rest chains (query blank nodes =
    * non-projectable variables); `()` is the constant rdf:nil. */
  private def parseCollection(ops: mutable.ArrayBuffer[Op]): VarOrTerm = {
    expect('(')
    skipWs()
    val items = mutable.ArrayBuffer.empty[VarOrTerm]
    while (!eof && peek != ')') {
      items += (peek match {
        case '[' => parseBlankNodePropertyList(ops)
        case '(' => parseCollection(ops)
        case _ => parseTermOrVar()
      })
      skipWs()
    }
    if (eof) err("unterminated collection")
    pos += 1
    if (items.isEmpty) T(Iri(graft.rdf.RDF.nil))
    else {
      val cells = items.map(_ => V(freshVar()))
      cells.zipWithIndex.foreach { case (cell, i) =>
        ops += Scan(cell, T(Iri(graft.rdf.RDF.first)), items(i), graphCtx)
        ops += Scan(cell, T(Iri(graft.rdf.RDF.rest)),
          if (i + 1 < cells.size) cells(i + 1) else T(Iri(graft.rdf.RDF.nil)),
          graphCtx)
      }
      cells.head
    }
  }

  private def parseTermOrVar(): VarOrTerm = {
    skipWs()
    peek match {
      case '?' | '$' => V(parseVarName())
      case '_' if peekAt(1) == ':' =>
        pos += 2
        val start = pos
        while (!eof && (peek.isLetterOrDigit || peek == '_' || peek == '-')) pos += 1
        V("_anonbn_" + input.substring(start, pos)) // query bnode = variable
      case _ => T(parseConstTerm())
    }
  }

  /** Ground RDF term (IRI / literal); used by VALUES and constants. */
  private def parseConstTerm(): Term = {
    skipWs()
    peek match {
      case '<' => Iri(parseIriRef())
      case '"' | '\'' => parseLiteralTerm()
      case c if c == '+' || c == '-' || c.isDigit => parseNumericTerm()
      case 't' | 'T' if peekKw("TRUE") => pos += 4; Lit("true", XSD.boolean)
      case 'f' | 'F' if peekKw("FALSE") => pos += 5; Lit("false", XSD.boolean)
      case _ => Iri(parsePrefixedIri())
    }
  }

  private def parseIriRef(): String = {
    skipWs()
    if (peek != '<') err("expected IRI")
    pos += 1
    val end = input.indexOf('>', pos)
    if (end < 0) err("unterminated IRI")
    val iri = input.substring(pos, end)
    pos = end + 1
    graft.rdf.TurtleParser.resolveIri(base, iri)
  }

  private def parsePrefixedIri(): String = {
    skipWs()
    val start = pos
    while (!eof && (peek.isLetterOrDigit || peek == '_' || peek == '-' || peek == '.')) pos += 1
    if (peek != ':') { pos = start; err("expected prefixed name") }
    val prefix = input.substring(start, pos)
    pos += 1
    val lstart = pos
    while (!eof && (peek.isLetterOrDigit || peek == '_' || peek == '-' ||
           peek == '.' || peek == '%')) pos += 1
    var local = input.substring(lstart, pos)
    while (local.nonEmpty && local.last == '.') { local = local.dropRight(1); pos -= 1 }
    val ns = prefixes.getOrElse(prefix, err(s"undefined prefix '$prefix:'"))
    ns + local
  }

  private def parseLiteralTerm(): Term = {
    val quote = peek
    val triple = input.regionMatches(pos, s"$quote$quote$quote", 0, 3)
    val sb = new StringBuilder
    if (triple) {
      pos += 3
      while (!input.regionMatches(pos, s"$quote$quote$quote", 0, 3)) {
        if (eof) err("unterminated literal")
        if (peek == '\\') { pos += 1; sb ++= unescape(peek); pos += 1 }
        else { sb += peek; pos += 1 }
      }
      pos += 3
    } else {
      pos += 1
      while (peek != quote) {
        if (eof) err("unterminated literal")
        if (peek == '\\') { pos += 1; sb ++= unescape(peek); pos += 1 }
        else { sb += peek; pos += 1 }
      }
      pos += 1
    }
    if (peek == '^' && peekAt(1) == '^') {
      pos += 2
      val dt = if (peek == '<') parseIriRef() else parsePrefixedIri()
      Lit(sb.toString, dt)
    } else if (peek == '@') {
      pos += 1
      val start = pos
      while (!eof && (peek.isLetterOrDigit || peek == '-')) pos += 1
      Lit(sb.toString, lang = input.substring(start, pos))
    } else Lit(sb.toString)
  }

  private def unescape(c: Char): String = {
    val (s, next) = graft.rdf.TurtleParser.decodeEscape(input, pos, err)
    pos = next - 1
    s
  }

  private def parseNumericTerm(): Term = {
    val start = pos
    if (peek == '+' || peek == '-') pos += 1
    var sawDot = false
    var sawExp = false
    var go = true
    while (go && !eof) {
      val c = peek
      if (c.isDigit) pos += 1
      else if (c == '.' && !sawDot && !sawExp && peekAt(1).isDigit) { sawDot = true; pos += 1 }
      else if ((c == 'e' || c == 'E') && !sawExp &&
               (peekAt(1).isDigit || ((peekAt(1) == '+' || peekAt(1) == '-') && peekAt(2).isDigit))) {
        sawExp = true; pos += 1
        if (peek == '+' || peek == '-') pos += 1
      } else go = false
    }
    val lex = input.substring(start, pos)
    if (lex.isEmpty || lex == "+" || lex == "-") err("bad number")
    val dt = if (sawExp) XSD.double else if (sawDot) XSD.decimal else XSD.integer
    Lit(lex, dt)
  }

  // ----- property paths -----
  sealed private trait Path
  private case class PLink(iri: String) extends Path
  private case class PInverse(p: Path) extends Path
  private case class PSeq(l: Path, r: Path) extends Path
  private case class PAlt(l: Path, r: Path) extends Path
  private case class PZeroOrOne(p: Path) extends Path
  private case class PZeroOrMore(p: Path) extends Path
  private case class POneOrMore(p: Path) extends Path
  private case class PNegated(fwd: List[String], bwd: List[String]) extends Path

  private def parsePath(): Path = {
    var p = parsePathSequence()
    skipWs()
    while (peek == '|') { pos += 1; p = PAlt(p, parsePathSequence()); skipWs() }
    p
  }
  private def parsePathSequence(): Path = {
    var p = parsePathEltOrInverse()
    skipWs()
    while (peek == '/') { pos += 1; p = PSeq(p, parsePathEltOrInverse()); skipWs() }
    p
  }
  private def parsePathEltOrInverse(): Path = {
    skipWs()
    if (peek == '^') { pos += 1; PInverse(parsePathElt()) } else parsePathElt()
  }
  private def parsePathElt(): Path = {
    val prim = parsePathPrimary()
    skipWs()
    peek match {
      case '?' if !isIdentChar(peekAt(1)) || peekAt(1) == '\u0000' =>
        // `?` modifier vs variable: a variable can't follow a path
        // primary directly, so this is always the modifier here
        pos += 1; PZeroOrOne(prim)
      case '*' => pos += 1; PZeroOrMore(prim)
      case '+' => pos += 1; POneOrMore(prim)
      case _ => prim
    }
  }
  private def parsePathPrimary(): Path = {
    skipWs()
    peek match {
      case '(' =>
        pos += 1
        val p = parsePath()
        expect(')')
        p
      case '!' =>
        pos += 1
        skipWs()
        if (peek == '(') {
          pos += 1
          val fwd = mutable.ArrayBuffer.empty[String]
          val bwd = mutable.ArrayBuffer.empty[String]
          var go = true
          while (go) {
            skipWs()
            if (peek == '^') { pos += 1; bwd += parsePathIri() }
            else fwd += parsePathIri()
            skipWs()
            if (peek == '|') pos += 1 else go = false
          }
          expect(')')
          PNegated(fwd.toList, bwd.toList)
        } else if (peek == '^') { pos += 1; PNegated(Nil, List(parsePathIri())) }
        else PNegated(List(parsePathIri()), Nil)
      case _ => PLink(parsePathIri())
    }
  }
  private def parsePathIri(): String = {
    skipWs()
    if (peek == 'a' && aKeywordBoundary(1)) { pos += 1; RDF.typ }
    else if (peek == '<') parseIriRef()
    else parsePrefixedIri()
  }

  /** Desugar a path between two endpoints into algebra (SURVEY.md §2.8). */
  private def pathToOp(s: VarOrTerm, path: Path, o: VarOrTerm): Op = path match {
    case PLink(iri) => Scan(s, T(Iri(iri)), o, graphCtx)
    case PInverse(p) => pathToOp(o, p, s)
    case PSeq(l, r) =>
      val mid = V(freshVar())
      Join(pathToOp(s, l, mid), pathToOp(mid, r, o))
    case PAlt(l, r) => Union(pathToOp(s, l, o), pathToOp(s, r, o))
    case PZeroOrOne(p) =>
      Union(ZeroLengthPath(s, o, graphCtx), pathToOp(s, p, o))
    case PZeroOrMore(p) =>
      val (is, io) = (freshVar(), freshVar())
      ArbitraryLengthPath(s, o, pathToOp(V(is), p, V(io)), is, io,
        includeZero = true, graphCtx)
    case POneOrMore(p) =>
      val (is, io) = (freshVar(), freshVar())
      ArbitraryLengthPath(s, o, pathToOp(V(is), p, V(io)), is, io,
        includeZero = false, graphCtx)
    case PNegated(fwd, bwd) =>
      val pv = freshVar()
      val fwdOp: Option[Op] =
        if (bwd.nonEmpty && fwd.isEmpty) None
        else Some(Filter(
          Scan(s, V(pv), o, graphCtx),
          notIn(VarE(pv), fwd)))
      val bwdOp: Option[Op] =
        if (bwd.isEmpty) None
        else Some(Filter(
          Scan(o, V(pv + "b"), s, graphCtx),
          notIn(VarE(pv + "b"), bwd)))
      (fwdOp, bwdOp) match {
        case (Some(a), Some(b)) => Union(a, b)
        case (Some(a), None) => a
        case (None, Some(b)) => b
        case (None, None) => err("empty negated property set")
      }
  }

  private def notIn(v: Expr, iris: List[String]): Expr =
    iris.map(i => FuncE("!=", List(v, ConstE(Iri(i)))))
      .reduceOption((a, b) => FuncE("&&", List(a, b)))
      .getOrElse(ConstE(Lit("true", XSD.boolean)))

  // ---------- expressions ----------
  def parseExpr(): Expr = parseOrExpr()

  private def parseOrExpr(): Expr = {
    var e = parseAndExpr()
    skipWs()
    while (peek == '|' && peekAt(1) == '|') { pos += 2; e = FuncE("||", List(e, parseAndExpr())); skipWs() }
    e
  }
  private def parseAndExpr(): Expr = {
    var e = parseRelExpr()
    skipWs()
    while (peek == '&' && peekAt(1) == '&') { pos += 2; e = FuncE("&&", List(e, parseRelExpr())); skipWs() }
    e
  }
  private def parseRelExpr(): Expr = {
    val e = parseAdditiveExpr()
    skipWs()
    if (peek == '=' && peekAt(1) != '=') { pos += 1; FuncE("=", List(e, parseAdditiveExpr())) }
    else if (peek == '!' && peekAt(1) == '=') { pos += 2; FuncE("!=", List(e, parseAdditiveExpr())) }
    else if (peek == '<' && peekAt(1) == '=') { pos += 2; FuncE("<=", List(e, parseAdditiveExpr())) }
    else if (peek == '>' && peekAt(1) == '=') { pos += 2; FuncE(">=", List(e, parseAdditiveExpr())) }
    else if (peek == '<') { pos += 1; FuncE("<", List(e, parseAdditiveExpr())) }
    else if (peek == '>') { pos += 1; FuncE(">", List(e, parseAdditiveExpr())) }
    else if (peekKw("IN")) { pos += 2; InE(e, parseExprList(), negated = false) }
    else if (peekKw("NOT")) { pos += 3; expectKw("IN"); InE(e, parseExprList(), negated = true) }
    else e
  }
  private def parseExprList(): List[Expr] = {
    expect('(')
    val es = mutable.ArrayBuffer.empty[Expr]
    skipWs()
    if (peek != ')') {
      es += parseExpr()
      skipWs()
      while (peek == ',') { pos += 1; es += parseExpr(); skipWs() }
    }
    expect(')')
    es.toList
  }
  private def parseAdditiveExpr(): Expr = {
    var e = parseMultiplicativeExpr()
    skipWs()
    var go = true
    while (go) {
      if (peek == '+') { pos += 1; e = FuncE("+", List(e, parseMultiplicativeExpr())); skipWs() }
      else if (peek == '-') { pos += 1; e = FuncE("-", List(e, parseMultiplicativeExpr())); skipWs() }
      else go = false
    }
    e
  }
  private def parseMultiplicativeExpr(): Expr = {
    var e = parseUnaryExpr()
    skipWs()
    var go = true
    while (go) {
      if (peek == '*') { pos += 1; e = FuncE("*", List(e, parseUnaryExpr())); skipWs() }
      else if (peek == '/') { pos += 1; e = FuncE("/", List(e, parseUnaryExpr())); skipWs() }
      else go = false
    }
    e
  }
  private def parseUnaryExpr(): Expr = {
    skipWs()
    if (peek == '!' && peekAt(1) != '=') { pos += 1; FuncE("!", List(parseUnaryExpr())) }
    else if (peek == '-' && !peekAt(1).isDigit) { pos += 1; FuncE("UMINUS", List(parseUnaryExpr())) }
    else if (peek == '+' && !peekAt(1).isDigit) { pos += 1; parseUnaryExpr() }
    else parsePrimaryExpr()
  }

  private val aggNames = Set("COUNT", "SUM", "MIN", "MAX", "AVG", "SAMPLE", "GROUP_CONCAT")
  private val builtins = Set(
    "BOUND", "IF", "COALESCE", "SAMETERM", "STR", "LANG", "LANGMATCHES",
    "DATATYPE", "IRI", "URI", "BNODE", "STRDT", "STRLANG", "UUID", "STRUUID",
    "STRLEN", "SUBSTR", "UCASE", "LCASE", "STRSTARTS", "STRENDS", "CONTAINS",
    "STRBEFORE", "STRAFTER", "ENCODE_FOR_URI", "CONCAT", "REGEX", "REPLACE",
    "ABS", "ROUND", "CEIL", "FLOOR", "RAND",
    "NOW", "YEAR", "MONTH", "DAY", "HOURS", "MINUTES", "SECONDS", "TIMEZONE", "TZ",
    "MD5", "SHA1", "SHA256", "SHA384", "SHA512",
    "ISIRI", "ISURI", "ISBLANK", "ISLITERAL", "ISNUMERIC")

  private def parsePrimaryExpr(): Expr = {
    skipWs()
    peek match {
      case '(' =>
        pos += 1
        val e = parseExpr()
        expect(')')
        e
      case '?' | '$' => VarE(parseVarName())
      case '"' | '\'' => ConstE(parseLiteralTerm())
      case c if c.isDigit => ConstE(parseNumericTerm())
      case '+' | '-' => ConstE(parseNumericTerm())
      case '<' =>
        val iri = parseIriRef()
        skipWs()
        if (peek == '(') FuncE("cast:" + iri, parseExprList())
        else ConstE(Iri(iri))
      case _ =>
        if (peekKw("EXISTS")) { pos += 6; ExistsE(unionBranch(), negated = false) }
        else if (peekKw("NOT")) { pos += 3; expectKw("EXISTS"); ExistsE(unionBranch(), negated = true) }
        else if (peekKw("TRUE")) { pos += 4; ConstE(Lit("true", XSD.boolean)) }
        else if (peekKw("FALSE")) { pos += 5; ConstE(Lit("false", XSD.boolean)) }
        else parseCallOrIri()
    }
  }

  private def parseCallOrIri(): Expr = {
    val save = pos
    val start = pos
    while (!eof && (isIdentChar(peek) || peek == '-')) pos += 1
    val word = input.substring(start, pos)
    val upper = word.toUpperCase
    if (peek == ':') { // prefixed name (possibly empty prefix, e.g. `:book1`)
      pos = save
      val iri = parsePrefixedIri()
      skipWs()
      if (peek == '(') FuncE("cast:" + iri, parseExprList())
      else ConstE(Iri(iri))
    } else if (pos == start) err("expected expression")
    else if (aggNames.contains(upper)) parseAggCall(upper)
    else if (builtins.contains(upper)) {
      skipWs()
      if (upper == "RAND" || upper == "NOW" || upper == "UUID" || upper == "STRUUID") {
        expect('('); skipWs(); expect(')'); FuncE(upper, Nil)
      } else FuncE(upper, parseExprList())
    } else err(s"unknown function or keyword '$word'")
  }

  private def parseAggCall(name: String): Expr = {
    expect('(')
    val distinct = tryKw("DISTINCT")
    skipWs()
    if (name == "COUNT" && peek == '*') {
      pos += 1
      expect(')')
      AggE("COUNT", distinct, None)
    } else {
      val e = parseExpr()
      var sep = " "
      skipWs()
      if (name == "GROUP_CONCAT" && peek == ';') {
        pos += 1
        expectKw("SEPARATOR")
        skipWs(); expect('='); skipWs()
        sep = parseLiteralTerm() match {
          case l: Lit => l.lex
          case other  => err(s"separator must be a string, got $other")
        }
      }
      expect(')')
      AggE(name, distinct, Some(e), sep)
    }
  }
}

object SparqlParser {
  /** Dataset clause (SPARQL 1.1 §13.2): `FROM g…` merges the listed
    * named graphs into the query's default graph; `FROM NAMED h…`
    * restricts which named graphs GRAPH patterns may address. Empty =
    * no dataset clause → query the dataset as given. */
  final case class DatasetSpec(from: List[Term], fromNamed: List[Term]) {
    def isEmpty: Boolean = from.isEmpty && fromNamed.isEmpty
  }
  val NoDataset: DatasetSpec = DatasetSpec(Nil, Nil)

  sealed trait Query
  final case class SelectQuery(op: Op,
                               dataset: DatasetSpec = NoDataset) extends Query
  final case class AskQuery(op: Op,
                            dataset: DatasetSpec = NoDataset) extends Query
  final case class DescribeQuery(targets: List[VarOrTerm], star: Boolean,
                                 op: Option[Op],
                                 dataset: DatasetSpec = NoDataset) extends Query
  final case class ConstructQuery(
      template: List[(VarOrTerm, VarOrTerm, VarOrTerm)], op: Op,
      dataset: DatasetSpec = NoDataset) extends Query

  // ----- SPARQL 1.1 Update (graph-transform subset) -----
  /** One template/data quad: positions + graph scope. */
  final case class QuadTpl(s: VarOrTerm, p: VarOrTerm, o: VarOrTerm,
                           g: GraphSpec)
  sealed trait Update
  final case class InsertData(quads: List[QuadTpl]) extends Update
  final case class DeleteData(quads: List[QuadTpl]) extends Update
  /** DELETE tpl INSERT tpl WHERE pattern (either template may be
    * empty; DELETE WHERE uses the pattern as its own template).
    * `withGraph` (WITH <g>): default graph for templates AND — absent
    * USING clauses — for the WHERE pattern. `using` (USING / USING
    * NAMED): FROM-style dataset construction for the WHERE pattern
    * only (overrides WITH for matching, not for templates). */
  final case class Modify(delete: List[QuadTpl], insert: List[QuadTpl],
                          where: Op,
                          using: DatasetSpec = NoDataset,
                          withGraph: Option[Term] = None) extends Update

  // ----- SPARQL 1.1 Update graph management (§3.2) -----
  /** Graph reference: DEFAULT | GRAPH <iri>; CLEAR/DROP additionally
    * accept NAMED (every named graph) and ALL. */
  sealed trait GraphRef
  case object DefaultRef extends GraphRef
  final case class NamedRef(iri: Term) extends GraphRef
  case object AllNamedRef extends GraphRef
  case object AllGraphsRef extends GraphRef
  /** LOAD <doc> (INTO GRAPH <g>)? — doc is a file path / file: IRI
    * read by extension (QuadsIO.read); INTO retags every loaded quad. */
  final case class Load(doc: Term, into: Option[Term],
                        silent: Boolean) extends Update
  final case class Clear(target: GraphRef, silent: Boolean) extends Update
  final case class Drop(target: GraphRef, silent: Boolean) extends Update
  final case class Create(graph: Term, silent: Boolean) extends Update
  final case class AddGraph(src: GraphRef, dst: GraphRef,
                            silent: Boolean) extends Update
  final case class CopyGraph(src: GraphRef, dst: GraphRef,
                             silent: Boolean) extends Update
  final case class MoveGraph(src: GraphRef, dst: GraphRef,
                             silent: Boolean) extends Update

  def parse(query: String): Op = new SparqlParser(query).parseQuery()
  def parseAny(query: String): Query = new SparqlParser(query).parseAnyQuery()
  /** Parse an update request: one or more ';'-separated operations. */
  def parseUpdate(text: String): List[Update] =
    new SparqlParser(text).parseUpdateReq()
}
