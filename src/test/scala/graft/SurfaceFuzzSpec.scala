package graft

import graft.io.QuadsIO
import graft.rdf._
import graft.sparql.Sparql
import graft.sparql.Sparql._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import scala.util.Random

/** Seeded differential fuzzing of the three surfaces the round-9
  * verdict called out as example-tested only: CONSTRUCT template
  * instantiation, SPARQL Update, and SERVICE. Each gets an ALGEBRAIC
  * oracle rather than a second engine:
  *
  *   - CONSTRUCT: the engine's distributed template instantiation must
  *     equal a client-side re-instantiation over the SELECT bindings of
  *     the same WHERE pattern (unbound → skip, literal subject / non-IRI
  *     predicate → skip, set semantics) — the spec's §16.2 procedure
  *     executed literally on the driver.
  *   - Update: a `;`-sequence applied by the engine must land on the
  *     state computed by client-side set algebra, where each WHERE is
  *     evaluated by the (battle-tested) query path over the client's
  *     intermediate state; plus DELETE WHERE idempotence and
  *     insert-then-delete-fresh identity.
  *   - SERVICE: `{ outer SERVICE <e> { inner } }` must equal the
  *     compat-join (SPARQL §18.5 merge-compatible) of the two groups
  *     evaluated separately — outer on the local store, inner on the
  *     registered endpoint dataset.
  *
  * The DictFuzzSpec discipline carries over: deterministic default
  * seeds (plus -Dgraft.fuzz.seed for exploration), both-reject counts
  * as agreement, and a non-triviality floor so agreement over empty
  * results can't fake coverage. */
class SurfaceFuzzSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark

  // -Dgraft.fuzz.seed=N (forwarded into the forked test JVM by
  // build.sbt) explores a fresh query stream; the non-triviality
  // floors are pinned only for the default seeds
  private val customSeed = sys.props.get("graft.fuzz.seed").map(_.toInt)
  private def seedsOr(defaults: Seq[Int]): Seq[Int] =
    customSeed.map(Seq(_)).getOrElse(defaults)

  private val prologue = "PREFIX : <http://fz.example/>\n"
  private def iri(n: String) = Iri("http://fz.example/" + n)

  // deterministic duplicate-free fixture (a quad SET, so update-state
  // algebra is exact): the DictFuzzSpec small-world shape plus two
  // named graphs
  private def fixtureQuads(seed: Int, subjects: Int): Seq[Quad] = {
    val rnd = new Random(seed)
    val b = Seq.newBuilder[Quad]
    for (i <- 0 until subjects) {
      b += Quad(iri(s"n$i"), iri("p"), iri(s"n${(i + 1) % subjects}"), None)
      if (i % 2 == 0)
        b += Quad(iri(s"n$i"), iri("p"), iri(s"n${(i + 5) % subjects}"), None)
      b += Quad(iri(s"n$i"), iri("q"),
        Lit(rnd.nextInt(10).toString, XSD.integer), None)
      if (i % 3 != 0)
        b += Quad(iri(s"n$i"), iri("r"), Lit(s"w${rnd.nextInt(5)}"), None)
    }
    b += Quad(iri("n0"), iri("p"), iri("n3"), Some(iri("g1")))
    b += Quad(iri("n2"), iri("q"), Lit("7", XSD.integer), Some(iri("g1")))
    b += Quad(iri("n1"), iri("p"), iri("n0"), Some(iri("g2")))
    b.result().distinct
  }

  private lazy val baseQuads = fixtureQuads(11, 10)
  private lazy val base = QuadsIO.fromQuads(spark, baseQuads).cache()

  private def quadSet(df: org.apache.spark.sql.DataFrame): Set[Quad] =
    df.collect().toSet.map { r: org.apache.spark.sql.Row =>
      Quad(TermSchema.fromRow(r.getStruct(0)).get,
        TermSchema.fromRow(r.getStruct(1)).get,
        TermSchema.fromRow(r.getStruct(2)).get,
        TermSchema.fromRow(if (r.isNullAt(3)) null else r.getStruct(3))
          .map(_.asInstanceOf[Iri]))
    }

  private def bindings(df: org.apache.spark.sql.DataFrame): Seq[Map[String, Term]] = {
    val names = df.columns
    df.collect().toSeq.map { row =>
      names.zipWithIndex.flatMap { case (n, i) =>
        val sub = if (row.isNullAt(i)) null else row.getStruct(i)
        TermSchema.fromRow(sub).map(n -> _)
      }.toMap
    }
  }

  private def multiset[T](xs: Seq[T]): Map[T, Int] =
    xs.groupBy(identity).view.mapValues(_.size).toMap

  // ----- shared generator pieces -----

  /** Template / pattern component: a variable name or a ground term. */
  private type Comp = Either[String, Term]
  private def render(c: Comp): String = c match {
    case Left(v) => v
    case Right(t) => Sparql.serialize(t)
  }

  /** One quad template (g = None → default graph). */
  private final case class Tpl(s: Comp, p: Comp, o: Comp, g: Option[Comp]) {
    def text: String = {
      val t = s"${render(s)} ${render(p)} ${render(o)} ."
      g match {
        case None => t
        case Some(gc) => s"GRAPH ${render(gc)} { $t }"
      }
    }
  }

  /** §16.2 / §3.1.3 instantiation, on the driver: substitute each
    * solution into the template, skip quads with an unbound component,
    * a literal subject, a non-IRI predicate, or a non-IRI graph.
    * `defaultG` is the template-target default graph (Some under
    * `WITH g`, per §3.1.3). */
  private def instantiate(tpls: Seq[Tpl],
                          sols: Seq[Map[String, Term]],
                          defaultG: Option[Iri] = None): Set[Quad] = {
    def resolve(c: Comp, sol: Map[String, Term]): Option[Term] = c match {
      case Left(v) => sol.get(v.stripPrefix("?"))
      case Right(t) => Some(t)
    }
    (for {
      sol <- sols
      t <- tpls
      s <- resolve(t.s, sol)
      p <- resolve(t.p, sol)
      o <- resolve(t.o, sol)
      if !s.isInstanceOf[Lit] && p.isInstanceOf[Iri]
      g = t.g.map(resolve(_, sol))
      if g.forall(_.exists(_.isInstanceOf[Iri]))
    } yield Quad(s, p, o,
      g.flatten.map(_.asInstanceOf[Iri]).orElse(defaultG))).toSet
  }

  private final class SGen(seed: Int) {
    val rnd = new Random(seed)
    private val vars = Vector("?a", "?b", "?c", "?d")
    def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.size))

    def groundTerm(pos: Int): Term = pos match {
      case 0 => iri(s"n${rnd.nextInt(10)}")                   // subject
      case 1 => iri(pick(Seq("p", "q", "r")))                 // predicate
      case _ => rnd.nextInt(3) match {                        // object
        case 0 => iri(s"n${rnd.nextInt(10)}")
        case 1 => Lit(rnd.nextInt(10).toString, XSD.integer)
        case _ => Lit(s"w${rnd.nextInt(5)}")
      }
    }

    def comp(pos: Int, varP: Double): Comp =
      if (rnd.nextDouble() < varP) Left(pick(vars))
      else Right(groundTerm(pos))

    def tripleText(scope: Seq[String]): String = {
      val s = if (scope.nonEmpty && rnd.nextDouble() < 0.4) pick(scope)
              else if (rnd.nextDouble() < 0.75) pick(vars)
              else s":n${rnd.nextInt(10)}"
      rnd.nextInt(3) match {
        case 0 =>
          val o = if (rnd.nextDouble() < 0.6) pick(vars) else s":n${rnd.nextInt(10)}"
          s"$s :p $o ."
        case 1 =>
          val o = if (rnd.nextDouble() < 0.7) pick(vars) else rnd.nextInt(10).toString
          s"$s :q $o ."
        case _ =>
          val o = if (rnd.nextDouble() < 0.7) pick(vars) else s""""w${rnd.nextInt(5)}""""
          s"$s :r $o ."
      }
    }

    def varsIn(pat: String): Seq[String] = vars.filter(pat.contains)

    def bgp(scope: Seq[String], n: Int): String =
      (0 until n).map(_ => tripleText(scope)).mkString(" ")

    def filterCond(scope: Seq[String]): String = {
      if (scope.isEmpty) return "1 = 1"
      val v = pick(scope)
      rnd.nextInt(4) match {
        case 0 => s"$v > ${rnd.nextInt(8)}"
        case 1 => s"BOUND($v)"
        case 2 => s"""REGEX(STR($v), "w|n${rnd.nextInt(10)}")"""
        case _ => s"!sameTerm($v, :n${rnd.nextInt(10)})"
      }
    }

    /** Type-disciplined triple: each object var is pinned to one
      * predicate's value domain (?b ↔ :p IRIs, ?c ↔ :q ints, ?d ↔ :r
      * strings), so multi-triple BGPs are satisfiable far more often
      * than the untyped generator's cross-domain var collisions allow —
      * the high-yield corpus the SERVICE compat-join floor needs. */
    def typedTriple(): String = {
      val s = if (rnd.nextDouble() < 0.2) s":n${rnd.nextInt(10)}"
              else pick(Seq("?a", "?b")) // :p objects are IRIs → chainable
      rnd.nextInt(3) match {
        case 0 => s"$s :p ${if (rnd.nextDouble() < 0.85) "?b" else s":n${rnd.nextInt(10)}"} ."
        case 1 => s"$s :q ${if (rnd.nextDouble() < 0.85) "?c" else rnd.nextInt(10).toString} ."
        case _ => s"$s :r ${if (rnd.nextDouble() < 0.85) "?d" else s""""w${rnd.nextInt(5)}""""} ."
      }
    }

    def typedBgp(n: Int): String =
      (0 until n).map(_ => typedTriple()).mkString(" ")

    /** A group pattern: BGP plus at most one structural modifier —
      * enough variety to stress instantiation/deletion against varied
      * binding shapes (unbound OPTIONAL vars, UNION branches, graph
      * vars) without re-fuzzing the query algebra DictFuzzSpec owns. */
    def group(): String = {
      val b = bgp(Nil, 1 + rnd.nextInt(2))
      rnd.nextInt(6) match {
        case 0 => s"$b OPTIONAL { ${bgp(varsIn(b), 1)} }"
        case 1 => s"{ $b } UNION { ${bgp(Nil, 1)} }"
        case 2 => s"$b FILTER(${filterCond(varsIn(b))})"
        case 3 => s"GRAPH ?g { ${bgp(Nil, 1)} } $b"
        case _ => b
      }
    }

    def template(scope: Seq[String], n: Int, withGraph: Boolean): Seq[Tpl] =
      (0 until n).map { _ =>
        def c(pos: Int) =
          if (scope.nonEmpty && rnd.nextDouble() < 0.55) Left(pick(scope))
          else Right(groundTerm(pos))
        val g =
          if (!withGraph || rnd.nextDouble() < 0.6) None
          else if (scope.contains("?g") && rnd.nextBoolean()) Some(Left("?g"): Comp)
          else Some(Right(iri(s"g${1 + rnd.nextInt(2)}")): Comp)
        Tpl(c(0), c(1), c(2), g)
      }
  }

  private def attempt[T](f: => T): Either[String, T] =
    try Right(f) catch { case e: Throwable => Left(e.getClass.getSimpleName) }

  // ----- 1. CONSTRUCT: engine instantiation vs driver instantiation -----

  "CONSTRUCT fuzzing" should
    "agree with driver-side §16.2 template instantiation" in {
    val seeds = seedsOr(Seq(41, 42, 43))
    var nonEmpty = 0
    for (seed <- seeds; i <- 0 until 15) {
      val gen = new SGen(seed * 1000 + i)
      val pat = gen.group()
      val tpls = gen.template(gen.varsIn(pat), 1 + gen.rnd.nextInt(2),
        withGraph = false)
      val tplText = tpls.map(_.text).mkString(" ")
      val q = s"${prologue}CONSTRUCT { $tplText } WHERE { $pat }"
      withClue(s"seed=$seed #$i:\n$q\n") {
        val expected = attempt {
          val sols = bindings(base.sparql(s"${prologue}SELECT * { $pat }"))
          instantiate(tpls, sols)
        }
        attempt(quadSet(base.sparql(q))) shouldBe expected
        // round-trip re-queryability: the constructed graph is a valid
        // quads table — scanning it back returns exactly its size
        expected.foreach { exp =>
          if (exp.nonEmpty) {
            nonEmpty += 1
            val back = QuadsIO.fromQuads(spark, exp.toSeq)
            bindings(back.sparql(
              s"${prologue}SELECT * { ?s ?p ?o }")) should have size exp.size.toLong
          }
        }
      }
    }
    if (customSeed.isEmpty)
      nonEmpty should be >= 12 // agreement over empty graphs proves nothing
  }

  // ----- 2. Update: engine sequences vs client-side set algebra -----

  private def renderData(qs: Seq[Quad]): String =
    qs.map { q =>
      val t = s"${Sparql.serialize(q.s)} ${Sparql.serialize(q.p)} " +
        s"${Sparql.serialize(q.o)} ."
      q.g match {
        case None => t
        case Some(g) => s"GRAPH ${Sparql.serialize(g)} { $t }"
      }
    }.mkString(" ")

  "Update fuzzing" should
    "land every ';'-sequence on the client-side set-algebra state" in {
    val seeds = seedsOr(Seq(61, 62, 63))
    var mutations = 0
    for (seed <- seeds; i <- 0 until 6) {
      val gen = new SGen(seed * 1000 + i)
      var expected: Set[Quad] = baseQuads.toSet
      val stmts = Seq.newBuilder[String]

      // §3.2 graph refs as (syntax, client predicate, retag target)
      def refOf(k: Int): (String, Quad => Boolean, Option[Iri]) = k match {
        case 0 => ("DEFAULT", q => q.g.isEmpty, None)
        case 1 => ("GRAPH :g1", q => q.g.contains(iri("g1")), Some(iri("g1")))
        case _ => ("GRAPH :g2", q => q.g.contains(iri("g2")), Some(iri("g2")))
      }

      for (_ <- 0 to gen.rnd.nextInt(2)) {
        gen.rnd.nextInt(9) match {
          case 0 => // INSERT DATA: mix of fresh and already-present quads
            val fresh = (0 until 1 + gen.rnd.nextInt(2)).map { _ =>
              val g = if (gen.rnd.nextDouble() < 0.3)
                Some(iri(s"g${1 + gen.rnd.nextInt(2)}")) else None
              Quad(iri(s"x${gen.rnd.nextInt(6)}"), iri("p"),
                gen.groundTerm(2), g)
            } ++ (if (gen.rnd.nextBoolean() && expected.nonEmpty)
              Seq(gen.pick(expected.toSeq.sortBy(_.toString))) else Nil)
            stmts += s"INSERT DATA { ${renderData(fresh)} }"
            expected = expected ++ fresh
          case 1 => // DELETE DATA: mix of present and absent quads
            val present =
              if (expected.isEmpty) Nil
              else (0 until 1 + gen.rnd.nextInt(2)).map(_ =>
                gen.pick(expected.toSeq.sortBy(_.toString)))
            val absent = Quad(iri("nope"), iri("p"), Lit("z"), None)
            val doomed = present ++
              (if (gen.rnd.nextBoolean() || present.isEmpty) Seq(absent) else Nil)
            stmts += s"DELETE DATA { ${renderData(doomed)} }"
            expected = expected -- doomed
          case 2 => // DELETE WHERE: pattern doubles as template
            val pats = (0 until 1 + gen.rnd.nextInt(2)).map { _ =>
              val useG = gen.rnd.nextDouble() < 0.3
              Tpl(gen.comp(0, 0.8), Right(iri(gen.pick(Seq("p", "q", "r")))),
                gen.comp(2, 0.8),
                if (useG) Some(Left("?g")) else None)
            }
            stmts += s"DELETE WHERE { ${pats.map(_.text).mkString(" ")} }"
            val sols = bindings(QuadsIO.fromQuads(spark, expected.toSeq)
              .sparql(s"${prologue}SELECT * { ${pats.map(_.text).mkString(" ")} }"))
            expected = expected -- instantiate(pats, sols)
          case 3 => // DELETE/INSERT WHERE over the current state
            val pat = gen.bgp(Nil, 1 + gen.rnd.nextInt(2))
            val scope = gen.varsIn(pat)
            val del = gen.template(scope, 1, withGraph = true)
            val ins = gen.template(scope, 1, withGraph = true)
            stmts += s"DELETE { ${del.map(_.text).mkString(" ")} } " +
              s"INSERT { ${ins.map(_.text).mkString(" ")} } WHERE { $pat }"
            val sols = bindings(QuadsIO.fromQuads(spark, expected.toSeq)
              .sparql(s"${prologue}SELECT * { $pat }"))
            expected = expected -- instantiate(del, sols) ++ instantiate(ins, sols)
          case 4 => // CLEAR / DROP (equivalent under the quad-set model)
            val kw = if (gen.rnd.nextBoolean()) "CLEAR" else "DROP"
            gen.rnd.nextInt(5) match {
              case 0 => stmts += s"$kw NAMED"
                expected = expected.filter(_.g.isEmpty)
              case 1 => stmts += s"$kw ALL"
                expected = Set.empty
              case k =>
                val (syn, m, _) = refOf(k - 2)
                stmts += s"$kw $syn"
                expected = expected.filterNot(m)
            }
          case 5 => // ADD: insert source's quads into destination
            val (ss, sm, _) = refOf(gen.rnd.nextInt(3))
            val (ds, _, dg) = refOf(gen.rnd.nextInt(3))
            stmts += s"ADD ${ss.stripPrefix("GRAPH ")} TO ${ds.stripPrefix("GRAPH ")}"
            if (ss != ds)
              expected = expected ++ expected.filter(sm).map(_.copy(g = dg))
          case 6 => // COPY / MOVE: overwrite destination (± drop source)
            val move = gen.rnd.nextBoolean()
            val (ss, sm, _) = refOf(gen.rnd.nextInt(3))
            val (ds, dm, dg) = refOf(gen.rnd.nextInt(3))
            stmts += s"${if (move) "MOVE" else "COPY"} " +
              s"${ss.stripPrefix("GRAPH ")} TO ${ds.stripPrefix("GRAPH ")}"
            if (ss != ds) {
              val src = expected.filter(sm)
              expected = expected.filterNot(dm) --
                (if (move) src else Set.empty) ++ src.map(_.copy(g = dg))
            }
          case 8 => // USING [NAMED]: WHERE's dataset rebuilt FROM-style
            // (USING graphs merge as default, USING NAMED graphs stay
            // addressable, everything else vanishes); templates still
            // target the REAL store's graphs
            val g = iri(s"g${1 + gen.rnd.nextInt(2)}")
            val named = gen.rnd.nextBoolean()
            val pat =
              if (named) s"GRAPH ?g { ${gen.bgp(Nil, 1)} }"
              else gen.bgp(Nil, 1)
            val scope = gen.varsIn(pat) ++ (if (named) Seq("?g") else Nil)
            val ins = gen.template(scope, 1, withGraph = true)
            stmts += s"INSERT { ${ins.map(_.text).mkString(" ")} } " +
              s"USING ${if (named) "NAMED " else ""}<${g.lex}> WHERE { $pat }"
            val matchSet =
              if (named) expected.filter(_.g.contains(g))
              else expected.filter(_.g.contains(g)).map(_.copy(g = None))
            val sols = bindings(QuadsIO.fromQuads(spark, matchSet.toSeq)
              .sparql(s"${prologue}SELECT * { $pat }"))
            expected = expected ++ instantiate(ins, sols)
          case _ => // WITH: match against g-as-default, templates target g
            val g = iri(s"g${1 + gen.rnd.nextInt(2)}")
            val pat = gen.bgp(Nil, 1)
            val scope = gen.varsIn(pat)
            val del = gen.template(scope, 1, withGraph = false)
            val ins = gen.template(scope, 1, withGraph = false)
            stmts += s"WITH <${g.lex}> " +
              s"DELETE { ${del.map(_.text).mkString(" ")} } " +
              s"INSERT { ${ins.map(_.text).mkString(" ")} } WHERE { $pat }"
            // §3.1.3 match dataset: the store's named graphs stay
            // addressable AND g's quads appear retagged as default
            val matchSet = expected.filter(_.g.nonEmpty) ++
              expected.filter(_.g.contains(g)).map(_.copy(g = None))
            val sols = bindings(QuadsIO.fromQuads(spark, matchSet.toSeq)
              .sparql(s"${prologue}SELECT * { $pat }"))
            expected = expected -- instantiate(del, sols, Some(g)) ++
              instantiate(ins, sols, Some(g))
        }
      }
      val update = prologue + stmts.result().mkString(" ;\n")
      withClue(s"seed=$seed #$i:\n$update\n") {
        quadSet(base.sparqlUpdate(update)) shouldBe expected
        if (expected != baseQuads.toSet) mutations += 1
      }
    }
    if (customSeed.isEmpty)
      mutations should be >= 12 // identity outcomes prove nothing
  }

  it should "hold DELETE WHERE idempotent and INSERT-then-DELETE-fresh an identity" in {
    val seeds = seedsOr(Seq(71, 72, 73))
    for (seed <- seeds) {
      val gen = new SGen(seed)
      // DELETE WHERE applied twice ≡ once (second pass matches nothing)
      val pat = Tpl(gen.comp(0, 0.9), Right(iri(gen.pick(Seq("p", "q", "r")))),
        gen.comp(2, 0.9), None)
      val once = quadSet(base.sparqlUpdate(
        s"${prologue}DELETE WHERE { ${pat.text} }"))
      val twice = quadSet(base.sparqlUpdate(
        s"${prologue}DELETE WHERE { ${pat.text} } ; DELETE WHERE { ${pat.text} }"))
      withClue(s"seed=$seed DELETE WHERE { ${pat.text} }: ") {
        twice shouldBe once
      }
      // fresh quads inserted then deleted restore the exact input set
      val fresh = (0 until 2).map(k =>
        Quad(iri(s"fresh$seed-$k"), iri("p"), Lit(k.toString, XSD.integer),
          if (k == 1) Some(iri("g1")) else None))
      val rt = quadSet(base.sparqlUpdate(
        s"${prologue}INSERT DATA { ${renderData(fresh)} } ; " +
          s"DELETE DATA { ${renderData(fresh)} }"))
      withClue(s"seed=$seed insert-then-delete: ") {
        rt shouldBe baseQuads.toSet
      }
    }
  }

  // ----- 1b. CONSTRUCT blank-node templates: per-solution sharing -----

  "CONSTRUCT bnode-template fuzzing" should
    "mint one shared bnode per solution, distinct across solutions" in {
    // `_:n` in a template is a FRESH blank node per solution, SHARED
    // across that solution's template triples — the engine freezes a
    // per-solution uuid under localCheckpoint so re-execution cannot
    // split the sharing. Structure-aware oracle: project each result
    // bnode to its (in-edge, out-edge) neighborhood; the multiset of
    // neighborhoods must equal the solutions, and bnode count must
    // equal the SOLUTION count (duplicate solutions mint distinct
    // bnodes; spec graphs are sets, so both copies survive).
    val seeds = seedsOr(Seq(51, 52, 53))
    for (seed <- seeds; i <- 0 until 5) {
      val gen = new SGen(seed * 1000 + i)
      val pat = gen.typedBgp(1 + gen.rnd.nextInt(2))
      val vs = gen.varsIn(pat)
      if (vs.size >= 2) {
        val a = vs.head; val b = vs(1)
        val q = s"${prologue}CONSTRUCT { $a :via _:n . _:n :val $b } " +
          s"WHERE { $pat }"
        withClue(s"seed=$seed #$i:\n$q\n") {
          // a solution contributes iff EITHER triple instantiates:
          // (a bound non-literal → via-edge) or (b bound → val-edge);
          // a solution failing both mints nothing
          val sols = bindings(base.sparql(s"${prologue}SELECT * { $pat }"))
            .flatMap { s =>
              val sa = s.get(a.stripPrefix("?"))
                .filter(t => !t.isInstanceOf[Lit])
              val sb = s.get(b.stripPrefix("?"))
              if (sa.isEmpty && sb.isEmpty) None else Some((sa, sb))
            }
          val quads = quadSet(base.sparql(q))
          val bnodes = quads.collect {
            case Quad(_, _, bn: BNode, _) => bn
            case Quad(bn: BNode, _, _, _) => bn
          }
          // one bnode per surviving solution (distinct across dupes)
          bnodes.size.toLong shouldBe sols.size.toLong
          // each bnode's neighborhood = exactly one solution
          val neighborhoods = bnodes.toSeq.map { bn =>
            val in = quads.collectFirst {
              case Quad(s, p, `bn`, _) if p == iri("via") => s }
            val out = quads.collectFirst {
              case Quad(`bn`, p, o, _) if p == iri("val") => o }
            (in, out)
          }
          multiset(neighborhoods) shouldBe
            multiset(sols.map { case (sa, sb) => (sa, sb) })
        }
      }
    }
  }

  // ----- 2b. DESCRIBE: engine CBD vs driver closure -----

  /** Concise Bounded Description on the driver: subject quads of every
    * described term, plus — transitively — the quads of blank nodes
    * reached in object position (mirrors Compiler.runDescribe; the
    * anti-join against the seen set is the `-- described`). */
  private def cbd(targets: Set[Term], quads: Set[Quad]): Set[Quad] = {
    var described = targets
    var delta = targets
    var result = Set.empty[Quad]
    while (delta.nonEmpty) {
      val nq = quads.filter(q => delta.contains(q.s))
      result ++= nq
      val bn: Set[Term] =
        nq.collect { case q if q.o.isInstanceOf[BNode] => q.o } -- described
      described ++= bn
      delta = bn
    }
    result
  }

  "DESCRIBE fuzzing" should
    "agree with the driver-side Concise Bounded Description closure" in {
    // fixture with blank-node structure: per-subject address bnodes,
    // a two-level chain, and a bnode CYCLE (closure must terminate)
    val bq = baseQuads ++ (0 until 5).flatMap { i =>
      Seq(
        Quad(iri(s"n$i"), iri("addr"), BNode(s"a$i"), None),
        Quad(BNode(s"a$i"), iri("street"), Lit(s"s$i"), None),
        Quad(BNode(s"a$i"), iri("next"), BNode(s"b$i"), None),
        Quad(BNode(s"b$i"), iri("zip"), Lit(i.toString, XSD.integer), None))
    } ++ Seq(
      Quad(iri("n0"), iri("loop"), BNode("c1"), None),
      Quad(BNode("c1"), iri("next"), BNode("c2"), None),
      Quad(BNode("c2"), iri("next"), BNode("c1"), None))
    val store = QuadsIO.fromQuads(spark, bq).cache()
    val seeds = seedsOr(Seq(91, 92, 93))
    var nonEmpty = 0
    for (seed <- seeds; i <- 0 until 10) {
      val gen = new SGen(seed * 1000 + i)
      val (q, targets) = gen.rnd.nextInt(4) match {
        case 0 => // bare constants, no WHERE
          val ts = (0 until 1 + gen.rnd.nextInt(2))
            .map(_ => iri(s"n${gen.rnd.nextInt(10)}"))
          (s"${prologue}DESCRIBE ${ts.map(t => s"<${t.lex}>").mkString(" ")}",
            ts.toSet[Term])
        case 1 => // DESCRIBE * over a pattern
          val pat = gen.typedBgp(1 + gen.rnd.nextInt(2))
          val sols = bindings(store.sparql(s"${prologue}SELECT * { $pat }"))
          (s"${prologue}DESCRIBE * WHERE { $pat }",
            sols.flatMap(_.values).toSet)
        case 2 => // projected vars over a pattern
          val pat = gen.typedBgp(1 + gen.rnd.nextInt(2))
          val vs = gen.varsIn(pat)
          if (vs.isEmpty) (s"${prologue}DESCRIBE <${iri("n0").lex}>",
            Set[Term](iri("n0")))
          else {
            val chosen = vs.take(1 + gen.rnd.nextInt(vs.size))
            val sols = bindings(store.sparql(s"${prologue}SELECT * { $pat }"))
            (s"${prologue}DESCRIBE ${chosen.mkString(" ")} WHERE { $pat }",
              sols.flatMap(s => chosen.flatMap(v =>
                s.get(v.stripPrefix("?")))).toSet)
          }
        case _ => // mixed constant + var
          val pat = gen.typedBgp(1)
          val vs = gen.varsIn(pat)
          val c = iri(s"n${gen.rnd.nextInt(10)}")
          val v = if (vs.nonEmpty) Some(gen.pick(vs)) else None
          val sols = bindings(store.sparql(s"${prologue}SELECT * { $pat }"))
          (s"${prologue}DESCRIBE <${c.lex}> ${v.getOrElse("")} WHERE { $pat }",
            Set[Term](c) ++ v.toSeq.flatMap(vn =>
              sols.flatMap(_.get(vn.stripPrefix("?")))))
      }
      withClue(s"seed=$seed #$i:\n$q\n") {
        val expected = attempt(cbd(targets, bq.toSet))
        attempt(quadSet(store.sparql(q))) shouldBe expected
        if (expected.exists(_.nonEmpty)) nonEmpty += 1
      }
    }
    if (customSeed.isEmpty) nonEmpty should be >= 18
  }

  // ----- 3. SERVICE: composed execution vs compat-join of the parts -----

  /** §18.5 merge: μ1 and μ2 are compatible iff they agree on every
    * shared bound variable; the joined solution is their union. */
  private def compatJoin(l: Seq[Map[String, Term]],
                         r: Seq[Map[String, Term]]): Seq[Map[String, Term]] =
    for {
      m1 <- l; m2 <- r
      if m1.keySet.intersect(m2.keySet).forall(k => m1(k) == m2(k))
    } yield m1 ++ m2

  "SERVICE fuzzing" should
    "agree with the compat-join of outer (local) and inner (endpoint) groups" in {
    val svcEndpoint = "http://fz.example/svc"
    // a DIFFERENT dataset behind the endpoint — same seed so the
    // shared subjects n0..n6 carry join-compatible :q/:r values, but a
    // 7-ring instead of a 10-ring, so conflating the two stores is
    // immediately visible in the :p edges
    val svcQuads = QuadsIO.fromQuads(spark, fixtureQuads(11, 7)).cache()
    Sparql.registerService(svcEndpoint, svcQuads)
    try {
      val seeds = seedsOr(Seq(81, 82, 83))
      var nonEmpty = 0
      var loEmpty = 0; var riEmpty = 0; var rejected = 0
      for (seed <- seeds; i <- 0 until 12) {
        val gen = new SGen(seed * 1000 + i)
        // outer is usually a plain var-heavy BGP (filters/GRAPH shrink
        // the local side toward empty and starve the join of rows);
        // every fourth query still draws a full group for variety
        val outer =
          if (gen.rnd.nextDouble() < 0.25) gen.group()
          else gen.typedBgp(1 + gen.rnd.nextInt(2))
        // inner stays a small BGP (± filter): four shared vars across
        // two full groups over-constrains the compat join into empty
        // results, and the algebra inside a group is DictFuzzSpec's job
        val innerBgp = gen.typedBgp(1)
        val inner0 =
          if (gen.rnd.nextDouble() < 0.3)
            s"$innerBgp FILTER(${gen.filterCond(gen.varsIn(innerBgp))})"
          else innerBgp
        // only ?a/?b are shareable across the SERVICE boundary; ?c/?d
        // become endpoint-private ?x/?y — four jointly-constrained vars
        // across two DIFFERENT datasets empty the compat join so often
        // the floor below can't be met
        val inner = inner0.replace("?c", "?x").replace("?d", "?y")
        val q = s"${prologue}SELECT * { $outer SERVICE <$svcEndpoint> { $inner } }"
        withClue(s"seed=$seed #$i:\n$q\n") {
          val expected = attempt {
            val lo = bindings(base.sparql(s"${prologue}SELECT * { $outer }"))
            val ri = bindings(svcQuads.sparql(s"${prologue}SELECT * { $inner }"))
            if (lo.isEmpty) loEmpty += 1
            if (ri.isEmpty) riEmpty += 1
            multiset(compatJoin(lo, ri))
          }
          if (expected.isLeft) rejected += 1
          attempt(multiset(bindings(base.sparql(q)))) shouldBe expected
          if (expected.exists(_.nonEmpty)) nonEmpty += 1
        }
      }
      if (customSeed.isEmpty)
        withClue(s"loEmpty=$loEmpty riEmpty=$riEmpty rejected=$rejected: ") {
          nonEmpty should be >= 15
        }
    } finally Sparql.unregisterService(svcEndpoint)
  }
}
