package graft

import graft.io.{DictStore, QuadsIO}
import graft.rdf.TurtleParser
import graft.sparql.Sparql._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import scala.util.Random

/** Randomized differential testing of the dict-store id-space
  * rewriter against the term-struct compiler: the rewriter's
  * eligibility analysis (assured vars, hybrid decode, EXISTS
  * correlation, VALUES probes, spine shapes) has many interacting
  * branches; seeded random query generation exercises combinations no
  * example-based spec enumerates. Every query runs on BOTH paths and
  * must agree as a multiset — by construction this also covers the
  * fallback boundary (ineligible shapes compile through the standard
  * compiler on both sides and agree trivially, so a misclassified
  * ELIGIBLE shape is exactly what the diff would catch). */
class DictFuzzSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark

  // deterministic small-world fixture: 3 predicates over 12 subjects,
  // object mix of IRIs (graph edges), ints and tagged strings — dense
  // enough that joins, optionals and filters all produce rows
  private lazy val ttl: String = {
    val rnd = new Random(7)
    val sb = new StringBuilder("@prefix : <http://fz.example/> .\n")
    for (i <- 0 until 12) {
      sb.append(s":n$i :p :n${(i + 1) % 12} .\n")
      if (i % 2 == 0) sb.append(s":n$i :p :n${(i + 5) % 12} .\n")
      sb.append(s":n$i :q ${rnd.nextInt(10)} .\n")
      if (i % 3 != 0) sb.append(s""":n$i :r "w${rnd.nextInt(5)}" .\n""")
    }
    // two named graphs so GRAPH ?g / GRAPH :gK shapes have data
    sb.append(":g1 { :n0 :p :n3 . :n2 :q 7 . :n4 :r \"w1\" . }\n")
    sb.append(":g2 { :n1 :p :n0 . :n5 :q 3 . }\n")
    // heterogeneous values: negative/decimal/double numbers, unicode
    // and case-varied strings — comparison/regex/sort-key stress
    sb.append(":n0 :q -3 . :n1 :q 2.5 . :n2 :q 1.0e1 .\n")
    sb.append(":n3 :r \"wüñ∂\" . :n4 :r \"W2\" .\n")
    sb.toString
  }

  private lazy val quads = {
    // generalized-RDF rows with LITERAL SUBJECTS (Turtle cannot spell
    // them): the round-14 subject sidecar makes `FILTER(?a > 3)` on a
    // subject var take the typed id-space path on the dict stores —
    // the existing numeric/arith filter generators now differentially
    // cover that path against the term-struct compiler for free
    import graft.rdf.{Iri, Lit, Quad, XSD}
    val litSubj = (0 until 8).flatMap { i =>
      val s: graft.rdf.Term =
        if (i % 4 == 3) Lit(s"$i.5", XSD.double, "")
        else Lit(i.toString, XSD.integer, "")
      Seq(
        Quad(s, Iri("http://fz.example/q"),
          Lit((i % 5).toString, XSD.integer, ""), None),
        Quad(s, Iri("http://fz.example/r"),
          Lit(s"w${i % 5}", XSD.string, ""), None))
    }
    QuadsIO.fromQuads(spark, TurtleParser.parse(ttl))
      .union(QuadsIO.fromQuads(spark, litSubj)).cache()
  }
  // the CBO path: statistics may only change the JOIN ORDER, never
  // the result — the fifth execution path in the differential
  private lazy val stats = quads.analyze()
  private lazy val store = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dict-fuzz").toString
    DictStore.encode(quads, dir)
  }
  private lazy val bucketed = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dict-fuzz-b").toString
    DictStore.encodeBucketed(quads, dir, buckets = 4)
  }

  private val prologue = "PREFIX : <http://fz.example/>\n"

  private final class Gen(seed: Int) {
    private val rnd = new Random(seed)
    private val vars = Vector("?a", "?b", "?c", "?d")
    private def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.size))

    private def subject(scope: Seq[String]): String =
      if (rnd.nextDouble() < 0.7) pick(vars)
      else if (scope.nonEmpty && rnd.nextDouble() < 0.5) pick(scope)
      else s":n${rnd.nextInt(12)}"

    /** One triple pattern; predicate decides the object's domain. */
    private def triple(scope: Seq[String]): String = {
      val s = subject(scope)
      rnd.nextInt(3) match {
        case 0 =>
          val o = if (rnd.nextDouble() < 0.6) pick(vars)
                  else s":n${rnd.nextInt(12)}"
          s"$s :p $o ."
        case 1 =>
          val o = if (rnd.nextDouble() < 0.7) pick(vars)
                  else rnd.nextInt(10).toString
          s"$s :q $o ."
        case _ =>
          val o = if (rnd.nextDouble() < 0.7) pick(vars)
                  else s""""w${rnd.nextInt(5)}""""
          s"$s :r $o ."
      }
    }

    private def bgp(scope: Seq[String], n: Int): String =
      (0 until n).map(_ => triple(scope)).mkString(" ")

    private def varsIn(pat: String): Seq[String] =
      vars.filter(pat.contains)

    private def filterCond(scope: Seq[String]): String = {
      if (scope.isEmpty) return "1 = 1"
      val v = pick(scope)
      rnd.nextInt(9) match {
        case 0 => s"$v > ${rnd.nextInt(10)}"
        case 1 => s"$v = :n${rnd.nextInt(12)}"
        case 2 => s"sameTerm($v, ${rnd.nextInt(10)})"
        case 3 => s"""REGEX(STR($v), "w|n${rnd.nextInt(12)}")"""
        case 4 => s"BOUND($v)"
        // hybrid-decode error semantics: arithmetic on non-numeric
        // terms and casts must error → NULL → drop identically
        case 5 => s"$v + ${rnd.nextInt(3)} > ${rnd.nextInt(12)}"
        case 6 => s"STRLEN(STR($v)) > ${1 + rnd.nextInt(3)}"
        case 7 => s"IF(BOUND($v), $v > ${rnd.nextInt(8)}, true)"
        case _ => s"!sameTerm($v, :n${rnd.nextInt(12)})"
      }
    }

    /** A group pattern; depth bounds the operator nesting. */
    private def group(depth: Int): String = {
      val base = bgp(Nil, 1 + rnd.nextInt(2))
      if (depth == 0) return base
      rnd.nextInt(14) match {
        case 12 => // negated property set (desugars to Filter(Scan))
          val ps = rnd.shuffle(Seq(":p", ":q", ":r")).take(1 + rnd.nextInt(2))
          s"$base ${pick(vars)} !(${ps.mkString("|")}) ${pick(vars)} ."
        case 13 => // inverse / sequence path composition
          val p = if (rnd.nextBoolean()) "^:p" else ":p/:q"
          s"$base ${pick(vars)} $p ${pick(vars)} ."
        case 9 => s"GRAPH ?g { ${bgp(Nil, 1 + rnd.nextInt(2))} } $base"
        case 10 => s"GRAPH :g${1 + rnd.nextInt(2)} { ${bgp(Nil, 1)} } $base"
        case 11 => // sub-SELECT aggregate joined into the group
          val inner = bgp(Nil, 1 + rnd.nextInt(2))
          varsIn(inner) match {
            case Seq() => base
            case vs =>
              val g = pick(vs)
              s"$base { SELECT $g (COUNT(*) AS ?cnt${rnd.nextInt(3)}) " +
                s"{ $inner } GROUP BY $g }"
          }
        case 7 => // BIND of an arithmetic/string expression
          val scope = varsIn(base)
          val fresh = vars.find(v => !base.contains(v))
          (scope.headOption, fresh) match {
            case (Some(v), Some(f)) =>
              val e = if (rnd.nextBoolean()) s"$v + ${rnd.nextInt(5)}"
                      else s"STR($v)"
              s"$base BIND($e AS $f)"
            case _ => base
          }
        case 8 => // path: transitive closure or zero-or-one — subject
          // may be a CONSTANT, covering the round-10 constant-end
          // zero-length split (zero ∪ id-space plus) and the
          // dict-absent-term binding edge
          val s = if (rnd.nextDouble() < 0.2) s":fresh${rnd.nextInt(3)}"
                  else subject(varsIn(base))
          val o = pick(vars)
          val op = rnd.nextInt(3) match {
            case 0 => "+"; case 1 => "*"; case _ => "?"
          }
          s"$base $s :p$op $o ."
        case 0 => // OPTIONAL, sometimes conditioned, sometimes complex
          val opt = if (rnd.nextDouble() < 0.25) group(depth - 1)
                    else bgp(varsIn(base), 1)
          val cond =
            if (rnd.nextBoolean()) "" else s" FILTER(${filterCond(varsIn(opt))})"
          s"$base OPTIONAL { $opt$cond }"
        case 1 => s"{ ${group(depth - 1)} } UNION { ${group(depth - 1)} }"
        case 2 => s"$base MINUS { ${bgp(varsIn(base), 1)} }"
        case 3 => s"$base FILTER(${filterCond(varsIn(base))})"
        case 4 => // [NOT] EXISTS, sometimes with a correlated inner
          // filter, sometimes a COMPLEX inner pattern (which either
          // engine may legitimately reject — the harness accepts
          // both-reject as agreement)
          val inner = if (rnd.nextDouble() < 0.25) group(depth - 1)
                      else bgp(varsIn(base), 1)
          val innerScope = varsIn(inner) ++ varsIn(base)
          val innerFilter =
            if (rnd.nextBoolean()) ""
            else s" FILTER(${filterCond(innerScope)})"
          val neg = if (rnd.nextBoolean()) "NOT " else ""
          s"$base FILTER ${neg}EXISTS { $inner$innerFilter }"
        case 5 => // VALUES probe list
          val v = pick(varsIn(base) match { case Seq() => vars; case s => s })
          val cells = (0 until 1 + rnd.nextInt(2)).map(_ =>
            if (rnd.nextBoolean()) s":n${rnd.nextInt(12)}"
            else rnd.nextInt(10).toString)
          s"$base VALUES $v { ${cells.mkString(" ")} }"
        case _ => s"${group(depth - 1)} ${bgp(Nil, 1)}"
      }
    }

    /** Optional FROM / FROM NAMED dataset clause (the id-space
      * dataset path: graph-id filter + default-graph retag). */
    private def datasetClause(): String =
      if (rnd.nextDouble() >= 0.15) ""
      else rnd.nextInt(3) match {
        case 0 => s"FROM :g${1 + rnd.nextInt(2)} "
        case 1 => s"FROM NAMED :g${1 + rnd.nextInt(2)} "
        case _ => "FROM :g1 FROM NAMED :g2 "
      }

    def query(): String = {
      val pat = group(1 + rnd.nextInt(2))
      val inScope = varsIn(pat)
      val ds = datasetClause()
      if (rnd.nextDouble() < 0.1)
        return s"${prologue}ASK $ds{ $pat }"
      val proj =
        if (inScope.isEmpty || rnd.nextDouble() < 0.3) "*"
        else rnd.shuffle(inScope).take(1 + rnd.nextInt(inScope.size))
          .mkString(" ")
      val distinct = if (rnd.nextDouble() < 0.25) "DISTINCT " else ""
      if (rnd.nextDouble() < 0.2 && inScope.nonEmpty) {
        // aggregate forms beyond COUNT: SUM/AVG error-poisoning on
        // non-numeric terms, MIN/MAX total value order, sorted
        // GROUP_CONCAT, COUNT DISTINCT — all deterministic, so the
        // four execution paths must agree bit-for-bit; HAVING lifts
        // to a filter above the group on both engines
        val g = pick(inScope)
        val m = pick(inScope)
        val agg = rnd.nextInt(6) match {
          case 0 => "COUNT(*)"
          case 1 => s"SUM($m)"
          case 2 => s"MIN($m)"
          case 3 => s"MAX($m)"
          case 4 => s"COUNT(DISTINCT $m)"
          case _ => s"""GROUP_CONCAT($m; SEPARATOR="|")"""
        }
        val having =
          if (rnd.nextDouble() < 0.3) s" HAVING(COUNT(*) > ${rnd.nextInt(3)})"
          else ""
        s"${prologue}SELECT $g ($agg AS ?cnt) $ds{ $pat } GROUP BY $g$having"
      } else s"${prologue}SELECT $distinct$proj $ds{ $pat }"
    }
  }

  private def multiset(rows: Seq[Map[String, graft.rdf.Term]]) =
    rows.groupBy(identity).view.mapValues(_.size).toMap

  private def bindings(df: org.apache.spark.sql.DataFrame) = {
    val names = df.columns
    df.collect().toSeq.map { row =>
      names.zipWithIndex.flatMap { case (n, i) =>
        val sub = if (row.isNullAt(i)) null else row.getStruct(i)
        graft.rdf.TermSchema.fromRow(sub).map(n -> _)
      }.toMap
    }
  }

  private def same(q: String): Unit = {
    val viaDict = bindings(store.sparql(q))
    val viaTerms = bindings(quads.sparql(q))
    withClue(s"$q\n") { multiset(viaDict) shouldBe multiset(viaTerms) }
    viaTerms should not be empty
  }

  // the two bugs the fuzzer found on its first run, pinned as named
  // regressions (fuzz seed drift must never un-cover them)
  "fuzz regressions" should
    "keep compat semantics when joining above a swallowed UNION" in {
    // ?b is bound only in one UNION branch; the swallowed block must
    // NOT report it assured, or the outer join degrades from compat
    // (NULL matches anything) to plain equality and drops every
    // branch-1 row — the wrong-answer shape found at fuzz query #50
    same(prologue +
      "SELECT * { { ?c :q ?a . } UNION { ?d :p ?b . } ?c :p ?b . }")
  }

  it should "group by a variable scoped away inside MINUS" in {
    // GROUP BY ?a where ?a only occurs inside MINUS (not in scope) is
    // legal SPARQL: one group, key unbound — both compilers crashed
    // at analysis before the compileGroup pad (fuzz query #5)
    same(prologue +
      """SELECT ?a (COUNT(*) AS ?cnt)
        |{ ?c :q ?n . MINUS { ?a :r "w3" . } } GROUP BY ?a""".stripMargin)
  }

  "the dict-store rewriter" should
    "agree with the term-struct compiler on 90 random queries" in {
    // -Dgraft.fuzz.seed=N explores fresh query streams (dev bug-hunt
    // hook; seeds 7/99/12345 verified agreeing in round 9)
    val seed = sys.props.get("graft.fuzz.seed").map(_.toInt)
    val gen = new Gen(seed.getOrElse(20260814))
    var nonEmpty = 0
    for (i <- 0 until 90) {
      val q = gen.query()
      withClue(s"query #$i:\n$q\n") {
        // an engine may legitimately REJECT a generated query (e.g.
        // correlated filters under UNION inside EXISTS) — agreement
        // then means BOTH paths reject; one rejecting while the other
        // answers is a divergence
        def attempt[T](f: => T): Either[String, T] =
          try Right(f)
          catch { case e: Throwable => Left(e.getClass.getSimpleName) }
        if (q.startsWith(s"${prologue}ASK")) {
          // ASK returns one boolean row, not term structs
          val expect = attempt(quads.sparql(q).collect().map(_.toSeq).toSeq)
          attempt(store.sparql(q).collect().map(_.toSeq).toSeq) shouldBe expect
          if (i % 3 == 0)
            attempt(bucketed.sparql(q).collect().map(_.toSeq).toSeq) shouldBe
              expect
          if (expect.isRight) nonEmpty += 1
        } else {
          val viaTerms = attempt(multiset(bindings(quads.sparql(q))))
          attempt(multiset(bindings(store.sparql(q)))) shouldBe viaTerms
          // every third query also runs on the BUCKETED store layout —
          // same rewriter over catalog-bucketed tables
          if (i % 3 == 0)
            attempt(multiset(bindings(bucketed.sparql(q)))) shouldBe viaTerms
          // ...and every third (offset) through the CBO join-ordering
          // path: statistics must be result-invariant
          if (i % 3 == 1)
            attempt(multiset(bindings(quads.sparql(q, stats)))) shouldBe
              viaTerms
          if (viaTerms.exists(_.nonEmpty)) nonEmpty += 1
        }
      }
    }
    // the generator must produce a meaningfully non-trivial corpus —
    // agreement over empty results would prove nothing. Pinned only
    // for the DEFAULT seed (explored seeds yield 29-40 non-empty)
    if (seed.isEmpty) nonEmpty should be >= 30
  }

  it should "agree between batch and STREAMING execution on the " +
    "stateless subset" in {
    // the fourth execution path: the same compiled column plan over a
    // readStream source. Queries outside the validated stateless
    // subset (aggregates, DISTINCT, OPTIONAL/MINUS/EXISTS, paths) are
    // rejected at submission and skipped; accepted ones must append
    // exactly the batch multiset from one micro-batch of the fixture
    import graft.streaming.StreamingOps
    val dir = java.nio.file.Files
      .createTempDirectory("graft-fuzz-stream").toString
    quads.write.mode("overwrite").parquet(dir)
    val schema = quads.schema
    val gen = new Gen(20260815)
    var ran = 0
    var skipped = 0
    var i = 0
    // the generator's round-10 growth (aggregate forms, `?` paths,
    // constant path ends) shrank the stream-eligible fraction; scan
    // further to keep 12 accepted queries
    while (ran < 12 && i < 400) {
      val q = gen.query()
      i += 1
      val streamed =
        try Some(StreamingOps.sparqlStream(
          spark.readStream.schema(schema).parquet(dir), q))
        catch { case _: IllegalArgumentException => skipped += 1; None }
      streamed.foreach { out =>
        withClue(s"stream query #$i:\n$q\n") {
          val sink = s"fuzz_stream_out_$ran"
          val sq = out.writeStream.format("memory").queryName(sink)
            .outputMode("append").start()
          try {
            sq.processAllAvailable()
            multiset(bindings(spark.table(sink))) shouldBe
              multiset(bindings(quads.sparql(q)))
          } finally sq.stop()
          ran += 1
        }
      }
    }
    withClue(s"ran=$ran skipped=$skipped of $i generated: ") {
      ran should be >= 8 // the subset must actually get exercised
    }
  }
}
