package graft

import graft.rdf.Iri
import graft.sparql.Algebra._
import graft.sparql.{BgpOptimizer, SparqlParser}
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Selectivity-based BGP reordering: most-constant patterns first,
  * connectivity preserved (no introduced cross joins). Result
  * equivalence is covered by every suite running through sparql(). */
class BgpOptimizerSpec extends AnyFlatSpec with Matchers {

  private def joinLeaves(op: Op): List[Op] = {
    def strip(o: Op): Op = o match {
      case Project(c, _) => strip(c)
      case Distinct(c) => strip(c)
      case Filter(c, _) => strip(c)
      case other => other
    }
    def flatten(o: Op): List[Op] = o match {
      case Join(l, r) => flatten(l) ++ flatten(r)
      case other => List(other)
    }
    flatten(strip(op))
  }

  "BgpOptimizer" should "move the most selective pattern first" in {
    val parsed = SparqlParser.parse(
      """PREFIX : <urn:p:>
        |SELECT * { ?s ?p ?o . ?s :name "X" . }""".stripMargin)
    val leaves = joinLeaves(BgpOptimizer.optimize(parsed))
    leaves.head match {
      case Scan(_, T(Iri(p)), T(_), _) => p shouldBe "urn:p:name"
      case other => fail(s"expected constant-heavy scan first, got $other")
    }
  }

  it should "keep connectivity: next pattern shares a variable" in {
    val parsed = SparqlParser.parse(
      """PREFIX : <urn:p:>
        |SELECT * { ?a :p1 ?b . ?c :p2 ?d . ?b :sel "k" . ?b :p3 ?c . }""".stripMargin)
    val leaves = joinLeaves(BgpOptimizer.optimize(parsed))
    // first is the 2-constant scan on ?b; every later leaf must share a
    // var with what came before (no cross joins)
    var bound = vars(leaves.head)
    leaves.tail.foreach { l =>
      (vars(l) intersect bound) should not be empty
      bound ++= vars(l)
    }
  }

  it should "place VALUES blocks before plain scans" in {
    val parsed = SparqlParser.parse(
      """PREFIX : <urn:p:>
        |SELECT * { ?s :p ?v . VALUES ?v { "a" "b" } }""".stripMargin)
    joinLeaves(BgpOptimizer.optimize(parsed)).head shouldBe a[Values]
  }

  // ----- physical-plan regression guards on the join stack -----
  // Assured-on-both-sides variables must compile to plain === equi keys
  // (hash/sort-merge joinable); the NULL-tolerant compat condition —
  // which forces BroadcastNestedLoopJoin, O(n×m) — is reserved for
  // genuinely possibly-unbound shared vars. This distinction was the
  // 73s → 2s fix at sf0.1; these specs pin both sides of it.

  private def plan(fixture: String, q: String): String = {
    import graft.sparql.Sparql._
    TestSpark.fixture(fixture).sparql(q).queryExecution.executedPlan.toString
  }

  "join compilation" should "use equi keys (no nested-loop join) when the shared var is assured" in {
    val p = plan("optionals.ttl",
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |SELECT ?name ?mbox { ?x foaf:name ?name
        |  OPTIONAL { ?x foaf:mbox ?mbox } }""".stripMargin)
    p should not include "BroadcastNestedLoopJoin"
  }

  it should "fall back to the compat nested-loop join ONLY for possibly-unbound shared vars" in {
    val p = plan("optionals.ttl",
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |SELECT ?name ?mbox
        |{ { ?x foaf:name ?name . ?x foaf:knows ?y } UNION { ?x foaf:name ?name }
        |  OPTIONAL { ?y foaf:mbox ?mbox } }""".stripMargin)
    // ?y is bound in only one UNION branch → compat condition is the
    // CORRECT plan here (documents the legitimate fallback)
    p should include("BroadcastNestedLoopJoin")
  }
}
