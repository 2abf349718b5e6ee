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
}
