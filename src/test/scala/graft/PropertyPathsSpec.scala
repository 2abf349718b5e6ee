package graft

import graft.io.QuadsIO
import graft.rdf.{Iri, Quad}
import graft.sparql.Sparql._

/** Property paths — ports reference PropertyPathsTest.scala, plus
  * transitive `*`/`+` (ArbitraryLengthPath), which the reference cannot
  * execute at all (README.md:60-63). */
class PropertyPathsSpec extends SparqlSpecBase {
  private val prologue = "PREFIX : <http://example/>\n"
  private val E = "http://example/"

  "property paths" should "desugar a sequence path into joins" in {
    val q = prologue + "SELECT * \n{  ?s :item/:price ?x . }"
    check("property_paths.ttl", q, Seq(
      Map("s" -> iri(E + "order"), "x" -> int(5)),
      Map("s" -> iri(E + "order"), "x" -> int(5))))
  }

  it should "support negated property sets" in {
    val q = prologue + "SELECT * \n{  ?s !:item ?x . }"
    check("property_paths.ttl", q, Seq(
      Map("s" -> iri(E + "z1"), "x" -> str("Small")),
      Map("s" -> iri(E + "z1"), "x" -> int(5)),
      Map("s" -> iri(E + "z2"), "x" -> str("Large")),
      Map("s" -> iri(E + "z2"), "x" -> int(5))))
  }

  it should "support alternative paths" in {
    val q = prologue + "SELECT * \n{  ?s (:item | :price) ?x . }"
    check("property_paths.ttl", q, Seq(
      Map("s" -> iri(E + "order"), "x" -> iri(E + "z1")),
      Map("s" -> iri(E + "order"), "x" -> iri(E + "z2")),
      Map("s" -> iri(E + "z1"), "x" -> int(5)),
      Map("s" -> iri(E + "z2"), "x" -> int(5))))
  }

  it should "support zero-or-one paths" in {
    val q = prologue + "SELECT * \n{  ?s :item/:price? ?x . }"
    check("property_paths.ttl", q, Seq(
      Map("s" -> iri(E + "order"), "x" -> iri(E + "z1")),
      Map("s" -> iri(E + "order"), "x" -> int(5)),
      Map("s" -> iri(E + "order"), "x" -> iri(E + "z2")),
      Map("s" -> iri(E + "order"), "x" -> int(5))))
  }

  it should "support inverse paths" in {
    val q = prologue + "SELECT * { ?x ^:item ?s . }"
    check("property_paths.ttl", q, Seq(
      Map("s" -> iri(E + "order"), "x" -> iri(E + "z1")),
      Map("s" -> iri(E + "order"), "x" -> iri(E + "z2"))))
  }

  // ----- transitive closure (beyond the reference) -----
  private lazy val chain = QuadsIO.fromQuads(spark, Seq(
    Quad(Iri(E + "a"), Iri(E + "next"), Iri(E + "b"), None),
    Quad(Iri(E + "b"), Iri(E + "next"), Iri(E + "c"), None),
    Quad(Iri(E + "c"), Iri(E + "next"), Iri(E + "d"), None)))

  it should "evaluate OneOrMore (+) via iterative closure" in {
    val rows = collect(chain.sparql(prologue + "SELECT * { ?s :next+ ?o }"))
    val pairs = rows.map(r => (r("s"), r("o"))).toSet
    pairs shouldBe Set(
      (iri(E + "a"), iri(E + "b")), (iri(E + "a"), iri(E + "c")),
      (iri(E + "a"), iri(E + "d")), (iri(E + "b"), iri(E + "c")),
      (iri(E + "b"), iri(E + "d")), (iri(E + "c"), iri(E + "d")))
  }

  it should "evaluate ZeroOrMore (*) from a constant start" in {
    val rows = collect(chain.sparql(prologue + "SELECT ?o { :a :next* ?o }"))
    rows.map(_("o")).toSet shouldBe Set(
      iri(E + "a"), iri(E + "b"), iri(E + "c"), iri(E + "d"))
  }

  it should "evaluate + with both endpoints constant" in {
    val rows = collect(chain.sparql(
      prologue + "SELECT (1 AS ?ok) { :a :next+ ?end . FILTER(?end = :d) }"))
    rows should have size 1
  }

  it should "walk backward from a constant OBJECT (multi-hop predecessors)" in {
    val rows = collect(chain.sparql(prologue + "SELECT ?x { ?x :next+ :d }"))
    rows.map(_("x")).toSet shouldBe Set(iri(E + "a"), iri(E + "b"), iri(E + "c"))
    val star = collect(chain.sparql(prologue + "SELECT ?x { ?x :next* :d }"))
    star.map(_("x")).toSet shouldBe Set(
      iri(E + "a"), iri(E + "b"), iri(E + "c"), iri(E + "d"))
  }

  it should "keep transitive closure inside one named graph under GRAPH ?g" in {
    val g1 = Iri("urn:g1"); val g2 = Iri("urn:g2")
    val quads = QuadsIO.fromQuads(spark, Seq(
      Quad(Iri(E + "x"), Iri(E + "next"), Iri(E + "y"), Some(g1)),
      Quad(Iri(E + "y"), Iri(E + "next"), Iri(E + "z"), Some(g2))))
    val rows = collect(quads.sparql(
      prologue + "SELECT ?g ?a ?b { GRAPH ?g { ?a :next+ ?b } }"))
    // no cross-graph pair (x,z); each pair carries its graph
    rows.map(r => (r("g"), r("a"), r("b"))).toSet shouldBe Set(
      (g1: graft.rdf.Term, iri(E + "x"), iri(E + "y")),
      (g2: graft.rdf.Term, iri(E + "y"), iri(E + "z")))
  }
}
