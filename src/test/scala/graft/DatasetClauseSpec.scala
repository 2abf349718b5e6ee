package graft

import graft.io.QuadsIO
import graft.rdf._
import graft.sparql.Sparql._

/** FROM / FROM NAMED dataset clauses (SPARQL 1.1 §13.2): default-graph
  * merging, named-graph restriction, and their combinations. */
class DatasetClauseSpec extends SparqlSpecBase {
  private val E = "urn:dc:"
  private val P = s"PREFIX : <$E>\n"

  // default graph: d1; named graphs g1 (a,b), g2 (c)
  private lazy val data = QuadsIO.fromQuads(spark, Seq(
    Quad(Iri(E + "d1"), Iri(E + "p"), Lit("default"), None),
    Quad(Iri(E + "a"), Iri(E + "p"), Lit("in-g1"), Some(Iri(E + "g1"))),
    Quad(Iri(E + "b"), Iri(E + "q"), Lit("also-g1"), Some(Iri(E + "g1"))),
    Quad(Iri(E + "c"), Iri(E + "p"), Lit("in-g2"), Some(Iri(E + "g2")))))

  "FROM" should "merge the listed graphs into the default graph" in {
    val rows = collect(data.sparql(P +
      s"SELECT ?s FROM <${E}g1> { ?s :p ?o }"))
    // only g1's :p triple; the original default graph is excluded
    rows.map(_("s")) shouldBe Seq(iri(E + "a"))
  }

  it should "merge multiple graphs" in {
    val rows = collect(data.sparql(P +
      s"SELECT ?s FROM <${E}g1> FROM <${E}g2> { ?s :p ?o }"))
    rows.map(_("s")).toSet shouldBe Set(iri(E + "a"), iri(E + "c"))
  }

  it should "leave GRAPH patterns with nothing to match (no FROM NAMED)" in {
    collect(data.sparql(P +
      s"SELECT ?g ?s FROM <${E}g1> { GRAPH ?g { ?s ?p ?o } }")) shouldBe empty
  }

  "FROM NAMED" should "restrict which graphs GRAPH addresses" in {
    val rows = collect(data.sparql(P +
      s"SELECT ?g ?s FROM NAMED <${E}g2> { GRAPH ?g { ?s :p ?o } }"))
    rows.map(r => (r("g"), r("s"))) shouldBe Seq((iri(E + "g2"), iri(E + "c")))
  }

  it should "empty the default graph when no FROM is given" in {
    collect(data.sparql(P +
      s"SELECT ?s FROM NAMED <${E}g1> { ?s :p ?o }")) shouldBe empty
  }

  "FROM + FROM NAMED" should "compose" in {
    val rows = collect(data.sparql(P +
      s"""SELECT ?s ?t FROM <${E}g1> FROM NAMED <${E}g2>
         |{ ?s :p ?o . GRAPH <${E}g2> { ?t :p ?o2 } }""".stripMargin))
    rows.map(r => (r("s"), r("t"))) shouldBe Seq((iri(E + "a"), iri(E + "c")))
  }

  "no dataset clause" should "query the dataset as given" in {
    val rows = collect(data.sparql(P + "SELECT ?s { ?s :p ?o }"))
    rows.map(_("s")) shouldBe Seq(iri(E + "d1")) // default graph only
  }

  "ASK with FROM" should "see the constructed dataset" in {
    data.sparql(P + s"ASK FROM <${E}g2> { ?s :p ?o }")
      .head().getBoolean(0) shouldBe true
    data.sparql(P + s"ASK FROM NAMED <${E}g2> { ?s :p ?o }")
      .head().getBoolean(0) shouldBe false
  }

  "CONSTRUCT with FROM" should "instantiate over the constructed dataset" in {
    val out = data.sparql(P +
      s"CONSTRUCT { ?s <urn:dc:seen> \"y\" } FROM <${E}g1> WHERE { ?s ?p ?o }")
    out.count() shouldBe 2 // a and b
  }

  "DESCRIBE with explicit targets" should "accept dataset clauses" in {
    val out = data.sparql(P + s"DESCRIBE <${E}a> FROM <${E}g1>")
    out.count() shouldBe 1 // a's quad, promoted from g1
  }

  "a prefixed name with prefix NAMED" should "not be taken as the keyword" in {
    val rows = collect(data.sparql(
      s"PREFIX NAMED: <$E> SELECT ?s FROM NAMED:g1 { ?s ?p ?o }"))
    // FROM <urn:dc:g1> (default-graph merge), NOT "FROM NAMED :g1"
    rows.map(_("s")).toSet shouldBe Set(iri(E + "a"), iri(E + "b"))
  }

  it should "not mistake hyphenated NAMED-x: prefixed names for the keyword" in {
    val rows = collect(data.sparql(
      s"PREFIX NAMED-x: <$E> SELECT ?s FROM NAMED-x:g1 { ?s ?p ?o }"))
    rows.map(_("s")).toSet shouldBe Set(iri(E + "a"), iri(E + "b"))
  }

  "a sub-select" should "reject dataset clauses" in {
    an[IllegalArgumentException] should be thrownBy data.sparql(P +
      s"SELECT ?s { { SELECT ?s FROM <${E}g1> { ?s :p ?o } } }")
  }
}
