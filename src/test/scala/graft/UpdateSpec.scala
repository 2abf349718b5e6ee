package graft

import graft.io.QuadsIO
import graft.rdf._
import graft.sparql.Sparql._

/** SPARQL 1.1 Update as a pure quad-table transform (capability
  * extension — the reference is read-only). */
class UpdateSpec extends SparqlSpecBase {
  private val E = "urn:t:"
  private val P = s"PREFIX : <$E>\n"

  private def base = QuadsIO.fromQuads(spark, Seq(
    Quad(Iri(E + "a"), Iri(E + "p"), Lit("1", XSD.integer), None),
    Quad(Iri(E + "a"), Iri(E + "q"), Lit("x"), None),
    Quad(Iri(E + "b"), Iri(E + "p"), Lit("2", XSD.integer), None),
    Quad(Iri(E + "b"), Iri(E + "p"), Lit("2", XSD.integer), None), // duplicate
    Quad(Iri(E + "g1s"), Iri(E + "p"), Lit("g"), Some(Iri(E + "g1")))))

  private def all(df: org.apache.spark.sql.DataFrame): Seq[(Term, Term, Term, Option[Term])] =
    df.collect().toSeq.map { r =>
      (TermSchema.fromRow(r.getStruct(0)).get,
        TermSchema.fromRow(r.getStruct(1)).get,
        TermSchema.fromRow(r.getStruct(2)).get,
        TermSchema.fromRow(if (r.isNullAt(3)) null else r.getStruct(3)))
    }

  "INSERT DATA" should "add ground quads, including into named graphs" in {
    val out = base.sparqlUpdate(P +
      """INSERT DATA { :c :p 3 . GRAPH :g2 { :c :q "y" } }""")
    out.count() shouldBe 7
    val rows = all(out)
    rows should contain((Iri(E + "c"), Iri(E + "p"), Lit("3", XSD.integer), None))
    rows should contain((Iri(E + "c"), Iri(E + "q"), Lit("y"), Some(Iri(E + "g2"))))
  }

  it should "not duplicate an already-present quad" in {
    val out = base.sparqlUpdate(P + """INSERT DATA { :a :q "x" }""")
    out.count() shouldBe 5
  }

  "DELETE DATA" should "remove every copy of the matched quad" in {
    val out = base.sparqlUpdate(P + "DELETE DATA { :b :p 2 }")
    out.count() shouldBe 3 // both duplicate copies removed
  }

  "DELETE WHERE" should "use the pattern as its own template" in {
    val out = base.sparqlUpdate(P + "DELETE WHERE { ?s :p ?v }")
    // removes the default-graph :p quads; the GRAPH-scoped :p quad is
    // out of the pattern's (default-graph) scope and stays
    val rows = all(out)
    rows.filter(_._4.isEmpty).map(_._2) should not contain Iri(E + "p")
    out.count() shouldBe 1 + 1 // :a :q "x" + named-graph quad
  }

  it should "delete inside named graphs via GRAPH patterns" in {
    val out = base.sparqlUpdate(P + "DELETE WHERE { GRAPH ?g { ?s ?p ?o } }")
    out.count() shouldBe 4 // only the named-graph quad goes
  }

  "DELETE/INSERT WHERE" should "rewrite matched quads atomically" in {
    val out = base.sparqlUpdate(P +
      """DELETE { ?s :p ?v } INSERT { ?s :p2 ?v } WHERE { ?s :p ?v }""")
    val rows = all(out)
    rows should contain((Iri(E + "a"), Iri(E + "p2"), Lit("1", XSD.integer), None))
    rows should contain((Iri(E + "b"), Iri(E + "p2"), Lit("2", XSD.integer), None))
    rows.filter(_._4.isEmpty).map(_._2) should not contain Iri(E + "p")
    // :b's duplicate collapses to one inserted copy
    out.count() shouldBe 4
  }

  it should "keep a quad that is deleted and re-inserted in one request" in {
    val out = base.sparqlUpdate(P +
      """DELETE { ?s :q ?v } INSERT { ?s :q ?v } WHERE { ?s :q ?v }""")
    all(out) should contain((Iri(E + "a"), Iri(E + "q"), Lit("x"), None))
    out.count() shouldBe 5
  }

  it should "support INSERT-only with WHERE bindings" in {
    val out = base.sparqlUpdate(P +
      """INSERT { ?s :flag true } WHERE { ?s :p ?v . FILTER(?v > 1) }""")
    all(out) should contain(
      (Iri(E + "b"), Iri(E + "flag"), Lit("true", XSD.boolean), None))
    out.count() shouldBe 6
  }

  "WITH" should "scope both matching and template targets to its graph" in {
    val out = base.sparqlUpdate(P +
      """WITH :g1 DELETE { ?s :p ?v } INSERT { ?s :p2 ?v } WHERE { ?s :p ?v }""")
    val rows = all(out)
    // only g1's quad is rewritten — default-graph :p quads untouched
    rows should contain((Iri(E + "g1s"), Iri(E + "p2"), Lit("g"), Some(Iri(E + "g1"))))
    rows should contain((Iri(E + "a"), Iri(E + "p"), Lit("1", XSD.integer), None))
    rows.filter(_._4.contains(Iri(E + "g1"))).map(_._2) should not contain Iri(E + "p")
    out.count() shouldBe 5
  }

  it should "let an explicit GRAPH in the template override it" in {
    val out = base.sparqlUpdate(P +
      """WITH :g1 INSERT { GRAPH :g2 { ?s :copied true } } WHERE { ?s :p ?v }""")
    all(out) should contain(
      (Iri(E + "g1s"), Iri(E + "copied"), Lit("true", XSD.boolean), Some(Iri(E + "g2"))))
    out.count() shouldBe 6
  }

  "USING" should "override WITH for matching but not for templates" in {
    // match in the DEFAULT dataset built from g1 (USING), insert into
    // the WITH graph g3
    val out = base.sparqlUpdate(P +
      """WITH :g3 INSERT { ?s :seen true } USING :g1 WHERE { ?s :p ?v }""")
    val rows = all(out)
    rows should contain(
      (Iri(E + "g1s"), Iri(E + "seen"), Lit("true", XSD.boolean), Some(Iri(E + "g3"))))
    out.count() shouldBe 6
  }

  it should "restrict GRAPH patterns via USING NAMED" in {
    // USING NAMED :g1 with no USING: default graph for WHERE is empty,
    // GRAPH may only address g1
    val out = base.sparqlUpdate(P +
      """INSERT { ?s :fromNamed true } USING NAMED :g1
        |WHERE { GRAPH ?g { ?s ?p ?o } }""".stripMargin)
    all(out) should contain(
      (Iri(E + "g1s"), Iri(E + "fromNamed"), Lit("true", XSD.boolean), None))
    out.count() shouldBe 6
    // default-graph patterns see nothing under USING NAMED alone
    base.sparqlUpdate(P +
      """INSERT { ?s :x true } USING NAMED :g1 WHERE { ?s :p ?v }""")
      .count() shouldBe 5
  }

  "update parse errors" should "be loud" in {
    an[Exception] should be thrownBy
      base.sparqlUpdate(P + "INSERT DATA { ?s :p 1 }") // variable in DATA
    an[Exception] should be thrownBy
      base.sparqlUpdate(P + "DELETE { ?s :p ?v FILTER(?v > 1) } WHERE { ?s :p ?v }")
    an[Exception] should be thrownBy
      base.sparqlUpdate(P + "SELECT ?s { ?s ?p ?o }") // not an update
  }
}
