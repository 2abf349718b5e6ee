package graft

/** Grammar robustness: tricky-but-valid query shapes must parse and
  * run (results sanity-checked where cheap). */
class ParserEdgeSpec extends SparqlSpecBase {
  private val P =
    """PREFIX dc: <http://purl.org/dc/elements/1.1/>
      |PREFIX ns: <http://example.org/ns#>
      |""".stripMargin

  "parser" should "accept comments and $-variables" in {
    val q = P +
      """SELECT $title  # projecting the title
        |{ # a comment inside the group
        |  ?b dc:title $title .  # trailing comment
        |}""".stripMargin
    run("values.ttl", q) should have size 3
  }

  it should "accept FILTER before the triples it constrains" in {
    val q = P +
      """SELECT ?t ?p { FILTER(?p > 25) ?b dc:title ?t . ?b ns:price ?p }""".stripMargin
    check("values.ttl", q, Seq(
      Map("t" -> str("SPARQL Tutorial"), "p" -> int(42))))
  }

  it should "accept OPTIONAL as the first group element" in {
    val q = P + "SELECT ?t { OPTIONAL { ?b dc:title ?t } }"
    run("values.ttl", q) should have size 3
  }

  it should "accept nested braces and unions of groups" in {
    val q = P +
      """SELECT ?t
        |{ { { ?b dc:title ?t } UNION { ?b ns:missing ?t } } }""".stripMargin
    run("values.ttl", q) should have size 3
  }

  it should "accept trailing semicolons and dots" in {
    val q = P + "SELECT ?t ?p { ?b dc:title ?t ; ns:price ?p ; . }"
    run("values.ttl", q) should have size 2
  }

  it should "accept string escapes and single-quoted literals" in {
    val q = P + """SELECT ?b { ?b dc:title 'SPARQL Tutorial' }"""
    run("values.ttl", q) should have size 1
    val q2 = P + "SELECT ?b { ?b dc:title \"SPARQL\\u0020Tutorial\" }"
    run("values.ttl", q2) should have size 1
  }

  it should "accept keyword case variations" in {
    val q = "prefix dc: <http://purl.org/dc/elements/1.1/>\n" +
      "select distinct ?t where { ?b dc:title ?t } order by ?t limit 2"
    run("values.ttl", q) should have size 2
  }

  it should "accept expressions in GROUP BY" in {
    val q = P +
      """SELECT ?band (COUNT(?b) AS ?n)
        |{ ?b ns:price ?p }
        |GROUP BY (IF(?p > 30, "high", "low") AS ?band)""".stripMargin
    val rows = run("values.ttl", q)
    rows.map(r => r("band") -> r("n")).toMap shouldBe Map(
      str("high") -> int(1), str("low") -> int(1))
  }

  it should "accept a bare FILTER builtin call without parens" in {
    val q = P + """SELECT ?t { ?b dc:title ?t FILTER REGEX(?t, "Web") }"""
    check("values.ttl", q, Seq(Map("t" -> str("The Semantic Web"))))
  }

  it should "reject malformed queries with a position-bearing error" in {
    val bad = "SELECT ?x { ?x ?p }" // missing object
    val e = intercept[IllegalArgumentException](run("values.ttl", bad))
    e.getMessage should include("SPARQL parse error")
  }

  it should "accept empty group pattern (unit)" in {
    run("values.ttl", "SELECT (42 AS ?x) { }") should have size 1
  }

  "collections in patterns" should "match list data via rdf:first/rest desugaring" in {
    import graft.io.QuadsIO
    import graft.rdf.{Iri, TurtleParser}
    import graft.sparql.Sparql._
    val quads = QuadsIO.fromQuads(spark,
      TurtleParser.parse(
        """@prefix : <urn:x:> .
          |:s :items (1 2) .
          |:t :items (1 3) .
          |""".stripMargin))
    // object-position collection: exact list structure must match
    val rows = collect(quads.sparql(
      "PREFIX : <urn:x:>\nSELECT ?s { ?s :items (1 2) }"))
    rows.map(_("s")) shouldBe Seq(Iri("urn:x:s"))
    // variable inside a collection binds the list element
    val rows2 = collect(quads.sparql(
      "PREFIX : <urn:x:>\nSELECT ?v { ?s :items (1 ?v) }"))
    rows2.map(_("v")).toSet shouldBe Set(int(2), int(3))
    // subject-position collection: the (1 2) chain head is :s's — its
    // outgoing edges are its own rdf:first/rest triples
    val rows3 = collect(quads.sparql(
      "PREFIX : <urn:x:>\nSELECT ?p ?o { (1 2) ?p ?o }"))
    rows3.map(_("p")).toSet shouldBe
      Set(Iri(graft.rdf.RDF.first), Iri(graft.rdf.RDF.rest))
  }
}
