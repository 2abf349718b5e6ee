package graft

/** Nested SELECT (sub-queries) — the reference inherits these from
  * rdf4j's algebra (Projection nodes anywhere in the tree); we parse
  * them as a full query inside a group. */
class SubquerySpec extends SparqlSpecBase {
  private val prologue =
    """PREFIX dc: <http://purl.org/dc/elements/1.1/>
      |PREFIX ns: <http://example.org/ns#>
      |""".stripMargin

  "sub-SELECT" should "join an aggregated subquery into the outer pattern" in {
    val q = prologue +
      """SELECT ?title ?maxp
        |{ ?b dc:title ?title .
        |  { SELECT (MAX(?p) AS ?maxp) { ?x ns:price ?p } }
        |}""".stripMargin
    check("values.ttl", q, Seq(
      Map("title" -> str("SPARQL Tutorial"), "maxp" -> int(42)),
      Map("title" -> str("The Semantic Web"), "maxp" -> int(42)),
      Map("title" -> str("Priceless SPARQL"), "maxp" -> int(42))))
  }

  it should "correlate on shared variables and filter against the subquery" in {
    val q = prologue +
      """SELECT ?title ?price
        |{ ?b dc:title ?title . ?b ns:price ?price .
        |  { SELECT (AVG(?p) AS ?avgp) { ?x ns:price ?p } }
        |  FILTER(?price > ?avgp)
        |}""".stripMargin
    check("values.ttl", q, Seq( // avg = 32.5; only book1 (42) exceeds it
      Map("title" -> str("SPARQL Tutorial"), "price" -> int(42))))
  }

  it should "scope inner-only variables out of the result" in {
    val q = prologue +
      """SELECT *
        |{ { SELECT ?b { ?b ns:price ?p } } }""".stripMargin
    val rows = run("values.ttl", q)
    rows should have size 2
    rows.foreach(_.keySet shouldBe Set("b"))
  }

  it should "support LIMIT inside the subquery" in {
    val q = prologue +
      """SELECT ?b
        |{ { SELECT ?b ?p { ?b ns:price ?p } ORDER BY DESC(?p) LIMIT 1 } }""".stripMargin
    check("values.ttl", q,
      Seq(Map("b" -> iri("http://example.org/book/book1"))))
  }
}
