package graft

/** BGP scan + natural join — the flagship README query shape
  * (reference README.md:22-31; Interpreter.scala:207-258, 438-462). */
class BgpJoinSpec extends SparqlSpecBase {
  private val foaf = "http://xmlns.com/foaf/0.1/"

  "BGP join" should "run the flagship person/name/mbox query" in {
    val q =
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |SELECT ?name ?email
        |WHERE { ?person a foaf:Person .
        |        ?person foaf:name ?name .
        |        ?person foaf:mbox ?email . }""".stripMargin
    check("optionals.ttl", q, Seq(
      Map("name" -> str("Alice"), "email" -> iri("mailto:alice@example.com")),
      Map("name" -> str("Alice"), "email" -> iri("mailto:alice@work.example"))))
  }

  it should "handle ; and , abbreviated triple syntax" in {
    val q =
      s"""PREFIX foaf: <$foaf>
         |SELECT ?name ?email
         |WHERE { ?p a foaf:Person ; foaf:name ?name ; foaf:mbox ?email . }""".stripMargin
    run("optionals.ttl", q) should have size 2
  }

  it should "bind all three positions with variables" in {
    run("values.ttl", "SELECT * { ?s ?p ?o }") should have size 5
  }

  it should "filter on a constant object" in {
    val q =
      """PREFIX dc: <http://purl.org/dc/elements/1.1/>
        |SELECT ?b { ?b dc:title "SPARQL Tutorial" }""".stripMargin
    check("values.ttl", q, Seq(Map("b" -> iri("http://example.org/book/book1"))))
  }

  it should "handle repeated variables in one pattern" in {
    // no triple has s == o in values.ttl
    run("values.ttl", "SELECT * { ?x ?p ?x }") shouldBe empty
  }

  it should "produce bag (not set) semantics across joins" in {
    // two mbox rows for Alice joined through the same person
    val q =
      s"""PREFIX foaf: <$foaf>
         |SELECT ?name { ?p foaf:name ?name . ?p foaf:mbox ?m . }""".stripMargin
    check("optionals.ttl", q, Seq(
      Map("name" -> str("Alice")), Map("name" -> str("Alice"))))
  }
}
