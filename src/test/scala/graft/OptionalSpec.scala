package graft

/** OPTIONAL (LeftJoin) — ports reference OptionalTest.scala:4-27. */
class OptionalSpec extends SparqlSpecBase {

  "OPTIONAL" should "keep left rows without matches (single optional)" in {
    val q =
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |SELECT ?name ?mbox
        |WHERE  { ?x foaf:name  ?name .
        |         OPTIONAL { ?x  foaf:mbox  ?mbox }
        |       }""".stripMargin
    check("optionals.ttl", q, Seq(
      Map("name" -> str("Alice"), "mbox" -> iri("mailto:alice@example.com")),
      Map("name" -> str("Alice"), "mbox" -> iri("mailto:alice@work.example")),
      Map("name" -> str("Bob"))))
  }

  it should "support multiple optionals" in {
    val q =
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |SELECT ?name ?mbox ?hpage
        |WHERE  { ?x foaf:name  ?name .
        |         OPTIONAL { ?x foaf:mbox ?mbox } .
        |         OPTIONAL { ?x foaf:homepage ?hpage }
        |       }""".stripMargin
    check("optionals2.ttl", q, Seq(
      Map("name" -> str("Alice"), "hpage" -> iri("http://work.example.org/alice/")),
      Map("name" -> str("Bob"), "mbox" -> iri("mailto:bob@work.example"))))
  }
}
