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

  it should "evaluate left-referencing conditions on the merged row" in {
    // The reference pre-filters the RIGHT side only (Interpreter.scala:
    // 467-479) and cannot evaluate this; spec semantics are
    // LeftJoin(A, P, C) with C over the merged row.
    val q =
      """PREFIX  dc:  <http://purl.org/dc/elements/1.1/>
        |PREFIX  ns:  <http://example.org/ns#>
        |SELECT ?title ?price
        |WHERE { ?x dc:title ?title .
        |        OPTIONAL { ?x ns:price ?price .
        |                   FILTER(?price < 30 && STRSTARTS(?title, "The")) } }""".stripMargin
    check("values.ttl", q, Seq(
      Map("title" -> str("SPARQL Tutorial")), // 42 fails price cond
      Map("title" -> str("The Semantic Web"), "price" -> int(23)),
      Map("title" -> str("Priceless SPARQL")))) // no price triple
  }

  it should "support nested OPTIONAL" in {
    val q =
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |SELECT ?name ?mbox ?hpage
        |WHERE { ?x foaf:name ?name .
        |        OPTIONAL { ?x foaf:mbox ?mbox
        |                   OPTIONAL { ?x foaf:homepage ?hpage } } }""".stripMargin
    check("optionals2.ttl", q, Seq(
      Map("name" -> str("Alice")), // no mbox → inner optional never fires
      Map("name" -> str("Bob"), "mbox" -> iri("mailto:bob@work.example"))))
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
