package graft

/** GRAPH / named graphs — ports reference GraphsTest.scala. */
class GraphsSpec extends SparqlSpecBase {
  private val g = "tag:example.org,2005-06-06:"

  "GRAPH" should "join default-graph metadata with named-graph content" in {
    val q =
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |PREFIX dc:   <http://purl.org/dc/elements/1.1/>
        |
        |SELECT ?name ?mbox ?date
        |WHERE
        |  {  ?g dc:publisher ?name ;
        |        dc:date ?date .
        |    GRAPH ?g
        |      { ?person foaf:name ?name ; foaf:mbox ?mbox }
        |  }""".stripMargin
    check("graphs.trig", q, Seq(
      Map("name" -> str("Bob"), "mbox" -> iri("mailto:bob@oldcorp.example.org"),
        "date" -> date("2004-12-06")),
      Map("name" -> str("Bob"), "mbox" -> iri("mailto:bob@newcorp.example.org"),
        "date" -> date("2005-01-10"))))
  }

  it should "combine VALUES with constant named graphs" in {
    val q =
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |PREFIX dc:   <http://purl.org/dc/elements/1.1/>
        |prefix g:  <tag:example.org,2005-06-06:>
        |
        |SELECT ?item ?otherItem ?name ?type
        |WHERE
        |  {
        |    VALUES ?type { g:class g:otherClass g:noClass }
        |    GRAPH <tag:graph3> {
        |       ?item g:in ?otherItem .
        |    }
        |    GRAPH <tag:graph4> {
        |        ?otherItem foaf:name ?name ;
        |                     a ?type .
        |    }
        |  }""".stripMargin
    check("graphs.trig", q, Seq(
      Map("item" -> iri(g + "item1"), "otherItem" -> iri(g + "otherItem"),
        "name" -> str("Test"), "type" -> iri(g + "class"))))
  }

  it should "bind the graph variable" in {
    val q =
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |SELECT DISTINCT ?g
        |WHERE { GRAPH ?g { ?s foaf:name ?n } }""".stripMargin
    val rows = run("graphs.trig", q)
    rows.map(_("g")).toSet shouldBe Set(
      iri(g + "graph1"), iri(g + "graph2"), iri("tag:graph4"))
  }
}
