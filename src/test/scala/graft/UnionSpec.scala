package graft

/** UNION — ports reference UnionTest.scala. */
class UnionSpec extends SparqlSpecBase {
  private val prologue =
    """PREFIX dc10:  <http://purl.org/dc/elements/1.0/>
      |PREFIX dc11:  <http://purl.org/dc/elements/1.1/>
      |""".stripMargin

  "UNION" should "merge single-var branches" in {
    val q = prologue +
      """SELECT ?title
        |WHERE  { { ?book dc10:title  ?title } UNION { ?book dc11:title  ?title } }""".stripMargin
    check("union.ttl", q, Seq(
      Map("title" -> str("SPARQL Query Language Tutorial")),
      Map("title" -> str("SPARQL Protocol Tutorial")),
      Map("title" -> str("SPARQL")),
      Map("title" -> str("SPARQL (updated)"))))
  }

  it should "leave non-branch variables unbound (disjoint output vars)" in {
    val q = prologue +
      """SELECT ?x ?y
        |WHERE  { { ?book dc10:title ?x } UNION { ?book dc11:title  ?y } }""".stripMargin
    check("union.ttl", q, Seq(
      Map("x" -> str("SPARQL Query Language Tutorial")),
      Map("x" -> str("SPARQL")),
      Map("y" -> str("SPARQL Protocol Tutorial")),
      Map("y" -> str("SPARQL (updated)"))))
  }

  it should "join inside each branch" in {
    val q = prologue +
      """SELECT ?title ?author
        |WHERE  { { ?book dc10:title ?title .  ?book dc10:creator ?author }
        |         UNION
        |         { ?book dc11:title ?title .  ?book dc11:creator ?author }
        |       }""".stripMargin
    check("union.ttl", q, Seq(
      Map("title" -> str("SPARQL Query Language Tutorial"), "author" -> str("Alice")),
      Map("title" -> str("SPARQL Protocol Tutorial"), "author" -> str("Bob"))))
  }
}
