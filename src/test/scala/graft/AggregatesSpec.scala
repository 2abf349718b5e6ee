package graft

import graft.rdf.{Lit, Term, XSD}

/** GROUP BY + the 7 aggregates with SPARQL error-poisoning — ports
  * reference AggregatesTest.scala against group_by.ttl / sample.ttl.
  * The :y group contains a blank node, so SUM/AVG must come back
  * unbound for it while MIN picks the BNode (lowest in the total
  * order) — the semantics rdf4j's ValueComparator gives the reference. */
class AggregatesSpec extends SparqlSpecBase {
  private val books = "PREFIX : <http://books.example/>\n"
  private val data = "PREFIX : <http://example.com/data/#>\n"
  private val D = "http://example.com/data/#"

  "GROUP BY" should "SUM over a join (books)" in {
    val q = books +
      """SELECT ?org (SUM(?lprice) AS ?totalPrice)
        |WHERE {
        |  ?org :affiliates ?auth .
        |  ?auth :writesBook ?book .
        |  ?book :price ?lprice .
        |}
        |GROUP BY ?org""".stripMargin
    check("group_by.ttl", q, Seq(
      Map("org" -> iri("http://books.example/org1"), "totalPrice" -> int(21)),
      Map("org" -> iri("http://books.example/org2"), "totalPrice" -> int(7))))
  }

  it should "COUNT per group" in {
    val q = books +
      """SELECT ?auth (COUNT(?book) AS ?numBooks)
        |WHERE { ?auth :writesBook ?book . } GROUP BY ?auth""".stripMargin
    check("group_by.ttl", q, Seq(
      Map("auth" -> iri("http://books.example/auth1"), "numBooks" -> int(2)),
      Map("auth" -> iri("http://books.example/auth2"), "numBooks" -> int(1)),
      Map("auth" -> iri("http://books.example/auth3"), "numBooks" -> int(1))))
  }

  it should "MIN across mixed terms (BNode < literals)" in {
    val q = data +
      """SELECT ?g (MIN(?p) AS ?min)
        |WHERE { ?g :p ?p . } GROUP BY ?g""".stripMargin
    check("group_by.ttl", q, Seq(
      Map("g" -> iri(D + "x"), "min" -> int(1)),
      Map("g" -> iri(D + "y"), "min" -> bn("b2")),
      Map("g" -> iri(D + "z"), "min" -> dec("1.0")),
      Map("g" -> iri(D + "w"), "min" -> int(1))))
  }

  it should "propagate errors through MIN(?y)*2 (BNode arithmetic → unbound)" in {
    val q = data +
      """SELECT ?x (MIN(?y) * 2 AS ?min)
        |WHERE { ?x :p ?y . } GROUP BY ?x""".stripMargin
    check("group_by.ttl", q, Seq(
      Map("x" -> iri(D + "x"), "min" -> int(2)),
      Map("x" -> iri(D + "y")), // BNode * 2 → error → unbound
      Map("x" -> iri(D + "z"), "min" -> dec("2.0")),
      Map("x" -> iri(D + "w"), "min" -> int(2))))
  }

  it should "poison SUM when the group contains a non-numeric term" in {
    val q = data +
      """SELECT ?x (SUM(?y) * 2 AS ?sum)
        |WHERE { ?x :p ?y . } GROUP BY ?x""".stripMargin
    check("group_by.ttl", q, Seq(
      Map("x" -> iri(D + "x"), "sum" -> int(20)),
      Map("x" -> iri(D + "y")), // SUM poisoned by BNode
      Map("x" -> iri(D + "z"), "sum" -> dec("20.0")),
      Map("x" -> iri(D + "w"), "sum" -> int(12))))
  }

  it should "MAX over mixed terms (literals > BNode)" in {
    val q = data +
      """SELECT ?x (MAX(?y) * 2 AS ?max)
        |WHERE { ?x :p ?y . } GROUP BY ?x""".stripMargin
    check("group_by.ttl", q, Seq(
      Map("x" -> iri(D + "x"), "max" -> int(8)),
      Map("x" -> iri(D + "y"), "max" -> int(8)),
      Map("x" -> iri(D + "z"), "max" -> int(8)), // 4 (integer) * 2
      Map("x" -> iri(D + "w"), "max" -> int(6))))
  }

  it should "GROUP_CONCAT with separator (sorted for determinism)" in {
    val q = data +
      """SELECT ?x (GROUP_CONCAT(?y; separator=";") AS ?concat)
        |WHERE { ?x :p ?y . } GROUP BY ?x""".stripMargin
    check("group_by.ttl", q, Seq(
      Map("x" -> iri(D + "x"), "concat" -> str("1;2;3;4")),
      Map("x" -> iri(D + "y"), "concat" -> str("1;3;4;b2")),
      Map("x" -> iri(D + "z"), "concat" -> str("1.0;2.0;3.0;4")),
      Map("x" -> iri(D + "w"), "concat" -> str("1;2;3"))))
  }

  it should "AVG with xsd:decimal semantics" in {
    val q = data +
      """SELECT ?x (AVG(?y) AS ?avg)
        |WHERE { ?x :p ?y . } GROUP BY ?x""".stripMargin
    check("group_by.ttl", q, Seq(
      Map("x" -> iri(D + "x"), "avg" -> dec("2.5")),
      Map("x" -> iri(D + "y")),
      Map("x" -> iri(D + "z"), "avg" -> dec("2.5")),
      Map("x" -> iri(D + "w"), "avg" -> int(2))))
  }

  it should "apply HAVING over aggregate results (error → dropped)" in {
    val q = data +
      """SELECT ?x (MAX(?y) * 2 AS ?max)
        |WHERE { ?x :p ?y . } GROUP BY ?x HAVING(MAX(?y) < 4)""".stripMargin
    check("group_by.ttl", q, Seq(
      Map("x" -> iri(D + "w"), "max" -> int(6))))
  }

  it should "SAMPLE one value per group" in {
    val q = data +
      """SELECT ?x (SAMPLE(?y) AS ?sample)
        |WHERE { ?x :p ?y . } GROUP BY ?x""".stripMargin
    val rows = run("sample.ttl", q)
    rows should have size 2
    val byGroup = rows.map(r => r("x") -> r.get("sample")).toMap
    val xAllowed: Set[Term] = Set(int(1), int(2))
    val yAllowed: Set[Term] = Set(int(1), bn("b2"))
    byGroup(iri(D + "x")).exists(xAllowed.contains) shouldBe true
    byGroup(iri(D + "y")).exists(yAllowed.contains) shouldBe true
  }

  it should "fuse multiple aggregates into one pass" in {
    val q = data +
      """SELECT ?g (AVG(?p) AS ?avg) ((MIN(?p) + MAX(?p)) / 2 AS ?c)
        |WHERE { ?g :p ?p . }
        |GROUP BY ?g""".stripMargin
    check("group_by.ttl", q, Seq(
      Map("g" -> iri(D + "x"), "avg" -> dec("2.5"), "c" -> dec("2.5")),
      Map("g" -> iri(D + "y")), // both poisoned by the BNode
      Map("g" -> iri(D + "z"), "avg" -> dec("2.5"), "c" -> dec("2.5")),
      Map("g" -> iri(D + "w"), "avg" -> int(2), "c" -> int(2))))
  }

  it should "aggregate globally with no GROUP BY" in {
    val q = books +
      """SELECT (COUNT(?book) AS ?n) (SUM(?price) AS ?total)
        |WHERE { ?book :price ?price . }""".stripMargin
    check("group_by.ttl", q, Seq(Map("n" -> int(4), "total" -> int(28))))
  }

  it should "ORDER BY an aggregate alias for real (reference ignores it)" in {
    // mirrors NonSupportedOperationsTest.scala:4-32, where the reference
    // documents ORDER BY as a no-op; we sort for real
    val q = books +
      """SELECT ?org (SUM(?lprice) AS ?totalPrice)
        |WHERE {
        |  ?org :affiliates ?auth .
        |  ?auth :writesBook ?book .
        |  ?book :price ?lprice .
        |}
        |GROUP BY ?org
        |ORDER BY DESC(?totalPrice)""".stripMargin
    val rows = run("group_by.ttl", q)
    rows.map(_("totalPrice")) shouldBe Seq(int(21), int(7))
  }

  it should "COUNT(*) and COUNT(DISTINCT ?x)" in {
    val q = data +
      """SELECT (COUNT(*) AS ?all) (COUNT(DISTINCT ?x) AS ?groups)
        |WHERE { ?x :p ?y . }""".stripMargin
    check("group_by.ttl", q, Seq(Map("all" -> int(15), "groups" -> int(4))))
  }
}
