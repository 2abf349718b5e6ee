package graft

import graft.io.QuadsIO
import graft.rdf._
import graft.sparql.Sparql._

/** Regressions for the second review round: cycle paths, EXISTS
  * normalization/placement, DISTINCT aggregate semantics, casts, BASE,
  * unknown-datatype equality, and lone bracketed subjects. */
class ReviewFixesSpec extends SparqlSpecBase {
  private val E = "urn:rf:"
  private val P = s"PREFIX : <$E>\n"

  private lazy val cyclic = QuadsIO.fromQuads(spark, Seq(
    Quad(Iri(E + "a"), Iri(E + "next"), Iri(E + "b"), None),
    Quad(Iri(E + "b"), Iri(E + "next"), Iri(E + "a"), None),
    Quad(Iri(E + "c"), Iri(E + "next"), Iri(E + "d"), None)))

  "cycle path queries" should "bind one column for ?x p+ ?x" in {
    val rows = collect(cyclic.sparql(P + "SELECT ?x { ?x :next+ ?x }"))
    rows.map(_("x")).toSet shouldBe Set(iri(E + "a"), iri(E + "b"))
  }

  "!EXISTS" should "behave exactly like NOT EXISTS" in {
    val q1 = collect(TestSpark.fixture("values.ttl").sparql(
      """PREFIX dc: <http://purl.org/dc/elements/1.1/>
        |PREFIX ns: <http://example.org/ns#>
        |SELECT ?t { ?x dc:title ?t FILTER(!EXISTS { ?x ns:price ?p }) }""".stripMargin))
    q1.map(_("t")).toSet shouldBe Set(str("Priceless SPARQL"))
  }

  "EXISTS inside an OPTIONAL condition" should "pre-filter the right side" in {
    val q =
      """PREFIX dc: <http://purl.org/dc/elements/1.1/>
        |PREFIX ns: <http://example.org/ns#>
        |SELECT ?t ?p
        |{ ?x dc:title ?t
        |  OPTIONAL { ?x ns:price ?p FILTER EXISTS { ?x dc:title ?t2 } } }""".stripMargin
    check("values.ttl", q, Seq(
      Map("t" -> str("SPARQL Tutorial"), "p" -> int(42)),
      Map("t" -> str("The Semantic Web"), "p" -> int(23)),
      Map("t" -> str("Priceless SPARQL"))))
  }

  "correlated filter under UNION inside EXISTS" should "fail loudly, not silently" in {
    val q = P +
      """SELECT ?s { ?s :p ?o FILTER EXISTS {
        |  { ?s :q ?v FILTER(?v = ?o) } UNION { ?s :r ?v FILTER(?v = ?o) } } }""".stripMargin
    an[IllegalArgumentException] should be thrownBy collect(cyclic.sparql(q))
  }

  "COUNT(DISTINCT *)" should "count distinct solutions" in {
    // two identical solutions via duplicate quads
    val dup = QuadsIO.fromQuads(spark, Seq(
      Quad(Iri(E + "a"), Iri(E + "p"), Lit("1", XSD.integer), None),
      Quad(Iri(E + "a"), Iri(E + "p"), Lit("1", XSD.integer), None),
      Quad(Iri(E + "b"), Iri(E + "p"), Lit("2", XSD.integer), None)))
    val rows = collect(dup.sparql(P +
      "SELECT (COUNT(*) AS ?n) (COUNT(DISTINCT *) AS ?d) { ?s :p ?o }"))
    rows.head("n") shouldBe int(3)
    rows.head("d") shouldBe int(2)
  }

  "SUM/AVG DISTINCT" should "dedup terms, not numeric values" in {
    val rows = collect(TestSpark.fixture("values.ttl").sparql(
      """SELECT (SUM(DISTINCT ?x) AS ?s) (AVG(DISTINCT ?x) AS ?a)
        |{ VALUES ?x { 1 1.0 1 } }""".stripMargin))
    // terms {1^^integer, 1.0^^decimal} are distinct: sum 2.0, avg 1.0
    rows.head("s") shouldBe dec("2")
    rows.head("a") shouldBe dec("1")
  }

  "xsd:integer cast" should "truncate toward zero" in {
    val rows = collect(TestSpark.fixture("values.ttl").sparql(
      """PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        |SELECT ?i ?j { BIND(xsd:integer(2.7) AS ?i)
        |               BIND(xsd:integer(-2.7) AS ?j) }""".stripMargin))
    rows.head("i") shouldBe int(2)
    rows.head("j") shouldBe int(-2)
  }

  "BASE" should "resolve relative IRIs" in {
    val data = QuadsIO.fromQuads(spark, Seq(
      Quad(Iri("http://ex/s"), Iri("http://ex/name"), Lit("v"), None)))
    val rows = collect(data.sparql(
      "BASE <http://ex/> SELECT ?o { <s> <name> ?o }"))
    rows shouldBe Seq(Map("o" -> str("v")))
  }

  "unknown-datatype equality" should "be a type error, not false" in {
    val data = QuadsIO.fromQuads(spark, Seq(
      Quad(Iri(E + "s"), Iri(E + "p"), Lit("a", E + "custom"), None),
      Quad(Iri(E + "s"), Iri(E + "q"), Lit("b", E + "custom"), None)))
    // both = and != must error → both filters drop the row
    collect(data.sparql(P +
      "SELECT ?s { ?s :p ?x . ?s :q ?y FILTER(?x != ?y) }")) shouldBe empty
    collect(data.sparql(P +
      "SELECT ?s { ?s :p ?x . ?s :q ?y FILTER(?x = ?y) }")) shouldBe empty
    // identical unknown-dt terms ARE equal
    collect(data.sparql(P +
      "SELECT ?s { ?s :p ?x FILTER(?x = ?x) }")) should have size 1
  }

  "opaque BASE (urn:)" should "concatenate instead of silently dropping" in {
    val data = QuadsIO.fromQuads(spark, Seq(
      Quad(Iri("urn:x:s"), Iri("urn:x:name"), Lit("v"), None)))
    collect(data.sparql(
      "BASE <urn:x:> SELECT ?o { <s> <name> ?o }")) shouldBe
      Seq(Map("o" -> str("v")))
  }

  "SPARQL literal escapes" should "decode \\U supplementary-plane chars" in {
    val emoji = new String(Character.toChars(0x1F600))
    val data = QuadsIO.fromQuads(spark, Seq(
      Quad(Iri(E + "s"), Iri(E + "p"), Lit(emoji), None)))
    // assemble the backslash at runtime (scalac eats \U escapes)
    val q = P + "SELECT ?s { ?s :p \"" + '\\' + "U0001F600\" }"
    collect(data.sparql(q)) should have size 1
  }

  "bracketed subject followed by FILTER" should "parse without a dot" in {
    val rows = collect(TestSpark.fixture("values.ttl").sparql(
      """PREFIX dc: <http://purl.org/dc/elements/1.1/>
        |PREFIX ns: <http://example.org/ns#>
        |SELECT ?p { [ ns:price ?p ] FILTER(?p > 30) }""".stripMargin))
    rows.map(_("p")) shouldBe Seq(int(42))
  }

  "hyphenated prefixes" should "not collide with the 'a' keyword in queries" in {
    val data = QuadsIO.fromQuads(spark, Seq(
      Quad(Iri("urn:s"), Iri("http://x/p"), Iri("urn:o"), None)))
    val rows = collect(data.sparql(
      "PREFIX a-b: <http://x/> SELECT ?s { ?s a-b:p ?o }"))
    rows shouldBe Seq(Map("s" -> iri("urn:s")))
  }

  "CONSTRUCT" should "accept the grammar-optional WHERE keyword omission" in {
    import graft.sparql.Sparql._
    val out = TestSpark.fixture("values.ttl").sparql(
      """PREFIX dc: <http://purl.org/dc/elements/1.1/>
        |CONSTRUCT { ?b <urn:p:t> "x" } { ?b dc:title ?t }""".stripMargin)
    out.count() shouldBe 3
  }

  "a lone bracketed subject" should "parse" in {
    val rows = collect(TestSpark.fixture("values.ttl").sparql(
      """PREFIX dc: <http://purl.org/dc/elements/1.1/>
        |SELECT * { [ dc:title "SPARQL Tutorial" ] . }""".stripMargin))
    rows should have size 1
  }
}
