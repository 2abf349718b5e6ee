package graft

import graft.io.QuadsIO
import graft.rdf._
import graft.sparql.Sparql._

/** Regression guard for Spark 4 ANSI-mode cast behavior.
  *
  * RDF permits ill-typed literals ("abc"^^xsd:integer is valid RDF 1.1,
  * §3.3 — a literal's datatype does not constrain its lexical form), and
  * SPARQL 1.1 §17 maps every expression error to "unbound", never to a
  * job failure. Under Spark 4's default ANSI mode a plain `cast` throws
  * CAST_INVALID_INPUT, so every lexical→value conversion in the engine
  * must use try_cast. These specs plant dirty literals and assert the
  * error-as-NULL contract holds end to end.
  */
class AnsiRobustnessSpec extends SparqlSpecBase {
  private val E = "urn:t:"
  private val P = s"PREFIX : <$E>\nPREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n"

  // s1 clean, s2 carries an ill-typed integer, s3 a huge double
  private lazy val quads = QuadsIO.fromQuads(spark, Seq(
    Quad(Iri(E + "s1"), Iri(E + "num"), Lit("10", XSD.integer), None),
    Quad(Iri(E + "s1"), Iri(E + "name"), Lit("alpha"), None),
    Quad(Iri(E + "s2"), Iri(E + "num"), Lit("abc", XSD.integer), None),
    Quad(Iri(E + "s2"), Iri(E + "name"), Lit("beta"), None),
    Quad(Iri(E + "s3"), Iri(E + "num"), Lit("1e300", XSD.double), None),
    Quad(Iri(E + "s3"), Iri(E + "name"), Lit("gamma"), None)))

  private def q(body: String) = collect(quads.sparql(P + body))

  "ill-typed numeric literals" should "drop from numeric filters instead of crashing" in {
    val rows = q("SELECT ?s { ?s :num ?n . FILTER(?n > 5) }")
    rows.map(_("s")) should contain theSameElementsAs
      Seq(iri(E + "s1"), iri(E + "s3"))
  }

  it should "leave arithmetic BINDs unbound" in {
    val rows = q("SELECT ?s ?d { ?s :num ?n . BIND(?n * 2 AS ?d) }")
    val bySubj = rows.map(r => r("s") -> r.get("d")).toMap
    bySubj(iri(E + "s1")) shouldBe Some(int(20))
    bySubj(iri(E + "s2")) shouldBe None // "abc"^^xsd:integer → error → unbound
  }

  it should "poison SUM but not COUNT" in {
    val r = q("SELECT (SUM(?n) AS ?t) (COUNT(?n) AS ?c) { ?s :num ?n }").head
    r.get("t") shouldBe None // group contains a non-numeric value → error
    r("c") shouldBe int(3)
  }

  it should "have EBV false (not an error, not a crash)" in {
    // §17.2.2 rule 1: numeric literal with invalid lexical form → EBV false
    val rows = q("SELECT ?s { ?s :num ?n . FILTER(?n) }")
    rows.map(_("s")) should contain theSameElementsAs
      Seq(iri(E + "s1"), iri(E + "s3"))
  }

  "xsd constructor casts over junk strings" should "yield unbound, not crash" in {
    val r = q(
      """SELECT ?d ?f ?ts ?dt { ?s :name ?v . FILTER(?v = "alpha")
        |  BIND(xsd:decimal(?v) AS ?d) BIND(xsd:double(?v) AS ?f)
        |  BIND(xsd:dateTime(?v) AS ?ts) BIND(xsd:date(?v) AS ?dt) }""".stripMargin).head
    r.get("d") shouldBe None
    r.get("f") shouldBe None
    r.get("ts") shouldBe None
    r.get("dt") shouldBe None
  }

  it should "yield unbound for integer strings overflowing decimal range" in {
    val big = "9" * 40 // passes the digits rlike, overflows DECIMAL(38,12)
    val r = q(s"""SELECT ?i { ?s :name ?v . FILTER(?v = "alpha")
                 |  BIND(xsd:integer("$big") AS ?i) }""".stripMargin).head
    r.get("i") shouldBe None
  }

  "integer arithmetic beyond the decimal result range" should "yield unbound, not a wrong value" in {
    // decimal(38,6) holds 32 integer digits — a 34-digit product must
    // error→unbound like the Column form it replaced, not succeed
    val big = "9" * 17
    val r = q(s"""SELECT ?x { ?s :name ?v . FILTER(?v = "alpha")
                 |  BIND(xsd:integer("$big") * xsd:integer("$big") AS ?x) }""".stripMargin).head
    r.get("x") shouldBe None
  }

  "ORDER BY over out-of-decimal-range doubles" should "saturate, not crash" in {
    val rows = q("SELECT ?s ?n { ?s :num ?n . FILTER(isNumeric(?n) && datatype(?n) != xsd:integer || ?n > 0) } ORDER BY ?n LIMIT 3")
    // must simply complete; 1e300 sorts after 10
    rows.map(_("s")).indexOf(iri(E + "s3")) should be > rows.map(_("s")).indexOf(iri(E + "s1"))
  }

  "ungrouped SUM DISTINCT over an empty match" should "return one row with SUM=0" in {
    val rows = q("""SELECT (SUM(DISTINCT ?n) AS ?t) { ?s :missing ?n }""")
    rows should have size 1
    rows.head("t") shouldBe int(0)
  }
}
