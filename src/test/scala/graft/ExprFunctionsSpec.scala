package graft

import graft.io.QuadsIO
import graft.rdf._
import graft.sparql.Sparql._

/** SPARQL builtin function library over term structs (SURVEY.md §2.2).
  * One tiny fixture, one query per function family; expectations are
  * SPARQL 1.1 §17 semantics. */
class ExprFunctionsSpec extends SparqlSpecBase {
  private val E = "urn:t:"
  private lazy val quads = QuadsIO.fromQuads(spark, Seq(
    Quad(Iri(E + "s1"), Iri(E + "str"), Lit("Hello World"), None),
    Quad(Iri(E + "s1"), Iri(E + "num"), Lit("42", XSD.integer), None),
    Quad(Iri(E + "s1"), Iri(E + "dec"), Lit("3.5", XSD.decimal), None),
    Quad(Iri(E + "s1"), Iri(E + "lang"), Lit("chat", lang = "en"), None),
    Quad(Iri(E + "s1"), Iri(E + "when"), Lit("2020-06-15T10:30:45", XSD.dateTime), None),
    Quad(Iri(E + "s2"), Iri(E + "str"), Lit("bye"), None),
    Quad(Iri(E + "s2"), Iri(E + "num"), Lit("7", XSD.integer), None),
    Quad(Iri(E + "s2"), Iri(E + "bn"), BNode("x"), None)))

  private val P = s"PREFIX : <$E>\n"

  private def one(q: String): Binding = {
    val rows = collect(quads.sparql(P + q))
    rows should have size 1
    rows.head
  }

  "string builtins" should "STRLEN / UCASE / LCASE / SUBSTR / CONCAT" in {
    val r = one(
      """SELECT ?len ?up ?low ?sub ?cat { :s1 :str ?v .
        |  BIND(STRLEN(?v) AS ?len) BIND(UCASE(?v) AS ?up)
        |  BIND(LCASE(?v) AS ?low) BIND(SUBSTR(?v, 7) AS ?sub)
        |  BIND(CONCAT(?v, "!") AS ?cat) }""".stripMargin)
    r("len") shouldBe int(11)
    r("up") shouldBe str("HELLO WORLD")
    r("low") shouldBe str("hello world")
    r("sub") shouldBe str("World")
    r("cat") shouldBe str("Hello World!")
  }

  it should "STRBEFORE / STRAFTER / CONTAINS / REPLACE / ENCODE_FOR_URI" in {
    val r = one(
      """SELECT ?b ?a ?rep ?enc { :s1 :str ?v .
        |  BIND(STRBEFORE(?v, " ") AS ?b) BIND(STRAFTER(?v, " ") AS ?a)
        |  BIND(REPLACE(?v, "o", "0") AS ?rep)
        |  BIND(ENCODE_FOR_URI(?v) AS ?enc) }""".stripMargin)
    r("b") shouldBe str("Hello")
    r("a") shouldBe str("World")
    r("rep") shouldBe str("Hell0 W0rld")
    r("enc") shouldBe str("Hello%20World")
  }

  it should "REGEX with flags" in {
    check("values.ttl",
      """PREFIX dc: <http://purl.org/dc/elements/1.1/>
        |SELECT ?t { ?b dc:title ?t . FILTER(REGEX(?t, "^sparql tutorial$", "i")) }""".stripMargin,
      Seq(Map("t" -> str("SPARQL Tutorial"))))
  }

  "term builtins" should "STR / LANG / DATATYPE / IRI / STRDT / STRLANG" in {
    val r = one(
      """SELECT ?s ?lg ?dt ?iri ?sd ?sl { :s1 :lang ?v . :s1 :num ?n .
        |  BIND(STR(?v) AS ?s) BIND(LANG(?v) AS ?lg) BIND(DATATYPE(?n) AS ?dt)
        |  BIND(IRI("urn:t:x") AS ?iri)
        |  BIND(STRDT("5", <http://www.w3.org/2001/XMLSchema#integer>) AS ?sd)
        |  BIND(STRLANG("hi", "EN") AS ?sl) }""".stripMargin)
    r("s") shouldBe str("chat")
    r("lg") shouldBe str("en")
    r("dt") shouldBe iri(XSD.integer)
    r("iri") shouldBe iri("urn:t:x")
    r("sd") shouldBe int(5)
    r("sl") shouldBe Lit("hi", lang = "en")
  }

  it should "isIRI / isBlank / isLiteral / isNumeric / BOUND / sameTerm" in {
    val rows = collect(quads.sparql(P +
      """SELECT ?s ?v ?isi ?isb ?isl ?isn
        |{ ?s :bn ?v .
        |  BIND(isIRI(?s) AS ?isi) BIND(isBlank(?v) AS ?isb)
        |  BIND(isLiteral(?v) AS ?isl) BIND(isNumeric(?v) AS ?isn) }""".stripMargin))
    rows should have size 1
    rows.head("isi") shouldBe Lit("true", XSD.boolean)
    rows.head("isb") shouldBe Lit("true", XSD.boolean)
    rows.head("isl") shouldBe Lit("false", XSD.boolean)
    rows.head("isn") shouldBe Lit("false", XSD.boolean)
  }

  "numeric builtins" should "ABS / CEIL / FLOOR / ROUND with type preservation" in {
    val r = one(
      """SELECT ?a ?c ?f ?r { :s1 :dec ?v .
        |  BIND(ABS(-1 * ?v) AS ?a) BIND(CEIL(?v) AS ?c)
        |  BIND(FLOOR(?v) AS ?f) BIND(ROUND(?v) AS ?r) }""".stripMargin)
    r("a") shouldBe dec("3.5")
    r("c") shouldBe dec("4")
    r("f") shouldBe dec("3")
    r("r") shouldBe dec("4")
  }

  it should "apply numeric promotion in arithmetic" in {
    val r = one(
      """SELECT ?x ?y { :s1 :num ?n . :s1 :dec ?d .
        |  BIND(?n + ?d AS ?x) BIND(?n / 4 AS ?y) }""".stripMargin)
    r("x") shouldBe dec("45.5") // integer + decimal → decimal
    r("y") shouldBe dec("10.5") // integer / integer → decimal
  }

  "datetime builtins" should "YEAR / MONTH / DAY / HOURS / MINUTES" in {
    val r = one(
      """SELECT ?y ?m ?d ?h ?mi { :s1 :when ?t .
        |  BIND(YEAR(?t) AS ?y) BIND(MONTH(?t) AS ?m) BIND(DAY(?t) AS ?d)
        |  BIND(HOURS(?t) AS ?h) BIND(MINUTES(?t) AS ?mi) }""".stripMargin)
    r("y") shouldBe int(2020)
    r("m") shouldBe int(6)
    r("d") shouldBe int(15)
    r("h") shouldBe int(10)
    r("mi") shouldBe int(30)
  }

  it should "TIMEZONE / TZ per SPARQL §17.4.5.8" in {
    val d = "http://www.w3.org/2001/XMLSchema#dayTimeDuration"
    def tzOf(litv: String): Option[Term] = {
      val r = collect(quads.sparql(P +
        s"""SELECT ?z { :s1 :num ?n . FILTER(?n = 42)
           |  BIND(TIMEZONE("$litv"^^<http://www.w3.org/2001/XMLSchema#dateTime>) AS ?z) }"""
          .stripMargin))
      r.head.get("z")
    }
    tzOf("2011-01-10T14:45:13.815-05:00") shouldBe Some(Lit("-PT5H", d))
    tzOf("2011-01-10T14:45:13Z") shouldBe Some(Lit("PT0S", d))
    tzOf("2011-01-10T14:45:13+05:30") shouldBe Some(Lit("PT5H30M", d))
    tzOf("2011-01-10T14:45:13-00:30") shouldBe Some(Lit("-PT30M", d))
    tzOf("2011-01-10T14:45:13+00:00") shouldBe Some(Lit("PT0S", d))
    tzOf("2011-01-10T14:45:13") shouldBe None // no timezone → error → unbound
  }

  "hash builtins" should "MD5 / SHA1 / SHA256" in {
    val r = one(
      """SELECT ?m ?s1x ?s256 { :s2 :str ?v .
        |  BIND(MD5(?v) AS ?m) BIND(SHA1(?v) AS ?s1x) BIND(SHA256(?v) AS ?s256) }""".stripMargin)
    r("m") shouldBe str("bfa99df33b137bc8fb5f5407d7e58da8")
    r("s1x") shouldBe str("78c9a53e2f28b543ea62c8266acfdf36d5c63e61")
    r("s256") shouldBe str(
      "b49f425a7e1f9cff3856329ada223f2f9d368f15a00cf48df16ca95986137fe8")
  }

  "conditionals" should "IF / COALESCE / IN / NOT IN" in {
    val rows = collect(quads.sparql(P +
      """SELECT ?s ?t ?c ?i
        |{ ?s :num ?n .
        |  BIND(IF(?n > 10, "big", "small") AS ?t)
        |  BIND(COALESCE(?missing, ?n) AS ?c)
        |  BIND(?n IN (7, 13) AS ?i) }""".stripMargin))
    val bySubj = rows.map(r => r("s") -> r).toMap
    bySubj(iri(E + "s1"))("t") shouldBe str("big")
    bySubj(iri(E + "s2"))("t") shouldBe str("small")
    bySubj(iri(E + "s1"))("c") shouldBe int(42)
    bySubj(iri(E + "s2"))("i") shouldBe Lit("true", XSD.boolean)
    bySubj(iri(E + "s1"))("i") shouldBe Lit("false", XSD.boolean)
  }

  "casts" should "xsd:integer / xsd:double / xsd:string / xsd:boolean" in {
    val r = one(
      """PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        |SELECT ?i ?d ?st ?b { :s1 :dec ?v . :s1 :num ?n .
        |  BIND(xsd:integer("13") AS ?i)
        |  BIND(xsd:double(?n) AS ?d)
        |  BIND(xsd:string(?n) AS ?st)
        |  BIND(xsd:boolean("true") AS ?b) }""".stripMargin)
    r("i") shouldBe int(13)
    r("d") shouldBe dbl("42.0")
    r("st") shouldBe str("42")
    r("b") shouldBe Lit("true", XSD.boolean)
  }

  "error semantics" should "drop rows on type-error filters, keep on BIND" in {
    // ?v < 10 errors for the string row → dropped; BIND error → unbound
    val rows = collect(quads.sparql(P +
      """SELECT ?s ?bad { ?s :str ?v .
        |  BIND(?v + 1 AS ?bad) }""".stripMargin))
    rows should have size 2
    rows.foreach(_.get("bad") shouldBe None)
    collect(quads.sparql(P +
      "SELECT ?s { ?s :str ?v . FILTER(?v < 10) }")) shouldBe empty
  }

  it should "treat UCASE of a language-tagged literal as language-preserving" in {
    val r = one("SELECT ?u { :s1 :lang ?v . BIND(UCASE(?v) AS ?u) }")
    r("u") shouldBe Lit("CHAT", lang = "en")
  }

  "edge cases" should "handle unary minus and negative literals" in {
    val r = one(
      """SELECT ?n ?m { :s1 :num ?v .
        |  BIND(-?v AS ?n) BIND(?v > -1 AS ?m) }""".stripMargin)
    r("n") shouldBe int(-42)
    r("m") shouldBe Lit("true", XSD.boolean)
  }

  it should "return empty for OFFSET past the end" in {
    collect(quads.sparql(P + "SELECT ?s { ?s :num ?v } OFFSET 99")) shouldBe empty
  }

  it should "evaluate zero-argument CONCAT and COALESCE" in {
    val r = one(
      """SELECT ?c ?n { :s1 :num ?v .
        |  BIND(CONCAT() AS ?c) BIND(COALESCE() AS ?n) }""".stripMargin)
    r("c") shouldBe str("")
    r.get("n") shouldBe None // COALESCE() → error → unbound
  }

  it should "reject BOUND with a non-variable argument cleanly" in {
    an[IllegalArgumentException] should be thrownBy
      quads.sparql(P + "SELECT ?s { ?s :num ?v . FILTER(BOUND(STR(?v))) }")
  }

  it should "order int64-magnitude integers exactly (no double collapse)" in {
    val big = QuadsIO.fromQuads(spark, Seq(
      Quad(Iri(E + "a"), Iri(E + "v"), Lit("9007199254740993", XSD.integer), None),
      Quad(Iri(E + "b"), Iri(E + "v"), Lit("9007199254740992", XSD.integer), None)))
    val rows = collect(big.sparql(P +
      "SELECT ?s ?x { ?s :v ?x } ORDER BY ?x"))
    rows.map(_("x")) shouldBe Seq(
      Lit("9007199254740992", XSD.integer), Lit("9007199254740993", XSD.integer))
    val m = collect(big.sparql(P + "SELECT (MIN(?x) AS ?m) { ?s :v ?x }"))
    m.head("m") shouldBe Lit("9007199254740992", XSD.integer)
  }
}
