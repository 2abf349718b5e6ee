package graft

import graft.rdf._
import graft.sparql.Sparql
import graft.sparql.Sparql._
import org.apache.spark.sql.functions.col

/** Regressions for the round-6 conformance review of the sparql
  * package: preBind scope, DESCRIBE *, grouped-projection errors,
  * SUBSTR XPath semantics, INSERT DATA blank nodes, LIMIT/OFFSET
  * beyond Int, CONSTRUCT WHERE shorthand, REGEX/REPLACE
  * error-as-NULL. */
class SparqlConformanceFixesSpec extends SparqlSpecBase {

  // ----- preBind scope -----
  "preBind" should "inject into the WHERE group of a CONSTRUCT, not the template" in {
    val fx = TestSpark.fixture("optionals.ttl")
    val df = fx.sparql(
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |CONSTRUCT { ?x <urn:hasName> ?n } WHERE { ?x foaf:name ?n }""".stripMargin,
      Map("n" -> Lit("Alice")))
    val rows = df.select(col("o.lex")).collect().map(_.getString(0)).toSet
    rows shouldBe Set("Alice")
  }

  it should "skip an EXISTS group in the SELECT clause" in {
    val q = """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
              |SELECT (EXISTS{?x foaf:name ?n} AS ?e) WHERE { ?x foaf:name ?n }""".stripMargin
    // the injection point must be the WHERE group's brace (after the
    // keyword), not the EXISTS group inside the parenthesized select
    val idx = Sparql.whereGroupBrace(q)
    q.substring(idx - 7, idx + 1).toUpperCase should include("WHERE")
  }

  it should "ignore braces inside strings, IRIs and comments" in {
    val q = "PREFIX ex: <urn:x{y> # note { in comment\n" +
      "SELECT ?s WHERE { ?s ex:p \"{literal\" }"
    val idx = Sparql.whereGroupBrace(q)
    q.charAt(idx) shouldBe '{'
    q.substring(idx).startsWith("{ ?s") shouldBe true
  }

  // ----- DESCRIBE * -----
  "DESCRIBE *" should "not describe parser-generated path midpoints" in {
    val fx = TestSpark.fixture("optionals.ttl")
    // path desugars through an _anon midpoint; DESCRIBE * must
    // describe only ?x and ?m — identical to naming them explicitly
    val star = fx.sparql(
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |DESCRIBE * WHERE { ?x foaf:knows/foaf:mbox ?m }""".stripMargin)
    val named = fx.sparql(
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |DESCRIBE ?x ?m WHERE { ?x foaf:knows/foaf:mbox ?m }""".stripMargin)
    collect(star).toSet shouldBe collect(named).toSet
  }

  // ----- grouped projection validation -----
  "grouped projection" should "reject a variable that is neither key nor aggregate" in {
    val fx = TestSpark.fixture("optionals.ttl")
    an[Exception] should be thrownBy fx.sparql(
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |SELECT ?n (COUNT(*) AS ?c)
        |WHERE { ?x foaf:name ?n . ?x foaf:mbox ?m } GROUP BY ?m""".stripMargin)
  }

  it should "accept keys, aggregates, and expressions over them" in {
    val fx = TestSpark.fixture("optionals.ttl")
    val df = fx.sparql(
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |SELECT ?n (COUNT(*) AS ?c) (STRLEN(?n) AS ?l)
        |WHERE { ?x foaf:name ?n } GROUP BY ?n""".stripMargin)
    df.count() should be > 0L
  }

  // ----- SUBSTR XPath semantics -----
  "SUBSTR" should "follow fn:substring for start < 1 and rounding" in {
    val fx = TestSpark.fixture("optionals.ttl")
    def sub(args: String): String =
      fx.sparql(s"""SELECT ?r { BIND(SUBSTR("abc", $args) AS ?r) } LIMIT 1""")
        .select(col("r.lex")).head().getString(0)
    sub("0, 2") shouldBe "a"   // positions p: 0 <= p < 2 ∩ [1,3] = {1}
    sub("-1, 3") shouldBe "a"  // p: -1 <= p < 2 ∩ [1,3] = {1}
    sub("1.5, 1") shouldBe "b" // round(1.5) = 2
    sub("2") shouldBe "bc"     // two-arg form: to end
    sub("0") shouldBe "abc"    // start < 1, no len: whole string
  }

  // ----- INSERT DATA blank nodes -----
  "INSERT DATA" should "mint fresh blank nodes (§3.1.1)" in {
    val fx = TestSpark.fixture("optionals.ttl")
    val out = fx.sparqlUpdate(
      """INSERT DATA { _:b <urn:p:name> "x" . _:b <urn:p:age> "3" }""")
    val subs = out.filter(col("p.lex") === "urn:p:name" ||
        col("p.lex") === "urn:p:age")
      .select(col("s.kind"), col("s.lex")).collect()
    subs should have length 2
    subs.foreach(_.getInt(0) shouldBe TermKind.BNODE)
    subs.map(_.getString(1)).distinct should have length 1 // same _:b
  }

  it should "still reject blank nodes in DELETE DATA" in {
    val fx = TestSpark.fixture("optionals.ttl")
    an[Exception] should be thrownBy fx.sparqlUpdate(
      """DELETE DATA { _:b <urn:p:name> "x" }""")
  }

  // ----- LIMIT/OFFSET beyond Int -----
  "LIMIT" should "clamp beyond Int.MaxValue instead of wrapping" in {
    val fx = TestSpark.fixture("optionals.ttl")
    val n = fx.sparql(
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |SELECT ?n { ?x foaf:name ?n }""".stripMargin).count()
    // 2^32 + 5 used to wrap to limit(5)
    fx.sparql(
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |SELECT ?n { ?x foaf:name ?n } LIMIT 4294967301""".stripMargin)
      .count() shouldBe n
    an[Exception] should be thrownBy fx.sparql(
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |SELECT ?n { ?x foaf:name ?n } OFFSET 4294967301""".stripMargin)
  }

  // ----- CONSTRUCT WHERE shorthand -----
  "CONSTRUCT WHERE" should "parse the grammar's second alternative" in {
    val fx = TestSpark.fixture("optionals.ttl")
    val short = fx.sparql(
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |CONSTRUCT WHERE { ?x foaf:name ?n }""".stripMargin)
    val full = fx.sparql(
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |CONSTRUCT { ?x foaf:name ?n } WHERE { ?x foaf:name ?n }""".stripMargin)
    short.count() shouldBe full.count()
    short.exceptAll(full).count() shouldBe 0
  }

  // ----- REGEX/REPLACE error-as-NULL -----
  "REGEX" should "treat an invalid pattern as an expression error (row dropped), not a crash" in {
    val fx = TestSpark.fixture("optionals.ttl")
    fx.sparql(
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |SELECT ?n { ?x foaf:name ?n FILTER REGEX(?n, "(") }""".stripMargin)
      .count() shouldBe 0L
  }

  it should "reject an unsupported flag as an error, not inject it into the pattern" in {
    val fx = TestSpark.fixture("optionals.ttl")
    fx.sparql(
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |SELECT ?n { ?x foaf:name ?n FILTER REGEX(?n, "A", "z") }""".stripMargin)
      .count() shouldBe 0L
  }

  it should "support the XPath q (literal) flag" in {
    val fx = TestSpark.fixture("optionals.ttl")
    // "." with q matches only a literal dot — no name contains one
    val dotLit = fx.sparql(
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |SELECT ?n { ?x foaf:name ?n FILTER REGEX(?n, ".", "q") }""".stripMargin)
      .count()
    val dotAny = fx.sparql(
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |SELECT ?n { ?x foaf:name ?n FILTER REGEX(?n, ".") }""".stripMargin)
      .count()
    dotLit shouldBe 0L
    dotAny should be > 0L
  }

  "REPLACE" should "yield NULL (unbound) for an invalid pattern" in {
    val fx = TestSpark.fixture("optionals.ttl")
    val rows = fx.sparql(
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |SELECT ?r { ?x foaf:name ?n BIND(REPLACE(?n, "(", "y") AS ?r) }""".stripMargin)
      .select(col("r")).collect()
    rows.foreach(r => r.isNullAt(0) shouldBe true)
    rows.length should be > 0
  }

  it should "keep working for valid patterns with flags" in {
    val fx = TestSpark.fixture("optionals.ttl")
    val r = fx.sparql(
      """SELECT ?r { BIND(REPLACE("Hello World", "WORLD", "there", "i") AS ?r) } LIMIT 1""")
      .select(col("r.lex")).head().getString(0)
    r shouldBe "Hello there"
  }
}
