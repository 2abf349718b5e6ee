package graft

import graft.rdf._
import graft.sparql.Sparql._

/** ASK and CONSTRUCT query forms — capability superset: the reference
  * rejects both at parse (Interpreter.scala:196-201). */
class AskConstructSpec extends SparqlSpecBase {
  private val P =
    """PREFIX dc: <http://purl.org/dc/elements/1.1/>
      |PREFIX ns: <http://example.org/ns#>
      |""".stripMargin

  private def fixtureDf = TestSpark.fixture("values.ttl")

  "ASK" should "return true when the pattern matches" in {
    val r = fixtureDf.sparql(P + """ASK { ?b dc:title "SPARQL Tutorial" }""")
    r.columns.toSeq shouldBe Seq("ask")
    r.head().getBoolean(0) shouldBe true
  }

  it should "return false when it does not" in {
    fixtureDf.sparql(P + """ASK { ?b dc:title "No Such Book" }""")
      .head().getBoolean(0) shouldBe false
  }

  it should "honor FILTER inside the pattern" in {
    fixtureDf.sparql(P + "ASK { ?b ns:price ?p FILTER(?p > 100) }")
      .head().getBoolean(0) shouldBe false
    fixtureDf.sparql(P + "ASK { ?b ns:price ?p FILTER(?p > 40) }")
      .head().getBoolean(0) shouldBe true
  }

  "CONSTRUCT" should "instantiate the template per solution as quads" in {
    val out = fixtureDf.sparql(P +
      """CONSTRUCT { ?b <urn:p:expensive> "yes" }
        |WHERE { ?b ns:price ?p FILTER(?p > 30) }""".stripMargin)
    out.columns.toSeq shouldBe Seq("s", "p", "o", "g")
    val rows = out.collect()
    rows should have size 1
    TermSchema.fromRow(rows.head.getStruct(0)) shouldBe
      Some(Iri("http://example.org/book/book1"))
    TermSchema.fromRow(rows.head.getStruct(2)) shouldBe Some(Lit("yes"))
  }

  it should "skip triples with unbound template positions" in {
    val out = fixtureDf.sparql(P +
      """CONSTRUCT { ?b <urn:p:price> ?price }
        |WHERE { ?b dc:title ?t OPTIONAL { ?b ns:price ?price } }""".stripMargin)
    out.count() shouldBe 2 // book3 has no price → its triple is dropped
  }

  it should "mint one fresh blank node per solution shared across template triples" in {
    val out = fixtureDf.sparql(P +
      """CONSTRUCT { _:offer <urn:p:about> ?b . _:offer <urn:p:price> ?p }
        |WHERE { ?b ns:price ?p }""".stripMargin)
    val quads = out.collect().map { r =>
      (TermSchema.fromRow(r.getStruct(0)).get,
        TermSchema.fromRow(r.getStruct(1)).get.lex,
        TermSchema.fromRow(r.getStruct(2)).get)
    }
    quads should have size 4 // 2 solutions × 2 template triples
    val bySubj = quads.groupBy(_._1)
    bySubj should have size 2 // one fresh bnode per solution
    bySubj.values.foreach { g =>
      g.map(_._2).toSet shouldBe Set("urn:p:about", "urn:p:price")
    }
  }

  it should "produce set semantics (dedup) and feed back into sparql()" in {
    val out = fixtureDf.sparql(P +
      """CONSTRUCT { ?b <urn:p:isBook> "true" } WHERE { ?b dc:title ?t }""")
    out.count() shouldBe 3
    // output is itself a valid quads DataFrame → query it
    import graft.sparql.Sparql._
    val back = collect(out.sparql("SELECT ?s { ?s <urn:p:isBook> \"true\" }"))
    back should have size 3
  }

  it should "apply LIMIT to WHERE solutions" in {
    val out = fixtureDf.sparql(P +
      """CONSTRUCT { ?b <urn:p:seen> "1" } WHERE { ?b dc:title ?t } LIMIT 2""")
    out.count() shouldBe 2
  }

  "DESCRIBE" should "return all subject quads of a constant resource" in {
    val out = fixtureDf.sparql("DESCRIBE <http://example.org/book/book1>")
    val got = collect(out.sparql("SELECT ?p { ?s ?p ?o }"))
    got.map(_("p")).toSet shouldBe
      Set(iri("http://purl.org/dc/elements/1.1/title"),
        iri("http://example.org/ns#price"))
  }

  it should "describe variable bindings from a WHERE clause" in {
    val out = fixtureDf.sparql(P +
      """DESCRIBE ?b WHERE { ?b dc:title "SPARQL Tutorial" }""")
    // exactly book1's subject triples
    out.count() shouldBe 2
    val subs = collect(out.sparql("SELECT DISTINCT ?s { ?s ?p ?o }"))
    subs should have size 1
  }

  it should "union constants with variables and support DESCRIBE *" in {
    val both = fixtureDf.sparql(P +
      """DESCRIBE ?b <urn:notthere> WHERE { ?b dc:title "SPARQL Tutorial" }""")
    both.count() shouldBe 2 // unknown IRI describes to nothing
    val star = fixtureDf.sparql(P +
      """DESCRIBE * WHERE { ?b dc:title "SPARQL Tutorial" }""")
    star.count() shouldBe 2
  }

  it should "require WHERE when describing variables" in {
    an[Exception] should be thrownBy fixtureDf.sparql("DESCRIBE ?x")
  }

  it should "follow blank nodes transitively (Concise Bounded Description)" in {
    import graft.io.QuadsIO
    val E = "urn:d:"
    val data = QuadsIO.fromQuads(spark, Seq(
      Quad(Iri(E + "alice"), Iri(E + "name"), Lit("Alice"), None),
      Quad(Iri(E + "alice"), Iri(E + "addr"), BNode("a1"), None),
      Quad(BNode("a1"), Iri(E + "city"), Lit("Springfield"), None),
      Quad(BNode("a1"), Iri(E + "geo"), BNode("g1"), None),
      Quad(BNode("g1"), Iri(E + "lat"), Lit("1.5", XSD.decimal), None),
      // reachable only through an IRI → NOT part of the description
      Quad(Iri(E + "alice"), Iri(E + "knows"), Iri(E + "bob"), None),
      Quad(Iri(E + "bob"), Iri(E + "name"), Lit("Bob"), None),
      // cycle between bnodes must terminate
      Quad(BNode("g1"), Iri(E + "back"), BNode("a1"), None)))
    val out = data.sparql(s"DESCRIBE <${E}alice>")
    out.count() shouldBe 7 // alice(3) + a1(2) + g1(2); bob excluded
    val preds = collect(out.sparql("SELECT ?p { ?s ?p ?o }")).map(_("p")).toSet
    preds should contain(iri(E + "lat")) // nested two bnodes deep
    collect(out.sparql(s"SELECT ?n { <${E}bob> <${E}name> ?n }")) shouldBe empty
  }

  it should "accept default-prefix targets and WHERE-less solution modifiers" in {
    // ':book1' exercises the empty-prefix prefixed-name path
    val out = fixtureDf.sparql(
      "PREFIX : <http://example.org/book/>\nDESCRIBE :book1")
    out.count() shouldBe 2
    // LIMIT without WHERE is grammatical; one implicit solution
    fixtureDf.sparql("DESCRIBE <http://example.org/book/book1> LIMIT 5")
      .count() shouldBe 2
    fixtureDf.sparql("DESCRIBE <http://example.org/book/book1> LIMIT 0")
      .count() shouldBe 0
  }

  it should "round-trip through the parquet quad store (construct → write → read → query)" in {
    // closes the loop ingest → query → construct → store: a constructed
    // graph is a first-class quads table, persisted in the same layout
    // (p,s-sorted parquet) every other query reads
    import graft.io.QuadsIO
    import graft.sparql.Sparql._
    val out = fixtureDf.sparql(P +
      """CONSTRUCT { ?b <urn:p:hasTitle> ?t . ?b <urn:p:isBook> "y" }
        |WHERE { ?b dc:title ?t }""".stripMargin)
    val dir = java.nio.file.Files.createTempDirectory("graft-construct").toString + "/g"
    QuadsIO.writeParquet(out, dir)
    val back = QuadsIO.readParquet(spark, dir)
    back.count() shouldBe out.count()
    val titles = collect(back.sparql(
      """SELECT ?t { ?b <urn:p:isBook> "y" ; <urn:p:hasTitle> ?t }"""))
    titles should have size 3
    titles.map(_("t")) should contain(str("SPARQL Tutorial"))
  }
}
