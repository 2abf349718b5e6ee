package graft

import graft.rdf._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class TurtleParserSpec extends AnyFlatSpec with Matchers {

  private def fixture(name: String): Seq[Quad] = {
    val in = getClass.getResourceAsStream(s"/$name")
    require(in != null, s"missing fixture $name")
    val text = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    TurtleParser.parse(text)
  }

  "TurtleParser" should "parse values.ttl with ; lists and numeric literals" in {
    val qs = fixture("values.ttl")
    qs should have size 5
    qs should contain(Quad(
      Iri("http://example.org/book/book1"),
      Iri("http://purl.org/dc/elements/1.1/title"),
      Lit("SPARQL Tutorial"), None))
    qs should contain(Quad(
      Iri("http://example.org/book/book2"),
      Iri("http://example.org/ns#price"),
      Lit("23", XSD.integer), None))
  }

  it should "honor mid-document prefix redefinition (group_by.ttl)" in {
    val qs = fixture("group_by.ttl")
    qs should have size 26
    qs should contain(Quad(Iri("http://books.example/book1"),
      Iri("http://books.example/price"), Lit("9", XSD.integer), None))
    qs should contain(Quad(Iri("http://example.com/data/#y"),
      Iri("http://example.com/data/#p"), BNode("b2"), None))
    qs should contain(Quad(Iri("http://example.com/data/#z"),
      Iri("http://example.com/data/#p"), Lit("1.0", XSD.decimal), None))
  }

  it should "parse blank node subjects and IRIs (optionals.ttl)" in {
    val qs = fixture("optionals.ttl")
    qs should have size 6
    qs should contain(Quad(BNode("a"), Iri(RDF.typ),
      Iri("http://xmlns.com/foaf/0.1/Person"), None))
    qs should contain(Quad(BNode("a"), Iri("http://xmlns.com/foaf/0.1/mbox"),
      Iri("mailto:alice@work.example"), None))
  }

  it should "parse TriG graph blocks and typed literals (graphs.trig)" in {
    val qs = fixture("graphs.trig")
    val g1 = Iri("tag:example.org,2005-06-06:graph1")
    qs.count(_.g.contains(g1)) shouldBe 6
    qs.count(_.g.isEmpty) shouldBe 4
    qs should contain(Quad(Iri("tag:example.org,2005-06-06:graph1"),
      Iri("http://purl.org/dc/elements/1.1/date"),
      Lit("2004-12-06", XSD.date), None))
    // `a` keyword inside a graph block
    qs should contain(Quad(Iri("tag:example.org,2005-06-06:otherItem"),
      Iri(RDF.typ), Iri("tag:example.org,2005-06-06:class"),
      Some(Iri("tag:graph4"))))
  }

  it should "parse the TriG 1.1 GRAPH keyword form" in {
    val qs = TurtleParser.parse(
      """@prefix : <urn:x:> .
        |GRAPH :g1 { :s :p :o . }
        |graph <urn:x:g2> { :s2 :p :o2 }
        |:s3 :p :o3 .""".stripMargin)
    qs should contain(Quad(Iri("urn:x:s"), Iri("urn:x:p"), Iri("urn:x:o"),
      Some(Iri("urn:x:g1"))))
    qs should contain(Quad(Iri("urn:x:s2"), Iri("urn:x:p"), Iri("urn:x:o2"),
      Some(Iri("urn:x:g2"))))
    qs should contain(Quad(Iri("urn:x:s3"), Iri("urn:x:p"), Iri("urn:x:o3"), None))
    // `graph:x` stays a plain prefixed-name subject, not a keyword
    TurtleParser.parse(
      "@prefix graph: <urn:gp:> . graph:x <urn:p> \"v\" .").head.s shouldBe
      Iri("urn:gp:x")
    // labelOrSubject is iri | BlankNode: collections and literals are
    // invalid labels in the keyword form too
    an[IllegalArgumentException] should be thrownBy TurtleParser.parse(
      "@prefix : <urn:x:> . GRAPH (:a) { :s :p :o . }")
    an[IllegalArgumentException] should be thrownBy TurtleParser.parse(
      "@prefix : <urn:x:> . GRAPH \"g\" { :s :p :o . }")
  }

  it should "require the terminating dot and reject trailing junk on NT lines" in {
    an[IllegalArgumentException] should be thrownBy
      TurtleParser.parseNTriplesLine("<urn:a> <urn:p> <urn:o>") // missing '.'
    an[IllegalArgumentException] should be thrownBy
      TurtleParser.parseNTriplesLine("<urn:a> <urn:p> <urn:o> <urn:g> <urn:x> .")
    an[IllegalArgumentException] should be thrownBy
      TurtleParser.parseNTriplesLine("<urn:a> <urn:p> <urn:o> . <urn:b>")
    // trailing comment after the dot is legal
    TurtleParser.parseNTriplesLine("<urn:a> <urn:p> <urn:o> . # ok") shouldBe
      Some(Quad(Iri("urn:a"), Iri("urn:p"), Iri("urn:o"), None))
  }

  it should "reject Turtle-only syntax and literal subjects/graphs on NT lines" in {
    // [...] and (...) emit auxiliary triples a single-quad return would
    // silently drop — data loss, not a dropped line
    an[IllegalArgumentException] should be thrownBy
      TurtleParser.parseNTriplesLine("[ <urn:q> <urn:v> ] <urn:p> <urn:o> .")
    an[IllegalArgumentException] should be thrownBy
      TurtleParser.parseNTriplesLine("<urn:a> <urn:p> (\"x\") .")
    an[IllegalArgumentException] should be thrownBy
      TurtleParser.parseNTriplesLine("\"x\" <urn:p> <urn:o> .")
    an[IllegalArgumentException] should be thrownBy
      TurtleParser.parseNTriplesLine("<urn:a> <urn:p> <urn:o> \"g\" .")
    // plain blank-node LABELS stay legal everywhere they were
    TurtleParser.parseNTriplesLine("_:b <urn:p> _:c _:g .") shouldBe
      Some(Quad(BNode("b"), Iri("urn:p"), BNode("c"), Some(BNode("g"))))
  }

  it should "parse escaped quotes and apostrophes in literals" in {
    val qs = TurtleParser.parse(
      """@prefix : <urn:x:> . :s :p "Alice's \"Work\" Email" .""")
    qs.head.o shouldBe Lit("Alice's \"Work\" Email")
  }

  it should "parse N-Triples and N-Quads lines" in {
    TurtleParser.parseNTriplesLine(
      "<urn:a> <urn:p> \"x\"^^<http://www.w3.org/2001/XMLSchema#integer> .") shouldBe
      Some(Quad(Iri("urn:a"), Iri("urn:p"), Lit("x", XSD.integer), None))
    TurtleParser.parseNTriplesLine("<urn:a> <urn:p> _:b <urn:g> .") shouldBe
      Some(Quad(Iri("urn:a"), Iri("urn:p"), BNode("b"), Some(Iri("urn:g"))))
    TurtleParser.parseNTriplesLine("# comment") shouldBe None
    TurtleParser.parseNTriplesLine("   ") shouldBe None
  }

  it should "decode \\U escapes (supplementary plane) and bounds-check \\u" in {
    TurtleParser.parseNTriplesLine(
      "<urn:a> <urn:p> \"\\U0001F600ok\\u0041\" .").get.o shouldBe
      Lit(new String(Character.toChars(0x1F600)) + "okA")
    // (assemble the backslash at runtime — scalac processes \u escapes
    // even inside triple quotes)
    val truncated = "@prefix : <urn:x:> . :s :p \"bad" + '\\' + "u00"
    an[IllegalArgumentException] should be thrownBy TurtleParser.parse(truncated)
  }

  it should "allow 'base' and 'prefix' as prefix names" in {
    val qs = TurtleParser.parse(
      """@prefix base: <http://x/> . @prefix prefix: <http://y/> .
        |base:a prefix:b base:c .""".stripMargin)
    qs shouldBe Seq(Quad(Iri("http://x/a"), Iri("http://y/b"),
      Iri("http://x/c"), None))
  }

  it should "resolve relative IRIs per RFC 3986" in {
    val qs = TurtleParser.parse(
      """@base <http://ex.org/dir/doc> .
        |<other> <p:p> <frag#a:b> .""".stripMargin)
    qs.head.s shouldBe Iri("http://ex.org/dir/other")
    qs.head.o shouldBe Iri("http://ex.org/dir/frag#a:b")
  }

  it should "keep predicates with hyphenated prefixes distinct from the 'a' keyword" in {
    val qs = TurtleParser.parse(
      """@prefix a-b: <http://x/> . <urn:s> a-b:p <urn:o> .""")
    qs.head.p shouldBe Iri("http://x/p")
  }

  it should "normalize language-tagged literals to rdf:langString" in {
    val qs = TurtleParser.parse("""@prefix : <urn:x:> . :s :p "chat"@EN .""")
    qs.head.o shouldBe Lit("chat", lang = "en")
    qs.head.o.asInstanceOf[Lit].dt shouldBe XSD.langString
  }

  it should "expand RDF collections into rdf:first/rest chains" in {
    val qs = TurtleParser.parse(
      """@prefix : <urn:x:> . :s :items (1 2 3) . :t :empty () .""")
    // chain: 3 cells, each with first+rest; final rest = rdf:nil
    val firsts = qs.filter(_.p == Iri(RDF.first))
    firsts.map(_.o) shouldBe Seq(
      Lit("1", XSD.integer), Lit("2", XSD.integer), Lit("3", XSD.integer))
    val rests = qs.filter(_.p == Iri(RDF.rest))
    rests should have size 3
    rests.last.o shouldBe Iri(RDF.nil)
    // the subject points at the chain head; () is rdf:nil directly
    val head = qs.find(_.p == Iri("urn:x:items")).get.o
    firsts.head.s shouldBe head
    qs.find(_.p == Iri("urn:x:empty")).get.o shouldBe Iri(RDF.nil)
  }

  it should "allow collections as subjects but reject them as predicates or graph labels" in {
    val subj = TurtleParser.parse("""@prefix : <urn:x:> . ("a") :p :o .""")
    subj.find(_.p == Iri("urn:x:p")).get.s shouldBe a[BNode]
    an[IllegalArgumentException] should be thrownBy
      TurtleParser.parse("""@prefix : <urn:x:> . :s () :o .""")
    an[IllegalArgumentException] should be thrownBy
      TurtleParser.parse("""@prefix : <urn:x:> . () { :s :p :o . }""")
    an[IllegalArgumentException] should be thrownBy
      TurtleParser.parse("""@prefix : <urn:x:> . :s :p (1 2 .""")
  }
}
