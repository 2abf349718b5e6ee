package graft

import graft.rdf._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class TriXParserSpec extends AnyFlatSpec with Matchers {

  private val doc =
    """<?xml version="1.0" encoding="utf-8"?>
      |<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">
      |  <graph>
      |    <triple>
      |      <uri>urn:tx:s1</uri>
      |      <uri>urn:tx:p</uri>
      |      <plainLiteral>plain</plainLiteral>
      |    </triple>
      |    <triple>
      |      <id>b1</id>
      |      <uri>urn:tx:p</uri>
      |      <plainLiteral xml:lang="en">tagged</plainLiteral>
      |    </triple>
      |  </graph>
      |  <graph>
      |    <uri>urn:tx:g</uri>
      |    <triple>
      |      <uri>urn:tx:s2</uri>
      |      <uri>urn:tx:p</uri>
      |      <typedLiteral datatype="http://www.w3.org/2001/XMLSchema#integer">7</typedLiteral>
      |    </triple>
      |    <triple>
      |      <uri>urn:tx:s2</uri>
      |      <uri>urn:tx:q</uri>
      |      <id>b1</id>
      |    </triple>
      |  </graph>
      |</TriX>""".stripMargin

  "TriXParser" should "parse default and named graphs with all term kinds" in {
    val qs = TriXParser.parse(doc)
    qs should have size 4
    qs should contain(Quad(Iri("urn:tx:s1"), Iri("urn:tx:p"),
      Lit("plain"), None))
    qs should contain(Quad(BNode("b1"), Iri("urn:tx:p"),
      Lit("tagged", lang = "en"), None))
    qs should contain(Quad(Iri("urn:tx:s2"), Iri("urn:tx:p"),
      Lit("7", XSD.integer), Some(Iri("urn:tx:g"))))
    qs should contain(Quad(Iri("urn:tx:s2"), Iri("urn:tx:q"),
      BNode("b1"), Some(Iri("urn:tx:g"))))
  }

  it should "preserve literal whitespace but trim pretty-printed IRIs" in {
    val qs = TriXParser.parse(
      """<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/"><graph><triple>
        |  <uri>
        |    urn:tx:s
        |  </uri>
        |  <uri>urn:tx:p</uri>
        |  <plainLiteral>  two  spaces  </plainLiteral>
        |</triple></graph></TriX>""".stripMargin)
    qs shouldBe Seq(Quad(Iri("urn:tx:s"), Iri("urn:tx:p"),
      Lit("  two  spaces  "), None))
  }

  it should "reject malformed documents loudly, with line positions" in {
    def bad(body: String): String = intercept[IllegalArgumentException] {
      TriXParser.parse(
        s"""<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">$body</TriX>""")
    }.getMessage
    val t3 = "<uri>urn:s</uri><uri>urn:p</uri><uri>urn:o</uri>"
    // literal subject
    bad("<graph><triple><plainLiteral>x</plainLiteral>" +
      "<uri>urn:p</uri><uri>urn:o</uri></triple></graph>") should
      include("subject is a literal")
    // non-IRI predicate
    bad("<graph><triple><uri>urn:s</uri><id>b</id>" +
      "<uri>urn:o</uri></triple></graph>") should
      include("predicate must be a <uri>")
    // wrong arity
    bad("<graph><triple><uri>urn:s</uri><uri>urn:p</uri></triple></graph>") should
      include("expected 3")
    // typedLiteral without datatype
    bad("<graph><triple><uri>urn:s</uri><uri>urn:p</uri>" +
      "<typedLiteral>5</typedLiteral></triple></graph>") should
      include("datatype")
    // graph name after its triples
    bad(s"<graph><triple>$t3</triple><uri>urn:g</uri></graph>") should
      include("must precede")
    // two graph names
    bad("<graph><uri>urn:g1</uri><uri>urn:g2</uri></graph>") should
      include("more than one name")
    // unknown element — never a silent drop
    bad("<graph><quad/></graph>") should include("<quad>")
    // nested element inside a term
    bad("<graph><triple><uri><uri>urn:s</uri></uri>" +
      "<uri>urn:p</uri><uri>urn:o</uri></triple></graph>") should
      include("nested")
    // empty blank node label
    bad(s"<graph><triple><id> </id><uri>urn:p</uri><uri>urn:o</uri></triple></graph>") should
      include("label is empty")
    // the error carries a line number
    bad("<graph><quad/></graph>") should include("line")
  }

  it should "reject foreign-namespace elements and require the root" in {
    intercept[IllegalArgumentException] {
      TriXParser.parse("""<TriX xmlns="urn:not-trix:"><graph/></TriX>""")
    }.getMessage should include("namespace")
    intercept[IllegalArgumentException] {
      TriXParser.parse(
        """<graph xmlns="http://www.w3.org/2004/03/trix/trix-1/"/>""")
    }.getMessage should include("root")
  }

  it should "not resolve DTDs or external entities (XXE hardening)" in {
    // SUPPORT_DTD=false must make a DOCTYPE fail, not fetch/expand
    intercept[Exception] {
      TriXParser.parse(
        """<?xml version="1.0"?>
          |<!DOCTYPE TriX [<!ENTITY xxe SYSTEM "file:///etc/hostname">]>
          |<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">
          |<graph><triple><uri>urn:s</uri><uri>urn:p</uri>
          |<plainLiteral>&xxe;</plainLiteral></triple></graph></TriX>""".stripMargin)
    }
  }

  it should "ingest .trix files distributed via QuadsIO.read" in {
    val spark = TestSpark.spark
    val tmp = java.nio.file.Files.createTempDirectory("graft-trix")
    java.nio.file.Files.writeString(tmp.resolve("a.trix"), doc)
    val gz = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(tmp.resolve("b.trix.gz")))
    gz.write(
      """<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/"><graph>
        |<triple><uri>urn:tx:s9</uri><uri>urn:tx:p</uri>
        |<plainLiteral>gz</plainLiteral></triple></graph></TriX>"""
        .stripMargin.getBytes("UTF-8"))
    gz.close()
    val quads = graft.io.QuadsIO.read(spark, tmp.toString)
    quads.count() shouldBe 5
    // named-graph quad survives the distributed fan-out
    import graft.sparql.Sparql._
    quads.sparql("SELECT ?s { GRAPH <urn:tx:g> { ?s <urn:tx:p> ?o } }")
      .count() shouldBe 1
    // single-file and driver-side forms agree
    graft.io.QuadsIO.read(spark, tmp.resolve("a.trix").toString)
      .count() shouldBe 4
    graft.io.QuadsIO.readTriX(spark, tmp.resolve("a.trix").toString)
      .count() shouldBe 4
  }
}
