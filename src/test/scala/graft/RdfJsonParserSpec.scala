package graft

import graft.rdf._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** RDF/JSON (`.rj`) parser: the W3C Note's subject→predicate→value-
  * object shape, every term form, and loud rejection of deviations. */
class RdfJsonParserSpec extends AnyFlatSpec with Matchers {

  "RdfJsonParser" should "parse every term form of the Note's example shape" in {
    val doc =
      """{
        |  "http://x/s": {
        |    "http://x/p": [
        |      {"value": "http://x/o", "type": "uri"},
        |      {"value": "chat", "type": "literal", "lang": "fr"},
        |      {"value": "5", "type": "literal",
        |       "datatype": "http://www.w3.org/2001/XMLSchema#integer"},
        |      {"value": "plain", "type": "literal"},
        |      {"value": "_:b1", "type": "bnode"}
        |    ]
        |  },
        |  "_:b1": {
        |    "http://x/q": [{"value": "linked", "type": "literal"}]
        |  }
        |}""".stripMargin
    val quads = RdfJsonParser.parse(doc)
    quads should have size 6
    quads.foreach(_.g shouldBe None) // triples-only format
    val s = Iri("http://x/s"); val p = Iri("http://x/p")
    quads should contain allOf (
      Quad(s, p, Iri("http://x/o"), None),
      Quad(s, p, Lit("chat", lang = "fr"), None),
      Quad(s, p, Lit("5", XSD.integer), None),
      Quad(s, p, Lit("plain"), None),
      Quad(s, p, BNode("b1"), None),
      Quad(BNode("b1"), Iri("http://x/q"), Lit("linked"), None))
  }

  it should "parse an empty document to zero quads" in {
    RdfJsonParser.parse("{}") shouldBe empty
  }

  it should "reject malformed shapes loudly, naming the site" in {
    // non-array predicate value
    the[IllegalArgumentException] thrownBy RdfJsonParser.parse(
      """{"http://x/s": {"http://x/p": {"value": "v", "type": "literal"}}}"""
    ) should have message "RDF/JSON parse error: <http://x/s> " +
      "<http://x/p> must map to an ARRAY of value objects, got " +
      "JObj(Vector((value,JStr(v)), (type,JStr(literal))))"
    // missing type
    an[IllegalArgumentException] should be thrownBy RdfJsonParser.parse(
      """{"http://x/s": {"http://x/p": [{"value": "v"}]}}""")
    // unknown type
    an[IllegalArgumentException] should be thrownBy RdfJsonParser.parse(
      """{"http://x/s": {"http://x/p": [{"value": "v", "type": "blank"}]}}""")
    // lang + (non-langString) datatype together
    an[IllegalArgumentException] should be thrownBy RdfJsonParser.parse(
      """{"http://x/s": {"http://x/p": [{"value": "v", "type": "literal",
        | "lang": "en", "datatype": "http://x/dt"}]}}""".stripMargin)
    // empty object array (the Note requires at least one)
    an[IllegalArgumentException] should be thrownBy RdfJsonParser.parse(
      """{"http://x/s": {"http://x/p": []}}""")
    // array root
    an[IllegalArgumentException] should be thrownBy RdfJsonParser.parse("[]")
  }

  it should "round-trip through the distributed reader by extension" in {
    val spark = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("graft-rj")
    java.nio.file.Files.writeString(dir.resolve("a.rj"),
      """{"urn:s1": {"urn:p": [{"value": "A", "type": "literal"}]}}""")
    java.nio.file.Files.writeString(dir.resolve("b.rj"),
      """{"urn:s2": {"urn:p": [{"value": "urn:s1", "type": "uri"}]}}""")
    val quads = graft.io.QuadsIO.readFiles(spark, dir.toString)
    quads.count() shouldBe 2
    // and the quads are queryable like any other source
    import graft.sparql.Sparql._
    val rows = quads.sparql("SELECT ?x { ?x <urn:p> \"A\" }").collect()
    rows should have size 1
    rows.head.getStruct(0).getString(1) shouldBe "urn:s1"
  }

  it should "surface the failing FILE path from the distributed reader" in {
    val spark = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("graft-rj-bad")
    java.nio.file.Files.writeString(dir.resolve("bad.rj"), """{"urn:s": []}""")
    val e = intercept[org.apache.spark.SparkException] {
      graft.io.QuadsIO.readFiles(spark, dir.toString).collect()
    }
    e.getMessage should include("bad.rj")
  }
}
