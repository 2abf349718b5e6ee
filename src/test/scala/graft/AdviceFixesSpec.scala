package graft

import graft.io.QuadsIO
import graft.pipeline.{Dedup, Similarity}
import graft.rdf._
import graft.sparql.Sparql
import graft.sparql.Sparql._
import org.apache.spark.sql.functions.col

/** Regressions for the round-3 advice items: Java-only double lexicals,
  * RHP plane-count bound, sidecar column-name validation, JSON-LD graph
  * wrappers with extra properties, multi-node RDF/XML property elements. */
class AdviceFixesSpec extends SparqlSpecBase {
  private val E = "urn:af:"
  private val P = s"PREFIX : <$E>\n"

  "Java-only double lexicals" should "be errors, not numbers" in {
    // Double.valueOf accepts "1.5f" and "0x1.8p1"; xsd:double and
    // Spark's cast reject both → arithmetic must error → unbound
    val data = QuadsIO.fromQuads(spark, Seq(
      Quad(Iri(E + "a"), Iri(E + "p"), Lit("1.5f", XSD.double), None),
      Quad(Iri(E + "b"), Iri(E + "p"), Lit("0x1.8p1", XSD.double), None),
      Quad(Iri(E + "c"), Iri(E + "p"), Lit("1.5e0", XSD.double), None)))
    val rows = collect(data.sparql(P +
      "SELECT ?s ?y { ?s :p ?x BIND(?x + 1 AS ?y) }"))
    rows should have size 3
    rows.filter(_.contains("y")).map(_("s")) shouldBe Seq(iri(E + "c"))
    // comparison filters must likewise drop the malformed rows
    collect(data.sparql(P + "SELECT ?s { ?s :p ?x FILTER(?x > 0) }"))
      .map(_("s")) shouldBe Seq(iri(E + "c"))
  }

  "RHP signatures" should "reject more than 64 planes" in {
    an[IllegalArgumentException] should be thrownBy
      Dedup.rhpSignature(col("emb"), numPlanes = 65, dim = 4)
    an[IllegalArgumentException] should be thrownBy
      Similarity.signatureOf(Seq(1.0, 0.0), numPlanes = 65)
  }

  "index builds" should "reject column names the sidecar cannot round-trip" in {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Seq(1.0f, 0.0f))).toDF("id", "em\"b")
    an[IllegalArgumentException] should be thrownBy
      Similarity.buildIndex(df, "id", "em\"b",
        java.nio.file.Files.createTempDirectory("annbad").toString, dim = 2)
    an[IllegalArgumentException] should be thrownBy
      graft.pipeline.Ivf.buildIndex(df.withColumnRenamed("em\"b", "emb,x"),
        "id", "emb,x",
        java.nio.file.Files.createTempDirectory("ivfbad").toString, k = 1)
  }

  "a top-level @graph wrapper with extra properties" should "fail loudly" in {
    val doc =
      """{"@graph":[{"@id":"http://x/s","http://x/p":"v"}],
        |"http://x/q":"dropped?"}""".stripMargin
    an[IllegalArgumentException] should be thrownBy JsonLdParser.parse(doc)
    // the pure wrapper (only @context/@graph) still parses
    JsonLdParser.parse(
      """{"@context":{},"@graph":[{"@id":"http://x/s","http://x/p":"v"}]}"""
    ) should have size 1
  }

  "an RDF/XML property element with two nested nodes" should "fail loudly" in {
    val doc =
      """<?xml version="1.0"?>
        |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:ex="http://x/">
        |  <rdf:Description rdf:about="http://x/s">
        |    <ex:p>
        |      <rdf:Description rdf:about="http://x/o1"/>
        |      <rdf:Description rdf:about="http://x/o2"/>
        |    </ex:p>
        |  </rdf:Description>
        |</rdf:RDF>""".stripMargin
    the[IllegalArgumentException] thrownBy RdfXmlParser.parse(doc) should
      have message "property element contains more than one nested node element " +
        "(only rdf:parseType=\"Collection\" may hold several)"
  }

  // ----- round-6 advice items -----

  "preBind" should "not be derailed by a '<' comparison in a SELECT expression" in {
    val q = "SELECT ((?a < ?b) AS ?c) WHERE { ?x <urn:af:a> ?a ; <urn:af:b> ?b }"
    val idx = Sparql.whereGroupBrace(q)
    q.charAt(idx) shouldBe '{'
    idx shouldBe q.indexOf("{ ?x")
    // and a genuine IRI before WHERE still skips correctly
    val q2 = "SELECT ?s FROM <urn:g> WHERE { ?s ?p ?o }"
    q2.charAt(Sparql.whereGroupBrace(q2)) shouldBe '{'
  }

  "exact dedup" should "prefer a non-NULL tieBreak over NULL" in {
    val s = spark; import s.implicits._
    val df = Seq(("k", Option.empty[String], "nullRow"),
      ("k", Some("b"), "keepMe")).toDF("key", "tb", "payload")
    Dedup.exact(df, "key", "tb").select("payload").as[String].collect()
      .toSeq shouldBe Seq("keepMe")
  }

  it should "reject map-typed columns with a clear message" in {
    val s = spark; import s.implicits._
    val df = Seq(("k", 1, Map("a" -> 1))).toDF("key", "tb", "m")
    the[IllegalArgumentException] thrownBy Dedup.exact(df, "key", "tb") should
      have message "requirement failed: exact() compares whole rows, so every " +
        "column must be orderable; map-typed columns are not: m — " +
        "drop or serialize them (e.g. to_json) first"
  }

  "\\U escapes" should "reject code points beyond U+10FFFF with a parse error" in {
    val ex = the[IllegalArgumentException] thrownBy
      TurtleParser.parse("<urn:a> <urn:p> \"\\U00110000\" .")
    ex.getMessage should include("invalid code point")
    // max valid code point still decodes
    TurtleParser.parse("<urn:a> <urn:p> \"\\U0010FFFF\" .").head.o shouldBe
      Lit(new String(Character.toChars(0x10FFFF)), XSD.string)
  }

  "empty plane/centroid matrices" should "be rejected at construction" in {
    import graft.functions.VectorExprs
    an[IllegalArgumentException] should be thrownBy
      VectorExprs.rhpSignature(col("emb"), Seq.empty)
    an[IllegalArgumentException] should be thrownBy
      VectorExprs.nearestCentroid(col("emb"), Seq.empty)
    an[IllegalArgumentException] should be thrownBy
      VectorExprs.nearestCentroid(col("emb"), Seq(Seq.empty))
  }

  // round-7 advice items

  "corpusReport" should "skip NULL text even under legacy sizeOfNull" in {
    val s = spark
    import s.implicits._
    val docs = Seq(("a", "one two three"), ("a", null), ("b", null))
      .toDF("lang", "text")
    // legacy mode makes size(NULL) = -1; the operator must not let
    // that leak into token totals
    s.conf.set("spark.sql.legacy.sizeOfNull", "true")
    try {
      val r = graft.pipeline.Curation.corpusReport(docs, "lang", "text")
        .orderBy("lang").collect()
      r.map(_.getLong(1)) shouldBe Array(2L, 1L)       // n_docs counts all
      r(0).getLong(2) shouldBe 3L                      // tokens from non-NULL only
      r(1).isNullAt(2) shouldBe true                   // all-NULL stratum: NULL, not -1
    } finally s.conf.unset("spark.sql.legacy.sizeOfNull")
  }

  "asofLookup" should "reject input columns that shadow its temp names" in {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 10L, "x")).toDF("k", "t", "__m")
    val dim = Seq((1L, 5L, 1.0)).toDF("k", "t", "v")
    val e = intercept[IllegalArgumentException] {
      graft.pipeline.Temporal.asofLookup(left, dim, "k", "t",
        rightCols = Seq("v"), rightTieCol = "v")
    }
    e.getMessage should include("__m")
    val dimBad = Seq((1L, 5L, 1.0)).toDF("k", "t", "__hist")
    intercept[IllegalArgumentException] {
      graft.pipeline.Temporal.asofLookup(
        Seq((1L, 10L)).toDF("k", "t"), dimBad, "k", "t",
        rightCols = Seq("__hist"), rightTieCol = "__hist")
    }
  }
}
