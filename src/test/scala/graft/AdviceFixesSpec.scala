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

  // ----- round-9 advice items -----

  "compact" should "reject an outPath that is an ANCESTOR of inPath" in {
    val base = java.nio.file.Files.createTempDirectory("compact-anc")
    val in = base.resolve("data")
    val s = spark; import s.implicits._
    Seq(1, 2, 3).toDF("x").write.parquet(in.toString)
    // overwrite-mode would recursively delete `base` — including the
    // input — before the lazy read ran
    an[IllegalArgumentException] should be thrownBy
      graft.io.Layout.compact(spark, in.toString, base.toString, 1024L)
    // the input must be untouched by the rejected call
    spark.read.parquet(in.toString).count() shouldBe 3L
    // a sibling output still works
    graft.io.Layout.compact(spark, in.toString,
      base.resolve("out").toString, 1024L)
    spark.read.parquet(base.resolve("out").toString).count() shouldBe 3L
  }

  "bottom-k sample" should "retain the finite measure over NaN in either insertion order" in {
    val s = spark; import s.implicits._
    // same id → same 48-bit hash → the collision-resolution branch;
    // min(v) under TOTAL order must keep 2.0 whichever row arrives first
    for (rows <- Seq(
        Seq(("k", 1L, Double.NaN), ("k", 1L, 2.0)),
        Seq(("k", 1L, 2.0), ("k", 1L, Double.NaN)))) {
      val df = rows.toDF("g", "id", "v").coalesce(1)
      val st = graft.pipeline.Sketches
        .quantileSketchTable(df, Seq("g"), "v", "id", k = 4)
        .select(org.apache.spark.sql.functions.explode(col("qsk")).as("e"))
        .select("e.v").as[Double].collect()
      st shouldBe Array(2.0)
    }
  }

  "sparqlStream" should "accept joins against Singleton and VALUES sides" in {
    val s = spark; import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
    val quads = input.toDF.selectExpr(
      "named_struct('kind', 0, 'lex', _1, 'dt', '', 'lang', '') as s",
      "named_struct('kind', 0, 'lex', _2, 'dt', '', 'lang', '') as p",
      "named_struct('kind', 0, 'lex', _2, 'dt', '', 'lang', '') as o",
      "cast(null as struct<kind:int,lex:string,dt:string,lang:string>) as g")
    // `{ {} ?s ?p ?o }` parses to Join(Singleton, Scan) — a 1-row
    // local-relation join, streamable even without an equality key
    noException should be thrownBy graft.streaming.StreamingOps
      .sparqlStream(quads, "SELECT ?s { {} ?s ?p ?o }")
    // stream-static join against a VALUES side whose shared var has an
    // UNDEF row (so ?s is not assured on the VALUES side)
    noException should be thrownBy graft.streaming.StreamingOps
      .sparqlStream(quads,
        "SELECT ?s { ?s ?p ?o VALUES ?s { <urn:af:a> UNDEF } }")
    // scan-vs-scan without a shared assured var stays rejected
    an[IllegalArgumentException] should be thrownBy
      graft.streaming.StreamingOps.sparqlStream(quads,
        "SELECT * { ?a <urn:af:p> ?b . ?c <urn:af:q> ?d }")
  }

  "hot-key detection" should "not pool NULL-bearing composite keys with their non-NULL projections" in {
    val s = spark; import s.implicits._
    // ("a", NULL) ×5 and (NULL, "a") ×5 must NOT pool into one "a"
    // key of count 10; with 90 cold rows and minShare 0.08, pooling
    // would spuriously flag "a" as hot
    val rows = Seq.fill(5)((Option("a"), Option.empty[String])) ++
      Seq.fill(5)((Option.empty[String], Option("a"))) ++
      (1 to 90).map(i => (Option(s"c$i"), Option(s"c$i")))
    val df = rows.toDF("k1", "k2")
    graft.pipeline.Skew.detectHotKeys(df, Seq("k1", "k2"),
      m = 64, minShare = 0.08) shouldBe empty
    // genuinely hot composite keys are still caught
    val hotRows = Seq.fill(20)((Option("h"), Option("h"))) ++
      (1 to 80).map(i => (Option(s"c$i"), Option(s"c$i")))
    graft.pipeline.Skew.detectHotKeys(hotRows.toDF("k1", "k2"),
      Seq("k1", "k2"), m = 64, minShare = 0.1) should have size 1
  }
}
