package graft

import graft.io.QuadsIO
import graft.rdf._
import graft.sparql.Sparql
import graft.sparql.Sparql._
import java.nio.file.Files

/** Entry-point API (SURVEY.md §2.11) and ingest/storage round trips. */
class ApiAndIoSpec extends SparqlSpecBase {

  "pre-binding" should "substitute constants before parse" in {
    val q =
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |SELECT ?name { ?x foaf:name ?name }""".stripMargin
    val bound = Sparql.preBind(q, Map("name" -> Lit("Alice")))
    bound should include("BIND(\"Alice\" AS ?name)")
    val rows = collect(TestSpark.fixture("optionals.ttl").sparql(q,
      Map("name" -> Lit("Alice"))))
    rows should have size 1 // only _:a has name "Alice"
  }

  it should "serialize terms into SPARQL surface syntax" in {
    Sparql.serialize(Iri("urn:x")) shouldBe "<urn:x>"
    Sparql.serialize(Lit("hi")) shouldBe "\"hi\""
    Sparql.serialize(Lit("5", XSD.integer)) shouldBe
      "\"5\"^^<http://www.w3.org/2001/XMLSchema#integer>"
    Sparql.serialize(Lit("x", lang = "en")) shouldBe "\"x\"@en"
  }

  "N-Triples ingest" should "round-trip through parquet" in {
    val tmp = Files.createTempDirectory("graft-nt")
    val nt = tmp.resolve("data.nt")
    Files.writeString(nt,
      """<urn:a> <urn:p> "v1" .
        |<urn:a> <urn:p> "2"^^<http://www.w3.org/2001/XMLSchema#integer> .
        |# comment line
        |<urn:b> <urn:p> <urn:a> <urn:g1> .
        |""".stripMargin)
    val quads = QuadsIO.readNTriples(spark, nt.toString)
    quads.count() shouldBe 3
    val pq = tmp.resolve("quads").toString
    QuadsIO.writeParquet(quads, pq)
    val back = QuadsIO.readParquet(spark, pq)
    back.count() shouldBe 3
    val rows = collect(back.sparql("SELECT ?s ?o { ?s <urn:p> ?o }"))
    rows.map(_("o")).toSet shouldBe Set(Lit("v1"), Lit("2", XSD.integer))
    // named-graph quad round-trips
    collect(back.sparql(
      "SELECT ?s { GRAPH <urn:g1> { ?s <urn:p> ?o } }")) shouldBe
      Seq(Map("s" -> Iri("urn:b")))
  }

  "sparqlLex" should "flatten results to lexical strings" in {
    val df = TestSpark.fixture("values.ttl").sparqlLex(
      """PREFIX ns: <http://example.org/ns#>
        |SELECT ?b ?p { ?b ns:price ?p }""".stripMargin)
    df.schema.fields.map(_.dataType.typeName).toSet shouldBe Set("string")
    df.count() shouldBe 2
  }

  "SparkEntry.entry" should "return rows on sf0.001 (driver smoke check)" in {
    SparkEntry.entry(spark).count() should be > 0L
  }

  "bucketed quads table" should "plan star self-joins without an exchange" in {
    import graft.sources.TpchQuads
    val quads = TpchQuads.customer(spark, "/root/testdata/sf0.001")
    spark.sql("DROP TABLE IF EXISTS quads_bucketed")
    QuadsIO.writeBucketedTable(quads, "quads_bucketed", buckets = 4)
    // disable broadcast so the assertion really exercises bucket reuse
    // (a broadcast join would trivially have no shuffle either)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val star = spark.table("quads_bucketed").sparql(
        """PREFIX : <urn:p:>
          |SELECT ?n ?b { ?c :cname ?n . ?c :acctbal ?b }""".stripMargin)
      val plan = star.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      plan should not include "Exchange hashpartitioning"
      star.count() shouldBe 150
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
