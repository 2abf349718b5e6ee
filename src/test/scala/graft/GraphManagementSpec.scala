package graft

import graft.io.QuadsIO
import graft.rdf._
import graft.sparql.Sparql._

/** SPARQL 1.1 Update §3.2 graph management (LOAD / CLEAR / DROP /
  * CREATE / ADD / COPY / MOVE) and §3.1 operation sequences, as pure
  * quad-table transforms over the implicit-graph (quad-set) model. */
class GraphManagementSpec extends SparqlSpecBase {
  private val E = "urn:t:"
  private val P = s"PREFIX : <$E>\n"

  // default graph: 3 distinct quads (one duplicated); g1: one quad
  private def base = QuadsIO.fromQuads(spark, Seq(
    Quad(Iri(E + "a"), Iri(E + "p"), Lit("1", XSD.integer), None),
    Quad(Iri(E + "a"), Iri(E + "q"), Lit("x"), None),
    Quad(Iri(E + "b"), Iri(E + "p"), Lit("2", XSD.integer), None),
    Quad(Iri(E + "b"), Iri(E + "p"), Lit("2", XSD.integer), None), // duplicate
    Quad(Iri(E + "g1s"), Iri(E + "p"), Lit("g"), Some(Iri(E + "g1")))))

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Term, Term, Term, Option[Term])] =
    df.collect().toSeq.map { r =>
      (TermSchema.fromRow(r.getStruct(0)).get,
        TermSchema.fromRow(r.getStruct(1)).get,
        TermSchema.fromRow(r.getStruct(2)).get,
        TermSchema.fromRow(if (r.isNullAt(3)) null else r.getStruct(3)))
    }

  "CLEAR" should "empty a named graph" in {
    val out = base.sparqlUpdate(P + "CLEAR GRAPH :g1")
    out.count() shouldBe 4
    rows(out).forall(_._4.isEmpty) shouldBe true
  }

  it should "empty the default graph with DEFAULT" in {
    val out = base.sparqlUpdate(P + "CLEAR DEFAULT")
    out.count() shouldBe 1
    rows(out).head._4 shouldBe Some(Iri(E + "g1"))
  }

  it should "empty every named graph with NAMED" in {
    base.sparqlUpdate(P + "CLEAR NAMED").count() shouldBe 4
  }

  it should "empty the store with ALL" in {
    base.sparqlUpdate(P + "CLEAR ALL").count() shouldBe 0
  }

  "DROP" should "behave as CLEAR under the quad-set model" in {
    base.sparqlUpdate(P + "DROP GRAPH :g1").count() shouldBe 4
    base.sparqlUpdate(P + "DROP SILENT GRAPH :nope").count() shouldBe 5
    // absent graph, non-SILENT: no error either — graphs exist
    // implicitly, so "does not exist" never applies
    base.sparqlUpdate(P + "DROP GRAPH :nope").count() shouldBe 5
  }

  "CREATE" should "be a no-op (graphs exist implicitly)" in {
    base.sparqlUpdate(P + "CREATE GRAPH :gnew").count() shouldBe 5
    base.sparqlUpdate(P + "CREATE SILENT GRAPH :g1").count() shouldBe 5
  }

  "ADD" should "insert the source's quad set into the destination, keeping the source" in {
    val out = base.sparqlUpdate(P + "ADD DEFAULT TO :g1")
    // g1 gains the 3 distinct default quads, default keeps all 4 copies
    out.count() shouldBe 8
    val g1 = rows(out).filter(_._4.contains(Iri(E + "g1")))
    g1.size shouldBe 4
    g1 should contain((Iri(E + "a"), Iri(E + "p"), Lit("1", XSD.integer), Some(Iri(E + "g1"))))
  }

  it should "not duplicate quads already present in the destination" in {
    val out = base.sparqlUpdate(P + "ADD DEFAULT TO :g1 ; ADD DEFAULT TO :g1")
    out.count() shouldBe 8
  }

  it should "be a no-op when source and destination coincide" in {
    base.sparqlUpdate(P + "ADD :g1 TO :g1").count() shouldBe 5
    base.sparqlUpdate(P + "ADD DEFAULT TO DEFAULT").count() shouldBe 5
  }

  "COPY" should "overwrite the destination with the source's quad set" in {
    val out = base.sparqlUpdate(P + "COPY DEFAULT TO :g1")
    out.count() shouldBe 7 // 4 default copies + 3 distinct in g1 (old g1 quad gone)
    val g1 = rows(out).filter(_._4.contains(Iri(E + "g1")))
    g1.size shouldBe 3
    g1.map(_._3) should not contain Lit("g")
  }

  "MOVE" should "transfer the source into the destination and clear the source" in {
    val out = base.sparqlUpdate(P + "MOVE :g1 TO DEFAULT")
    // default graph replaced by g1's set; g1 emptied
    out.count() shouldBe 1
    rows(out).head shouldBe ((Iri(E + "g1s"), Iri(E + "p"), Lit("g"), None))
  }

  "operation sequences" should "apply ';'-separated updates in order" in {
    val out = base.sparqlUpdate(P +
      """CLEAR DEFAULT ;
        |INSERT DATA { :z :p 9 } ;
        |COPY :g1 TO :g2""".stripMargin)
    out.count() shouldBe 3
    rows(out) should contain(
      (Iri(E + "g1s"), Iri(E + "p"), Lit("g"), Some(Iri(E + "g2"))))
  }

  it should "accumulate prefixes declared after a ';'" in {
    val out = base.sparqlUpdate(P +
      "INSERT DATA { :z :p 9 } ;\nPREFIX x: <urn:x:>\nINSERT DATA { x:a :p x:b }")
    rows(out) should contain(
      (Iri("urn:x:a"), Iri(E + "p"), Iri("urn:x:b"), None))
    out.count() shouldBe 7
  }

  it should "tolerate a trailing semicolon" in {
    base.sparqlUpdate(P + "CLEAR ALL ;").count() shouldBe 0
  }

  "LOAD" should "read an RDF document into the store, honouring INTO GRAPH" in {
    val dir = java.nio.file.Files.createTempDirectory("graft-load")
    val f = dir.resolve("doc.nt")
    java.nio.file.Files.write(f,
      ("<urn:t:l1> <urn:t:p> \"v1\" .\n" +
        "<urn:t:l2> <urn:t:p> \"v2\" .\n").getBytes("UTF-8"))
    val out = base.sparqlUpdate(P + s"LOAD <file://$f> INTO GRAPH :gload")
    out.count() shouldBe 7
    val loaded = rows(out).filter(_._4.contains(Iri(E + "gload")))
    loaded.map(_._1).toSet shouldBe Set(Iri(E + "l1"), Iri(E + "l2"))

    // without INTO: lands in the default graph
    val out2 = base.sparqlUpdate(P + s"LOAD <file://$f>")
    rows(out2) should contain((Iri(E + "l1"), Iri(E + "p"), Lit("v1"), None))
  }

  it should "degrade to a no-op under SILENT when the read fails" in {
    base.sparqlUpdate(P + "LOAD SILENT <file:///nonexistent/x.nt>")
      .count() shouldBe 5
  }

  it should "throw loudly without SILENT" in {
    an[Exception] should be thrownBy
      base.sparqlUpdate(P + "LOAD <file:///nonexistent/x.nt>").count()
  }

  "graph-management parse errors" should "be loud" in {
    an[Exception] should be thrownBy
      base.sparqlUpdate(P + "CLEAR") // missing graph ref
    an[Exception] should be thrownBy
      base.sparqlUpdate(P + "CREATE :g") // CREATE requires GRAPH keyword
    an[Exception] should be thrownBy
      base.sparqlUpdate(P + "ADD NAMED TO DEFAULT") // NAMED not a target
    an[Exception] should be thrownBy
      base.sparqlUpdate(P + "WITH :g CLEAR DEFAULT") // WITH only on Modify
  }
}
