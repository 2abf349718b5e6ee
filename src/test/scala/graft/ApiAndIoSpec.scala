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

  "gzipped N-Triples ingest" should "decompress transparently and query end-to-end" in {
    val tmp = Files.createTempDirectory("graft-ntgz")
    val gz = tmp.resolve("data.nt.gz")
    val content =
      """<urn:a> <urn:p> "v1" .
        |<urn:a> <urn:q> "5"^^<http://www.w3.org/2001/XMLSchema#integer> .
        |<urn:b> <urn:p> "v2" .
        |""".stripMargin
    val out = new java.util.zip.GZIPOutputStream(Files.newOutputStream(gz))
    out.write(content.getBytes("UTF-8")); out.close()
    val quads = QuadsIO.read(spark, gz.toString) // extension dispatch + codec
    quads.count() shouldBe 3
    val rows = collect(quads.sparql("SELECT ?s { ?s <urn:p> ?v }"))
    rows.map(_("s")).toSet shouldBe Set(iri("urn:a"), iri("urn:b"))
  }

  "compressed ingest breadth" should
    "decode bz2/zst/deflate/xz/lz4 on whole-file and line formats" in {
    import org.apache.commons.compress.compressors
    val tmp = Files.createTempDirectory("graft-comp")
    def write(name: String, text: String): String = {
      val f = Files.newOutputStream(tmp.resolve(name))
      val ext = name.substring(name.lastIndexOf('.') + 1)
      val out: java.io.OutputStream = ext match {
        case "bz2" => new compressors.bzip2.BZip2CompressorOutputStream(f)
        case "zst" => new compressors.zstandard.ZstdCompressorOutputStream(f)
        case "deflate" => new compressors.deflate.DeflateCompressorOutputStream(f)
        case "xz" => new compressors.xz.XZCompressorOutputStream(f)
        case "lz4" => new compressors.lz4.FramedLZ4CompressorOutputStream(f)
      }
      out.write(text.getBytes("UTF-8")); out.close()
      tmp.resolve(name).toString
    }
    // whole-file dispatch: same Turtle doc under every codec
    for (ext <- Seq("bz2", "zst", "deflate", "xz", "lz4")) {
      val ttl = s"""@prefix : <urn:c:> . :s :p "$ext" ."""
      val quads = QuadsIO.read(spark, write(s"d_$ext.ttl.$ext", ttl))
      withClue(s".$ext: ") {
        collect(quads.sparql("SELECT ?s ?v { ?s <urn:c:p> ?v }")) shouldBe
          Seq(Map("s" -> iri("urn:c:s"), "v" -> str(ext)))
      }
    }
    // line formats: bz2 stays on the distributed text reader (Hadoop
    // decodes it natively AND splits within files); zstd falls back
    // to one-file-per-task — identical quads either way
    val nt = (1 to 40).map(i => s"""<urn:a:$i> <urn:p> "v$i" .""").mkString("\n")
    QuadsIO.read(spark, write("data.nt.bz2", nt)).count() shouldBe 40
    QuadsIO.read(spark, write("data2.nt.zst", nt)).count() shouldBe 40
    // compressed EXPORT round-trips through the same parser: write
    // the quads back out gzipped and bzip2'd, read via the line path
    val quads40 = QuadsIO.read(spark, write("data3.nt.bz2", nt))
    for (codec <- Seq("gzip", "bzip2")) {
      val outDir = tmp.resolve(s"export_$codec").toString
      QuadsIO.writeNQuads(quads40, outDir, compression = codec)
      import java.nio.file.{Files => F}
      import scala.jdk.CollectionConverters._
      F.list(java.nio.file.Paths.get(outDir)).iterator().asScala
        .count(p => p.toString.endsWith(if (codec == "gzip") ".gz" else ".bz2")) should be >= 1
      QuadsIO.readNTriples(spark, outDir).count() shouldBe 40
    }
    // concatenated members (`cat a.nt.bz2 b.nt.bz2`) decode fully —
    // the Hadoop-codec contract, honored by the whole-file wrappers
    val memberA = {
      val bos = new java.io.ByteArrayOutputStream()
      val o = new compressors.bzip2.BZip2CompressorOutputStream(bos)
      o.write("<urn:m:1> <urn:p> \"a\" .\n".getBytes("UTF-8")); o.close()
      bos.toByteArray
    }
    val memberB = {
      val bos = new java.io.ByteArrayOutputStream()
      val o = new compressors.bzip2.BZip2CompressorOutputStream(bos)
      o.write("<urn:m:2> <urn:p> \"b\" .\n".getBytes("UTF-8")); o.close()
      bos.toByteArray
    }
    Files.write(tmp.resolve("cat.ttl.bz2"), memberA ++ memberB)
    QuadsIO.read(spark, tmp.resolve("cat.ttl.bz2").toString)
      .count() shouldBe 2
    // corrupt payload names the file, not a bare codec error
    Files.write(tmp.resolve("bad.ttl.bz2"), Array[Byte](1, 2, 3))
    val e = intercept[org.apache.spark.SparkException] {
      QuadsIO.read(spark, tmp.resolve("bad.ttl.bz2").toString).collect()
    }
    e.getMessage should include("bad.ttl.bz2")
  }

  "RDF/XML ingest" should "parse node/property elements, refs, datatypes and lang" in {
    val tmp = Files.createTempDirectory("graft-rdfxml")
    val f = tmp.resolve("data.rdf")
    Files.writeString(f,
      """<?xml version="1.0"?>
        |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:ex="http://ex.org/" xml:base="http://base.org/">
        |  <rdf:Description rdf:about="alice">
        |    <ex:name xml:lang="en">Alice</ex:name>
        |    <ex:age rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">30</ex:age>
        |    <ex:knows rdf:resource="http://ex.org/bob"/>
        |    <ex:addr rdf:parseType="Resource">
        |      <ex:city>Springfield</ex:city>
        |    </ex:addr>
        |  </rdf:Description>
        |  <ex:Person rdf:about="http://ex.org/bob" ex:nick="bobby">
        |    <ex:friend>
        |      <ex:Person rdf:nodeID="c"/>
        |    </ex:friend>
        |  </ex:Person>
        |</rdf:RDF>
        |""".stripMargin)
    val quads = QuadsIO.read(spark, f.toString)
    val got = collect(quads.sparql("SELECT ?s ?p ?o { ?s ?p ?o }"))
      .map(b => (b("s"), b("p"), b.get("o")))
    // xml:base resolution of relative rdf:about
    got.map(_._1) should contain(iri("http://base.org/alice"))
    // lang literal, typed literal, resource ref
    val alice = got.filter(_._1 == iri("http://base.org/alice"))
    alice.map(t => (t._2, t._3.get)) should contain allOf (
      (iri("http://ex.org/name"), Lit("Alice", lang = "en")),
      (iri("http://ex.org/age"), Lit("30", XSD.integer)),
      (iri("http://ex.org/knows"), iri("http://ex.org/bob")))
    // typed node element → rdf:type; property attribute → literal
    val bob = got.filter(_._1 == iri("http://ex.org/bob"))
    bob.map(t => (t._2, t._3.get)) should contain allOf (
      (iri(RDF.typ), iri("http://ex.org/Person")),
      (iri("http://ex.org/nick"), str("bobby")))
    // parseType=Resource bnode carries the nested property
    val addrBn = alice.find(_._2 == iri("http://ex.org/addr")).get._3.get
    addrBn shouldBe a[BNode]
    got.find(t => t._1 == addrBn && t._2 == iri("http://ex.org/city"))
      .get._3.get shouldBe str("Springfield")
    // SPARQL over the ingested graph end-to-end
    val names = collect(quads.sparql(
      """PREFIX ex: <http://ex.org/>
        |SELECT ?n { ?s ex:name ?n }""".stripMargin))
    names.head("n") shouldBe Lit("Alice", lang = "en")
  }

  "JSON-LD ingest" should "expand context terms, coercions, value objects and graphs" in {
    val tmp = Files.createTempDirectory("graft-jsonld")
    val f = tmp.resolve("data.jsonld")
    Files.writeString(f,
      """{
        |  "@context": {
        |    "ex": "http://ex.org/",
        |    "name": "ex:name",
        |    "knows": {"@id": "ex:knows", "@type": "@id"},
        |    "age": {"@id": "ex:age", "@type": "http://www.w3.org/2001/XMLSchema#integer"},
        |    "@vocab": "http://voc.org/",
        |    "@base": "http://base.org/"
        |  },
        |  "@graph": [
        |    { "@id": "alice", "@type": "ex:Person",
        |      "name": {"@value": "Alice", "@language": "en"},
        |      "age": "30",
        |      "knows": "http://ex.org/bob",
        |      "score": 9.5,
        |      "active": true,
        |      "pet": { "name": "Rex" } },
        |    { "@id": "http://ex.org/bob", "name": "Bob" }
        |  ]
        |}""".stripMargin)
    val quads = QuadsIO.read(spark, f.toString)
    val got = collect(quads.sparql("SELECT ?s ?p ?o { ?s ?p ?o }"))
      .map(b => (b("s"), b("p"), b.get("o").orNull))
    val alice = iri("http://base.org/alice") // @base resolution
    got should contain((alice, iri(RDF.typ), iri("http://ex.org/Person")))
    got should contain((alice, iri("http://ex.org/name"), Lit("Alice", lang = "en")))
    got should contain((alice, iri("http://ex.org/age"), Lit("30", XSD.integer)))
    got should contain((alice, iri("http://ex.org/knows"), iri("http://ex.org/bob")))
    got should contain((alice, iri("http://voc.org/score"), Lit("9.5", XSD.double)))
    got should contain((alice, iri("http://voc.org/active"), Lit("true", XSD.boolean)))
    // nested anonymous node
    val pet = got.collectFirst {
      case (`alice`, Iri("http://voc.org/pet"), o) => o }.get
    pet shouldBe a[BNode]
    got should contain((pet, iri("http://ex.org/name"), str("Rex")))
    got should contain((iri("http://ex.org/bob"), iri("http://ex.org/name"), str("Bob")))
    // end-to-end SPARQL over the ingested graph
    val n = collect(quads.sparql(
      """PREFIX ex: <http://ex.org/>
        |SELECT ?n { ?s ex:knows ?o . ?o ex:name ?n }""".stripMargin))
    n.head("n") shouldBe str("Bob")
  }

  it should "put @id+@graph contents into that named graph" in {
    val tmp = Files.createTempDirectory("graft-jsonld2")
    val f = tmp.resolve("g.jsonld")
    Files.writeString(f,
      """{ "@id": "urn:g1", "@graph": [
        |  { "@id": "urn:a", "urn:p:x": "v" } ] }""".stripMargin)
    val quads = QuadsIO.read(spark, f.toString)
    val rows = collect(quads.sparql(
      "SELECT ?g ?s { GRAPH ?g { ?s <urn:p:x> \"v\" } }"))
    rows should have size 1
    rows.head("g") shouldBe iri("urn:g1")
    rows.head("s") shouldBe iri("urn:a")
  }

  it should "fully process a nested node that has @id plus its own properties" in {
    val tmp = Files.createTempDirectory("graft-jsonld4")
    val f = tmp.resolve("nested.jsonld")
    Files.writeString(f,
      """{ "@id": "urn:a",
        |  "urn:p:knows": { "@id": "urn:b", "urn:p:name": "Bob" } }""".stripMargin)
    val got = collect(QuadsIO.read(spark, f.toString)
      .sparql("SELECT ?s ?p ?o { ?s ?p ?o }"))
      .map(b => (b("s"), b("p"), b("o")))
    got should contain((iri("urn:a"), iri("urn:p:knows"), iri("urn:b")))
    got should contain((iri("urn:b"), iri("urn:p:name"), str("Bob")))
  }

  it should "reject keyword aliases loudly" in {
    val tmp = Files.createTempDirectory("graft-jsonld5")
    val f = tmp.resolve("alias.jsonld")
    Files.writeString(f,
      """{ "@context": { "id": "@id" }, "id": "urn:x", "urn:p:x": "v" }""")
    readFails(f.toString)
  }

  it should "deserialize @list into rdf:first/rest chains" in {
    val tmp = Files.createTempDirectory("graft-jsonld3")
    val f = tmp.resolve("list.jsonld")
    Files.writeString(f,
      """{ "@id": "urn:a", "urn:p:x": { "@list": ["a", "b"] } }""")
    val quads = QuadsIO.read(spark, f.toString)
    // walk the chain with a SPARQL path query
    val items = collect(quads.sparql(
      s"""SELECT ?v { <urn:a> <urn:p:x>/<${RDF.rest}>*/<${RDF.first}> ?v }"""))
    items.map(_("v")).toSet shouldBe Set(str("a"), str("b"))
    // chain terminates at rdf:nil
    collect(quads.sparql(
      s"""SELECT ?c { ?c <${RDF.rest}> <${RDF.nil}> }""")) should have size 1
  }

  it should "honor @container list, set, language and index term definitions" in {
    val tmp = Files.createTempDirectory("graft-jsonld7")
    val f = tmp.resolve("containers.jsonld")
    Files.writeString(f,
      """{
        |  "@context": {
        |    "ex": "http://ex.org/",
        |    "steps": {"@id": "ex:steps", "@container": "@list"},
        |    "tags": {"@id": "ex:tags", "@container": "@set"},
        |    "label": {"@id": "ex:label", "@container": "@language"},
        |    "byRegion": {"@id": "ex:site", "@container": ["@index", "@set"], "@type": "@id"}
        |  },
        |  "@id": "urn:doc",
        |  "steps": ["s1", "s2"],
        |  "tags": ["t1", "t2"],
        |  "label": {"en": "Cat", "de": ["Katze", "Kater"], "@none": "cat"},
        |  "byRegion": {"eu": "urn:site:eu", "us": ["urn:site:us1", "urn:site:us2"]}
        |}""".stripMargin)
    val quads = QuadsIO.read(spark, f.toString)
    // @container @list: the plain array became one rdf:first/rest chain
    val steps = collect(quads.sparql(
      s"""SELECT ?v { <urn:doc> <http://ex.org/steps>/<${RDF.rest}>*/<${RDF.first}> ?v }"""))
    steps.map(_("v")).toSet shouldBe Set(str("s1"), str("s2"))
    val got = collect(quads.sparql("SELECT ?s ?p ?o { ?s ?p ?o }"))
      .map(b => (b("s"), b("p"), b("o")))
    // @container @set: plain repeated triples, no chain
    got should contain((iri("urn:doc"), iri("http://ex.org/tags"), str("t1")))
    got should contain((iri("urn:doc"), iri("http://ex.org/tags"), str("t2")))
    // @container @language: map keys become language tags; @none is plain
    got should contain((iri("urn:doc"), iri("http://ex.org/label"), Lit("Cat", lang = "en")))
    got should contain((iri("urn:doc"), iri("http://ex.org/label"), Lit("Katze", lang = "de")))
    got should contain((iri("urn:doc"), iri("http://ex.org/label"), Lit("Kater", lang = "de")))
    got should contain((iri("urn:doc"), iri("http://ex.org/label"), str("cat")))
    // @container @index: index keys dropped, values keep the @id coercion
    got should contain((iri("urn:doc"), iri("http://ex.org/site"), iri("urn:site:eu")))
    got should contain((iri("urn:doc"), iri("http://ex.org/site"), iri("urn:site:us1")))
    got should contain((iri("urn:doc"), iri("http://ex.org/site"), iri("urn:site:us2")))
    // no triple mentions an index key
    got.map(_._3) should not contain str("eu")
  }

  it should "reject unsupported @container maps loudly" in {
    val tmp = Files.createTempDirectory("graft-jsonld8")
    val f = tmp.resolve("idmap.jsonld")
    Files.writeString(f,
      """{ "@context": { "m": {"@id": "urn:p:m", "@container": "@id"} },
        |  "@id": "urn:a", "m": { "urn:x": {"urn:p:v": "1"} } }""".stripMargin)
    readFails(f.toString)
  }

  it should "reject @reverse loudly" in {
    val tmp = Files.createTempDirectory("graft-jsonld6")
    val f = tmp.resolve("bad.jsonld")
    Files.writeString(f,
      """{ "@id": "urn:a", "urn:p:x": { "@reverse": {} } }""")
    readFails(f.toString)
  }

  it should "reject elements without a namespace (relative IRIs) loudly" in {
    val tmp = Files.createTempDirectory("graft-rdfxml3")
    val f = tmp.resolve("nons.rdf")
    Files.writeString(f,
      """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">
        |  <rdf:Description rdf:about="urn:x"><name>Bob</name></rdf:Description>
        |</rdf:RDF>""".stripMargin)
    readFails(f.toString)
  }

  it should "expand rdf:li containers and parseType=Collection" in {
    val tmp = Files.createTempDirectory("graft-rdfxml4")
    val f = tmp.resolve("coll.rdf")
    Files.writeString(f,
      """<?xml version="1.0"?>
        |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:ex="http://ex.org/">
        |  <rdf:Description rdf:about="urn:doc">
        |    <ex:authors>
        |      <rdf:Seq>
        |        <rdf:li>Ann</rdf:li>
        |        <rdf:li>Ben</rdf:li>
        |      </rdf:Seq>
        |    </ex:authors>
        |    <ex:tags rdf:parseType="Collection">
        |      <rdf:Description rdf:about="urn:t1"/>
        |      <rdf:Description rdf:about="urn:t2"/>
        |    </ex:tags>
        |  </rdf:Description>
        |  <rdf:Description rdf:about="urn:other">
        |    <ex:members>
        |      <rdf:Bag><rdf:li>X</rdf:li></rdf:Bag>
        |    </ex:members>
        |  </rdf:Description>
        |</rdf:RDF>
        |""".stripMargin)
    val quads = QuadsIO.read(spark, f.toString)
    val got = collect(quads.sparql("SELECT ?s ?p ?o { ?s ?p ?o }"))
      .map(b => (b("s"), b("p"), b("o")))
    // rdf:li expands to rdf:_1, rdf:_2 in document order on the Seq node
    val seqNode = got.find(t => t._2 == iri(RDF.typ) && t._3 == iri(RDF.ns + "Seq")).get._1
    got should contain(seqNode, iri(RDF.ns + "_1"), str("Ann"))
    got should contain(seqNode, iri(RDF.ns + "_2"), str("Ben"))
    // the counter restarts per container element (spec §7.4)
    val bagNode = got.find(t => t._2 == iri(RDF.typ) && t._3 == iri(RDF.ns + "Bag")).get._1
    got should contain(bagNode, iri(RDF.ns + "_1"), str("X"))
    // parseType=Collection builds the shared rdf:first/rest chain —
    // walk it with a property path end-to-end
    val items = collect(quads.sparql(
      """PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
        |SELECT ?x { <urn:doc> <http://ex.org/tags>/rdf:rest*/rdf:first ?x }""".stripMargin))
    items.map(_("x")).toSet shouldBe Set(iri("urn:t1"), iri("urn:t2"))
  }

  it should "reject unsupported parseType loudly" in {
    val tmp = Files.createTempDirectory("graft-rdfxml2")
    val f = tmp.resolve("bad.rdf")
    Files.writeString(f,
      """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:ex="http://ex.org/">
        |  <rdf:Description rdf:about="urn:x">
        |    <ex:html rdf:parseType="Literal"><b>hi</b></ex:html>
        |  </rdf:Description>
        |</rdf:RDF>""".stripMargin)
    readFails(f.toString)
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

  "N-Quads export" should "round-trip every term shape through the parser" in {
    val tmp = Files.createTempDirectory("graft-nqout")
    val quads = QuadsIO.fromQuads(spark, Seq(
      Quad(Iri("urn:a"), Iri("urn:p"), Lit("plain"), None),
      Quad(Iri("urn:a"), Iri("urn:p"), Lit("esc\"q\\b\nnl\tt"), None),
      Quad(Iri("urn:a"), Iri("urn:p"), Lit("42", XSD.integer), None),
      Quad(Iri("urn:a"), Iri("urn:p"), Lit("hi", lang = "en"), None),
      Quad(BNode("bn1"), Iri("urn:p"), Iri("urn:b"), Some(Iri("urn:g1")))))
    val out = tmp.resolve("out.nq").toString
    QuadsIO.writeNQuads(quads, out)
    val back = QuadsIO.readNTriples(spark, out)
    def multiset(df: org.apache.spark.sql.DataFrame) =
      df.collect().toSeq.map(_.toString).groupBy(identity).view.mapValues(_.size).toMap
    multiset(back) shouldBe multiset(quads)
    // xsd:string stays PLAIN (no ^^), language tags serialize as @lang
    val text = spark.read.textFile(out).collect().mkString("\n")
    text should include("\"hi\"@en")
    text should not include "XMLSchema#string>"
    text should include("\"esc\\\"q\\\\b\\nnl\\tt\"")
    text should include("<urn:g1> .")
  }

  "results writers" should "emit W3C CSV and TSV forms" in {
    import graft.sparql.Sparql
    val quads = QuadsIO.fromQuads(spark, Seq(
      Quad(Iri("urn:a"), Iri("urn:p"), Lit("v1"), None),
      Quad(Iri("urn:b"), Iri("urn:p"), Lit("5", XSD.integer), None),
      Quad(Iri("urn:c"), Iri("urn:q"), Lit("hi", lang = "en"), None)))
    val res = quads.sparql(
      "SELECT ?s ?o { ?s <urn:p> ?o OPTIONAL { ?s <urn:q> ?x } }")
    val tmp = Files.createTempDirectory("graft-results")
    Sparql.writeResultsCsv(res, tmp.resolve("csv").toString)
    val csv = spark.read.option("header", "true")
      .csv(tmp.resolve("csv").toString)
    csv.columns.toSeq shouldBe Seq("s", "o")
    csv.collect().map(_.getString(0)).toSet shouldBe Set("urn:a", "urn:b")
    Sparql.writeResultsTsv(res, tmp.resolve("tsv").toString)
    // concatenate part files in name order — header must come first
    val dir = new java.io.File(tmp.resolve("tsv").toString)
    val lines = dir.listFiles().filter(_.getName.startsWith("part-")).sorted
      .flatMap(f => scala.io.Source.fromFile(f).getLines()).toSeq
    lines.head shouldBe "?s\t?o"
    lines.tail.toSet shouldBe Set(
      "<urn:a>\t\"v1\"",
      "<urn:b>\t\"5\"^^<http://www.w3.org/2001/XMLSchema#integer>")
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

  "distributed multi-file ingest" should
    "parse a mixed-format directory one file per task" in {
    val tmp = Files.createTempDirectory("graft-multifile")
    Files.writeString(tmp.resolve("a.ttl"),
      "@prefix : <urn:mf:> . :s1 :p \"ttl\" .")
    Files.writeString(tmp.resolve("b.trig"),
      "@prefix : <urn:mf:> . GRAPH :g { :s2 :p \"trig\" . }")
    Files.writeString(tmp.resolve("c.rdf"),
      """<?xml version="1.0"?>
        |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        |         xmlns:mf="urn:mf:">
        |  <rdf:Description rdf:about="urn:mf:s3"><mf:p>xml</mf:p></rdf:Description>
        |</rdf:RDF>""".stripMargin)
    Files.writeString(tmp.resolve("d.jsonld"),
      """{"@id":"urn:mf:s4","urn:mf:p":"jsonld"}""")
    Files.writeString(tmp.resolve("e.nt"),
      "<urn:mf:s5> <urn:mf:p> \"nt\" .")
    val gz = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(tmp.resolve("f.ttl.gz")))
    gz.write("@prefix : <urn:mf:> . :s6 :p \"gz\" .".getBytes("UTF-8")); gz.close()

    val quads = QuadsIO.read(spark, tmp.toString) // directory → readFiles
    // default-graph pattern: everything except the TriG named-graph quad
    val rows = collect(quads.sparql(
      "SELECT ?s ?v { ?s <urn:mf:p> ?v }"))
    rows.map(r => r("s") -> r("v")).toSet shouldBe Set(
      iri("urn:mf:s1") -> str("ttl"),
      iri("urn:mf:s3") -> str("xml"), iri("urn:mf:s4") -> str("jsonld"),
      iri("urn:mf:s5") -> str("nt"), iri("urn:mf:s6") -> str("gz"))
    // the TriG graph tag survives the fan-out
    collect(quads.sparql(
      "SELECT ?s { GRAPH <urn:mf:g> { ?s ?p ?o } }"))
      .map(_("s")) shouldBe Seq(iri("urn:mf:s2"))
    // glob form parses the same files
    QuadsIO.read(spark, tmp.toString + "/*.ttl").count() shouldBe 1
  }

  it should "accept .n3 as Turtle and reject N3-only syntax loudly" in {
    val tmp = Files.createTempDirectory("graft-n3")
    Files.writeString(tmp.resolve("ok.n3"),
      "@prefix : <urn:n3:> . :s :p \"turtle-subset\" .")
    QuadsIO.read(spark, tmp.resolve("ok.n3").toString).count() shouldBe 1
    // formulae are N3-only: the Turtle parser must error, not mis-parse
    Files.writeString(tmp.resolve("bad.n3"),
      "@prefix : <urn:n3:> . { :s :p :o } => { :s :q :o } .")
    val ex = intercept[Exception] {
      QuadsIO.read(spark, tmp.resolve("bad.n3").toString).count()
    }
    deepMessage(ex) should include("bad.n3")
  }

  /** Executor-side failures arrive wrapped in SparkException; collect
    * messages down the cause chain. */
  private def deepMessage(e: Throwable): String =
    Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")

  /** Whole-file reads are lazy (parse runs on executors at the first
    * action); a malformed file must still fail loudly — with the
    * parser's IllegalArgumentException in the cause chain. */
  private def readFails(path: String): Unit = {
    val ex = intercept[Exception](QuadsIO.read(spark, path).count())
    Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(_.isInstanceOf[IllegalArgumentException]) shouldBe true
  }

  "skipMalformed N-Triples ingest" should "drop bad lines and count them" in {
    val tmp = Files.createTempDirectory("graft-ntperm")
    val f = tmp.resolve("dirty.nt")
    Files.writeString(f,
      """<urn:a> <urn:p> "ok1" .
        |this line is garbage
        |<urn:b> <urn:p> "ok2" .
        |<urn:c> <urn:p> "missing dot"
        |""".stripMargin)
    // strict default: the load fails
    intercept[Exception](QuadsIO.readNTriples(spark, f.toString).count())
    // permissive: good lines survive, bad ones counted
    val quads = QuadsIO.readNTriples(spark, f.toString, skipMalformed = true)
    quads.count() shouldBe 2
    collect(quads.sparql("SELECT ?s { ?s <urn:p> ?v }"))
      .map(_("s")).toSet shouldBe Set(iri("urn:a"), iri("urn:b"))
    // the knob reaches the format-dispatch entry point too
    QuadsIO.read(spark, f.toString, skipMalformed = true).count() shouldBe 2
  }

  it should "parse each line exactly once (no filter-pushdown duplication)" in {
    val tmp = Files.createTempDirectory("graft-ntonce")
    val f = tmp.resolve("one.nt")
    Files.writeString(f, "<urn:a> <urn:p> \"v\" .\n")
    val plan = QuadsIO.readNTriples(spark, f.toString)
      .queryExecution.optimizedPlan.toString
    // a nullable-scalar parse + isNotNull filter gets the expression
    // duplicated into the pushed-down Filter — every line parsed twice
    val occurrences = "parse_ntriple".r.findAllIn(plan).size
    occurrences shouldBe 1
  }

  it should "drop unparseable whole files only when asked" in {
    val tmp = Files.createTempDirectory("graft-permfiles")
    Files.writeString(tmp.resolve("good.ttl"),
      "@prefix : <urn:pf:> . :s :p \"ok\" .")
    Files.writeString(tmp.resolve("broken.ttl"),
      "@prefix : <urn:pf:> . :s :p ")
    intercept[Exception](QuadsIO.read(spark, tmp.toString).count()) // strict
    val quads = QuadsIO.read(spark, tmp.toString, skipMalformed = true)
    collect(quads.sparql("SELECT ?s { ?s <urn:pf:p> ?o }"))
      .map(_("s")) shouldBe Seq(iri("urn:pf:s"))
  }

  it should "dispatch .trix through the distributed whole-file reader" in {
    // full TriX coverage lives in TriXParserSpec; this pins the
    // extension dispatch (formerly a reject-with-pointer)
    val tmp = Files.createTempDirectory("graft-trixdisp")
    Files.writeString(tmp.resolve("a.trix"),
      """<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/"><graph>
        |<triple><uri>urn:td:s</uri><uri>urn:td:p</uri>
        |<plainLiteral>v</plainLiteral></triple></graph></TriX>""".stripMargin)
    collect(QuadsIO.read(spark, tmp.resolve("a.trix").toString)
      .sparql("SELECT ?s { ?s <urn:td:p> ?o }"))
      .map(_("s")) shouldBe Seq(iri("urn:td:s"))
  }

  it should "surface the offending file path on parse errors" in {
    val tmp = Files.createTempDirectory("graft-badfile")
    Files.writeString(tmp.resolve("good.ttl"),
      "@prefix : <urn:bf:> . :s :p \"ok\" .")
    Files.writeString(tmp.resolve("broken.ttl"),
      "@prefix : <urn:bf:> . :s :p ")
    val ex = intercept[Exception] {
      QuadsIO.read(spark, tmp.toString).count()
    }
    deepMessage(ex) should include("broken.ttl")
    // non-IllegalArgument parser failures carry the path too: StAX
    // throws XMLStreamException on truncated XML
    val tmp2 = Files.createTempDirectory("graft-badxml")
    Files.writeString(tmp2.resolve("trunc.rdf"),
      """<?xml version="1.0"?><rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-""")
    val ex2 = intercept[Exception] {
      QuadsIO.read(spark, tmp2.toString).count()
    }
    deepMessage(ex2) should include("trunc.rdf")
  }
}
