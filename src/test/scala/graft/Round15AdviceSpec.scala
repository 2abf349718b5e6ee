package graft

import graft.io.{DictStore, DocsIO}
import graft.rdf.{Iri, Lit, Quad, Term, XSD}
import org.apache.spark.sql.DataFrame
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Regressions for the round-14 review items: WARC Content-Length
  * values that are non-numeric or beyond Int.MaxValue must fail with
  * the same file+offset context as every other malformed frame shape
  * (a bare `.toInt` threw an unpositioned NumberFormatException, and
  * a 2^31+ value wrapped negative past the truncation check into an
  * uncontextualized copyOfRange error); an EXISTING-but-unreadable
  * stats sidecar must fail append loudly instead of silently skipping
  * the stats update (indistinguishable from the tolerated legacy-
  * store case, leaving permanently undercounted CBO stats); and
  * whitespace-only jsonl lines must drop in both modes, not just
  * ASCII-space-only ones. */
class Round15AdviceSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"r15-$tag").toString
  private def write(f: java.io.File, bytes: Array[Byte]): Unit = {
    val out = new java.io.FileOutputStream(f)
    try out.write(bytes) finally out.close()
  }
  private def exceptionChain(e: Throwable): String = {
    var cur: Throwable = e
    val sb = new StringBuilder
    while (cur != null) { sb.append(cur.getMessage).append(" | "); cur = cur.getCause }
    sb.toString
  }

  private def warcFrame(headers: String, body: Array[Byte]): Array[Byte] =
    (s"WARC/1.0\r\n$headers\r\n").getBytes("UTF-8") ++
      body ++ "\r\n\r\n".getBytes("UTF-8")
  private def goodRecord(uri: String): Array[Byte] = {
    val body = "HTTP/1.1 200 OK\r\n\r\nok".getBytes("UTF-8")
    warcFrame(
      "WARC-Type: response\r\n" +
        "WARC-Record-ID: <urn:uuid:1>\r\n" +
        s"WARC-Target-URI: $uri\r\n" +
        "WARC-Date: 2024-01-01T00:00:00Z\r\n" +
        "Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${body.length}\r\n", body)
  }

  behavior of "WARC Content-Length hardening"

  it should "position a non-numeric Content-Length with file context in strict mode" in {
    val dir = tmpDir("warc-nonnum")
    val bad = warcFrame(
      "WARC-Type: response\r\nContent-Length: banana\r\n", Array.emptyByteArray)
    write(new java.io.File(dir, "nonnum.warc"), goodRecord("http://ex.com/1") ++ bad)
    val e = intercept[Exception] {
      DocsIO.readWarc(spark, s"$dir/nonnum.warc").collect()
    }
    val msg = exceptionChain(e)
    msg should include("nonnum.warc")
    msg should include("non-numeric Content-Length")
    msg should include("banana")
    // permissive keeps the record before the bad frame
    DocsIO.readWarc(spark, s"$dir/nonnum.warc", skipMalformed = true)
      .count() shouldBe 1
  }

  it should "treat a 2^31+ Content-Length as a positioned truncation, not an int wrap" in {
    val dir = tmpDir("warc-big")
    val bad = warcFrame(
      "WARC-Type: response\r\nContent-Length: 3000000000\r\n",
      "short".getBytes("UTF-8"))
    write(new java.io.File(dir, "big.warc"), goodRecord("http://ex.com/1") ++ bad)
    val e = intercept[Exception] {
      DocsIO.readWarc(spark, s"$dir/big.warc").collect()
    }
    val msg = exceptionChain(e)
    msg should include("big.warc")
    msg should include("truncated record body")
    DocsIO.readWarc(spark, s"$dir/big.warc", skipMalformed = true)
      .count() shouldBe 1
  }

  it should "reject a negative Content-Length with file context" in {
    val dir = tmpDir("warc-neg")
    val bad = warcFrame(
      "WARC-Type: response\r\nContent-Length: -5\r\n", Array.emptyByteArray)
    write(new java.io.File(dir, "neg.warc"), bad)
    val e = intercept[Exception] {
      DocsIO.readWarc(spark, s"$dir/neg.warc").collect()
    }
    val msg = exceptionChain(e)
    msg should include("neg.warc")
    msg should include("negative Content-Length")
  }

  behavior of "DictStore.append stats-sidecar failure modes"

  private def lit_(lex: String, dt: String) = Lit(lex, dt, "")
  private def q(s: String, p: String, o: Term) =
    Quad(Iri(s"urn:$s"), Iri(s"urn:p:$p"), o, None)
  private def qdf(quads: Seq[Quad]): DataFrame = spark.createDataFrame(
    spark.sparkContext.parallelize(quads.map(_.toRow), 2),
    graft.rdf.TermSchema.quadType)
  private val batch1 = Seq(q("a", "bal", lit_("1", XSD.integer)))
  private val batch2 = Seq(q("b", "bal", lit_("2", XSD.integer)))

  it should "fail loudly when the sidecar exists but is unreadable, tolerate only a MISSING one" in {
    // missing (legacy store): tolerated, append proceeds
    val legacy = tmpDir("stats-missing")
    DictStore.encode(qdf(batch1), legacy)
    def rmTree(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    rmTree(java.nio.file.Paths.get(legacy, "stats"))
    noException should be thrownBy DictStore.append(qdf(batch2), legacy)

    // existing but unreadable (here: a partial delete left the
    // directory with no readable one-line payload): append must
    // propagate instead of silently freezing the CBO stats forever
    val broken = tmpDir("stats-broken")
    DictStore.encode(qdf(batch1), broken)
    val statsDir = java.nio.file.Paths.get(broken, "stats")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(statsDir).iterator().asScala.toSeq
      .foreach(f => if (java.nio.file.Files.isRegularFile(f))
        java.nio.file.Files.delete(f))
    intercept[Exception] { DictStore.append(qdf(batch2), broken) }
  }

  behavior of "jsonl blank-line handling"

  it should "drop whitespace-only lines in strict mode, not just space-only ones" in {
    val dir = tmpDir("jsonl-ws")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    write(new java.io.File(dir, "ws.jsonl"),
      "{\"doc_id\": 1, \"text\": \"a\"}\n\t\n   \n\t \t\n{\"doc_id\": 2, \"text\": \"b\"}\n"
        .getBytes("UTF-8"))
    val got = DocsIO.readJsonl(spark, s"$dir/ws.jsonl", schema)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    got shouldBe Set((1L, "a"), (2L, "b"))
  }
}
