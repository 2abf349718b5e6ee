package graft

import graft.io.DocsIO
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Raw document-corpus ingest: distributed jsonl(.gz/.zst) and WARC
  * readers — strict-by-default with the offending FILE in every
  * error, skipMalformed for dirty corpora, codegen end to end. */
class DocsIOSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Message of `e` and every cause below it (Spark wraps task
    * failures several layers deep). */
  private def exceptionChain(e: Throwable): String = {
    val sb = new StringBuilder
    var t: Throwable = e
    while (t != null) { sb.append(t.getMessage).append('\n'); t = t.getCause }
    sb.toString
  }

  private def tmpDir(pfx: String): java.io.File =
    java.nio.file.Files.createTempDirectory(pfx).toFile

  private def write(f: java.io.File, bytes: Array[Byte]): Unit = {
    val out = new java.io.FileOutputStream(f)
    try out.write(bytes) finally out.close()
  }
  private def gz(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(bytes); g.close(); bos.toByteArray
  }

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  behavior of "DocsIO.readJsonl"

  it should "read a multi-file gzip jsonl corpus written by Spark" in {
    val dir = tmpDir("jsonl-gz")
    Seq((1L, "alpha"), (2L, "beta \"quoted\"\nline2"), (3L, "γράμμα"))
      .toDF("doc_id", "text").repartition(2)
      .write.mode("overwrite").option("compression", "gzip")
      .json(s"$dir/docs")
    val got = DocsIO.readJsonl(spark, s"$dir/docs", schema)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    got shouldBe Set((1L, "alpha"), (2L, "beta \"quoted\"\nline2"),
      (3L, "γράμμα"))
  }

  it should "drop blank lines in both modes and keep field order" in {
    val dir = tmpDir("jsonl-plain")
    write(new java.io.File(dir, "a.jsonl"),
      "\n{\"doc_id\": 7, \"text\": \"x\"}\n\n{\"text\": \"y\", \"doc_id\": 8}\n"
        .getBytes("UTF-8"))
    val got = DocsIO.readJsonl(spark, s"$dir/a.jsonl", schema)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    got shouldBe Set((7L, "x"), (8L, "y"))
  }

  it should "fail loudly on a malformed record, NAMING the file" in {
    val dir = tmpDir("jsonl-bad")
    write(new java.io.File(dir, "shard-07.jsonl"),
      "{\"doc_id\": 1, \"text\": \"ok\"}\n{not json}\n".getBytes("UTF-8"))
    val e = intercept[Exception] {
      DocsIO.readJsonl(spark, s"$dir/shard-07.jsonl", schema).collect()
    }
    val msg = exceptionChain(e)
    msg should include("shard-07.jsonl")
    msg should include("malformed JSON record")
  }

  it should "skip malformed records (not files) when asked" in {
    val dir = tmpDir("jsonl-skip")
    write(new java.io.File(dir, "a.jsonl"),
      ("{\"doc_id\": 1, \"text\": \"ok\"}\n{not json}\n" +
        "{\"doc_id\": 2, \"text\": \"also ok\"}\n").getBytes("UTF-8"))
    val got = DocsIO.readJsonl(spark, s"$dir/a.jsonl", schema,
      skipMalformed = true)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    got shouldBe Set((1L, "ok"), (2L, "also ok"))
  }

  it should "read zstd jsonl through the whole-file route" in {
    val dir = tmpDir("jsonl-zst")
    val bos = new java.io.ByteArrayOutputStream()
    val z = new org.apache.commons.compress.compressors.zstandard
      .ZstdCompressorOutputStream(bos)
    z.write("{\"doc_id\": 5, \"text\": \"zz\"}\n".getBytes("UTF-8")); z.close()
    write(new java.io.File(dir, "b.jsonl.zst"), bos.toByteArray)
    val got = DocsIO.readJsonl(spark, s"$dir/b.jsonl.zst", schema)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    got shouldBe Set((5L, "zz"))
  }

  // --- WARC ---

  private def warcRecord(typ: String, uri: String, body: Array[Byte],
                         id: String = "<urn:uuid:1>"): Array[Byte] = {
    val h = (s"WARC/1.0\r\n" +
      s"WARC-Type: $typ\r\n" +
      s"WARC-Record-ID: $id\r\n" +
      (if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "") +
      "WARC-Date: 2024-01-01T00:00:00Z\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("UTF-8")
    h ++ body ++ "\r\n\r\n".getBytes("UTF-8")
  }
  private def httpHtml(html: String): Array[Byte] =
    ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html)
      .getBytes("UTF-8")

  behavior of "DocsIO.readWarc"

  it should "split records from plain and per-member-gzip files" in {
    val dir = tmpDir("warc")
    val info = warcRecord("warcinfo", "", "software: graft\r\n".getBytes("UTF-8"))
    val r1 = warcRecord("response", "http://ex.com/1", httpHtml("<p>one</p>"))
    val r2 = warcRecord("response", "http://ex.com/2", httpHtml("<p>two</p>"))
    write(new java.io.File(dir, "a.warc"), info ++ r1)
    // Common Crawl layout: EACH record its own gzip member
    write(new java.io.File(dir, "b.warc.gz"), gz(info) ++ gz(r2))
    val df = DocsIO.readWarc(spark, s"$dir/*.warc*")
    df.count() shouldBe 4
    val resp = df.filter(col("warc_type") === "response")
      .select(col("target_uri"),
        DocsIO.httpPayload(col("body")).cast("string").as("payload"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    resp shouldBe Set(("http://ex.com/1", "<p>one</p>"),
      ("http://ex.com/2", "<p>two</p>"))
  }

  it should "fail loudly on a torn frame with file and offset" in {
    val dir = tmpDir("warc-bad")
    val r1 = warcRecord("response", "http://ex.com/1", httpHtml("<p>x</p>"))
    write(new java.io.File(dir, "torn.warc"),
      r1 ++ "WARC/1.0\r\nContent-Length: 99999\r\n\r\nshort".getBytes("UTF-8"))
    val e = intercept[Exception] {
      DocsIO.readWarc(spark, s"$dir/torn.warc").collect()
    }
    val msg = exceptionChain(e)
    msg should include("torn.warc")
    msg should include("truncated record body")
    // permissive keeps the records before the torn frame
    DocsIO.readWarc(spark, s"$dir/torn.warc", skipMalformed = true)
      .count() shouldBe 1
  }

  it should "keep the jsonl parse free of RDD hops (stats survive)" in {
    val dir = tmpDir("jsonl-stats")
    Seq((1L, "a")).toDF("doc_id", "text")
      .write.mode("overwrite").json(s"$dir/docs")
    val df = DocsIO.readJsonl(spark, s"$dir/docs", schema)
    // an RDD hop would reset sizeInBytes to the unknown-size default
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    size should be < BigInt(Long.MaxValue) / 4
  }
}
