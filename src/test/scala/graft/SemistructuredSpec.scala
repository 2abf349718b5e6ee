package graft

import graft.pipeline.Semistructured
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class SemistructuredSpec extends AnyFlatSpec with Matchers {
  private def spark = TestSpark.spark

  private def df = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, """{"k": 7, "tag": "a"}"""),
      (2L, """{"k": -3}"""),          // missing attribute → NULL
      (3L, """{"tag": "b"}"""),       // missing k → NULL
      (4L, """not json at all"""),    // malformed → NULL, not an error
      (5L, null)                      // NULL string → NULL
    ).toDF("id", "props")
  }

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("tag", StringType)))

  "extractJson" should "project typed columns, NULL on missing/malformed" in {
    val r = Semistructured.extractJson(df, "props", schema, prefix = "p_")
    r.columns.toSeq shouldBe Seq("id", "props", "p_k", "p_tag")
    r.schema("p_k").dataType shouldBe LongType
    val rows = r.orderBy("id")
      .collect().map(x => (x.getLong(0),
        if (x.isNullAt(2)) None else Some(x.getLong(2)),
        Option(x.getString(3))))
    rows shouldBe Array(
      (1L, Some(7L), Some("a")),
      (2L, Some(-3L), None),
      (3L, None, Some("b")),
      (4L, None, None),
      (5L, None, None))
  }

  it should "never plan a redundant full parse per projected field" in {
    // parquet-backed so the optimizer cannot constant-fold the whole
    // projection into a LocalRelation
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toString
    df.write.mode("overwrite").parquet(dir)
    val r = Semistructured.extractJson(
      spark.read.parquet(dir), "props", schema, prefix = "p_")
    val js = r.queryExecution.optimizedPlan.expressions.flatMap(_.collect {
      case j: org.apache.spark.sql.catalyst.expressions.JsonToStructs => j
    })
    js.size should be >= 1
    // Catalyst either shares ONE full parse across the getFields or
    // (OptimizeJsonExprs) rewrites to per-field parses with PRUNED
    // single-field schemas; what it must never do is parse the full
    // declared schema once per projected field
    if (js.size > 1) js.foreach { j =>
      j.schema.asInstanceOf[StructType].fields.length shouldBe 1
    }
  }

  it should "reject colliding output names and unknown source columns" in {
    val e = intercept[IllegalArgumentException] {
      Semistructured.extractJson(df.withColumnRenamed("id", "k"), "props", schema)
    }
    e.getMessage should include("k")
    intercept[IllegalArgumentException] {
      Semistructured.extractJson(df, "nope", schema)
    }
  }

  "extractJson" should "compose with a streaming source (stateless projection)" in {
    // a pure map: no state, no watermark — the streaming face of JSON
    // attribute extraction is the same call as the batch face
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val out = Semistructured.extractJson(
      input.toDF.toDF("id", "props"),
      "props", StructType(Seq(StructField("k", LongType))), prefix = "p_")
    out.isStreaming shouldBe true
    val q = out.writeStream.format("memory").queryName("json_stream_out")
      .outputMode("append").start()
    try {
      input.addData((1L, """{"k": 5}"""), (2L, """garbage"""))
      q.processAllAvailable()
      val rows = s.table("json_stream_out").orderBy("id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      rows shouldBe Array((1L, Some(5L)), (2L, None))
    } finally q.stop()
  }

  "jsonAttr" should "extract one typed attribute by path" in {
    val r = df.select(col("id"),
        Semistructured.jsonAttr(col("props"), "$.k", LongType).as("k"))
      .orderBy("id").collect()
      .map(x => if (x.isNullAt(1)) None else Some(x.getLong(1)))
    r shouldBe Array(Some(7L), Some(-3L), None, None, None)
  }

  "toVariant + variantAttr" should
    "parse once into VARIANT and probe typed paths, NULL on bad rows" in {
    val v = Semistructured.toVariant(df, "props", "pv")
    v.schema("pv").dataType shouldBe VariantType
    val r = v.select(col("id"),
        Semistructured.variantAttr(col("pv"), "$.k", "long").as("k"),
        Semistructured.variantAttr(col("pv"), "$.tag", "string").as("tag"))
      .orderBy("id").collect()
      .map(x => (x.getLong(0),
        if (x.isNullAt(1)) None else Some(x.getLong(1)),
        Option(x.getString(2))))
    r shouldBe Array(
      (1L, Some(7L), Some("a")),
      (2L, Some(-3L), None),
      (3L, None, Some("b")),
      (4L, None, None), // malformed → NULL variant (try_parse_json)
      (5L, None, None))
    // uncastable value at the path → NULL, not an error
    val bad = Semistructured.variantAttr(col("pv"), "$.tag", "long")
    v.filter(col("id") === 1L).select(bad.as("t")).collect()
      .head.isNullAt(0) shouldBe true
  }

  it should "round-trip VARIANT through parquet and refuse collisions" in {
    // the persisted form: write the parsed binary, read it back, probe
    val dir = java.nio.file.Files.createTempDirectory("graft-variant").toString
    Semistructured.toVariant(df, "props", "pv").drop("props")
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    back.schema("pv").dataType shouldBe VariantType
    val ks = back.select(col("id"),
        Semistructured.variantAttr(col("pv"), "$.k", "long").as("k"))
      .orderBy("id").collect()
      .map(x => if (x.isNullAt(1)) None else Some(x.getLong(1)))
    ks shouldBe Array(Some(7L), Some(-3L), None, None, None)
    intercept[IllegalArgumentException] {
      Semistructured.toVariant(df, "props", "id")
    }
    intercept[IllegalArgumentException] {
      Semistructured.toVariant(df, "nope", "pv")
    }
  }
}
