package graft

import graft.functions.{TextHashExprs, VectorExprs}
import graft.rdf.{JsonLdParser, Lit, TurtleParser}
import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Regressions for the round-6 rdf/streaming/functions review. */
class RdfFunctionsHardeningSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  "TurtleParser" should "reject a literal as graph label or subject" in {
    an[IllegalArgumentException] should be thrownBy
      TurtleParser.parse(""""g" { <urn:s> <urn:p> <urn:o> . }""")
    an[IllegalArgumentException] should be thrownBy
      TurtleParser.parse(""""s" <urn:p> <urn:o> .""")
  }

  it should "turn a trailing backslash and bad hex escapes into parse errors" in {
    // previously StringIndexOutOfBoundsException / NumberFormatException
    an[IllegalArgumentException] should be thrownBy
      TurtleParser.parse("<urn:s> <urn:p> \"abc\\")
    an[IllegalArgumentException] should be thrownBy
      TurtleParser.parse("<urn:s> <urn:p> \"a\\uZZZZ\" .")
  }

  "JsonLdParser" should "treat explicit @language null as a plain literal" in {
    val quads = JsonLdParser.parse(
      """{"@context": {"@language": "en", "ex": "urn:ex:"},
        |"@id": "ex:s",
        |"ex:tagged": {"@value": "x"},
        |"ex:plain": {"@value": "y", "@language": null}}""".stripMargin)
    val byPred = quads.map(q => q.p.lex -> q.o).toMap
    byPred("urn:ex:tagged").asInstanceOf[Lit].lang shouldBe "en"
    byPred("urn:ex:plain").asInstanceOf[Lit].lang shouldBe ""
  }

  it should "reject malformed JSON numbers instead of minting bad literals" in {
    an[IllegalArgumentException] should be thrownBy
      JsonLdParser.parse("""{"@id": "urn:s", "urn:p": 1-2}""")
    an[IllegalArgumentException] should be thrownBy
      JsonLdParser.parse("""{"@id": "urn:s", "urn:p": 1.2.3}""")
  }

  "REGEX" should "propagate an errored/unbound flags argument as an error" in {
    val fx = TestSpark.fixture("optionals.ttl")
    import graft.sparql.Sparql._
    // ?f is never bound: per SPARQL an error in ANY argument is an
    // error for the call, so the FILTER drops every row
    fx.sparql(
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |SELECT ?n { ?x foaf:name ?n
        |  OPTIONAL { ?x foaf:nosuch ?f }
        |  FILTER REGEX(?n, "A", ?f) }""".stripMargin)
      .count() shouldBe 0L
  }

  it should "not collide distinct (pattern, flags) pairs in the cache" in {
    // ("x p", "i") and ("p", "i x") previously shared a cache key; the
    // second must be an ERROR (space is not a flag), not a cached hit
    val df = Seq(("alpha x p beta")).toDF("s")
    df.select(graft.functions.RegexExprs.regexMatch(
        col("s"), lit("x p"), lit("i")).as("m"))
      .head().getBoolean(0) shouldBe true
    df.select(graft.functions.RegexExprs.regexMatch(
        col("s"), lit("p"), lit("i x")).as("m"))
      .head().isNullAt(0) shouldBe true
  }

  "vector expressions" should "fail loudly on a plane/vector dimension mismatch" in {
    val df = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("id", "v")
    val planes = Seq(Seq(1.0, 0.0)) // built for dim 2
    an[Exception] should be thrownBy
      df.select(VectorExprs.rhpSignature(col("v"), planes)).collect()
  }

  it should "reject wrong element types at analysis time for SQL users" in {
    graft.functions.GraftFunctions.register(spark)
    Seq((1, 2)).toDF("a", "b").createOrReplaceTempView("notvec_v")
    val e = intercept[Exception] {
      spark.sql("SELECT vec_cosine(array(1, 2), array(3, 4)) FROM notvec_v")
        .collect()
    }
    e.getMessage should include("array<float|double>")
  }

  "streaming dedup" should "pass NULL-text rows through instead of collapsing them" in {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    val input = MemoryStream[(Long, String, Timestamp)]
    val out = StreamingOps.dedupStream(
      input.toDF.toDF("id", "text", "event_ts"), "text", "event_ts")
    val q = out.writeStream.format("memory").queryName("nulldedup_out")
      .outputMode("append").start()
    try {
      val ts = Timestamp.valueOf("2024-01-01 10:00:00")
      input.addData(
        (1L, "same content", ts), (2L, "same content", ts),
        (3L, null.asInstanceOf[String], ts),
        (4L, null.asInstanceOf[String], ts))
      q.processAllAvailable()
      val ids = spark.table("nulldedup_out")
        .select("id").as[Long].collect().toSet
      ids.intersect(Set(1L, 2L)) should have size 1 // real dup collapsed
      ids should contain allOf (3L, 4L) // NULL text ≠ duplicate content
    } finally q.stop()
  }
}
