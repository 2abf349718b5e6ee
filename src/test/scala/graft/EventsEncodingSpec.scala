package graft

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Regression for the round-8 battery breakage: the driver regenerated
  * events.parquet with `ts` as TIMESTAMP_NTZ(µs) where it had been
  * TIMESTAMP(NANOS), and six entries that hard-coded the nanos-as-long
  * read died at analysis time. [[SparkEntry.eventsUs]] must normalize
  * `ts` to long epoch-µs from ANY of the logical shapes the table has
  * shipped with — and fail with a legible schema-drift message, not an
  * analyzer stack trace, on a shape it has never seen. */
class EventsEncodingSpec extends AnyFlatSpec with Matchers {
  private def spark = TestSpark.spark

  // three instants with sub-millisecond parts, as epoch-µs
  private val micros = Seq(1696118400123456L, 1696118401000001L, 1700000000999999L)

  private def dirWith(mkTs: org.apache.spark.sql.Column): String = {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-evenc").toString
    micros.zipWithIndex.toDF("us", "event_id")
      .select(col("event_id").cast("long"), mkTs.as("ts"),
        lit(1L).as("user_id"), lit("view").as("event_type"),
        lit(1.0).as("value"), lit("""{"k": 1}""").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def readBack(dir: String): Map[Long, Long] =
    SparkEntry.eventsUs(spark, dir)
      .select(col("event_id"), col("ts"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private val expected = micros.zipWithIndex.map { case (us, i) => i.toLong -> us }.toMap

  "eventsUs" should "normalize a TIMESTAMP_NTZ(µs) ts (the current driver encoding)" in {
    val dir = dirWith(timestamp_micros(col("us")).cast("timestamp_ntz"))
    spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType.typeName shouldBe "timestamp_ntz"
    readBack(dir) shouldBe expected
  }

  it should "normalize a session-TZ TIMESTAMP(µs) ts" in {
    val dir = dirWith(timestamp_micros(col("us")))
    readBack(dir) shouldBe expected
  }

  it should "normalize a nanos-as-long ts (the pre-round-8 encoding)" in {
    // a TIMESTAMP(NANOS) parquet column surfaces as LongType under
    // spark.sql.legacy.parquet.nanosAsLong (Spark cannot WRITE nanos,
    // so the fixture stores the same int64 the reader would produce)
    val dir = dirWith((col("us") * 1000L).cast("long"))
    readBack(dir) shouldBe expected
  }

  it should "fail legibly, naming table and type, on an unknown ts shape" in {
    val dir = dirWith(col("us").cast("string"))
    val e = intercept[IllegalStateException](readBack(dir))
    e.getMessage should include("schema drift")
    e.getMessage should include("events.parquet")
    e.getMessage should include("ts")
  }

  it should "fail legibly when ts disappears entirely" in {
    // the most likely real drift — a lost/renamed column — must also
    // produce the one-line message, not an analyzer stack trace
    val dir = java.nio.file.Files.createTempDirectory("graft-evenc").toString
    val s = spark
    import s.implicits._
    Seq((1L, 1L, "view", 1.0, """{"k": 1}"""))
      .toDF("event_id", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException](readBack(dir))
    e.getMessage should include("schema drift")
    e.getMessage should include("lost column `ts`")
  }

  "the schema-drift canary" should "flag lost columns and family changes in one line" in {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "text", "en", "web", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    SparkEntry.checkShape(docs, "x/documents.parquet", "documents") // fine
    // extra columns are tolerated — the driver ADDS columns mid-build
    SparkEntry.checkShape(docs.withColumn("extra", lit(1)),
      "x/documents.parquet", "documents")
    val lost = intercept[IllegalArgumentException] {
      SparkEntry.checkShape(docs.drop("lang"), "x/documents.parquet", "documents")
    }
    lost.getMessage should (include("documents.parquet") and
      include("lang") and include("schema drift"))
    val retyped = intercept[IllegalArgumentException] {
      SparkEntry.checkShape(docs.withColumn("n_chars", lit("nope")),
        "x/documents.parquet", "documents")
    }
    retyped.getMessage should (include("n_chars") and include("string"))
    // unknown tables pass through unchecked (fixture/tmp reads)
    SparkEntry.checkShape(docs, "x/other.parquet", "other")
  }
}
