package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import java.sql.Timestamp

class StreamingSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  "streaming dedup" should "drop repeated fingerprints within the watermark" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val out = StreamingOps.dedupStream(
      input.toDF.toDF("id", "text", "event_ts"), "text", "event_ts")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "hello world", ts("2024-01-01 10:00:00")),
        (2L, "hello world", ts("2024-01-01 10:00:05")), // dup within watermark
        (3L, "different text", ts("2024-01-01 10:00:10")))
      q.processAllAvailable()
      val rows = spark.table("dedup_out").select("id").as[Long].collect().toSet
      rows should have size 2
      rows should contain(3L)
      rows.intersect(Set(1L, 2L)) should have size 1
    } finally q.stop()
  }

  "streaming curation" should "attach signals and filter incrementally" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val out = StreamingOps.curateStream(
      input.toDF.toDF("id", "text"), "text", minQuality = 0.2)
    val q = out.writeStream.format("memory").queryName("curate_out")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "the quick brown fox jumps over the lazy dog and runs to the river"),
        (2L, "!!!! ???? ####")) // punctuation garbage → filtered
      q.processAllAvailable()
      val rows = spark.table("curate_out")
      rows.count() shouldBe 1
      rows.select("lang_pred").head().getString(0) shouldBe "en"
      rows.select("n_tokens").head().getLong(0) shouldBe 14
    } finally q.stop()
  }

  "streaming event aggregation" should "count per window and type with watermark" in {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val out = StreamingOps.eventCounts(
      input.toDF.toDF("event_ts", "event_type", "value"), "event_ts")
    val q = out.writeStream.format("memory").queryName("events_out")
      .outputMode("complete").start()
    try {
      input.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 10:35:00"), "click", 2.0),
        (ts("2024-01-01 11:05:00"), "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("events_out")
        .select("event_type", "n", "total_value").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      rows shouldBe Set(("click", 2L, 3.0), ("view", 1L, 5.0))
    } finally q.stop()
  }
}
