package graft

import graft.pipeline.Temporal
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** As-of join and sessionization: planted histories with known
  * answers — equal-time matches, tolerance cut-offs, no-match NULLs,
  * deterministic tie-breaks, gap boundaries — plus plan-shape checks
  * (one exchange, no join node). */
class TemporalSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  // trades (left) and quotes (right) of the classic as-of example;
  // times are small longs (the operator only assumes numeric).
  private lazy val trades: DataFrame = Seq(
    (1L, 100L, "t-a"), // before any quote of key 1
    (1L, 205L, "t-b"), // between quotes at 200 and 300
    (1L, 300L, "t-c"), // EQUAL time to a quote → matches it
    (2L, 500L, "t-d"), // key with a single old quote
    (3L, 900L, "t-e")  // key with no quotes at all
  ).toDF("k", "t", "trade")

  private lazy val quotes: DataFrame = Seq(
    (1L, 200L, 10.0, 1L),
    (1L, 300L, 11.0, 2L),
    (1L, 300L, 12.0, 3L), // co-timed duplicate: larger tie (qid=3) wins
    (1L, 400L, 13.0, 4L), // in the future of every trade — never matches
    (2L, 100L, 20.0, 5L)
  ).toDF("k", "t", "px", "qid")

  private def asofMap(tolerance: Option[Long]): Map[String, Option[(Double, Long)]] =
    Temporal.asofJoin(trades, quotes, "k", "t",
      rightCols = Seq("px"), rightTieCol = "qid", tolerance = tolerance)
      .collect().map { r =>
        r.getAs[String]("trade") ->
          (if (r.isNullAt(r.fieldIndex("asof_px"))) None
           else Some((r.getAs[Double]("asof_px"), r.getAs[Long]("asof_t"))))
      }.toMap

  "asofJoin" should "match the latest quote at or before each trade" in {
    val m = asofMap(None)
    m("t-a") shouldBe None                 // no quote yet
    m("t-b") shouldBe Some((10.0, 200L))   // 300 is in the future
    m("t-c") shouldBe Some((12.0, 300L))   // equal time; tie qid=3 wins
    m("t-d") shouldBe Some((20.0, 100L))   // old quote still matches
    m("t-e") shouldBe None                 // key never quoted
  }

  it should "null out matches older than the tolerance" in {
    val m = asofMap(Some(50L))
    m("t-b") shouldBe Some((10.0, 200L))   // 5 units old
    m("t-c") shouldBe Some((12.0, 300L))   // 0 units old
    m("t-d") shouldBe None                 // 400 units old > 50
  }

  it should "preserve every left row exactly once" in {
    Temporal.asofJoin(trades, quotes, "k", "t", Seq("px"), "qid")
      .count() shouldBe trades.count()
  }

  it should "plan one exchange and no join" in {
    val df = Temporal.asofJoin(trades, quotes, "k", "t", Seq("px"), "qid")
    df.write.mode("overwrite").format("noop").save() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    plan should not include "Join"
    "Exchange hashpartitioning".r.findAllIn(plan).size shouldBe 1
  }

  it should "never match NULL-key or NULL-time right rows" in {
    // a NULL-time quote would otherwise sort FIRST and be carried to
    // every early left row; NULL keys must not attribute each other
    val dirtyQuotes = Seq(
      (Some(1L), None, 66.0, 10L),         // NULL time
      (None, Some(40L), 77.0, 11L),        // NULL key
      (Some(1L), Some(200L), 10.0, 1L)
    ).toDF("k", "t", "px", "qid")
    val dirtyTrades = Seq(
      (Some(1L), 100L, "early"),  // before any VALID quote
      (None, 100L, "nullkey"),    // NULL-key left row: kept, no match
      (Some(1L), 205L, "normal")
    ).toDF("k", "t", "trade")
    val m = Temporal.asofJoin(dirtyTrades, dirtyQuotes, "k", "t",
      Seq("px"), "qid")
      .collect().map(r => r.getAs[String]("trade") ->
        Option(r.getAs[java.lang.Double]("asof_px"))).toMap
    m should have size 3 // every left row survives
    m("early") shouldBe None
    m("nullkey") shouldBe None
    m("normal") shouldBe Some(10.0)
  }

  it should "reject colliding output names and bad arguments" in {
    an[IllegalArgumentException] should be thrownBy
      Temporal.asofJoin(trades, quotes, "k", "t", Seq("t"), "qid")
    an[IllegalArgumentException] should be thrownBy
      Temporal.asofJoin(trades, quotes, "k", "t", Nil, "qid")
    an[IllegalArgumentException] should be thrownBy
      Temporal.asofJoin(trades, quotes, "k", "t", Seq("px"), "qid",
        tolerance = Some(0L))
    an[IllegalArgumentException] should be thrownBy
      Temporal.asofJoin(
        trades.withColumnRenamed("trade", "asof_px"), quotes,
        "k", "t", Seq("px"), "qid")
  }

  // user 7: two sessions split by a silence of 100 (> gap 60); the
  // boundary event at exactly gap distance STAYS in-session.
  private lazy val events: DataFrame = Seq(
    (7L, 1000L, 1.0),
    (7L, 1060L, 2.0),  // exactly gap after → same session
    (7L, 1160L, 3.0),  // 100 > 60 → NEW session
    (8L, 5000L, 4.0)   // single-event session
  ).toDF("u", "t", "v")

  "sessionize" should "split on gaps strictly greater than the gap" in {
    val bySession = Temporal.sessionize(events, "u", "t", gap = 60L,
      aggs = Seq(sum(col("v")).as("total")))
      .collect().map(r => (r.getAs[Long]("u"), r.getAs[Long]("session_idx")) ->
        ((r.getAs[Long]("session_start"), r.getAs[Long]("session_end"),
          r.getAs[Long]("n_events"), r.getAs[Double]("total")))).toMap
    bySession.keySet shouldBe Set((7L, 1L), (7L, 2L), (8L, 1L))
    bySession((7L, 1L)) shouldBe ((1000L, 1060L, 2L, 3.0))
    bySession((7L, 2L)) shouldBe ((1160L, 1160L, 1L, 3.0))
    bySession((8L, 1L)) shouldBe ((5000L, 5000L, 1L, 4.0))
  }

  it should "plan one exchange" in {
    val df = Temporal.sessionize(events, "u", "t", gap = 60L)
    df.write.mode("overwrite").format("noop").save()
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).size shouldBe 1
  }

  it should "reject non-positive gaps" in {
    an[IllegalArgumentException] should be thrownBy
      Temporal.sessionize(events, "u", "t", gap = 0L)
  }

  "funnel" should "measure ordered progress per key" in {
    val ev = Seq(
      (1L, "signup", 10L), (1L, "click", 20L), (1L, "buy", 30L), // full
      (2L, "signup", 10L), (2L, "click", 20L),                   // depth 2
      (3L, "click", 5L), (3L, "signup", 10L),  // click BEFORE signup
      (4L, "buy", 10L),                        // skipped steps → 0
      (5L, "signup", 10L), (5L, "buy", 5L), (5L, "click", 10L),
      (6L, "other", 1L)                        // unknown step only
    ).toDF("u", "step", "t")
    val m = Temporal.funnel(ev, "u", "step", "t",
      Seq("signup", "click", "buy"))
      .collect().map(r => r.getAs[Long]("u") -> r.getAs[Int]("funnel_depth"))
      .toMap
    m(1L) shouldBe 3
    m(2L) shouldBe 2
    m(3L) shouldBe 1 // click's min precedes signup's → chain stops
    m(4L) shouldBe 0
    m(5L) shouldBe 2 // buy at t=5 < click at t=10 → depth stops at click
    m(6L) shouldBe 0
  }

  it should "reject duplicate or empty steps" in {
    val ev = Seq((1L, "a", 1L)).toDF("u", "step", "t")
    an[IllegalArgumentException] should be thrownBy
      Temporal.funnel(ev, "u", "step", "t", Nil)
    an[IllegalArgumentException] should be thrownBy
      Temporal.funnel(ev, "u", "step", "t", Seq("a", "a"))
  }

  "sessionize (dirty input)" should
    "drop NULL-time events without shifting session numbering" in {
    val dirty = Seq(
      (7L, None, 0.5), (7L, None, 0.5), // would shift idx by 2 if kept
      (7L, Some(1000L), 1.0), (7L, Some(1060L), 2.0)
    ).toDF("u", "t", "v")
    val rows = Temporal.sessionize(dirty, "u", "t", gap = 60L)
      .collect().map(r => (r.getAs[Long]("session_idx"),
        r.getAs[Long]("n_events")))
    rows shouldBe Array((1L, 2L)) // one session, numbered from 1
  }

  "asofLookup" should "agree with asofJoin on every fixture case" in {
    for (tol <- Seq(None, Some(50L))) {
      val viaJoin = Temporal.asofJoin(trades, quotes, "k", "t",
        Seq("px"), "qid", tol)
        .collect().map(r => (r.getAs[String]("trade"),
          Option(r.getAs[java.lang.Double]("asof_px")),
          Option(r.getAs[java.lang.Long]("asof_t")))).toSet
      val viaLookup = Temporal.asofLookup(trades, quotes, "k", "t",
        Seq("px"), "qid", tol)
        .collect().map(r => (r.getAs[String]("trade"),
          Option(r.getAs[java.lang.Double]("asof_px")),
          Option(r.getAs[java.lang.Long]("asof_t")))).toSet
      withClue(s"tolerance=$tol ") { viaLookup shouldBe viaJoin }
    }
  }

  it should "shuffle nothing on the probe side" in {
    val df = Temporal.asofLookup(trades, quotes, "k", "t", Seq("px"), "qid")
    df.write.mode("overwrite").format("noop").save()
    val plan = df.queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    // the only exchanges are broadcasts + the dim-side packing shuffle;
    // the left (event) side reaches the join with no hash exchange
    plan should not include "SortMergeJoin"
  }

  it should "reject rightCols repeating the key/time columns" in {
    an[IllegalArgumentException] should be thrownBy
      Temporal.asofLookup(trades, quotes, "k", "t", Seq("t", "px"), "qid")
  }

  it should "serve a streaming left side statelessly" in {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, Long)]
    val out = Temporal.asofLookup(
      input.toDF.toDF("k", "t"), quotes, "k", "t", Seq("px"), "qid")
    val q = out.writeStream.format("memory").queryName("asof_stream_out")
      .outputMode("append").start()
    try {
      input.addData((1L, 100L), (1L, 205L), (3L, 900L))
      q.processAllAvailable()
      val rows = spark.table("asof_stream_out")
        .collect().map(r => (r.getAs[Long]("t"),
          Option(r.getAs[java.lang.Double]("asof_px")))).toSet
      rows shouldBe Set((100L, None), (205L, Some(10.0)), (900L, None))
    } finally q.stop()
  }

  // intervals straddling bucket boundaries (width 10), inclusive
  // endpoints, a backwards interval (matches nothing), and a
  // negative-axis interval (floor-div, not truncate-div, semantics)
  private lazy val intervals: DataFrame = Seq(
    ("iv-a", 5L, 14L),   // crosses buckets 0 and 1
    ("iv-b", 14L, 14L),  // single point
    ("iv-c", 20L, 10L),  // backwards → dropped
    ("iv-d", -15L, -5L)  // negative axis
  ).toDF("iv", "lo", "hi")

  private lazy val points: DataFrame =
    Seq(("p1", 5L), ("p2", 14L), ("p3", 15L), ("p4", -10L), ("p5", 12L))
      .toDF("p", "x")

  "rangeJoin" should "emit each containing pair exactly once" in {
    val pairs = Temporal.rangeJoin(points, intervals, "x", "lo", "hi",
      bucketWidth = 10L)
      .collect().map(r => (r.getAs[String]("p"), r.getAs[String]("iv"))).toSet
    pairs shouldBe Set(
      ("p1", "iv-a"), // lo endpoint inclusive
      ("p2", "iv-a"), // hi endpoint inclusive
      ("p2", "iv-b"), // degenerate interval
      ("p5", "iv-a"),
      ("p4", "iv-d")  // negative axis
    )
  }

  it should "scope pairs by key columns when given" in {
    val kp = points.withColumn("k", when(col("p") === "p1", "A").otherwise("B"))
    val ki = intervals.withColumn("k", lit("A"))
    val pairs = Temporal.rangeJoin(kp, ki, "x", "lo", "hi", 10L, Seq("k"))
      .collect().map(r => (r.getAs[String]("p"), r.getAs[String]("iv"))).toSet
    pairs shouldBe Set(("p1", "iv-a")) // only the key-A point survives
  }

  it should "plan an equi join, not a nested-loop join" in {
    val df = Temporal.rangeJoin(points, intervals, "x", "lo", "hi", 10L)
    df.write.mode("overwrite").format("noop").save()
    val plan = df.queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }

  it should "reject overlapping non-key columns and bad widths" in {
    an[IllegalArgumentException] should be thrownBy
      Temporal.rangeJoin(points, intervals.withColumnRenamed("iv", "p"),
        "x", "lo", "hi", 10L)
    an[IllegalArgumentException] should be thrownBy
      Temporal.rangeJoin(points, intervals, "x", "lo", "hi", 0L)
  }
}
