package graft

import graft.pipeline.Sketches
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** KMV distinct-count sketch: exact below k, estimator above k
  * (pinned against an independent plain-Scala replay of the k-min
  * rule), merge correctness across partitions, NULL handling, and the
  * partial-aggregation plan shape. */
class SketchesSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def md5hash48(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(6).map(b => f"$b%02x").mkString, 16)
  }

  "distinctCountSketch" should "be exact below k and estimate above" in {
    // group A: 5 distinct values (< k=8 → exact); group B: 100 (> k)
    val df = ((1 to 5).map(i => ("A", i.toLong)) ++
      (1 to 200).map(i => ("B", (i % 100).toLong))).toDF("g", "v")
      .repartition(7) // force multi-partition partials + merge
    val rows = Sketches.distinctCountSketch(df, Seq("g"), "v", k = 8)
      .collect().map(r => r.getAs[String]("g") ->
        ((r.getAs[Int]("n_retained"), r.getAs[Long]("kth_min"),
          r.getAs[Double]("estimate")))).toMap

    rows("A")._1 shouldBe 5
    rows("A")._3 shouldBe 5.0 // exact below k

    // independent replay: k smallest 48-bit md5 hashes of B's values
    val hashes = (0 until 100).map(i => md5hash48(i.toString)).sorted
    val kth = hashes(7)
    rows("B")._1 shouldBe 8
    rows("B")._2 shouldBe kth
    rows("B")._3 shouldBe 7.0 * Sketches.Space48.toDouble / kth.toDouble
    // and the estimate lands in the promised error band (~1/sqrt(k-2))
    rows("B")._3 shouldBe 100.0 +- 100.0 * 2.5 / math.sqrt(8.0 - 2)
  }

  it should "ignore NULL values and dedup repeated ones" in {
    val df = Seq(Some(1L), Some(1L), Some(2L), None, None)
      .map(v => ("g", v)).toDF("g", "v")
    val r = Sketches.distinctCountSketch(df, Seq("g"), "v", k = 8)
      .collect().head
    r.getAs[Int]("n_retained") shouldBe 2
    r.getAs[Double]("estimate") shouldBe 2.0
  }

  it should "partial-aggregate (map-side combine) before the shuffle" in {
    val df = (1 to 1000).map(i => (i % 3, i.toLong)).toDF("g", "v")
      .repartition(8)
    val agg = Sketches.distinctCountSketch(df, Seq("g"), "v", k = 16)
    agg.write.mode("overwrite").format("noop").save()
    val plan = agg.queryExecution.executedPlan.toString
    // two ObjectHashAggregate stages (partial + final) around the
    // exchange: the sketch, not the rows, crosses the wire
    "ObjectHashAggregate".r.findAllIn(plan).size should be >= 2
  }

  it should "give identical results however the data is partitioned" in {
    val base = (1 to 500).map(i => ("g", i.toLong)).toDF("g", "v")
    val a = Sketches.distinctCountSketch(base.repartition(1), Seq("g"), "v", 16)
      .collect().head
    val b = Sketches.distinctCountSketch(base.repartition(13), Seq("g"), "v", 16)
      .collect().head
    a.getAs[Long]("kth_min") shouldBe b.getAs[Long]("kth_min")
    a.getAs[Double]("estimate") shouldBe b.getAs[Double]("estimate")
  }

  it should "reject bad arguments" in {
    val df = Seq(("g", 1L)).toDF("g", "v")
    an[IllegalArgumentException] should be thrownBy
      Sketches.distinctCountSketch(df, Nil, "v", 8)
    an[IllegalArgumentException] should be thrownBy
      Sketches.distinctCountSketch(df, Seq("g"), "v", 1)
  }

  "sketchTable + mergeSketches" should
    "roll up to exactly the direct coarse sketch" in {
    // fine groups (day, shard) each see >k distinct values, overlap
    // across groups; rollup by day and the grand total must equal
    // sketching those granularities directly
    val df = (1 to 3000).map { i =>
      (s"d${i % 3}", s"s${i % 5}", (i % 400).toLong)
    }.toDF("day", "shard", "v")
    val fine = Sketches.sketchTable(df, Seq("day", "shard"), "v", k = 16)
    fine.count() shouldBe 15
    fine.select(max(org.apache.spark.sql.functions.size(col("kmv"))))
      .head().getInt(0) shouldBe 16

    def rows(d: org.apache.spark.sql.DataFrame, keys: String*) =
      d.collect().map(r => keys.map(r.getAs[String]).mkString("|") ->
        ((r.getAs[Int]("n_retained"), r.getAs[Long]("kth_min"),
          r.getAs[Double]("estimate")))).toMap

    val viaMerge = rows(Sketches.mergeSketches(fine, Seq("day"), 16), "day")
    val direct = rows(Sketches.distinctCountSketch(df, Seq("day"), "v", 16), "day")
    viaMerge shouldBe direct

    val total = Sketches.mergeSketches(fine, Nil, 16).collect().head
    val directTotal = Sketches
      .distinctCountSketch(df.withColumn("g", lit(1)), Seq("g"), "v", 16)
      .collect().head
    total.getAs[Long]("kth_min") shouldBe directTotal.getAs[Long]("kth_min")
    total.getAs[Double]("estimate") shouldBe
      directTotal.getAs[Double]("estimate")
  }

  it should "keep coarse groups whose fine sketches are all empty" in {
    // a day of all-NULL values sketches to an empty array; the rollup
    // must still emit that day as (0, null, 0.0) like direct sketching
    val df = Seq(("d1", Some(1L)), ("d2", None), ("d2", None))
      .toDF("day", "v")
    val fine = Sketches.sketchTable(df, Seq("day"), "v", k = 8)
    val merged = Sketches.mergeSketches(fine, Seq("day"), 8)
      .collect().map(r => r.getAs[String]("day") ->
        ((r.getAs[Int]("n_retained"), r.getAs[Double]("estimate")))).toMap
    merged.keySet shouldBe Set("d1", "d2")
    merged("d2") shouldBe ((0, 0.0))
  }

  it should "run as a streaming aggregation with bounded per-group state" in {
    // the same TypedImperativeAggregate drives a continuous streaming
    // aggregate: per-group state is the ≤k-long sketch buffer (bounded
    // however many distinct values flow through), Update mode emits
    // each group's refreshed estimate per micro-batch
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long)]
    val out = Sketches.distinctCountSketch(
      input.toDF.toDF("g", "v"), Seq("g"), "v", k = 32)
    out.isStreaming shouldBe true
    val q = out.writeStream.format("memory").queryName("kmv_stream_out")
      .outputMode("update").start()
    def latest() = s.table("kmv_stream_out")
      .groupBy("g")
      .agg(org.apache.spark.sql.functions.last("estimate").as("e"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    try {
      input.addData(("a", 1L), ("a", 2L), ("a", 2L), ("b", 10L))
      q.processAllAvailable()
      latest() shouldBe Map("a" -> 2.0, "b" -> 1.0)
      // state carries: the second batch ADDS to the first's sketch,
      // repeated values do not inflate the distinct estimate
      input.addData(("a", 3L), ("a", 1L), ("b", 11L), ("b", 10L))
      q.processAllAvailable()
      latest() shouldBe Map("a" -> 3.0, "b" -> 2.0)
    } finally q.stop()
  }

  "exactRegimeM" should "size m so the Space-Saving sketch stays exact" in {
    // 600 distinct users: ×2 headroom -> target ~1200 -> m=4096 floor;
    // 5000 distinct: target ~10000 -> 16384 (modulo HLL ±5% rsd, which
    // the 2× headroom swallows — both land on the same power of two)
    val small = (1 to 600).map(i => s"u$i").toDF("user_id")
    Sketches.exactRegimeM(small, "user_id") shouldBe 4096
    val big = (1 to 5000).map(i => s"u$i").toDF("user_id")
    val m = Sketches.exactRegimeM(big, "user_id")
    m should (be(8192) or be(16384)) // 5000×2=10000; HLL rsd may round
    // exactness end-to-end: with that m, sketch counts == exact counts
    val ev = (1 to 5000).flatMap(i =>
      Seq.fill(1 + i % 3)(("e", s"u$i"))).toDF("event_type", "user_id")
    val top = Sketches.heavyHitters(ev, Seq("event_type"), "user_id",
      m = m, topK = 5).collect()
    all(top.map(_.getAs[Long]("err"))) shouldBe 0L
  }

  it should "run its cardinality pre-pass with a map-side partial" in {
    val df = (1 to 2000).map(i => s"u${i % 500}").toDF("user_id")
      .repartition(8)
    val pre = Sketches.distinctPrePass(df, "user_id")
    pre.write.mode("overwrite").format("noop").save()
    val plan = pre.queryExecution.executedPlan.toString
    // partial HLL per partition before the single-row exchange: the
    // corpus crosses the wire as one register set per partition
    plan should include("partial_approx_count_distinct")
    // exactly one single-partition exchange for the global agg (the
    // other Exchange in this plan is the test's own repartition(8))
    "Exchange SinglePartition".r.findAllIn(plan).size shouldBe 1
  }
}
