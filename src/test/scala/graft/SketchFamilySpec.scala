package graft

import graft.pipeline.Sketches
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Space-Saving heavy hitters and the bottom-k-by-hash quantile
  * sample: exact-regime agreement with plain-Scala replays, the
  * ICDT '05 ε-guarantees under eviction pressure, rollup-merge
  * equivalence, partition invariance, and the partial-aggregation
  * plan shape. */
class SketchFamilySpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def md5hash48(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(6).map(b => f"$b%02x").mkString, 16)
  }

  // ---------------------------------------------------------- heavy hitters

  private def hhRows(d: DataFrame) =
    d.collect().map(r => (r.getAs[String]("g"), r.getAs[Int]("rank"),
      r.getAs[String]("item"), r.getAs[Long]("count"), r.getAs[Long]("err")))

  "heavyHitters" should "be exact (err = 0) when distinct fits m" in {
    // zipf-ish: item i appears i times; 40 distinct < m = 64
    val df = (1 to 40).flatMap(i => Seq.fill(i)(("g", s"w$i")))
      .toDF("g", "v").repartition(7)
    val got = hhRows(Sketches.heavyHitters(df, Seq("g"), "v", m = 64, topK = 5))
    got shouldBe (0 until 5).map(j =>
      ("g", j + 1, s"w${40 - j}", (40 - j).toLong, 0L))
  }

  it should "honor the Space-Saving bounds under eviction pressure" in {
    // 500 distinct items >> m = 50; true counts known exactly
    val truth = (1 to 500).map(i => s"w$i" -> (if (i <= 10) 200L else 3L)).toMap
    val data = truth.toSeq.flatMap { case (w, n) => Seq.fill(n.toInt)(("g", w)) }
    val df = new scala.util.Random(7).shuffle(data).toDF("g", "v")
      .repartition(5)
    val n = data.size.toLong
    val m = 50
    val got = hhRows(Sketches.heavyHitters(df, Seq("g"), "v", m, topK = m))
    got.size should be <= m
    got.foreach { case (_, _, item, count, err) =>
      val t = truth(item)
      count should be >= t         // never underestimates
      (count - err) should be <= t // count − err never overestimates
    }
    // every item with true frequency > N/m must be retained
    val retained = got.map(_._3).toSet
    truth.filter(_._2 > n / m).keySet.subsetOf(retained) shouldBe true
  }

  it should "ignore NULL items and partial-aggregate before the shuffle" in {
    val df = Seq(("g", Some("a")), ("g", Some("a")), ("g", None))
      .toDF("g", "v").repartition(3)
    val agg = Sketches.heavyHitters(df, Seq("g"), "v", m = 8, topK = 3)
    hhRows(agg) shouldBe Seq(("g", 1, "a", 2L, 0L))
    agg.write.mode("overwrite").format("noop").save()
    "ObjectHashAggregate".r
      .findAllIn(agg.queryExecution.executedPlan.toString)
      .size should be >= 2
  }

  it should "give identical exact-regime results however partitioned" in {
    val base = (1 to 30).flatMap(i => Seq.fill(i)(("g", s"w$i"))).toDF("g", "v")
    val a = hhRows(Sketches.heavyHitters(base.repartition(1), Seq("g"), "v", 64, 10))
    val b = hhRows(Sketches.heavyHitters(base.repartition(13), Seq("g"), "v", 64, 10))
    a shouldBe b
  }

  it should "keep a group whose items were all NULL (outer explode)" in {
    // consistent with quantileSketch's n_retained=0 row: an observed
    // group with nothing measurable still surfaces, so joins on the
    // group key don't silently lose it
    val df = Seq(("g", Some("a")), ("h", None), ("h", None)).toDF("g", "v")
    val rows = Sketches.heavyHitters(df, Seq("g"), "v", m = 8, topK = 3)
      .collect().map(r => (r.getAs[String]("g"),
        Option(r.getAs[Integer]("rank")), Option(r.getAs[String]("item"))))
    rows.toSet shouldBe Set(("g", Some(1: Integer), Some("a")),
      ("h", None, None))
  }

  "heavyHitterTable + mergeHeavyHitters" should
    "roll up to exactly the direct coarse sketch in the exact regime" in {
    val df = (1 to 1200).map { i =>
      (s"d${i % 3}", s"w${i % 40}")
    }.toDF("day", "v")
    val fine = Sketches.heavyHitterTable(df, Seq("day"), "v", m = 64)
    fine.count() shouldBe 3
    val merged = hhRows(Sketches.mergeHeavyHitters(fine, Nil, m = 64, topK = 40)
      .withColumn("g", lit("g")))
    val direct = hhRows(Sketches.heavyHitters(
      df.withColumn("g", lit("g")), Seq("g"), "v", m = 64, topK = 40))
    merged.map { case (_, r, i, c, e) => (r, i, c, e) } shouldBe
      direct.map { case (_, r, i, c, e) => (r, i, c, e) }
    merged.foreach(_._5 shouldBe 0L) // no eviction anywhere → still exact
  }

  it should "keep the mergeable-summary bounds under rollup eviction" in {
    // fine sketches each fit m, but the union of 3 days' items doesn't
    val truth = scala.collection.mutable.Map.empty[String, Long]
    val rows = (0 until 3).flatMap { d =>
      (1 to 60).flatMap { i =>
        val w = s"w${d * 40 + i}" // 60 items/day, 20 shared with next
        val n = if (i <= 5) 50 else 2
        truth(w) = truth.getOrElse(w, 0L) + n
        Seq.fill(n)((s"d$d", w))
      }
    }
    val df = rows.toDF("day", "v")
    val fine = Sketches.heavyHitterTable(df, Seq("day"), "v", m = 64)
    val merged = hhRows(Sketches.mergeHeavyHitters(fine, Nil, m = 64, topK = 64)
      .withColumn("g", lit("g")))
    merged.foreach { case (_, _, item, count, err) =>
      count should be >= truth(item)
      (count - err) should be <= truth(item)
    }
  }

  // ------------------------------------------------------- quantile sample

  "quantileSketch" should "be exact when a group fits k" in {
    // values 0..999 in one group; nearest-rank-below quantiles known
    val df = (0 until 1000).map(i => ("g", i.toLong, i.toDouble))
      .toDF("g", "id", "v").repartition(9)
    val r = Sketches.quantileSketch(df, Seq("g"), "v", "id", k = 2048,
      probs = Seq(0.0, 0.5, 0.9, 1.0)).collect().head
    r.getAs[Int]("n_retained") shouldBe 1000
    r.getAs[Double]("q_0") shouldBe 0.0
    r.getAs[Double]("q_50") shouldBe math.floor(0.5 * 999) // 499
    r.getAs[Double]("q_90") shouldBe math.floor(0.9 * 999) // 899
    r.getAs[Double]("q_100") shouldBe 999.0
  }

  it should "retain exactly the k smallest hashes of the id above k" in {
    val df = (0 until 500).map(i => ("g", i.toLong, i.toDouble))
      .toDF("g", "id", "v").repartition(11)
    val k = 64
    val r = Sketches.quantileSketch(df, Seq("g"), "v", "id", k,
      probs = Seq(0.5)).collect().head
    r.getAs[Int]("n_retained") shouldBe k
    // independent replay: the 64 ids with the smallest portable hash
    val sample = (0 until 500).map(i => md5hash48(i.toString) -> i.toDouble)
      .sortBy(_._1).take(k).map(_._2).sorted
    r.getAs[Double]("q_50") shouldBe sample(math.floor(0.5 * (k - 1)).toInt)
    // estimate is close in rank: sampled median within ±4σ·n of true
    math.abs(r.getAs[Double]("q_50") - 249.5) should be <=
      4.0 * 500.0 / math.sqrt(k.toDouble)
  }

  it should "be partition-invariant and emit NULLs for empty groups" in {
    val base = (0 until 300).map(i => ("g", i.toLong, math.sin(i).abs))
      .toDF("g", "id", "v")
    val a = Sketches.quantileSketch(base.repartition(1), Seq("g"), "v", "id",
      32, Seq(0.5, 0.9)).collect().head
    val b = Sketches.quantileSketch(base.repartition(13), Seq("g"), "v", "id",
      32, Seq(0.5, 0.9)).collect().head
    a.getAs[Double]("q_50") shouldBe b.getAs[Double]("q_50")
    a.getAs[Double]("q_90") shouldBe b.getAs[Double]("q_90")

    val nulls = Seq(("g", Option.empty[java.lang.Double], 1L))
      .toDF("g", "v", "id")
    val r = Sketches.quantileSketch(nulls, Seq("g"), "v", "id", 8, Seq(0.5))
      .collect().head
    r.getAs[Int]("n_retained") shouldBe 0
    r.isNullAt(r.fieldIndex("q_50")) shouldBe true
  }

  "quantileSketchTable + mergeQuantileSketches" should
    "roll up to exactly the direct coarse sample" in {
    val df = (0 until 900).map(i =>
      (s"d${i % 3}", i.toLong, (i * 37 % 900).toDouble))
      .toDF("day", "id", "v")
    val k = 128 // < 900 total → the merged sample is a true bottom-k union
    val fine = Sketches.quantileSketchTable(df, Seq("day"), "v", "id", k)
    fine.count() shouldBe 3
    val merged = Sketches.mergeQuantileSketches(fine, Nil, k, Seq(0.5, 0.99))
      .collect().head
    val direct = Sketches.quantileSketch(
      df.withColumn("g", lit("g")), Seq("g"), "v", "id", k, Seq(0.5, 0.99))
      .collect().head
    merged.getAs[Int]("n_retained") shouldBe direct.getAs[Int]("n_retained")
    merged.getAs[Double]("q_50") shouldBe direct.getAs[Double]("q_50")
    merged.getAs[Double]("q_99") shouldBe direct.getAs[Double]("q_99")
  }

  it should "reject bad arguments" in {
    val df = Seq(("g", 1L, 1.0)).toDF("g", "id", "v")
    an[IllegalArgumentException] should be thrownBy
      Sketches.quantileSketch(df, Nil, "v", "id", 8, Seq(0.5))
    an[IllegalArgumentException] should be thrownBy
      Sketches.quantileSketch(df, Seq("g"), "v", "id", 8, Seq(1.5))
    an[IllegalArgumentException] should be thrownBy
      Sketches.heavyHitters(df, Seq("g"), "v", m = 8, topK = 9)
  }

  "heavyHitters over a stream" should
    "track trending items with bounded per-group state" in {
    // the same TypedImperativeAggregate drives an Update-mode
    // streaming aggregation: per-group state is the ≤m-counter
    // Space-Saving buffer, each micro-batch refreshes the top-k
    val s = spark
    implicit val sqlCtx = s.sqlContext
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
    val out = Sketches.heavyHitters(
      input.toDF.toDF("g", "v"), Seq("g"), "v", m = 16, topK = 2)
    out.isStreaming shouldBe true
    val q = out.writeStream.format("memory").queryName("hh_stream_out")
      .outputMode("complete").start()
    def top() = s.table("hh_stream_out")
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Int]("rank"),
        r.getAs[String]("item"), r.getAs[Long]("count"))).sorted.toList
    try {
      input.addData(("a", "x"), ("a", "x"), ("a", "y"), ("b", "z"))
      q.processAllAvailable()
      top() shouldBe List(("a", 1, "x", 2L), ("a", 2, "y", 1L),
        ("b", 1, "z", 1L))
      // counts accumulate across batches; the leader can change
      input.addData(("a", "y"), ("a", "y"), ("b", "z"))
      q.processAllAvailable()
      top() shouldBe List(("a", 1, "y", 3L), ("a", 2, "x", 2L),
        ("b", 1, "z", 2L))
    } finally q.stop()
  }

  // ---------------------------------------------------------- count-min

  private def cmEsts(d: DataFrame) =
    d.collect().map(r =>
      (r.getAs[String]("item"), r.getAs[Long]("est"))).toMap

  "cmSketchTable + cmEstimates" should
    "read exact counts when the width is collision-sparse" in {
    val df = (1 to 20).flatMap(i => Seq.fill(i)(("g", s"w$i")))
      .toDF("g", "v").repartition(7)
    val sk = Sketches.cmSketchTable(df, Seq("g"), "v", depth = 4, width = 512)
    val est = cmEsts(Sketches.cmEstimates(sk, Seq("g"),
      (1 to 20).map(i => s"w$i") :+ "absent", depth = 4, width = 512))
    (1 to 20).foreach(i => est(s"w$i") shouldBe i.toLong)
    est("absent") shouldBe 0L
  }

  it should "never underestimate under heavy collision pressure" in {
    // 400 distinct items into width 16: most buckets collide, so
    // estimates inflate — the CM guarantee is one-sided
    val truth = (1 to 400).map(i => s"w$i" -> ((i % 7) + 1).toLong).toMap
    val df = truth.toSeq.flatMap { case (w, n) => Seq.fill(n.toInt)(("g", w)) }
      .toDF("g", "v").repartition(5)
    val sk = Sketches.cmSketchTable(df, Seq("g"), "v", depth = 4, width = 16)
    val est = cmEsts(Sketches.cmEstimates(sk, Seq("g"),
      truth.keys.toSeq.sorted, depth = 4, width = 16))
    truth.foreach { case (w, n) => est(w) should be >= n }
  }

  it should "respect weights and skip NULL items" in {
    val df = Seq(("g", "a", 5L), ("g", "a", 2L), ("g", "b", 1L),
      ("g", null, 100L)).toDF("g", "v", "w")
    val sk = Sketches.cmSketchTable(df, Seq("g"), "v", depth = 2,
      width = 128, weightCol = Some("w"))
    val est = cmEsts(Sketches.cmEstimates(sk, Seq("g"), Seq("a", "b"),
      depth = 2, width = 128))
    est shouldBe Map("a" -> 7L, "b" -> 1L)
  }

  "mergeCmSketches" should "equal the direct sketch exactly (cellwise sum)" in {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 600).map(_ =>
      (s"d${rnd.nextInt(5)}", s"w${rnd.nextInt(80)}"))
    val df = rows.toDF("day", "v").repartition(6)
    val daily = Sketches.cmSketchTable(df, Seq("day"), "v",
      depth = 4, width = 32)
    val merged = Sketches.mergeCmSketches(daily, Nil, depth = 4, width = 32)
    val direct = Sketches.cmSketchTable(
      df.withColumn("__all", lit("all")), Seq("__all"), "v",
      depth = 4, width = 32)
    merged.select("cm").collect().map(_.getSeq[Long](0)).toSeq shouldBe
      direct.select("cm").collect().map(_.getSeq[Long](0)).toSeq
    // and a partial rollup (to a coarser, non-empty key set) keeps keys
    val byPair = df.withColumn("pair", expr("substring(day, 1, 1)"))
    val fine = Sketches.cmSketchTable(byPair, Seq("day", "pair"), "v",
      depth = 4, width = 32)
    val up = Sketches.mergeCmSketches(fine, Seq("pair"), depth = 4, width = 32)
    up.columns.toSeq shouldBe Seq("pair", "cm")
    up.count() shouldBe 1L
  }

  "a streaming CM sketch" should "accumulate cells across micro-batches" in {
    // same composition story as the trending-items face: the
    // TypedImperativeAggregate IS the per-group streaming state
    // (depth·width longs), each micro-batch folds in cellwise
    val s = spark
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
    val out = Sketches.cmSketchTable(
      input.toDF.toDF("g", "v"), Seq("g"), "v", depth = 2, width = 64)
    out.isStreaming shouldBe true
    val q = out.writeStream.format("memory").queryName("cm_stream_out")
      .outputMode("complete").start()
    def est(items: Seq[String]) = cmEsts(Sketches.cmEstimates(
      s.table("cm_stream_out"), Seq("g"), items, depth = 2, width = 64))
    try {
      input.addData(("a", "x"), ("a", "x"), ("a", "y"))
      q.processAllAvailable()
      est(Seq("x", "y")) shouldBe Map("x" -> 2L, "y" -> 1L)
      input.addData(("a", "x"))
      q.processAllAvailable()
      est(Seq("x", "y")) shouldBe Map("x" -> 3L, "y" -> 1L)
    } finally q.stop()
  }

  "cm_sketch" should "be callable from SQL and agree with the API" in {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(("a", 1L), ("a", 1L), ("b", 1L)).toDF("v", "w")
    df.createOrReplaceTempView("cm_sql_in")
    val cells = spark.sql(
      "SELECT cm_sketch(v, w, 2, 64) AS cm FROM cm_sql_in")
      .collect().head.getSeq[Long](0)
    val api = Sketches.cmSketchTable(
      df.withColumn("g", lit("g")), Seq("g"), "v", depth = 2, width = 64,
      weightCol = Some("w"))
      .select("cm").collect().head.getSeq[Long](0)
    cells shouldBe api
    cells.sum shouldBe 6L // 3 arrivals × 2 depth rows × weight 1
  }

  "cmEstimateColumn" should "agree with the literal-item lookup over a query table" in {
    val df = (1 to 30).flatMap(i => Seq.fill(i % 5 + 1)(("g", s"w$i")))
      .toDF("g", "v")
    val sk = Sketches.cmSketchTable(df, Seq("g"), "v", depth = 3, width = 64)
    val items = (1 to 30).map(i => s"w$i") :+ "absent"
    val lit = cmEsts(Sketches.cmEstimates(sk, Seq("g"), items,
      depth = 3, width = 64))
    val queries = items.toDF("item")
    val dyn = sk.crossJoin(queries)
      .select(col("item"),
        Sketches.cmEstimateColumn(col("cm"), col("item"), 3, 64).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    dyn shouldBe lit
  }

  it should "match the documented DuckDB bucket replay" in {
    // the same '0x'||substr(md5(r||':'||item),1,12) convention the
    // oracle uses — pinned here so a hash change cannot slip through
    // as a mere battery mismatch
    graft.functions.SketchExprs.cmHash48(0, "click") shouldBe
      md5hash48("0:click")
    graft.functions.SketchExprs.cmHash48(3, "wüñ∂") shouldBe
      md5hash48("3:wüñ∂")
  }
}
