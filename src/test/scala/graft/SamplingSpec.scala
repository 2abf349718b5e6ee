package graft

import graft.pipeline.{Curation, Sampling}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Deterministic sampling, splits, stratified mixing, and curation
  * selection: decisions must be pure functions of (key, seed) —
  * stable under repartitioning and appends — and the portable bucket
  * must match an independent md5 computation bit for bit. */
class SamplingSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private lazy val rows: DataFrame = (1 to 2000)
    .map(i => (i.toLong, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr",
      i % 100))
    .toDF("id", "lang", "score")

  it should "round the 1e-6-granular rate threshold instead of truncating" in {
    // 0.000249 * 1e6 = 248.99999999999997 in double: truncation uses
    // threshold 248 while the documented external replay uses 249 —
    // plant a key whose bucket is exactly 248 and require it kept
    import org.apache.spark.sql.catalyst.expressions.XXH64
    def bucketOf(id: Long): Long = // = pmod(xxhash64(id, 0L), 1e6)
      Math.floorMod(XXH64.hashLong(0L, XXH64.hashLong(id, 42L)), 1000000L)
    val id248 = (0L to 20000000L).find(bucketOf(_) == 248L)
    id248.isDefined shouldBe true
    val df = Seq(id248.get).toDF("id")
    Sampling.deterministicSample(df, "id", 0.000249, seed = 0)
      .count() shouldBe 1L
  }

  "deterministicSample" should "be stable under repartitioning" in {
    val a = Sampling.deterministicSample(rows, "id", 0.3, seed = 7)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(rows.repartition(13), "id", 0.3, seed = 7)
      .select("id").collect().map(_.getLong(0)).toSet
    a shouldBe b
    a.size.toDouble shouldBe 600.0 +- 80.0 // ~Binomial(2000, .3)
  }

  it should "give independent samples for different seeds" in {
    val a = Sampling.deterministicSample(rows, "id", 0.5, seed = 1)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(rows, "id", 0.5, seed = 2)
      .select("id").collect().map(_.getLong(0)).toSet
    a should not be b
    // overlap ≈ 25% of population for independent halves
    (a intersect b).size.toDouble shouldBe 500.0 +- 120.0
  }

  "portableBucket" should "match an independent JVM md5 computation" in {
    val got = rows.limit(50)
      .select(col("id"), Sampling.portableBucket(col("id"), seed = 42).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (id, b) =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:42".getBytes("UTF-8"))
      val hex = md.take(4).map("%02x".format(_)).mkString
      val expected = java.lang.Long.parseLong(hex, 16) % Sampling.Buckets
      b shouldBe expected
    }
  }

  "split" should "partition every row into exactly one part" in {
    val parts = Sampling.split(rows, "id", Seq(0.8, 0.1, 0.1), seed = 3)
    parts should have size 3
    val sets = parts.map(_.select("id").collect().map(_.getLong(0)).toSet)
    sets.map(_.size).sum shouldBe 2000
    sets.combinations(2).foreach { case Seq(x, y) => (x intersect y) shouldBe empty }
    sets.head.size.toDouble shouldBe 1600.0 +- 120.0
  }

  it should "partition exhaustively and disjointly in portable mode too" in {
    val parts = Sampling.split(rows, "id", Seq(0.7, 0.2, 0.1), seed = 0,
      portable = true)
    val sets = parts.map(_.select("id").collect().map(_.getLong(0)).toSet)
    sets.map(_.size).sum shouldBe 2000
    sets.combinations(2).foreach { case Seq(a, b) =>
      a.intersect(b) shouldBe empty
    }
    sets.reduce(_ ++ _) should have size 2000
  }

  it should "never migrate rows when data is appended" in {
    val half = rows.filter(col("id") <= 1000)
    val fullParts = Sampling.split(rows, "id", Seq(0.5, 0.5), seed = 9)
      .map(_.filter(col("id") <= 1000).select("id").collect().map(_.getLong(0)).toSet)
    val halfParts = Sampling.split(half, "id", Seq(0.5, 0.5), seed = 9)
      .map(_.select("id").collect().map(_.getLong(0)).toSet)
    fullParts shouldBe halfParts
  }

  "stratifiedSample" should "apply per-stratum rates with a default" in {
    val out = Sampling.stratifiedSample(rows, "lang",
      Map("en" -> 1.0, "de" -> 0.2), keyCol = "id", seed = 5)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang("en") shouldBe 666 // rate 1.0 keeps every one of the 666 en rows
    byLang("de").toDouble shouldBe (667 * 0.2) +- 50.0
    byLang.get("fr") shouldBe None // defaultRate 0.0 drops the stratum
  }

  "topKPerGroup" should "keep the k best per group with deterministic ties" in {
    val df = Seq(
      ("a", 1L, 9), ("a", 2L, 9), ("a", 3L, 5), ("a", 4L, 1),
      ("b", 5L, 7), ("b", 6L, 3),
      ("c", 7L, 2)
    ).toDF("g", "id", "score")
    val out = Curation.topKPerGroup(df, "g", "score", k = 2, tieCol = "id")
      .select("g", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // tie on score 9 broken by ascending id: 1 and 2 both fit in k=2
    out shouldBe Set(("a", 1L), ("a", 2L), ("b", 5L), ("b", 6L), ("c", 7L))
    val top1 = Curation.topKPerGroup(df, "g", "score", k = 1, tieCol = "id")
      .select("g", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    top1 shouldBe Set(("a", 1L), ("b", 5L), ("c", 7L))
  }

  "tokenBudgetSample" should "fill each stratum in hash order up to the budget" in {
    val df = Seq(
      ("en", 1L, 100L), ("en", 2L, 100L), ("en", 3L, 100L), ("en", 4L, 100L),
      ("de", 5L, 50L), ("de", 6L, 500L)
    ).toDF("lang", "doc_id", "ntok")
    val kept = Sampling.tokenBudgetSample(
      df, "lang", "ntok", "doc_id", budget = 250, portable = true)
      .select("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // greedy fill in bucket order: cumBefore < 250 keeps rows until the
    // stratum holds >= 250 tokens (boundary row may overflow)
    val en = kept.filter(_._1 == "en")
    en.size shouldBe 3 // 100+100+100 >= 250, third row overflows to 300
    kept.filter(_._1 == "de").size should (be >= 1 and be <= 2)
  }

  it should "be deterministic under repartitioning and respect budget 0" in {
    val df = (1L to 200L).map(i => ("en", i, 10L)).toDF("lang", "doc_id", "ntok")
    val a = Sampling.tokenBudgetSample(df, "lang", "ntok", "doc_id", 500)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.tokenBudgetSample(df.repartition(13), "lang", "ntok",
      "doc_id", 500).select("doc_id").collect().map(_.getLong(0)).toSet
    a shouldBe b
    a.size shouldBe 50 // 500 / 10 tokens each
    Sampling.tokenBudgetSample(df, "lang", "ntok", "doc_id", 0)
      .count() shouldBe 0L
  }

  "corpusReport" should "summarize per-stratum composition" in {
    val df = Seq(
      ("en", "one two three"), ("en", "four five"),
      ("de", "eins"), ("de", null.asInstanceOf[String])
    ).toDF("lang", "text")
    val rep = Curation.corpusReport(df, "lang", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    rep("en") shouldBe ((2L, 5L, 2.5, 2.5))   // docs, tokens, avg, p50
    // NULL text: counted as a doc, contributes no tokens
    rep("de")._1 shouldBe 2L
    rep("de")._2 shouldBe 1L
    rep("de")._3 shouldBe 1.0
  }

  "weightedSample" should "honor per-row keep probabilities" in {
    val df = (1 to 2000).map { i =>
      (i.toLong, if (i % 2 == 0) 1.0 else 0.0)
    }.toDF("id", "w")
    val kept = Sampling.weightedSample(df, "id", "w")
      .select("id").collect().map(_.getLong(0))
    // weight 1 → always kept, weight 0 → never
    kept should have size 1000
    all(kept.map(_ % 2)) shouldBe 0L
  }

  it should "drop NULL weights, clamp out-of-range ones, and stay stable" in {
    val df = Seq(
      (1L, Some(5.0)),        // clamps to 1 → kept
      (2L, Some(-3.0)),       // clamps to 0 → dropped
      (3L, None),             // NULL → dropped
      (4L, Some(Double.NaN))  // NaN → dropped (NOT clamped to 1)
    ).toDF("id", "w")
    val kept = Sampling.weightedSample(df, "id", "w")
      .select("id").collect().map(_.getLong(0)).toSet
    kept shouldBe Set(1L)
    // intermediate weights keep roughly their share, identically
    // across partitionings (pure function of the key)
    val mid = (1 to 4000).map(i => (i.toLong, 0.3)).toDF("id", "w")
    val a = Sampling.weightedSample(mid.repartition(1), "id", "w")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.weightedSample(mid.repartition(11), "id", "w")
      .collect().map(_.getLong(0)).toSet
    a shouldBe b
    a.size.toDouble shouldBe (4000 * 0.3) +- 4000 * 0.3 * 0.2
  }

  "temperatureRates" should "flatten shares toward uniform as tau drops" in {
    // 900 'en' vs 100 'de': natural shares 0.9/0.1
    val df = ((1 to 900).map(i => (i.toLong, "en")) ++
      (901 to 1000).map(i => (i.toLong, "de"))).toDF("id", "lang")
    val m = Sampling.temperatureRates(df, "lang", tau = 0.5,
      targetFraction = 0.5)
      .collect().map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("share"),
          r.getAs[Double]("rate")))).toMap
    m("en")._1 shouldBe 900L
    m("en")._2 shouldBe 0.9
    // sqrt weighting: q_en = 30/40, q_de = 10/40 of the 500-doc target
    // → rates 375/900 and 125/100 (capped at 1)
    m("en")._3 shouldBe (375.0 / 900) +- 1e-6
    m("de")._3 shouldBe 1.0 // rare stratum upsample capped
  }

  it should "keep natural proportions at tau = 1" in {
    val df = ((1 to 300).map(i => (i.toLong, "a")) ++
      (301 to 400).map(i => (i.toLong, "b"))).toDF("id", "g")
    val rates = Sampling.temperatureRates(df, "g", tau = 1.0,
      targetFraction = 0.4)
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Double]("rate"))
      .toMap
    rates("a") shouldBe 0.4 +- 1e-6
    rates("b") shouldBe 0.4 +- 1e-6
  }

  it should "sample NULL strata at their computed rate, not drop them" in {
    // tau=1, target=1 → every stratum's rate is 1, including NULL:
    // all rows survive (an equi-join would silently delete the NULLs
    // while their count still diluted every other stratum's rate)
    val df = (Seq((1L, Some("a")), (2L, Some("a")), (3L, None), (4L, None)))
      .toDF("id", "g")
    Sampling.temperatureSample(df, "g", "id", tau = 1.0,
      targetFraction = 1.0).count() shouldBe 4L
  }

  "temperatureSample" should "hit per-stratum targets deterministically" in {
    val df = ((1 to 900).map(i => (i.toLong, "en")) ++
      (901 to 1000).map(i => (i.toLong, "de"))).toDF("id", "lang")
    val kept = Sampling.temperatureSample(df, "lang", "id",
      tau = 0.5, targetFraction = 0.5)
    val byLang = kept.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang("de") shouldBe 100L // rate capped at 1 → all kept
    byLang("en").toDouble shouldBe 375.0 +- 375 * 0.15
    // stable under repartitioning
    val again = Sampling.temperatureSample(df.repartition(13), "lang", "id",
      tau = 0.5, targetFraction = 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    kept.select("id").collect().map(_.getLong(0)).toSet shouldBe again
  }

  "aboveGroupQuantile" should "threshold within each group" in {
    val df = Seq(
      ("x", 1L, 10), ("x", 2L, 20), ("x", 3L, 30), ("x", 4L, 40),
      ("y", 5L, 1), ("y", 6L, 2)
    ).toDF("g", "id", "score")
    val out = Curation.aboveGroupQuantile(df, "g", "score", 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    // x median 25 → 30,40 survive; y median 1.5 → 2 survives
    out shouldBe Set(3L, 4L, 6L)
  }
}
