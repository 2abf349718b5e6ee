package graft

import graft.functions.QualityExprs
import graft.pipeline.Quality
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Trained quality classifier: held-out discrimination, a
  * differential fuzz of the hot-path scorer against a plain-Scala
  * replay of the model definition, the DataFrame training face
  * reproducing the committed weights bit-for-bit, SQL registration,
  * and the null/empty row-retention contract. */
class QualityModelSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def scoreOf(text: String): (Long, Int) = {
    val row = QualityExprs.score(
      if (text == null) null else UTF8String.fromString(text),
      QualityExprs.defaultWeights)
    (row.getLong(0), row.getInt(1))
  }

  behavior of "QualityExprs"

  it should "separate held-out prose from held-out junk" in {
    // the probes are committed constants the model never trained on —
    // sign of the NB score is the discrimination claim
    for (t <- QualityExprs.heldOutPositive)
      withClue(s"held-out positive '${t.take(60)}...': ") {
        scoreOf(t)._1 should be > 0L
      }
    for (t <- QualityExprs.heldOutNegative)
      withClue(s"held-out negative '${t.take(60)}...': ") {
        scoreOf(t)._1 should be < 0L
      }
  }

  it should "score training seeds on the correct side (sanity floor)" in {
    for (t <- QualityExprs.positiveSeeds) scoreOf(t)._1 should be > 0L
    for (t <- QualityExprs.negativeSeeds) scoreOf(t)._1 should be < 0L
  }

  it should "return (0, 0) for null, empty and whitespace text" in {
    scoreOf(null) shouldBe ((0L, 0))
    scoreOf("") shouldBe ((0L, 0))
    scoreOf("   \t  \n ") shouldBe ((0L, 0))
  }

  it should "count n_grams = 2·tokens − 1" in {
    scoreOf("one")._2 shouldBe 1
    scoreOf("one two")._2 shouldBe 3
    scoreOf("one two three four")._2 shouldBe 7
  }

  it should "agree with a plain-Scala replay of the model definition on fuzzed inputs" in {
    // independent formulation: naive tokenize → uni+bi grams → fresh
    // md5 bucket → Map lookup — no shared code with the hot path
    // beyond the committed weight array itself
    def referenceScore(text: String): (Long, Long) = {
      val capped = if (text.length > QualityExprs.MaxChars)
        text.substring(0, QualityExprs.MaxChars) else text
      val toks = capped.toLowerCase(java.util.Locale.ROOT)
        .split("\\s+").filter(_.nonEmpty).toSeq
      val gs = toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      val md = java.security.MessageDigest.getInstance("MD5")
      def bucket(g: String): Int = {
        md.reset()
        val hex = md.digest(g.getBytes("UTF-8"))
          .map(b => f"${b & 0xff}%02x").mkString
        (java.lang.Long.parseLong(hex.substring(0, 8), 16) %
          QualityExprs.NumBuckets).toInt
      }
      (gs.map(g => QualityExprs.defaultWeights(bucket(g))).sum, gs.size.toLong)
    }
    val seed = java.lang.Long.getLong("graft.fuzz.seed", 1321L)
    val rnd = new scala.util.Random(seed)
    val vocab: IndexedSeq[String] =
      (QualityExprs.positiveSeeds ++ QualityExprs.negativeSeeds)
        .flatMap(_.split("\\s+")).toIndexedSeq
    def randomText(): String =
      (0 until rnd.nextInt(60)).map { _ =>
        rnd.nextInt(5) match {
          case 0 | 1 => vocab(rnd.nextInt(vocab.size))
          case 2 => rnd.nextInt(100000).toString
          case 3 => // unseen letter runs → untouched buckets
            (0 until 1 + rnd.nextInt(8))
              .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
          case _ => if (rnd.nextBoolean()) "\t" else "  "
        }
      }.mkString(" ")
    var i = 0
    while (i < 200) {
      val t = randomText()
      val (gotS, gotN) = scoreOf(t)
      val (refS, refN) = referenceScore(t)
      withClue(s"seed=$seed input='${t.take(120)}': ") {
        gotS shouldBe refS
        gotN.toLong shouldBe refN
      }
      i += 1
    }
  }

  it should "cap scoring at MaxChars" in {
    val base = "alpha beta gamma "
    val long = base * (QualityExprs.MaxChars / base.length + 10)
    val capped = long.substring(0, QualityExprs.MaxChars)
    scoreOf(long) shouldBe scoreOf(capped)
  }

  behavior of "Quality.trainQualityWeights"

  it should "reproduce the committed model from the committed seeds bit-for-bit" in {
    val labeled =
      (QualityExprs.positiveSeeds.map(t => (t, true)) ++
        QualityExprs.negativeSeeds.map(t => (t, false)))
        .toDF("text", "label")
    val trained = Quality.collectWeights(
      Quality.trainQualityWeights(labeled, "text", "label"))
    trained should have length QualityExprs.NumBuckets
    trained.toSeq shouldBe QualityExprs.defaultWeights.toSeq
  }

  it should "score with a custom-trained model through the same expression" in {
    // a tiny two-class corpus: 'good'-family grams positive,
    // 'spam'-family negative; the trained model must route them
    val labeled = Seq(
      ("solid informative careful writing about real topics", true),
      ("thorough clear explanation of a real process", true),
      ("spam spam buy now click here spam discount", false),
      ("click here buy cheap spam offer now", false)).toDF("text", "label")
    val w = Quality.collectWeights(
      Quality.trainQualityWeights(labeled, "text", "label"))
    val scored = Quality.scoreWith(
      Seq((1L, "careful informative writing"), (2L, "buy spam click here"))
        .toDF("id", "text"), "text", w)
      .select("id", "keep").as[(Long, Boolean)].collect().toMap
    scored(1L) shouldBe true
    scored(2L) shouldBe false
  }

  it should "degrade to the uniform (all-zero) model on a gram-free corpus" in {
    // all-NULL / whitespace text trains NOTHING: zero counts and zero
    // totals give ln(1) = 0 for every bucket — the uniform NB model —
    // rather than the NULL weights that used to NPE at collect
    val labeled = Seq((null.asInstanceOf[String], true), ("   ", false))
      .toDF("text", "label")
    val w = Quality.collectWeights(
      Quality.trainQualityWeights(labeled, "text", "label"))
    w.distinct.toSeq shouldBe Seq(0L)
  }

  behavior of "SQL registration"

  it should "expose quality_model_score and quality_grams" in {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT quality_model_score('the printing press spread rapidly') AS q," +
        " quality_grams('a b c') AS g")
      .selectExpr("q.score", "q.n_grams", "size(g)").collect()(0)
    r.getInt(1) shouldBe (2 * 5 - 1)
    r.getInt(2) shouldBe 5
    // the SQL face and the column face are the same expression
    val viaCol = Seq("the printing press spread rapidly").toDF("t")
      .select(QualityExprs.qualityModelScoreCol(col("t")).as("q"))
      .select("q.score").as[Long].collect()(0)
    r.getLong(0) shouldBe viaCol
  }

  it should "keep the scoring plan map-only (no exchange)" in {
    val df = Seq((1L, "some text here")).toDF("doc_id", "text")
      .select(col("doc_id"),
        QualityExprs.qualityModelScoreCol(col("text")).as("q"))
    val plan = df.queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }

  behavior of "committed model constants"

  it should "have a near-balanced prior and a small base weight" in {
    QualityExprs.priorWeight shouldBe 0L
    // |w0| = |ln((negTot+B)/(posTot+B))|·Scale — classes are
    // near-balanced by construction; an OOV gram must stay ~neutral
    math.abs(QualityExprs.baseWeight) should be < 200L
  }
}
