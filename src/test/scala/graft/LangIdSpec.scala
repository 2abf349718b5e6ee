package graft

import graft.functions.LangIdExprs
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Cavnar–Trenkle language ID: script-class coverage on HELD-OUT
  * probe sentences (none appear in the training seeds), determinism,
  * profile invariants, and the SQL registration. */
class LangIdSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  // held-out probes — deliberately different wording from the seeds
  private val probes = Seq(
    "en" -> "we should meet at the station before noon because the train leaves early and we want good seats for the long ride",
    "de" -> "wir treffen uns morgen am bahnhof weil der zug sehr frueh abfaehrt und wir gute plaetze fuer die lange reise wollen",
    "fr" -> "nous devons nous retrouver a la gare avant midi parce que le train part tot et nous voulons de bonnes places",
    "es" -> "debemos encontrarnos en la estacion antes del mediodia porque el tren sale temprano y queremos buenos asientos",
    "it" -> "dobbiamo incontrarci alla stazione prima di mezzogiorno perche il treno parte presto e vogliamo dei buoni posti",
    "pt" -> "devemos nos encontrar na estacao antes do meio dia porque o trem sai cedo e queremos bons lugares para a viagem",
    "nl" -> "we moeten elkaar voor de middag op het station ontmoeten omdat de trein vroeg vertrekt en we goede plaatsen willen",
    "ru" -> "мы должны встретиться на вокзале до полудня потому что поезд уходит рано и мы хотим хорошие места",
    "el" -> "πρεπει να συναντηθουμε στον σταθμο πριν το μεσημερι γιατι το τρενο φευγει νωρις και θελουμε καλες θεσεις",
    "ar" -> "يجب ان نلتقي في المحطة قبل الظهر لان القطار يغادر مبكرا ونريد مقاعد جيدة للرحلة الطويلة",
    "zh" -> "我们应该在中午之前在车站见面因为火车很早出发我们想要好的座位",
    "ja" -> "電車が早く出発するので私たちは昼前に駅で会うべきですそして良い席がほしいです",
    "ko" -> "기차가 일찍 출발하기 때문에 우리는 정오 전에 역에서 만나야 하고 좋은 자리를 원합니다",
    "tr" -> "trenin erken kalkması nedeniyle öğleden önce istasyonda buluşmalıyız ve uzun yolculuk için iyi yerler istiyoruz",
    "vi" -> "chúng ta nên gặp nhau ở nhà ga trước buổi trưa vì tàu khởi hành sớm và chúng ta muốn chỗ ngồi tốt cho chuyến đi dài",
    "pl" -> "powinniśmy spotkać się na dworcu przed południem ponieważ pociąg odjeżdża wcześnie i chcemy dobre miejsca na podróż",
    "sv" -> "vi borde träffas på stationen före lunch eftersom tåget avgår tidigt och vi vill ha bra platser för den långa resan",
    "id" -> "kita harus bertemu di stasiun sebelum tengah hari karena kereta berangkat lebih awal dan kami ingin tempat duduk yang baik")

  behavior of "LangIdExprs.classify"

  it should "identify every script class on held-out probes" in {
    val got = probes.map { case (lang, text) =>
      lang -> graft.functions.LangIdExprs
        .classify(org.apache.spark.unsafe.types.UTF8String.fromString(text))
        .toString
    }
    for ((expected, predicted) <- got)
      withClue(s"probe for $expected: ") { predicted shouldBe expected }
  }

  it should "reject out-of-set scripts and content-free input as und" in {
    // None of these scripts appear in the committed profiles; the
    // rejection gate (distance > 0.95·k·ProfileSize or margin
    // < 0.005·k·ProfileSize) must return und instead of force-
    // assigning the nearest in-set language. Calibration numbers:
    // these score bestNorm >= 0.9938 with margin <= 0.0002, vs
    // in-set held-out probes at bestNorm <= 0.9079, margin >= 0.0215.
    val outOfSet = Seq(
      "he" -> "אנחנו צריכים להיפגש בתחנה לפני הצהריים כי הרכבת יוצאת מוקדם ואנחנו רוצים מקומות טובים",
      "th" -> "เราควรพบกันที่สถานีก่อนเที่ยงเพราะรถไฟออกเร็วและเราต้องการที่นั่งดีสำหรับการเดินทาง",
      "hi" -> "हमें दोपहर से पहले स्टेशन पर मिलना चाहिए क्योंकि ट्रेन जल्दी निकलती है",
      "ka" -> "ჩვენ უნდა შევხვდეთ სადგურზე შუადღემდე რადგან მატარებელი ადრე გადის",
      "hy" -> "մենք պետք է հանդիպենք կայարանում կեսօրից առաջ քանի որ գնացքը շուտ է մեկնում",
      "ta" -> "ரயில் சீக்கிரம் புறப்படுவதால் மதியத்திற்கு முன் நிலையத்தில் சந்திக்க வேண்டும்")
    for ((l, t) <- outOfSet) withClue(s"out-of-set $l: ") {
      LangIdExprs.classify(
        org.apache.spark.unsafe.types.UTF8String.fromString(t)).toString shouldBe "und"
    }
    // digits/punctuation only: nothing matches any profile beyond '_'
    for (t <- Seq("12345 67890 11 22 33 44 55", "!!! ??? ... --- === +++ ***"))
      withClue(s"junk '$t': ") {
        LangIdExprs.classify(
          org.apache.spark.unsafe.types.UTF8String.fromString(t)).toString shouldBe "und"
      }
    // ...while the committed out-of-set battery probes reject too
    for ((l, t) <- LangIdExprs.outOfSetProbes) withClue(s"battery probe $l: ") {
      LangIdExprs.classify(
        org.apache.spark.unsafe.types.UTF8String.fromString(t)).toString shouldBe "und"
    }
  }

  it should "return und on empty or whitespace input, en passthrough on null-free ASCII" in {
    def c(s: String) = LangIdExprs.classify(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString
    c("") shouldBe "und"
    c("   \n\t ") shouldBe "und"
    LangIdExprs.classify(null).toString shouldBe "und"
  }

  it should "be insensitive to input beyond the MaxChars cap" in {
    val base = probes.toMap.apply("ru")
    val padded = base + (" " + probes.toMap.apply("zh")) * 2000 // way past cap
    // the cap reads only the first 4000 chars — the Russian prefix
    val capped = padded.substring(0, LangIdExprs.MaxChars)
    LangIdExprs.classify(
      org.apache.spark.unsafe.types.UTF8String.fromString(padded)).toString shouldBe
      LangIdExprs.classify(
        org.apache.spark.unsafe.types.UTF8String.fromString(capped)).toString
  }

  it should "match the profileOf-based reference formulation on randomized inputs" in {
    // The hot path (count-bucketed lazy-md5 top-K + merged rank
    // vectors) must be observationally identical to ranking with
    // profileOf and scanning the per-language profiles one by one.
    def referenceClassify(s: String): String = {
      val capped =
        if (s.length > LangIdExprs.MaxChars) s.substring(0, LangIdExprs.MaxChars) else s
      val doc = LangIdExprs.profileOf(capped)
      if (doc.isEmpty) "und"
      else {
        val dists = LangIdExprs.profiles.map { case (lang, prof) =>
          var dist = 0L
          doc.foreach { case (g, i) =>
            dist += prof.get(g).fold(LangIdExprs.ProfileSize.toLong)(r =>
              math.abs(i - r).toLong)
          }
          (lang, dist)
        }
        val sorted = dists.sortBy { case (lang, d) => (d, lang) }
        val (bestLang, bestDist) = sorted.head
        val secondDist = sorted(1)._2
        val kp = doc.size.toLong * LangIdExprs.ProfileSize
        if (bestDist * 100L > LangIdExprs.UndDistPct * kp ||
            (secondDist - bestDist) * 1000L < LangIdExprs.UndMarginPerMille * kp)
          "und"
        else bestLang
      }
    }
    val seed = java.lang.Long.getLong("graft.fuzz.seed", 1317L)
    val rnd = new scala.util.Random(seed)
    val vocab: IndexedSeq[String] =
      LangIdExprs.seeds.flatMap(_._2).flatMap(_.split("\\s+")).toIndexedSeq ++
        probes.map(_._2).flatMap(_.split("\\s+"))
    def randomText(): String = {
      val parts = (0 until rnd.nextInt(40)).map { _ =>
        rnd.nextInt(4) match {
          case 0 => vocab(rnd.nextInt(vocab.size))
          case 1 => // random BMP letters incl. out-of-set scripts
            val cps = Seq(0x61 + rnd.nextInt(26), 0x5d0 + rnd.nextInt(27),
              0x0e01 + rnd.nextInt(40), 0x0905 + rnd.nextInt(40))
            (0 until 1 + rnd.nextInt(6)).map(_ =>
              cps(rnd.nextInt(cps.size)).toChar).mkString
          case 2 => rnd.nextInt(100000).toString
          case _ => if (rnd.nextBoolean()) "\t" else "  "
        }
      }
      parts.mkString(" ")
    }
    var i = 0
    while (i < 200) {
      val t = randomText()
      val got = LangIdExprs.classify(
        org.apache.spark.unsafe.types.UTF8String.fromString(t)).toString
      withClue(s"seed=$seed input=${t.take(120)}: ") {
        got shouldBe referenceClassify(t)
      }
      i += 1
    }
  }

  it should "agree with the scored variant and expose a sane margin" in {
    import org.apache.spark.unsafe.types.UTF8String
    val L = graft.functions.LangIdExprs
    for ((_, text) <- probes) {
      val u = UTF8String.fromString(text)
      val row = L.classifyScored(u)
      // the label is THE label — scored must never diverge from classify
      row.getUTF8String(0) shouldBe L.classify(u)
      val (best, second, k) =
        (row.getLong(1), row.getLong(2), row.getInt(3))
      k should be > 0
      best should be <= second
      second should be <= (k.toLong * L.ProfileSize * L.languages.length)
      // in-set probes sit well under the distance gate with real margin
      best * 100 should be <= (L.UndDistPct.toLong * k * L.ProfileSize)
      (second - best) * 1000 should be >=
        (L.UndMarginPerMille.toLong * k * L.ProfileSize)
    }
    // token-free input → the zero row
    val z = L.classifyScored(UTF8String.fromString("   "))
    z.getUTF8String(0).toString shouldBe "und"
    (z.getLong(1), z.getLong(2), z.getInt(3)) shouldBe ((0L, 0L, 0))
  }

  it should "put deliberate language mixtures inside the quarantine band" in {
    // the QuarMarginPerMille routing contract (q_warc_e2e_scored):
    // a 50/50 mixture of two close Latin languages must measure a
    // margin BELOW the quarantine cutoff, while every single-language
    // held-out probe measures ABOVE it — the band split the fixture
    // calibration found (mixtures ≤ 9.8‰, clean pages ≥ 52.4‰)
    import org.apache.spark.unsafe.types.UTF8String
    val L = graft.functions.LangIdExprs
    def marginPerMille(text: String): Double = {
      val row = L.classifyScored(UTF8String.fromString(text))
      val k = row.getInt(3)
      k should be > 0
      (row.getLong(2) - row.getLong(1)) * 1000.0 / (k.toLong * L.ProfileSize)
    }
    val es = L.seedText(L.languages.indexOf("es"), 0)
    val pt = L.seedText(L.languages.indexOf("pt"), 0)
    val mix = es.substring(0, 70) + " " + pt.substring(0, 70)
    marginPerMille(mix) should be < L.QuarMarginPerMille.toDouble
    for ((lang, text) <- probes)
      withClue(s"clean $lang probe must NOT quarantine: ") {
        marginPerMille(text) should be >= L.QuarMarginPerMille.toDouble
      }
  }

  it should "hold profile invariants: size cap, 1-based dense ranks, BMP-only" in {
    LangIdExprs.profiles.size shouldBe LangIdExprs.languages.size
    for ((lang, prof) <- LangIdExprs.profiles) {
      withClue(s"$lang: ") {
        prof.size should be <= LangIdExprs.ProfileSize
        prof.values.min shouldBe 1
        prof.values.max shouldBe prof.size // dense
        prof.values.toSeq.distinct.size shouldBe prof.size
        // BMP-only: the JVM walk and the SQL replay count equally
        for (g <- prof.keys; ch <- g) ch.isSurrogate shouldBe false
      }
    }
    // the seeds themselves are lowercase and BMP-only
    for ((lang, texts) <- LangIdExprs.seeds; t <- texts) {
      withClue(s"$lang seeds: ") {
        t shouldBe t.toLowerCase(java.util.Locale.ROOT)
        t.exists(_.isSurrogate) shouldBe false
        t.contains("'") shouldBe false // SQL-literal safety
      }
    }
  }

  behavior of "the Column and SQL surfaces"

  it should "classify through the expression and the registered SQL function" in {
    val df = probes.toDF("expected", "text")
    val viaCol = df.select(col("expected"),
      graft.pipeline.TextAnalysis.langIdCt(col("text")).as("got"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    viaCol.foreach { case (e, g) => g shouldBe e }
    graft.functions.GraftFunctions.register(spark)
    df.createOrReplaceTempView("langid_probes")
    val viaSql = spark.sql(
      "SELECT expected, lang_id_ct(text) AS got FROM langid_probes")
      .collect().map(r => (r.getString(0), r.getString(1)))
    viaSql.foreach { case (e, g) => g shouldBe e }
    // the scored SQL function agrees with the plain one on the label
    val viaScore = spark.sql(
      "SELECT expected, lang_id_ct_score(text).lang AS got," +
        " lang_id_ct_score(text).k AS k FROM langid_probes")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    viaScore.foreach { case (e, g, k) => g shouldBe e; k should be > 0 }
  }

  it should "stay map-only: no exchange, no UDF in the plan" in {
    val df = probes.toDF("expected", "text")
      .select(graft.pipeline.TextAnalysis.langIdCt(col("text")).as("lang"))
    df.write.mode("overwrite").format("noop").save()
    val nodes = graft.plans.PlanLint.walk(df.queryExecution.executedPlan)
    nodes.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.exchange.Exchange]) shouldBe false
    nodes.map(_.getClass.getSimpleName)
      .exists(_.contains("Python")) shouldBe false
  }
}
