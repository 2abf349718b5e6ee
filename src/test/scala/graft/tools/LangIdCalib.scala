package graft
import graft.functions.LangIdExprs

/** Calibration harness for the langid `und` rejection gate
  * (round 15): prints best-distance and margin, both normalized by
  * k·ProfileSize, for in-set held-out probes, out-of-set-script
  * probes, the training seeds, battery-shaped inputs, and junk.
  * The committed cutoffs (LangIdExprs.UndDistPct=95,
  * UndMarginPerMille=5) sit between the measured in-set maximum
  * (0.9079 best / 0.0215 margin) and the out-of-set minimum
  * (0.9938 best / 0.0002 margin).
  * Usage: sbt "Test/runMain graft.LangIdCalib" */
object LangIdCalib {
  def main(args: Array[String]): Unit = {
    val probesIn = Seq(
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
    val probesOut = Seq(
      "he" -> "אנחנו צריכים להיפגש בתחנה לפני הצהריים כי הרכבת יוצאת מוקדם ואנחנו רוצים מקומות טובים לנסיעה הארוכה",
      "th" -> "เราควรพบกันที่สถานีก่อนเที่ยงเพราะรถไฟออกเร็วและเราต้องการที่นั่งดีสำหรับการเดินทาง",
      "hi" -> "हमें दोपहर से पहले स्टेशन पर मिलना चाहिए क्योंकि ट्रेन जल्दी निकलती है और हम लंबी यात्रा के लिए अच्छी सीटें चाहते हैं",
      "ka" -> "ჩვენ უნდა შევხვდეთ სადგურზე შუადღემდე რადგან მატარებელი ადრე გადის და გვინდა კარგი ადგილები",
      "hy" -> "մենք պետք է հանդիպենք կայարանում կեսօրից առաջ քանի որ գնացքը շուտ է մեկնում եւ մենք լավ տեղեր ենք ուզում",
      "ta" -> "ரயில் சீக்கிரம் புறப்படுவதால் மதியத்திற்கு முன் நிலையத்தில் சந்திக்க வேண்டும் நல்ல இடங்கள் வேண்டும்")
    // also seed texts themselves and battery-shaped inputs (seed + 60 chars of noise)
    def stats(tag: String, lang: String, text: String): Unit = {
      
      val (k, dists) = LangIdExprs.distancesFor(text)
      if (k == 0) { println(f"$tag%-10s $lang%-3s EMPTY"); return }
      val sorted = dists.sorted
      val best = sorted(0); val second = sorted(1)
      val norm = best.toDouble / (k.toLong * LangIdExprs.ProfileSize)
      val margin = (second - best).toDouble / (k.toLong * LangIdExprs.ProfileSize)
      println(f"$tag%-10s $lang%-3s k=$k%3d bestNorm=$norm%.4f marginNorm=$margin%.4f")
    }
    probesIn.foreach { case (l, t) => stats("in", l, t) }
    probesOut.foreach { case (l, t) => stats("OUT", l, t) }
    LangIdExprs.seeds.foreach { case (l, ts) => ts.zipWithIndex.foreach { case (t, i) => stats(s"seed$i", l, t) } }
    // battery shape: seed + " " + 60 chars of lorem-ish noise
    val noise = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    LangIdExprs.seeds.foreach { case (l, ts) => stats("batt", l, ts.head + " " + noise.take(60)) }
    // numbers-only / punctuation
    stats("junk", "nm", "12345 67890 11 22 33 44 55 66 77 88 99")
    stats("junk", "pn", "!!! ??? ... --- === +++ ***")
  }
}
