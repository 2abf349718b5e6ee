package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Cavnar–Trenkle n-gram language identification (Cavnar & Trenkle
  * 1994, "N-Gram-Based Text Categorization"): each language is a
  * ranked profile of its most frequent character 1–3-grams (words
  * padded with `_`); a document classifies to the profile minimizing
  * the "out-of-place" distance — the sum over the document's top
  * n-grams of |rank in doc − rank in profile|, with a fixed penalty
  * for n-grams the profile lacks. Unlike the marker-word heuristic
  * ([[graft.pipeline.TextAnalysis.langId]], kept as the cheap
  * fixture), character n-grams need no tokenizer and cover
  * non-Latin scripts — CJK, Arabic, Cyrillic — where stopword lists
  * see nothing.
  *
  * Everything is DETERMINISTIC and replayable: profiles are built at
  * class-init from the committed lowercase seed snippets below (the
  * same discipline as the committed BPE merge table), ties rank by
  * the md5 of the n-gram's UTF-8 bytes (identical in any engine —
  * no collation dependence), and the battery oracle re-derives
  * profile, document profile and distance in pure SQL from the same
  * inlined constants. Seeds and inputs must stay in the BMP: the
  * JVM side walks UTF-16 code units, the SQL replay counts code
  * points — equal exactly there (and lowercase seeds sidestep
  * locale-dependent case mapping).
  *
  * Scale shape: one map-only codegen'd call per row, input capped at
  * [[MaxChars]], profile lookup against static in-memory maps — no
  * shuffle, no UDF, nothing driver-side. */
object LangIdExprs {

  /** Profile length K — also the out-of-place penalty for missing
    * n-grams (the classic choice). */
  val ProfileSize = 200

  /** Classification reads at most this many characters — the CT
    * paper's observation that a few hundred n-grams suffice, kept as
    * an explicit bound so a 1 GB document costs the same as a page. */
  val MaxChars = 4000

  /** Committed seed snippets (lowercase, BMP-only, apostrophe-free),
    * two variants per language. Latin, Cyrillic, Greek, Arabic and
    * the three CJK scripts are all represented. */
  val seeds: Seq[(String, Seq[String])] = Seq(
    "ar" -> Seq(
      "اللغة العربية هي واحدة من اكثر اللغات انتشارا في العالم ويتحدث بها ملايين الناس في بلدان كثيرة وتكتب من اليمين الى اليسار",
      "الكتاب على الطاولة والقهوة في الفنجان ونحن نقرا الاخبار كل صباح قبل الذهاب الى العمل في المدينة القديمة"),
    "de" -> Seq(
      "die deutsche sprache wird von vielen menschen in europa gesprochen und sie hat lange zusammengesetzte woerter die man erst lernen muss",
      "der schnelle braune fuchs springt ueber den faulen hund waehrend die kinder im garten spielen und das wetter schoen bleibt"),
    "el" -> Seq(
      "η ελληνικη γλωσσα εχει μακρα ιστορια και το αλφαβητο της χρησιμοποιειται εδω και χιλιαδες χρονια απο πολλους ανθρωπους",
      "το καλοκαιρι στα νησια ειναι ζεστο και ομορφο και οι ανθρωποι κολυμπουν στη θαλασσα και τρωνε φρεσκο ψαρι το βραδυ"),
    "en" -> Seq(
      "the english language is spoken by many people around the world and it is the common language of science and business today",
      "a quick brown fox jumps over the lazy dog while the children play in the garden and the weather stays warm and bright"),
    "es" -> Seq(
      "el idioma espanol se habla en muchos paises del mundo y es la lengua materna de millones de personas en america y europa",
      "los ninos juegan en el parque por la tarde mientras sus padres toman cafe y hablan de las noticias del dia con los vecinos"),
    "fr" -> Seq(
      "la langue francaise est parlee dans de nombreux pays du monde et elle est connue pour sa litterature et sa culture anciennes",
      "les enfants jouent dans le jardin pendant que leurs parents preparent le diner et regardent les nouvelles du soir ensemble"),
    "it" -> Seq(
      "la lingua italiana e conosciuta per la sua musica e la sua cucina e viene parlata da milioni di persone in tutto il mondo",
      "i bambini giocano nella piazza mentre i genitori bevono il caffe al bar e parlano del tempo e delle notizie della giornata"),
    "ja" -> Seq(
      "日本語は日本で話されている言語でありひらがなとカタカナと漢字という三つの文字を使って書かれます多くの人が毎日使っています",
      "今日は天気がとても良いので子供たちは公園で遊んでいます私たちはお茶を飲みながら本を読んで静かな午後を過ごしています"),
    "ko" -> Seq(
      "한국어는 한국에서 사용되는 언어이며 한글이라는 고유한 문자로 표기됩니다 많은 사람들이 매일 사용하고 있습니다",
      "오늘은 날씨가 좋아서 아이들이 공원에서 놀고 있습니다 우리는 차를 마시면서 책을 읽고 조용한 오후를 보내고 있습니다"),
    "nl" -> Seq(
      "de nederlandse taal wordt gesproken in nederland en belgie en heeft veel woorden die lijken op het duits en het engels",
      "de kinderen spelen buiten in de tuin terwijl hun ouders koffie drinken en praten over het nieuws van de dag met de buren"),
    "pt" -> Seq(
      "a lingua portuguesa e falada em varios paises do mundo e tem uma longa historia de literatura e navegacao pelos oceanos",
      "as criancas brincam no parque durante a tarde enquanto os pais tomam cafe e conversam sobre as noticias do dia todo"),
    "ru" -> Seq(
      "русский язык является одним из самых распространенных языков мира и на нем говорят миллионы людей во многих странах",
      "дети играют в парке после школы пока родители пьют чай дома и читают новости о погоде и событиях прошедшего дня"),
    "zh" -> Seq(
      "中文是世界上使用人数最多的语言之一汉字有几千年的历史许多国家的人们都在学习这种古老而优美的语言",
      "今天天气很好孩子们在公园里玩耍我们一边喝茶一边看书度过一个安静的下午大家都觉得非常开心"))

  val languages: Seq[String] = seeds.map(_._1)

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.map("%02x".format(_)).mkString
  }

  /** Character 1–3-grams of `_`-padded whitespace-split words —
    * shared by training and classification (and mirrored by the SQL
    * replay: BMP-only inputs make code-unit and code-point walks
    * identical). */
  private[graft] def ngrams(text: String): Iterator[String] =
    text.toLowerCase(java.util.Locale.ROOT) // locale-pinned, like the replay
      .split("\\s+").iterator.filter(_.nonEmpty)
      .flatMap { w =>
        val p = "_" + w + "_"
        (1 to 3).iterator.flatMap(n =>
          (0 to p.length - n).iterator.map(i => p.substring(i, i + n)))
      }

  /** Top-[[ProfileSize]] n-grams by (count desc, md5(gram) asc) →
    * 1-based rank. The md5 tie-break is the collation-free total
    * order both the JVM and the SQL replay share. */
  private[graft] def profileOf(text: String): Map[String, Int] = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    ngrams(text).foreach(g => counts(g) = counts.getOrElse(g, 0L) + 1L)
    counts.toSeq
      .map { case (g, c) => (g, c, md5Hex(g)) }
      .sortBy { case (_, c, h) => (-c, h) }
      .take(ProfileSize)
      .zipWithIndex.map { case ((g, _, _), i) => g -> (i + 1) }
      .toMap
  }

  /** The committed per-language profiles (seed variants concatenated). */
  val profiles: Seq[(String, Map[String, Int])] =
    seeds.map { case (lang, texts) => lang -> profileOf(texts.mkString(" ")) }

  /** Static entry point for generated code: classify `text`, `"und"`
    * when it yields no n-grams. Deterministic tie-break: smallest
    * distance, then language code. */
  def classify(text: UTF8String): UTF8String = {
    if (text == null) return UTF8String.fromString("und")
    val s0 = text.toString
    val s = if (s0.length > MaxChars) s0.substring(0, MaxChars) else s0
    val doc = profileOf(s)
    if (doc.isEmpty) return UTF8String.fromString("und")
    var bestLang = "und"
    var bestDist = Long.MaxValue
    profiles.foreach { case (lang, prof) =>
      var dist = 0L
      doc.foreach { case (g, i) =>
        dist += prof.get(g).fold(ProfileSize.toLong)(r => math.abs(i - r).toLong)
      }
      if (dist < bestDist || (dist == bestDist && lang < bestLang)) {
        bestDist = dist; bestLang = lang
      }
    }
    UTF8String.fromString(bestLang)
  }

  case class LangIdCtExpr(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects string, got $other")
      }
    override def dataType: DataType = StringType
    override def prettyName: String = "lang_id_ct"
    override def nullSafeEval(s: Any): Any =
      classify(s.asInstanceOf[UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"""
        |${ev.value} = graft.functions.LangIdExprs.classify($a);
        """.stripMargin)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def langIdCtCol(text: Column): Column =
    GraftColumnBridge.column(LangIdCtExpr(GraftColumnBridge.expression(text)))

  private def sqlQuote(s: String): String = "'" + s.replace("'", "''") + "'"

  /** `(lang, gram, rank)` VALUES rows for the oracle replay. */
  def profilesSqlValues: String =
    profiles.flatMap { case (lang, prof) =>
      prof.toSeq.sortBy(_._2).map { case (g, r) =>
        s"(${sqlQuote(lang)}, ${sqlQuote(g)}, $r)"
      }
    }.mkString(", ")

  /** `(lidx, vidx, txt)` VALUES rows (0-based) for battery fixtures
    * that draw deterministic multilingual inputs from the seeds. */
  def seedsSqlValues: String =
    seeds.zipWithIndex.flatMap { case ((_, texts), li) =>
      texts.zipWithIndex.map { case (t, vi) =>
        s"($li, $vi, ${sqlQuote(t)})"
      }
    }.mkString(", ")

  /** Seed snippet for a 0-based (language, variant) pair — the
    * battery fixture's deterministic input generator. */
  def seedText(lidx: Int, vidx: Int): String = {
    val (_, texts) = seeds(lidx % seeds.length)
    texts(vidx % texts.length)
  }
}
