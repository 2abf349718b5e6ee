package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Trained document-quality classifier: hashed n-gram Naive Bayes —
  * the fastText-style "does this look like curated text or crawl
  * junk" scorer that sits next to the rule-based gates
  * ([[graft.pipeline.TextAnalysis.qualityScore]] length/punct/stopword
  * heuristics, [[RepetitionExprs]] Gopher repetition,
  * [[graft.pipeline.TextAnalysis.bigramLogProbTable]] CCNet-shaped
  * corpus-self LM) in every GPT-3/Llama/CCNet-descended curation
  * pipeline. Route with it the way the pipelines do: keep score > 0,
  * or stratify by score band and down-sample the low band.
  *
  * Model shape — engineered for exact cross-engine replay (the
  * committed-seed discipline of [[LangIdExprs]]):
  *  - Features are word UNIGRAMS + adjacent BIGRAMS of the
  *    lowercased, whitespace-split document, hashed into
  *    [[NumBuckets]] buckets via the first 8 md5 hex chars (the
  *    portable 32-bit hash every other family here replays:
  *    `('0x' || substr(md5(g), 1, 8))::BIGINT % buckets`). Hashing
  *    bounds the model at [[NumBuckets]] longs no matter how large
  *    the training vocabulary grows — the 100 TB story.
  *  - Training is multinomial NB with add-one smoothing over the
  *    committed seed snippets below, folded to ONE integer weight per
  *    bucket: `w_b = floor(Scale · ln( (pos_b+1)(negTot+B) /
  *    ((neg_b+1)(posTot+B)) ) + 0.5)` (Math.round semantics, written
  *    as floor(x+0.5) so the Spark-side training face reproduces it
  *    bit-for-bit with `floor(... + 0.5)`). Buckets the training data
  *    never touched all share [[baseWeight]], so the committed model
  *    is the (bucket, weight) rows that DIFFER from it.
  *  - Scoring is `score = Σ_grams w_bucket(gram)` — pure integer
  *    summation, order-independent, overflow-free (|w| < 10 000,
  *    grams per doc < 2·[[MaxChars]]), so a SQL engine replays every
  *    score exactly from the emitted weight table. The NB decision is
  *    score > 0 (the seed classes are near-balanced; [[priorWeight]]
  *    carries the exact prior for consumers that want it).
  *
  * Scale shape: one map-only codegen'd call per row, input capped at
  * [[MaxChars]], weights ride into generated code as one `long[]`
  * reference (the [[TextHashExprs.PositionsInSortedSetExpr]] bank
  * pattern) — no shuffle, no UDF, no broadcast join. */
object QualityExprs {

  /** Hashed feature space size — the model is exactly this many
    * longs (32 KB) regardless of training-corpus vocabulary. */
  val NumBuckets = 4096

  /** Fixed-point scale for the committed log-likelihood-ratio
    * weights (3 decimal digits of ln). */
  val Scale = 1000

  /** Scoring reads at most this many characters — same explicit
    * bound as [[LangIdExprs.MaxChars]]: a 1 GB document costs the
    * same as a few pages, and the integer score cannot overflow.
    * Same BMP caveat as langid: the JVM cap counts UTF-16 code units
    * while the SQL replay's `substr` counts code points, equal
    * exactly for BMP text (the committed seeds/probes are ASCII). */
  val MaxChars = 8000

  /** Committed positive seeds — curated informative prose (the
    * "in-domain" class of the GPT-3/CCNet quality filters). Lowercase,
    * ASCII, apostrophe-free, one topic each so unigram AND bigram
    * evidence is varied. */
  val positiveSeeds: Seq[String] = Seq(
    "astronomers measure the distance to nearby stars by parallax which is the tiny shift in apparent position as the earth moves around the sun and for more distant objects they rely on standard candles whose true brightness is known",
    "bread rises because yeast ferments the sugars in flour and releases carbon dioxide which is trapped by the elastic network of gluten so kneading the dough develops that network and a long slow rise improves both texture and flavor",
    "the printing press spread rapidly across europe in the late fifteenth century and it lowered the cost of books so sharply that literacy expanded beyond the clergy and ideas began to circulate faster than any authority could control",
    "ocean tides are driven mostly by the gravity of the moon which pulls the water on the near side of the earth more strongly than the planet as a whole producing two bulges that sweep around the globe each day",
    "many birds migrate thousands of kilometers between breeding and wintering grounds and they navigate by the sun the stars and the magnetic field of the earth often returning to the same small patch of habitat year after year",
    "photosynthesis converts light energy into chemical energy as chloroplasts use sunlight to split water and fix carbon dioxide into sugars releasing oxygen as a byproduct and nearly all life on earth depends on this reaction directly or indirectly",
    "a suspension bridge carries its deck from cables strung between towers and the cables transfer the load into massive anchorages at each end which lets the design span distances that no beam or arch could cross economically",
    "western music organizes pitch into scales and chords and the tension between dissonance and resolution gives harmony its sense of motion so a composer can create expectation and then satisfy or frustrate it to shape the emotional arc of a piece",
    "weather fronts form where air masses of different temperature and humidity meet and the boundary forces the warmer lighter air to rise which cools it until its moisture condenses into cloud bands and often steady rain",
    "to keep a bicycle running smoothly check the tire pressure every week lubricate the chain when it looks dry and inspect the brake pads for wear because small maintenance done regularly prevents most expensive repairs later",
    "tea plants are grown at altitude on terraced hillsides where cool air slows the growth of the leaves and concentrates their flavor and the youngest two leaves and the bud are picked by hand for the finest grades",
    "glaciers form where winter snowfall exceeds summer melt for many years so the accumulating snow compresses into dense ice that flows slowly downhill carving valleys and leaving ridges of rock debris along its edges")

  /** Committed negative seeds — the crawl-junk class: keyword
    * stuffing, navigation chrome, consent banners, engagement bait,
    * affiliate spam. Same constraints as the positives. */
  val negativeSeeds: Seq[String] = Seq(
    "buy cheap watches best price cheap watches discount watches free shipping buy now limited offer best deals cheap watches online shop sale sale sale top quality watches lowest price guaranteed click here buy cheap watches today",
    "you will not believe number seven doctors hate this one weird trick click to see more amazing unbelievable shocking photos gallery next page next page click next to continue reading this incredible story",
    "home about us services products portfolio blog news careers contact privacy policy terms of service sitemap login register search menu home about us services products blog contact follow us facebook twitter instagram youtube",
    "we use cookies to improve your experience and to personalize content and ads by continuing to browse this site you accept our use of cookies click accept to agree or manage your preferences in settings cookie policy learn more",
    "best laptop 2024 cheap laptop deals laptop review laptop price laptop sale gaming laptop student laptop business laptop refurbished laptop laptop comparison top ten laptops buy laptop online laptop discount code free delivery",
    "win big today spin now jackpot casino bonus free spins no deposit required claim your bonus now play slots online betting odds best casino sites deposit bonus vip rewards play now win real money instant payout",
    "order viagra online without prescription cheap pills fast discreet shipping best prices on all medications no doctor visit required order now satisfaction guaranteed cheap pills online pharmacy discount meds",
    "download now free download fast download direct link mirror link click the download button below wait for the timer complete the captcha to unlock your file premium download no ads upgrade to premium for faster speeds",
    "great post thanks for sharing this is very helpful check out my website for amazing deals on designer handbags replica watches and more follow the link in my profile for a special discount code just for you",
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor incididunt ut labore et dolore magna aliqua ut enim ad minim veniam quis nostrud exercitation ullamco laboris nisi ut aliquip",
    "copyright all rights reserved terms and conditions apply see store for details subscribe to our newsletter enter your email unsubscribe at any time share this page like us on facebook tweet pin it email a friend print this page",
    "exclusive coupon code save twenty percent use code save20 at checkout hurry offer ends soon stock is limited act now best price guarantee price match promise free returns free shipping on orders over fifty")

  /** Committed HELD-OUT probes — topics and spam genres the seeds do
    * not cover, pinned by the calibration spec (the
    * [[LangIdExprs.outOfSetProbes]] discipline): positives must score
    * > 0, negatives < 0, on text the model never trained on. */
  val heldOutPositive: Seq[String] = Seq(
    "volcanoes erupt when molten rock rises through fractures in the crust and the dissolved gases expand as the pressure drops which can fragment the magma into ash or let it flow quietly depending on how viscous it is",
    "cheese begins as milk curdled by rennet and the curds are cut drained pressed and salted then aged under controlled temperature and humidity while enzymes slowly break down fats and proteins into the flavors of the finished wheel",
    "a reflecting telescope gathers light with a curved mirror instead of a lens which avoids color fringing and can be supported from behind so the largest research instruments in the world are all built around mirrors")

  val heldOutNegative: Seq[String] = Seq(
    "claim your free crypto airdrop now connect your wallet to receive tokens limited supply first come first served verified giveaway do not miss out join our telegram for more free coins daily rewards guaranteed",
    "wait before you go subscribe to our mailing list enter your email now get ten percent off your first order join thousands of happy subscribers no spam we promise sign up today popup close button subscribe now",
    "cheap flights hotel deals car rental travel insurance best booking site compare prices book now pay later cancel anytime top destinations beach holidays city breaks ski deals last minute offers book direct and save")

  // ----- featurizer (mirrored by the SQL replay) -----

  private val wsPattern = java.util.regex.Pattern.compile("\\s+")

  /** 32-bit-md5-prefix bucket of one gram — nonnegative, so `% B`
    * agrees between Java and SQL. */
  private[graft] def bucketOf(gram: String): Int =
    (java.lang.Long.parseLong(
      LangIdExprs.md5Hex(gram).substring(0, 8), 16) % NumBuckets).toInt

  /** Word unigrams + adjacent bigrams of the lowercased text —
    * training and scoring share this exact tokenization, and the SQL
    * replay mirrors it (`unnest(ts)` plus `ts[i] || ' ' || ts[i+1]`). */
  private[graft] def grams(text: String): Iterator[String] = {
    val ws = wsPattern.split(text.toLowerCase(java.util.Locale.ROOT))
      .filter(_.nonEmpty)
    ws.iterator ++ (1 until ws.length).iterator.map(i =>
      ws(i - 1) + " " + ws(i))
  }

  // ----- committed training (class-init, like the langid profiles) -----

  /** Math.round written as floor(x + 0.5) so the Spark-side training
    * face ([[graft.pipeline.Quality.trainQualityWeights]]) reproduces
    * the committed weights bit-for-bit with `floor(... + 0.5)`. */
  private[graft] def weightOf(posCnt: Long, negCnt: Long,
                              posTot: Long, negTot: Long): Long =
    math.floor(Scale * math.log(
      (posCnt + 1.0) * (negTot + NumBuckets) /
        ((negCnt + 1.0) * (posTot + NumBuckets))) + 0.5).toLong

  private def classCounts(seedTexts: Seq[String]): (Array[Long], Long) = {
    val counts = new Array[Long](NumBuckets)
    var tot = 0L
    seedTexts.foreach(t => grams(t).foreach { g =>
      counts(bucketOf(g)) += 1; tot += 1
    })
    (counts, tot)
  }

  private val (posCounts, posTotal) = classCounts(positiveSeeds)
  private val (negCounts, negTotal) = classCounts(negativeSeeds)

  /** Weight of every bucket the training data never touched. */
  val baseWeight: Long = weightOf(0, 0, posTotal, negTotal)

  /** NB class prior as the same fixed-point integer:
    * floor(Scale · ln(nPos/nNeg) + 0.5). Zero for the committed
    * near-balanced seeds; exposed so a consumer thresholding
    * `score + priorWeight > 0` gets textbook NB. */
  val priorWeight: Long = math.floor(Scale * math.log(
    positiveSeeds.size.toDouble / negativeSeeds.size) + 0.5).toLong

  /** The committed model: one weight per bucket. */
  val defaultWeights: Array[Long] = {
    val w = Array.fill(NumBuckets)(baseWeight)
    var b = 0
    while (b < NumBuckets) {
      if (posCounts(b) != 0 || negCounts(b) != 0)
        w(b) = weightOf(posCounts(b), negCounts(b), posTotal, negTotal)
      b += 1
    }
    w
  }

  // ----- scoring (static entry points for generated code) -----

  /** Score `text` against `weights`: struct(score, n_grams). NULL or
    * token-free text → (0, 0) — the row is kept, matching the SQL
    * replay's left-join-coalesce shape. */
  def score(text: UTF8String,
            weights: Array[Long]): org.apache.spark.sql.catalyst.InternalRow = {
    var s = 0L
    var n = 0
    if (text != null) {
      val str0 = text.toString
      val str = if (str0.length > MaxChars) str0.substring(0, MaxChars) else str0
      val ws = wsPattern.split(str.toLowerCase(java.util.Locale.ROOT))
      var prev: String = null
      var i = 0
      while (i < ws.length) {
        val w = ws(i)
        if (!w.isEmpty) {
          s += weights(bucketOf(w)); n += 1
          if (prev != null) { s += weights(bucketOf(prev + " " + w)); n += 1 }
          prev = w
        }
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](s, n))
  }

  /** Hashed-gram buckets of `text` WITH multiplicity (array<int>) —
    * the training-side featurizer: explode it, aggregate per-bucket
    * class counts, fold to weights
    * ([[graft.pipeline.Quality.trainQualityWeights]]). NULL-safe via
    * the expression wrapper. */
  def gramBuckets(text: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val str0 = text.toString
    val str = if (str0.length > MaxChars) str0.substring(0, MaxChars) else str0
    val ws = wsPattern.split(str.toLowerCase(java.util.Locale.ROOT))
      .filter(_.nonEmpty)
    val out = new Array[Int](if (ws.length == 0) 0 else 2 * ws.length - 1)
    var i = 0
    var j = 0
    while (i < ws.length) {
      out(j) = bucketOf(ws(i)); j += 1
      if (i > 0) { out(j) = bucketOf(ws(i - 1) + " " + ws(i)); j += 1 }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  private val scoreType = StructType(Seq(
    StructField("score", LongType, nullable = false),
    StructField("n_grams", IntegerType, nullable = false)))

  case class QualityScoreExpr(child: Expression, weights: Array[Long])
      extends UnaryExpression {
    require(weights.length == NumBuckets,
      s"quality model must have exactly $NumBuckets bucket weights, " +
        s"got ${weights.length}")
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects string, got $other")
      }
    override def dataType: DataType = scoreType
    override def prettyName: String = "quality_model_score"
    // NOT nullSafeEval/nullSafeCodeGen: NULL text scores (0, 0) through
    // the expression path too, matching score()'s documented contract
    // (a failed-extraction row is gram-free, not unscorable — the SQL
    // replay's left-join-coalesce shape). Round17AdviceSpec pins it.
    override def nullable: Boolean = false
    override def eval(input: InternalRow): Any =
      score(child.eval(input).asInstanceOf[UTF8String], weights)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val wRef = ctx.addReferenceObj("qualityWeights", weights, "long[]")
      val childGen = child.genCode(ctx)
      val code =
        code"""
           |${childGen.code}
           |org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
           |  graft.functions.QualityExprs.score(
           |    ${childGen.isNull} ? null : ${childGen.value}, $wRef);
         """.stripMargin
      ev.copy(code = code,
        isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
    }
    // structural equality/explain must not walk the weight array
    override def flatArguments: Iterator[Any] = Iterator(child)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class GramBucketsExpr(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects string, got $other")
      }
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "quality_grams"
    override def nullSafeEval(s: Any): Any =
      gramBuckets(s.asInstanceOf[UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"""
        |${ev.value} = graft.functions.QualityExprs.gramBuckets($a);
        """.stripMargin)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // ----- Column API -----

  /** struct(score, n_grams) under the committed default model. */
  def qualityModelScoreCol(text: Column): Column =
    qualityModelScoreCol(text, defaultWeights)

  /** struct(score, n_grams) under a trained model
    * ([[graft.pipeline.Quality.collectWeights]]). */
  def qualityModelScoreCol(text: Column, weights: Array[Long]): Column =
    GraftColumnBridge.column(
      QualityScoreExpr(GraftColumnBridge.expression(text), weights))

  /** Hashed gram buckets (array<int>, with multiplicity) — the
    * training featurizer. */
  def qualityGramsCol(text: Column): Column =
    GraftColumnBridge.column(
      GramBucketsExpr(GraftColumnBridge.expression(text)))

  // ----- oracle replay constants -----

  private def sqlQuote(s: String): String = "'" + s.replace("'", "''") + "'"

  /** `(b, w)` VALUES rows for every bucket whose weight differs from
    * [[baseWeight]] — the SQL replay scores with
    * `coalesce(w, baseWeight)`. */
  def weightsSqlValues: String =
    defaultWeights.zipWithIndex
      .filter { case (w, _) => w != baseWeight }
      .map { case (w, b) => s"($b, $w)" }
      .mkString(", ")

  /** `(i, txt)` VALUES rows (0-based) for battery fixtures drawing
    * deterministic inputs from the held-out probes. */
  def heldOutPositiveSqlValues: String =
    heldOutPositive.zipWithIndex.map { case (t, i) =>
      s"($i, ${sqlQuote(t)})"
    }.mkString(", ")

  def heldOutNegativeSqlValues: String =
    heldOutNegative.zipWithIndex.map { case (t, i) =>
      s"($i, ${sqlQuote(t)})"
    }.mkString(", ")

  /** Held-out probe for a 0-based index — battery fixture input. */
  def heldOutText(positive: Boolean, idx: Int): String =
    if (positive) heldOutPositive(idx % heldOutPositive.length)
    else heldOutNegative(idx % heldOutNegative.length)
}
