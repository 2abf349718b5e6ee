package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding subword tokenizer, the token-accounting unit a
  * training run actually consumes (whitespace tokens misprice budgets
  * 1.3–2× per language). Two halves:
  *
  *  - [[BpeModel]]: an immutable merge list + the encoder. Encoding
  *    semantics are deliberately minimal and SQL-replayable: repeat
  *    "find the lowest-rank merge whose pair is adjacent somewhere in
  *    the word; join the LEFTMOST occurrence" until no merge applies
  *    (the SentencePiece-style one-occurrence-per-step discipline —
  *    deterministic, and an external engine replays it with a
  *    recursive CTE over the merge table, see
  *    [[BpeModel.mergesSqlValues]]).
  *  - [[Bpe.train]]: classic BPE training (Sennrich et al.,
  *    arXiv:1508.07909) over the corpus's word-frequency table — the
  *    frequency table is ONE shuffle (groupBy word) capped to the
  *    `maxVocab` most frequent words (TakeOrdered, no full sort), and
  *    the merge loop runs driver-side over that bounded dict with
  *    incremental pair-count maintenance, the same shape production
  *    tokenizer trainers use (the dict is ≪ corpus: a 100 TB corpus
  *    still caps at `maxVocab` distinct words on the driver).
  *
  * Pre-tokenization is byte-identical to [[graft.pipeline.Dedup.tokens]]
  * (`array_remove(split(lower(trim(text)), "\\s+"), "")`), so BPE token
  * counts nest exactly under the whitespace accounting the rest of the
  * battery uses.
  *
  * The expressions are native codegen'd scalars (round-7 discipline:
  * the whole encode loop is ONE generated static call per row that
  * fuses into the scan — no interpreted array lambdas, no shuffle).
  * Per-word results are memoized per model per executor: corpus word
  * frequency is Zipfian, so the cache turns the per-document cost into
  * a near-O(1) lookup per word.
  */
final case class BpeModel(merges: IndexedSeq[(String, String)])
    extends Serializable {
  require(merges.nonEmpty, "BpeModel needs at least one merge")

  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    var i = 0
    while (i < merges.size) {
      val (a, b) = merges(i)
      // a merge pair is keyed "a b"; symbols never contain spaces
      // (they come from splitting on \s+), so the key is unambiguous
      if (!m.containsKey(a + " " + b)) m.put(a + " " + b, i)
      i += 1
    }
    m
  }

  /** Bounded per-model word→tokens memo (Zipfian reuse); entries stop
    * being added past the cap rather than evicting — the hot head of
    * the vocabulary is what matters. */
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]](1 << 12)
  private val MemoCap = 1 << 17

  /** Encode one word (no whitespace inside) to its subword tokens.
    * Symbols start as Unicode code points; each step joins the
    * leftmost occurrence of the lowest-rank adjacent pair. */
  def encodeWord(w: String): Array[String] = {
    val cached = memo.get(w)
    if (cached != null) return cached
    val syms = new java.util.ArrayList[String](w.length)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val n = Character.charCount(cp)
      syms.add(w.substring(i, i + n))
      i += n
    }
    var done = syms.size <= 1
    while (!done) {
      var bestRank = Int.MaxValue
      var bestPos = -1
      var j = 0
      val n = syms.size
      while (j < n - 1) {
        val r = rank.get(syms.get(j) + " " + syms.get(j + 1))
        if (r != null && r < bestRank) { bestRank = r; bestPos = j }
        j += 1
      }
      if (bestPos < 0) done = true
      else {
        syms.set(bestPos, syms.get(bestPos) + syms.get(bestPos + 1))
        syms.remove(bestPos + 1)
        if (syms.size <= 1) done = true
      }
    }
    val out = syms.toArray(new Array[String](syms.size))
    if (memo.size < MemoCap) memo.put(w, out)
    out
  }

  /** The merge table as SQL `VALUES` rows `(rank, ' a b ')` — the
    * space-delimited pair pattern a recursive CTE replays with plain
    * `instr`/`substr` string surgery (see the q_chunk_bpe oracle).
    * Single quotes are doubled for SQL embedding. */
  def mergesSqlValues: String =
    merges.zipWithIndex.map { case ((a, b), r) =>
      def q(s: String) = s.replace("'", "''")
      s"($r, ' ${q(a)} ${q(b)} ')"
    }.mkString(", ")
}

object Bpe {

  /** The committed vocabulary: `train(documents, "text", 48)` on the
    * sf0.01 corpus (deterministic — ties in pair counts break
    * lexicographically). Reproducibility is pinned by BpeSpec, which
    * retrains from the parquet and asserts equality. 48 merges leave
    * the vocabulary mid-merge on purpose: words split into 1–5
    * subwords (avg ≈ 2.3 per whitespace token), so BPE accounting is
    * observably different from whitespace accounting. */
  val committed: BpeModel = BpeModel(Vector(
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("cu", "st"), ("cust", "o"),
    ("custo", "mer"), ("f", "i"), ("fi", "l"), ("fil", "t"),
    ("filt", "er"), ("a", "l"), ("al", "l"), ("m", "all"),
    ("s", "mall"), ("g", "e"), ("l", "ow"), ("mer", "ge"),
    ("s", "low"), ("c", "t"), ("ct", "or"), ("d", "er"),
    ("e", "ctor"), ("or", "der"), ("v", "ector")))

  /** Parse the SQL-literal merge-table form: one `a b` pair per
    * newline, in merge-rank order (the inverse of [[renderMerges]]).
    * Symbols never contain whitespace — the pre-tokenizer splits on
    * `\s+` — so the two-field split is unambiguous. */
  def parseMerges(text: String): BpeModel = BpeModel(
    text.split("\n").iterator.map(_.trim).filter(_.nonEmpty).map { line =>
      val f = line.split(" ")
      require(f.length == 2,
        s"merge line '$line': expected exactly 'left right'")
      (f(0), f(1))
    }.toVector)

  /** The newline-delimited literal a trained model embeds in SQL —
    * `renderMerges(train(...))` is what you paste into
    * `bpe_encode(text, '<merges>')`. */
  def renderMerges(model: BpeModel): String =
    model.merges.map { case (a, b) => s"$a $b" }.mkString("\n")

  /** Train a BPE merge list on a corpus: ONE shuffle for the
    * word-frequency table, TakeOrdered to the `maxVocab` most frequent
    * words (ties by word ascending), then the driver-side merge loop.
    * Pair counts are maintained incrementally — after a merge only
    * words containing that pair are rescanned — so training is
    * O(vocab·wordLen + numMerges·touchedWords), not a full recount per
    * merge. Most-frequent pair wins each round; ties break by pair
    * lexicographic order, so training is deterministic. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxVocab: Int = 1 << 20): BpeModel = {
    require(numMerges >= 1, s"numMerges=$numMerges must be >= 1")
    val counts = df.filter(col(textCol).isNotNull)
      .select(explode(graft.pipeline.Dedup.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainFromCounts(counts, numMerges)
  }

  /** Driver-side merge loop over a word-frequency dict. */
  def trainFromCounts(wordCounts: Seq[(String, Long)],
                      numMerges: Int): BpeModel = {
    import scala.collection.mutable
    // symbol arrays per word, parallel freq array
    val words = wordCounts.map { case (w, _) =>
      val buf = mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        val n = Character.charCount(cp)
        buf += w.substring(i, i + n)
        i += n
      }
      buf
    }.toArray
    val freq = wordCounts.map(_._2).toArray

    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def addWordPairs(wi: Int, sign: Long): Unit = {
      val syms = words(wi)
      var j = 0
      while (j < syms.length - 1) {
        val p = (syms(j), syms(j + 1))
        val c = pairCount.getOrElse(p, 0L) + sign * freq(wi)
        if (c <= 0L) { pairCount.remove(p); () } else pairCount.update(p, c)
        if (sign > 0)
          pairWords.getOrElseUpdate(p, mutable.Set.empty) += wi
        j += 1
      }
    }
    words.indices.foreach(addWordPairs(_, 1L))

    val pairOrd = Ordering.Tuple2(Ordering.String, Ordering.String)
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var exhausted = pairCount.isEmpty
    while (m < numMerges && !exhausted) {
      // arg-min over (-count, pair): full scan is fine — the pair map
      // is bounded by total symbols in the (already capped) vocab
      var best: (String, String) = null
      var bestC = 0L
      for ((p, c) <- pairCount)
        if (best == null || c > bestC || (c == bestC && pairOrd.lt(p, best))) {
          best = p; bestC = c
        }
      merges += best
      val (a, b) = best
      val touched = pairWords.getOrElse(best, mutable.Set.empty).toArray
      for (wi <- touched) {
        addWordPairs(wi, -1L)
        val syms = words(wi)
        val out = mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += a + b; j += 2
          } else { out += syms(j); j += 1 }
        }
        words(wi) = out
        addWordPairs(wi, 1L)
      }
      pairWords.remove(best)
      m += 1
      exhausted = pairCount.isEmpty
    }
    BpeModel(merges.result())
  }

  // ----- static helpers, called from generated code -----

  private val WS = java.util.regex.Pattern.compile("\\s+")

  /** Pre-tokenize byte-identically to Dedup.tokens: trim spaces (Spark
    * `trim` removes ASCII 0x20 only), UTF8String lowercase (Spark
    * `lower`), split on Java `\s+`, drop empties. */
  private def preTokens(s: UTF8String): Array[String] = {
    val norm = s.trim().toLowerCase.toString
    if (norm.isEmpty) return Array.empty
    WS.split(norm).filter(_.nonEmpty)
  }

  /** Full-text BPE encode: array of subword tokens in word order. */
  def encodeText(model: BpeModel, s: UTF8String): ArrayData = {
    val ws = preTokens(s)
    val out = new java.util.ArrayList[UTF8String](ws.length * 2)
    var i = 0
    while (i < ws.length) {
      val toks = model.encodeWord(ws(i))
      var j = 0
      while (j < toks.length) { out.add(UTF8String.fromString(toks(j))); j += 1 }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Full-text BPE token count (no array materialization). */
  def countText(model: BpeModel, s: UTF8String): Long = {
    val ws = preTokens(s)
    var n = 0L
    var i = 0
    while (i < ws.length) { n += model.encodeWord(ws(i)).length; i += 1 }
    n
  }
}

object BpeExprs {

  private def checkString(e: Expression, what: String): TypeCheckResult =
    e.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$what expects string, got $other")
    }

  /** text → array<string> of BPE subword tokens. */
  case class BpeEncodeExpr(child: Expression, model: BpeModel)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkString(child, prettyName)
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def prettyName: String = "bpe_encode"

    override def nullSafeEval(a: Any): Any =
      Bpe.encodeText(model, a.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val modelRef = ctx.addReferenceObj("bpeModel", model,
        "graft.functions.BpeModel")
      nullSafeCodeGen(ctx, ev, a => s"""
        |${ev.value} = graft.functions.Bpe.encodeText($modelRef, $a);
        """.stripMargin)
    }

    // explain / structural printouts must not dump the merge table
    override def stringArgs: Iterator[Any] =
      Iterator(child, s"merges=${model.merges.size}")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** text → bigint BPE token count (array-free accounting path). */
  case class BpeCountExpr(child: Expression, model: BpeModel)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      checkString(child, prettyName)
    override def dataType: DataType = LongType
    override def prettyName: String = "bpe_count"

    override def nullSafeEval(a: Any): Any =
      Bpe.countText(model, a.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val modelRef = ctx.addReferenceObj("bpeModel", model,
        "graft.functions.BpeModel")
      nullSafeCodeGen(ctx, ev, a => s"""
        |${ev.value} = graft.functions.Bpe.countText($modelRef, $a);
        """.stripMargin)
    }

    override def stringArgs: Iterator[Any] =
      Iterator(child, s"merges=${model.merges.size}")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // ----- Column API -----
  def bpeTokensCol(text: Column, model: BpeModel = Bpe.committed): Column =
    GraftColumnBridge.column(
      BpeEncodeExpr(GraftColumnBridge.expression(text), model))
  def bpeTokenCountCol(text: Column, model: BpeModel = Bpe.committed): Column =
    GraftColumnBridge.column(
      BpeCountExpr(GraftColumnBridge.expression(text), model))
}
