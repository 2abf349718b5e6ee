package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd forms of the basic text-curation signals
  * (round-19 optimization): whitespace token stats, the rule-based
  * quality score, and the marker-word language ID.
  *
  * Why: the original column-expression forms rebuilt the token array
  * up to three times per document and counted stopwords through a
  * higher-order `filter(ts, t.isin(...))` lambda — interpreted
  * per-element dispatch, the exact q_rolling_fp lesson recorded in
  * [[RepetitionExprs]]. At 100 TB these signals must fuse into the
  * scan as ONE generated call per row with one tokenization pass.
  *
  * Semantics are replicated bit-for-bit against the previous column
  * expressions (and therefore against the committed DuckDB oracles):
  *  - tokens = `lower(trim(text))` via UTF8String's own trim (space
  *    0x20 only) and toLowerCase, split on Java-regex `\s+`, empties
  *    dropped — identical to [[graft.pipeline.Dedup.tokens]];
  *  - lengths are Unicode code-point counts (SQL `length`);
  *  - punct count = code points matching `[^A-Za-z0-9\s]`, where `\s`
  *    is Java's ASCII class [ \t\n\x0B\f\r];
  *  - quality = round(lenScore·0.4 + punctScore·0.3 + stopScore·0.3, 6)
  *    with the same double operation order and Spark's HALF_UP
  *    BigDecimal.valueOf rounding;
  *  - NULL text ⇒ NULL output (null-intolerant unary expressions).
  */
object TextStatsExprs {

  val StatsSchema: StructType = StructType(Seq(
    StructField("ntok", LongType, nullable = false),
    StructField("nstop", LongType, nullable = false),
    StructField("sumlen", LongType, nullable = false)))

  private val stopwords: Array[String] =
    Array("the", "a", "of", "and", "to", "in", "is")

  private def cp(s: String): Int = s.codePointCount(0, s.length)

  /** Tokens exactly as `Dedup.tokens`: UTF8String trim (0x20 only) +
    * UTF8String toLowerCase (Spark's `lower`, not JVM-default-locale),
    * Java-regex `\s+` split, empties dropped. */
  private def toks(text: UTF8String): Array[String] =
    text.trim().toLowerCase().toString.split("\\s+").filter(_.nonEmpty)

  /** One tokenization pass; called from generated code. */
  def tokenStats(text: UTF8String): InternalRow = {
    val ts = toks(text)
    var nstop = 0L
    var sumlen = 0L
    var i = 0
    while (i < ts.length) {
      val t = ts(i)
      var j = 0
      var hit = false
      while (j < stopwords.length && !hit) {
        if (stopwords(j) == t) hit = true
        j += 1
      }
      if (hit) nstop += 1
      sumlen += cp(t)
      i += 1
    }
    new GenericInternalRow(Array[Any](ts.length.toLong, nstop, sumlen))
  }

  /** Code points matching `[^A-Za-z0-9\s]` and total code points —
    * equivalent to `length(text) - length(regexp_replace(text,
    * "[^A-Za-z0-9\s]", ""))` (Java regex classes match per code
    * point; counting directly skips the replaceAll allocation). */
  private def punctAndLen(s: String): (Int, Int) = {
    var i = 0
    var n = 0
    var punct = 0
    while (i < s.length) {
      val c = s.codePointAt(i)
      val ok = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') ||
        c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'
      if (!ok) punct += 1
      n += 1
      i += Character.charCount(c)
    }
    (punct, n)
  }

  /** The composite rule-based quality score, one pass; called from
    * generated code. Operation order mirrors the original column
    * expression exactly: ((len·0.4) + (punct·0.3)) + (stop·0.3).
    *
    * NULL text scores 0.7, NOT NULL — inherited from the original
    * column form, where `least` SKIPS null operands: lenScore =
    * least(NULL, 1.0) = 1.0, punctScore = 1 − least(NULL, 1.0) = 0.0,
    * stopScore = least(NULL, 1.0) = 1.0 ⇒ 0.4 + 0.0 + 0.3 = 0.7. The
    * committed oracles replay that value, so it is the contract. */
  def ruleQuality(text: UTF8String): Double = {
    if (text == null)
      return 0.7 // round(1.0*0.4 + 0.0*0.3 + 1.0*0.3, 6), see scaladoc
    val ts = toks(text)
    val ntok = ts.length
    var nstop = 0
    var i = 0
    while (i < ntok) {
      val t = ts(i)
      var j = 0
      var hit = false
      while (j < stopwords.length && !hit) {
        if (stopwords(j) == t) hit = true
        j += 1
      }
      if (hit) nstop += 1
      i += 1
    }
    val lenScore = math.min(ntok.toLong.toDouble / 100.0, 1.0)
    val (punct, len) = punctAndLen(text.toString)
    val punctRatio =
      if (len == 0) 0.0 else punct.toDouble / len.toDouble
    val punctScore = 1.0 - math.min(punctRatio * 5.0, 1.0)
    val stopRatio =
      if (ntok == 0) 0.0 else nstop.toDouble / ntok.toDouble
    val stopScore = math.min(stopRatio * 4.0, 1.0)
    val q = lenScore * 0.4 + punctScore * 0.3 + stopScore * 0.3
    // Spark's round(double, 6): BigDecimal.valueOf + HALF_UP
    java.math.BigDecimal.valueOf(q)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  private val enWords = Array("the", "a", "and", "of")
  private val deWords = Array("der", "die", "das", "und")
  private val frWords = Array("le", "la", "les", "et")
  private val esWords = Array("el", "los", "las", "y")
  private val langEn = UTF8String.fromString("en")
  private val langDe = UTF8String.fromString("de")
  private val langFr = UTF8String.fromString("fr")
  private val langEs = UTF8String.fromString("es")
  private val langUnd = UTF8String.fromString("und")

  /** Marker-word language ID, one tokenization pass; called from
    * generated code. Branch order matches the original `when` chain.
    * NULL text yields "und", NOT NULL — in the original column form
    * every `when(cnt(...) > 0)` condition is NULL (treated false) and
    * the `otherwise` fires; the oracles replay that. */
  def markerLangId(text: UTF8String): UTF8String = {
    if (text == null) return langUnd
    val ts = toks(text)
    var en = false; var de = false; var fr = false; var es = false
    var i = 0
    while (i < ts.length) {
      val t = ts(i)
      var j = 0
      while (j < 4) {
        if (enWords(j) == t) en = true
        if (deWords(j) == t) de = true
        if (frWords(j) == t) fr = true
        if (esWords(j) == t) es = true
        j += 1
      }
      i += 1
    }
    if (en) langEn
    else if (de) langDe
    else if (fr) langFr
    else if (es) langEs
    else langUnd
  }

  // fields nullable like the legacy struct(element_at(...)) form —
  // token arrays never carry nulls, but the schema must not promise
  // more than the expression checks
  val PairSchema: StructType = StructType(Seq(
    StructField("w1", StringType, nullable = true),
    StructField("w2", StringType, nullable = true)))

  /** Adjacent token pairs of a token array as array<struct<w1,w2>> —
    * the native form of `transform(sequence(0, n-2), i =>
    * struct(ts[i+1], ts[i+2]))` (an interpreted per-element lambda).
    * Arrays shorter than 2 yield an empty array; both call sites
    * filter `size(ts) >= 2` first, so the legacy form's
    * descending-sequence corner for n < 2 is unreachable either way.
    * Tokens are copied to the heap (`clone`): the child array may be
    * backed by reused unsafe/columnar memory, and the returned rows
    * must stay valid if a consumer ever buffers them across input
    * rows. Each token is fetched+cloned once and shared by its two
    * pairs (immutable heap copies — sharing is safe).
    * Called from generated code. */
  def tokenPairs(ts: org.apache.spark.sql.catalyst.util.ArrayData): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = ts.numElements()
    if (n < 2)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    var prev = ts.getUTF8String(0)
    if (prev != null) prev = prev.clone()
    val out = new Array[Any](n - 1)
    var i = 0
    while (i < n - 1) {
      var next = ts.getUTF8String(i + 1)
      if (next != null) next = next.clone()
      out(i) = new GenericInternalRow(Array[Any](prev, next))
      prev = next
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  case class TokenPairsExpr(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<string>, got ${other.sql}")
    }
    override def dataType: DataType = ArrayType(PairSchema, containsNull = false)
    override def prettyName: String = "token_pairs"
    override def nullSafeEval(a: Any): Any =
      tokenPairs(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"""
        |${ev.value} = graft.functions.TextStatsExprs.tokenPairs($a);
        """.stripMargin)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def tokenPairsCol(tokens: Column): Column =
    GraftColumnBridge.column(TokenPairsExpr(GraftColumnBridge.expression(tokens)))

  private def stringOnly(prettyName: String, child: Expression): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${child.dataType.sql}")

  case class TokenStatsExpr(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      stringOnly(prettyName, child)
    override def dataType: DataType = StatsSchema
    override def prettyName: String = "token_stats"
    override def nullSafeEval(a: Any): Any =
      tokenStats(a.asInstanceOf[UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"""
        |${ev.value} = graft.functions.TextStatsExprs.tokenStats($a);
        """.stripMargin)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class RuleQualityExpr(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      stringOnly(prettyName, child)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "rule_quality"
    // NOT nullSafeEval/nullSafeCodeGen: NULL text scores 0.7 (see
    // ruleQuality's scaladoc — the least()-skips-null contract of the
    // original column expression, which the oracles replay).
    override def nullable: Boolean = false
    override def eval(input: InternalRow): Any =
      ruleQuality(child.eval(input).asInstanceOf[UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val childGen = child.genCode(ctx)
      val code =
        code"""
           |${childGen.code}
           |double ${ev.value} = graft.functions.TextStatsExprs.ruleQuality(
           |  ${childGen.isNull} ? null : ${childGen.value});
         """.stripMargin
      ev.copy(code = code,
        isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class MarkerLangIdExpr(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      stringOnly(prettyName, child)
    override def dataType: DataType = StringType
    override def prettyName: String = "marker_lang_id"
    // NOT nullSafeEval: NULL text classifies as "und" (the original
    // when-chain's otherwise fires on NULL counts; oracles replay it).
    override def nullable: Boolean = false
    override def eval(input: InternalRow): Any =
      markerLangId(child.eval(input).asInstanceOf[UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val childGen = child.genCode(ctx)
      val code =
        code"""
           |${childGen.code}
           |org.apache.spark.unsafe.types.UTF8String ${ev.value} =
           |  graft.functions.TextStatsExprs.markerLangId(
           |  ${childGen.isNull} ? null : ${childGen.value});
         """.stripMargin
      ev.copy(code = code,
        isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def tokenStatsCol(text: Column): Column =
    GraftColumnBridge.column(TokenStatsExpr(GraftColumnBridge.expression(text)))

  def ruleQualityCol(text: Column): Column =
    GraftColumnBridge.column(RuleQualityExpr(GraftColumnBridge.expression(text)))

  def markerLangIdCol(text: Column): Column =
    GraftColumnBridge.column(MarkerLangIdExpr(GraftColumnBridge.expression(text)))
}
