package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Repetition / layout quality signals for training-data curation — the
  * published filter family for web-corpus cleaning (duplicate-line and
  * repeated-n-gram fractions, bullet/ellipsis line shares; Rae et al.,
  * "Scaling Language Models: ... Gopher", arXiv:2112.11446 §A1.1) as
  * ONE native codegen'd scalar expression returning a struct.
  *
  * Why one scalar expression: every signal is a pure function of one
  * document, so at 100 TB it must fuse into the scan — one generated
  * call per row, one pass over the text, no exploded line/token rows,
  * no interpreted array lambdas (the q_rolling_fp lesson: per-element
  * interpreted dispatch costs ~8×, not the hashing).
  *
  * Signal definitions (replayed exactly by the DuckDB oracle):
  *  - lines   = '\n'-split, space-trimmed (space char only, matching
  *    SQL `trim`), empties dropped
  *  - dup_line_frac      = (lines - distinct lines) / lines
  *  - dup_line_char_frac = chars in line instances whose value occurs
  *    more than once / chars in all lines (char = Unicode code point,
  *    matching SQL `length`)
  *  - bullet_line_frac   = lines starting with '-', '*' or '•' / lines
  *  - ellipsis_line_frac = lines ending with "..." or '…' / lines
  *  - top_token_frac     = occurrences of the most frequent token /
  *    total tokens (tokens as [[graft.pipeline.Dedup.tokens]]:
  *    lowercased, \s+-split, empties dropped)
  *  - top_bigram_char_frac = min(1, count(top bigram) × chars(top
  *    bigram) / (chars of all tokens + (tokens − 1) separators)); the
  *    top bigram maximizes (count, then char length) so ties cannot
  *    make the fraction nondeterministic
  * Zero lines/tokens/bigrams make the respective fractions 0.0.
  */
object RepetitionExprs {

  val StatsSchema: StructType = StructType(Seq(
    StructField("n_lines", IntegerType, nullable = false),
    StructField("dup_line_frac", DoubleType, nullable = false),
    StructField("dup_line_char_frac", DoubleType, nullable = false),
    StructField("bullet_line_frac", DoubleType, nullable = false),
    StructField("ellipsis_line_frac", DoubleType, nullable = false),
    StructField("top_token_frac", DoubleType, nullable = false),
    StructField("top_bigram_char_frac", DoubleType, nullable = false)))

  private def cp(s: String): Int = s.codePointCount(0, s.length)

  /** SQL-`trim` semantics: strip leading/trailing SPACE (0x20) only —
    * Java's `String.trim` also strips control chars and would diverge
    * from the oracle on lines ending in '\r' or '\t'. */
  private def trimSpaces(s: String): String = {
    var a = 0; var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  /** One pass over the document; called from generated code. */
  def repetitionStats(text: UTF8String): InternalRow = {
    val s = text.toString

    // ---- line signals ----
    val rawLines = s.split("\n", -1)
    val lineCounts = new java.util.HashMap[String, Integer]()
    var nLines = 0; var bullet = 0; var ellipsis = 0
    var i = 0
    while (i < rawLines.length) {
      val l = trimSpaces(rawLines(i))
      if (l.nonEmpty) {
        nLines += 1
        lineCounts.merge(l, 1, (a, b) => a + b)
        val c0 = l.charAt(0)
        if (c0 == '-' || c0 == '*' || c0 == '•') bullet += 1
        if (l.endsWith("...") || l.endsWith("…")) ellipsis += 1
      }
      i += 1
    }
    var dupLineChars = 0L; var totalLineChars = 0L
    val lit = lineCounts.entrySet().iterator()
    while (lit.hasNext) {
      val e = lit.next()
      val chars = e.getValue.toLong * cp(e.getKey)
      totalLineChars += chars
      if (e.getValue > 1) dupLineChars += chars
    }
    val dupLineFrac =
      if (nLines == 0) 0.0 else (nLines - lineCounts.size).toDouble / nLines
    val dupLineCharFrac =
      if (totalLineChars == 0L) 0.0 else dupLineChars.toDouble / totalLineChars
    val bulletFrac = if (nLines == 0) 0.0 else bullet.toDouble / nLines
    val ellipsisFrac = if (nLines == 0) 0.0 else ellipsis.toDouble / nLines

    // ---- token signals (tokenization identical to Dedup.tokens:
    // lower(trim(text)) via UTF8String's own trim/lower, so casing
    // matches Spark's `lower` exactly, not the JVM default locale) ----
    val toks = text.trim().toLowerCase().toString.split("\\s+").filter(_.nonEmpty)
    val n = toks.length
    val tokCounts = new java.util.HashMap[String, Integer]()
    var totalTokChars = 0L
    i = 0
    while (i < n) {
      tokCounts.merge(toks(i), 1, (a, b) => a + b)
      totalTokChars += cp(toks(i))
      i += 1
    }
    var maxTok = 0
    val tit = tokCounts.values().iterator()
    while (tit.hasNext) { val c = tit.next(); if (c > maxTok) maxTok = c }
    val topTokenFrac = if (n == 0) 0.0 else maxTok.toDouble / n

    var topBigramFrac = 0.0
    if (n >= 2) {
      val bgCounts = new java.util.HashMap[String, Integer]()
      i = 0
      while (i < n - 1) {
        bgCounts.merge(toks(i) + " " + toks(i + 1), 1, (a, b) => a + b)
        i += 1
      }
      var maxC = 0
      val b1 = bgCounts.values().iterator()
      while (b1.hasNext) { val c = b1.next(); if (c > maxC) maxC = c }
      var maxLen = 0
      val b2 = bgCounts.entrySet().iterator()
      while (b2.hasNext) {
        val e = b2.next()
        if (e.getValue == maxC) { val l = cp(e.getKey); if (l > maxLen) maxLen = l }
      }
      val denom = totalTokChars + (n - 1) // single-space separators
      topBigramFrac = Math.min(1.0, maxC.toDouble * maxLen / denom)
    }

    new GenericInternalRow(Array[Any](nLines, dupLineFrac, dupLineCharFrac,
      bulletFrac, ellipsisFrac, topTokenFrac, topBigramFrac))
  }

  case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string column, got ${child.dataType.sql}")
    override def dataType: DataType = StatsSchema
    override def prettyName: String = "repetition_stats"

    override def nullSafeEval(a: Any): Any =
      repetitionStats(a.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"""
        |${ev.value} = graft.functions.RepetitionExprs.repetitionStats($a);
        """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def repetitionStatsCol(text: Column): Column =
    GraftColumnBridge.column(
      RepetitionStatsExpr(GraftColumnBridge.expression(text)))
}
