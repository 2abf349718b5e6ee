package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native codegen'd expression — the first
  * step of the standard corpus-cleaning recipe (composed forms so
  * "café" spelled e+◌́ and é dedup/fingerprint identically; NFKC
  * additionally folds compatibility characters: ﬁ→fi, ①→1,
  * fullwidth→ASCII). Spark ships no normalizer function and a Scala
  * UDF would leave whole-stage codegen; this stays inside it via a
  * static call, with an `isNormalized` fast path so the ASCII-heavy
  * bulk of a corpus pays one scan and zero allocations. */
object TextCleanExprs {

  // Form.values() clones the enum array per call — cache it once so
  // the per-row path below really is allocation-free for ASCII input.
  private val Forms: Array[java.text.Normalizer.Form] =
    java.text.Normalizer.Form.values()

  /** Static entry point called from generated code. */
  def normalize(s: UTF8String, form: Int): UTF8String = {
    val f = Forms(form)
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }

  case class UnicodeNormalizeExpr(child: Expression, form: String)
    extends UnaryExpression {
    private val formE =
      try java.text.Normalizer.Form.valueOf(form.toUpperCase)
      catch { case _: IllegalArgumentException =>
        throw new IllegalArgumentException(
          s"unknown normalization form '$form' (NFC, NFD, NFKC, NFKD)")
      }
    override def dataType: DataType = StringType
    override def prettyName: String = "unicode_normalize"
    override protected def nullSafeEval(input: Any): Any =
      normalize(input.asInstanceOf[UTF8String], formE.ordinal())
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.TextCleanExprs.normalize($c, ${formE.ordinal()})")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def unicodeNormalize(text: Column, form: String = "NFC"): Column =
    GraftColumnBridge.column(
      UnicodeNormalizeExpr(GraftColumnBridge.expression(text), form))

  // ----- mojibake repair (ftfy-style, deterministic subset) -----

  private val cp1252 = java.nio.charset.Charset.forName("windows-1252")

  /** One repair step: re-encode through windows-1252 and decode as
    * STRICT UTF-8. Returns null when the string doesn't round-trip
    * (an unmappable char, or bytes that aren't valid UTF-8) — i.e.
    * when the input was NOT mojibake. */
  private def decodeStep(s: String): String = {
    val enc = cp1252.newEncoder()
    if (!enc.canEncode(s)) return null
    val bytes =
      try enc.encode(java.nio.CharBuffer.wrap(s))
      catch { case _: java.nio.charset.CharacterCodingException => return null }
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(bytes).toString
    catch { case _: java.nio.charset.CharacterCodingException => null }
  }

  /** Marker heuristic: UTF-8-read-as-1252 text is full of Ã/Â/â/�
    * lead characters; plain Western text essentially never is. Only
    * marked strings attempt (and accept) a repair, so correctly-
    * encoded accented text is never "repaired" into garbage. */
  private def mojibakeMarkers(s: String): Int = {
    var n = 0; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == 'Ã' || c == 'Â' || c == 'â' || c == '�') n += 1
      i += 1
    }
    n
  }

  /** Static entry point called from generated code: repair UTF-8 text
    * that was mis-decoded as windows-1252 (possibly twice), the
    * dominant real-world mojibake ("cafÃ©" → "café", "â€™" → "’").
    * Deterministic and conservative: a step is accepted only when the
    * marker count strictly DROPS and the round-trip is lossless; at
    * most two steps (double-encoding); ASCII and clean accented text
    * pass through untouched. Limitation (whole-string semantics): a
    * corruption that passed through a cp1252-UNDEFINED byte decoded
    * the irrecoverable U+FFFD — such strings return unchanged rather
    * than half-repaired (ftfy's per-segment "sloppy-cp1252" trades
    * that safety for recall; this engine's discipline is determinism
    * over aggressiveness). */
  def fixMojibake(s: UTF8String): UTF8String = {
    var cur = s.toString
    var markers = mojibakeMarkers(cur)
    if (markers == 0) return s
    var steps = 0
    while (steps < 2 && markers > 0) {
      val next = decodeStep(cur)
      if (next == null) return if (steps == 0) s else UTF8String.fromString(cur)
      val nm = mojibakeMarkers(next)
      if (nm >= markers) return if (steps == 0) s else UTF8String.fromString(cur)
      cur = next; markers = nm; steps += 1
    }
    UTF8String.fromString(cur)
  }

  case class FixMojibakeExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "fix_mojibake"
    override protected def nullSafeEval(input: Any): Any =
      fixMojibake(input.asInstanceOf[UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextCleanExprs.fixMojibake($c)")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def fixMojibake(text: Column): Column =
    GraftColumnBridge.column(
      FixMojibakeExpr(GraftColumnBridge.expression(text)))
}
