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

  /** Static entry point called from generated code. */
  def normalize(s: UTF8String, form: Int): UTF8String = {
    val f = java.text.Normalizer.Form.values()(form)
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
}
