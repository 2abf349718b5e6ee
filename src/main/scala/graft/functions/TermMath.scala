package graft.functions

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}

import graft.rdf.{TermKind, TermSchema, XSD}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.DataType
import org.apache.spark.unsafe.types.UTF8String

/** Native SPARQL numeric arithmetic over term structs.
  *
  * The Column-tree form (TermFns.arith) is codegen'd but evaluates BOTH
  * the decimal and the double promotion branch per row, plus two
  * regexp_replace calls for canonical decimal lexicals and a
  * floor/ceil/double-cast chain for integer results — measured at ~7×
  * the cost of a comparable map-only query. Here codegen emits one call
  * to a static JIT'd helper that classifies the operands once, parses
  * each lexical once, computes only the promoted branch, and formats
  * without regex.
  *
  * Value semantics are kept bit-identical to the Column form (which the
  * DuckDB oracle verified): exact numerics compute in BigDecimal at
  * scale 12 and round to Spark's DecimalPrecision result scales for
  * (38,12) operands — scale 11 for +/−, scale 6 for × and ÷ — and
  * xsd:integer results truncate toward zero; floats compute in IEEE
  * double (÷0 → ±Infinity per XPath). The one deliberate improvement:
  * decimal overflow yields error→NULL (the SPARQL contract) where ANSI
  * decimal arithmetic in the Column form would throw.
  */
object TermMath {

  final val ADD = 0; final val SUB = 1; final val MUL = 2; final val DIV = 3
  final val NEG = 4

  // operand class per datatype IRI
  private final val NOT_NUM = 0
  private final val INT = 1
  private final val DEC = 2
  private final val FLT = 3

  private val classOfDt: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    XSD.integerFamily.foreach(d => m.put(UTF8String.fromString(d), INT))
    m.put(UTF8String.fromString(XSD.decimal), DEC)
    m.put(UTF8String.fromString(XSD.double), FLT)
    m.put(UTF8String.fromString(XSD.float), FLT)
    m
  }
  private val INTEGER_DT = UTF8String.fromString(XSD.integer)
  private val DECIMAL_DT = UTF8String.fromString(XSD.decimal)
  private val DOUBLE_DT = UTF8String.fromString(XSD.double)
  private val EMPTY = UTF8String.fromString("")

  private def numClass(kind: Int, dt: UTF8String): Int =
    if (kind != TermKind.LITERAL) NOT_NUM
    else {
      val c = classOfDt.get(dt)
      if (c == null) NOT_NUM else c.intValue()
    }

  /** Spark string→double cast semantics: java parse + the
    * case-insensitive special literals inf/+inf/-inf/infinity/nan.
    * Returns null (boxed) on a bad lexical. */
  private def parseDouble(lex: UTF8String): java.lang.Double = {
    val s = lex.toString.trim
    try java.lang.Double.valueOf(s)
    catch {
      case _: NumberFormatException =>
        s.toLowerCase match {
          case "inf" | "+inf" | "infinity" | "+infinity" =>
            java.lang.Double.valueOf(Double.PositiveInfinity)
          case "-inf" | "-infinity" =>
            java.lang.Double.valueOf(Double.NegativeInfinity)
          case "nan" => java.lang.Double.valueOf(Double.NaN)
          case _ => null
        }
    }
  }

  /** Spark string→decimal(38,12) cast semantics: BigDecimal parse
    * (scientific notation accepted), round to scale 12 HALF_UP, NULL
    * when the result exceeds precision 38. */
  private def parseDec(lex: UTF8String): JBigDecimal = {
    val s = lex.toString.trim
    val bd =
      try new JBigDecimal(s)
      catch { case _: NumberFormatException => return null }
    val scaled = bd.setScale(12, RoundingMode.HALF_UP)
    if (scaled.precision > 38) null else scaled
  }

  /** Canonical decimal lexical, mirroring decLex (BigDecimal.toString
    * then strip trailing zeros after a '.'): "3.500000000000" → "3.5",
    * "10.000000000000" → "10". */
  private def canonDec(d: JBigDecimal): UTF8String = {
    val s = d.toString
    val out =
      if (s.indexOf('.') >= 0 && s.indexOf('E') < 0) {
        var end = s.length
        while (end > 0 && s.charAt(end - 1) == '0') end -= 1
        if (end > 0 && s.charAt(end - 1) == '.') end -= 1
        s.substring(0, end)
      } else s
    UTF8String.fromString(out)
  }

  private def lit(lex: UTF8String, dt: UTF8String): InternalRow =
    new GenericInternalRow(Array[Any](TermKind.LITERAL, lex, dt, EMPTY))

  private def intResult(d: JBigDecimal): InternalRow =
    // truncate toward zero (XPath integer cast); inputs here are exact
    lit(UTF8String.fromString(
      d.setScale(0, RoundingMode.DOWN).toBigInteger.toString), INTEGER_DT)

  private def decResult(d: JBigDecimal, scale: Int): InternalRow = {
    val r = d.setScale(scale, RoundingMode.HALF_UP)
    if (r.precision - r.scale > 38 - scale) null // decimal(38,scale) overflow
    else lit(canonDec(r), DECIMAL_DT)
  }

  private def dblResult(d: Double): InternalRow =
    lit(UTF8String.fromString(java.lang.Double.toString(d)), DOUBLE_DT)

  /** a op b with XPath promotion; null = SPARQL error. Called from
    * generated code — must stay a flat static entry point. */
  def arith(op: Int, a: InternalRow, b: InternalRow): InternalRow = {
    val ca = numClass(a.getInt(0), a.getUTF8String(2))
    if (ca == NOT_NUM) return null
    val cb = numClass(b.getInt(0), b.getUTF8String(2))
    if (cb == NOT_NUM) return null
    if (ca == FLT || cb == FLT) {
      val x = parseDouble(a.getUTF8String(1)); if (x == null) return null
      val y = parseDouble(b.getUTF8String(1)); if (y == null) return null
      val r = op match {
        case ADD => x + y
        case SUB => x - y
        case MUL => x * y
        case DIV => x / y // IEEE ÷0 → ±Infinity/NaN, per XPath
      }
      dblResult(r)
    } else {
      val x = parseDec(a.getUTF8String(1)); if (x == null) return null
      val y = parseDec(b.getUTF8String(1)); if (y == null) return null
      val bothInt = ca == INT && cb == INT
      op match {
        case ADD => finishExact(x.add(y), 11, bothInt)
        case SUB => finishExact(x.subtract(y), 11, bothInt)
        case MUL => finishExact(x.multiply(y), 6, bothInt)
        case DIV =>
          if (y.signum() == 0) null // exact ÷0 → error
          else decResult(x.divide(y, MathContext.DECIMAL128), 6)
      }
    }
  }

  private def finishExact(r: JBigDecimal, scale: Int, bothInt: Boolean): InternalRow =
    if (bothInt) {
      if (r.precision - r.scale > 38) null else intResult(r)
    } else decResult(r, scale)

  /** Unary minus. */
  def neg(a: InternalRow): InternalRow = {
    val ca = numClass(a.getInt(0), a.getUTF8String(2))
    if (ca == NOT_NUM) return null
    if (ca == FLT) {
      val x = parseDouble(a.getUTF8String(1)); if (x == null) return null
      dblResult(-x)
    } else {
      val x = parseDec(a.getUTF8String(1)); if (x == null) return null
      if (ca == INT) intResult(x.negate()) else decResult(x.negate(), 12)
    }
  }

  // ----- expressions -----

  case class TermArith(op: Int, left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = TermSchema.termType
    override def nullable: Boolean = true
    override def prettyName: String = "term_arith"

    override def nullSafeEval(a: Any, b: Any): Any =
      arith(op, a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val tmp = ctx.freshName("arith")
        s"""
           |org.apache.spark.sql.catalyst.InternalRow $tmp =
           |  graft.functions.TermMath.arith($op, $a, $b);
           |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  case class TermNeg(child: Expression) extends UnaryExpression {
    override def dataType: DataType = TermSchema.termType
    override def nullable: Boolean = true
    override def prettyName: String = "term_neg"

    override def nullSafeEval(a: Any): Any = neg(a.asInstanceOf[InternalRow])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val tmp = ctx.freshName("negr")
        s"""
           |org.apache.spark.sql.catalyst.InternalRow $tmp =
           |  graft.functions.TermMath.neg($a);
           |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // ----- Column API -----
  private val opCodes = Map("+" -> ADD, "-" -> SUB, "*" -> MUL, "/" -> DIV)
  def arithCol(op: String, a: Column, b: Column): Column =
    GraftColumnBridge.column(TermArith(opCodes(op),
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def negCol(a: Column): Column =
    GraftColumnBridge.column(TermNeg(GraftColumnBridge.expression(a)))
}
