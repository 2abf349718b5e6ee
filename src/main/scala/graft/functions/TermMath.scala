package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import graft.rdf.{TermKind, TermSchema, XSD}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
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
    // Java's Double.valueOf also accepts type-suffixed ("1.5f") and hex
    // ("0x1.8p1") forms that Spark's string→double cast and xsd:double
    // both reject — route those to the special-literal fallback instead.
    val javaOnly = s.nonEmpty && {
      val last = s.charAt(s.length - 1)
      last == 'f' || last == 'F' || last == 'd' || last == 'D' ||
        s.indexOf('x') >= 0 || s.indexOf('X') >= 0
    }
    if (!javaOnly) {
      try return java.lang.Double.valueOf(s)
      catch { case _: NumberFormatException => () }
    }
    s.toLowerCase match {
      case "inf" | "+inf" | "infinity" | "+infinity" =>
        java.lang.Double.valueOf(Double.PositiveInfinity)
      case "-inf" | "-infinity" =>
        java.lang.Double.valueOf(Double.NegativeInfinity)
      case "nan" => java.lang.Double.valueOf(Double.NaN)
      case _ => null
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
        // the scale also bounds the integer range: decimal(38, s) holds
        // 38-s integer digits, the same boundary the Column form's
        // result types enforced (beyond it: error→NULL)
        case ADD => finishExact(x.add(y), 11, bothInt)
        case SUB => finishExact(x.subtract(y), 11, bothInt)
        case MUL => finishExact(x.multiply(y), 6, bothInt)
        case DIV =>
          if (y.signum() == 0) null // exact ÷0 → error
          else {
            // single rounding of the EXACT quotient to the result scale
            // (an intermediate DECIMAL128 rounding could differ by 1 ulp)
            val q = x.divide(y, 6, RoundingMode.HALF_UP)
            if (q.precision - q.scale > 32) null else lit(canonDec(q), DECIMAL_DT)
          }
      }
    }
  }

  private def finishExact(r: JBigDecimal, scale: Int, bothInt: Boolean): InternalRow =
    if (bothInt) {
      if (r.precision - r.scale > 38 - scale) null else intResult(r)
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

  // ----- value comparison / equality / EBV -----

  final val LT = 0; final val LE = 1; final val GT = 2; final val GE = 3

  private def boolVal(lex: UTF8String): java.lang.Boolean = {
    val s = lex.toString
    if (s == "true" || s == "1") java.lang.Boolean.TRUE
    else if (s == "false" || s == "0") java.lang.Boolean.FALSE
    else null
  }

  private def tsMicros(lex: UTF8String, zone: java.time.ZoneId): Option[Long] =
    org.apache.spark.sql.catalyst.util.DateTimeUtils.stringToTimestamp(lex, zone)

  private def cmpToBool(op: Int, c: Int): java.lang.Boolean = op match {
    case LT => java.lang.Boolean.valueOf(c < 0)
    case LE => java.lang.Boolean.valueOf(c <= 0)
    case GT => java.lang.Boolean.valueOf(c > 0)
    case GE => java.lang.Boolean.valueOf(c >= 0)
  }

  /** SPARQL `=` value equality; null = type error (kept branch-for-
    * branch equal to the Column form in TermFns.valueEq). */
  def valueEq(a: InternalRow, b: InternalRow,
              zone: java.time.ZoneId): java.lang.Boolean = {
    val ak = a.getInt(0); val bk = b.getInt(0)
    val aLex = a.getUTF8String(1); val bLex = b.getUTF8String(1)
    val aDt = a.getUTF8String(2); val bDt = b.getUTF8String(2)
    val ca = numClass(ak, aDt); val cb = numClass(bk, bDt)
    if (ca != NOT_NUM && cb != NOT_NUM) {
      if (ca == FLT || cb == FLT) {
        val x = parseDouble(aLex); if (x == null) return null
        val y = parseDouble(bLex); if (y == null) return null
        val xv = x.doubleValue(); val yv = y.doubleValue()
        // Spark SQL equality: NaN = NaN is true, -0.0 = 0.0 is true
        java.lang.Boolean.valueOf(xv == yv || (xv.isNaN && yv.isNaN))
      } else {
        val x = parseDec(aLex); if (x == null) return null
        val y = parseDec(bLex); if (y == null) return null
        java.lang.Boolean.valueOf(x.compareTo(y) == 0)
      }
    } else if (ak == TermKind.LITERAL && bk == TermKind.LITERAL &&
               aDt.equals(BOOLEAN_DT) && bDt.equals(BOOLEAN_DT)) {
      val x = boolVal(aLex); if (x == null) return null
      val y = boolVal(bLex); if (y == null) return null
      java.lang.Boolean.valueOf(x.booleanValue() == y.booleanValue())
    } else if (ak == TermKind.LITERAL && bk == TermKind.LITERAL &&
               (aDt.equals(DATE_DT) || aDt.equals(DATETIME_DT)) &&
               (bDt.equals(DATE_DT) || bDt.equals(DATETIME_DT))) {
      val x = tsMicros(aLex, zone); if (x.isEmpty) return null
      val y = tsMicros(bLex, zone); if (y.isEmpty) return null
      java.lang.Boolean.valueOf(x.get == y.get)
    } else if (ak != bk) java.lang.Boolean.FALSE
    else if (ak != TermKind.LITERAL) // IRI/BNode identity
      java.lang.Boolean.valueOf(aLex.equals(bLex))
    else {
      val aStr = aDt.equals(STRING_DT) || aDt.equals(LANGSTRING_DT)
      val bStr = bDt.equals(STRING_DT) || bDt.equals(LANGSTRING_DT)
      val identical = aLex.equals(bLex) && aDt.equals(bDt) &&
        a.getUTF8String(3).equals(b.getUTF8String(3))
      if (aStr && bStr) java.lang.Boolean.valueOf(identical)
      else if (identical) java.lang.Boolean.TRUE
      // distinct literals of unknown/mixed datatypes: type error, not
      // false (so `!=` drops the row instead of wrongly keeping it)
      else null
    }
  }

  /** SPARQL order comparison (<, <=, >, >=); null = type error. */
  def valueCmp(op: Int, a: InternalRow, b: InternalRow,
               zone: java.time.ZoneId): java.lang.Boolean = {
    val ak = a.getInt(0); val bk = b.getInt(0)
    val aLex = a.getUTF8String(1); val bLex = b.getUTF8String(1)
    val aDt = a.getUTF8String(2); val bDt = b.getUTF8String(2)
    val ca = numClass(ak, aDt); val cb = numClass(bk, bDt)
    if (ca != NOT_NUM && cb != NOT_NUM) {
      if (ca == FLT || cb == FLT) {
        val x = parseDouble(aLex); if (x == null) return null
        val y = parseDouble(bLex); if (y == null) return null
        // +0.0 normalizes -0.0 so ordering matches Spark (-0.0 = 0.0);
        // Double.compare puts NaN above everything, like Spark
        cmpToBool(op, java.lang.Double.compare(
          x.doubleValue() + 0.0, y.doubleValue() + 0.0))
      } else {
        val x = parseDec(aLex); if (x == null) return null
        val y = parseDec(bLex); if (y == null) return null
        cmpToBool(op, x.compareTo(y))
      }
    } else if (ak == TermKind.LITERAL && bk == TermKind.LITERAL) {
      val aStr = aDt.equals(STRING_DT) || aDt.equals(LANGSTRING_DT)
      val bStr = bDt.equals(STRING_DT) || bDt.equals(LANGSTRING_DT)
      if (aStr && bStr) cmpToBool(op, aLex.binaryCompare(bLex))
      else if (aDt.equals(BOOLEAN_DT) && bDt.equals(BOOLEAN_DT)) {
        val x = boolVal(aLex); if (x == null) return null
        val y = boolVal(bLex); if (y == null) return null
        cmpToBool(op, java.lang.Boolean.compare(x.booleanValue(), y.booleanValue()))
      } else if ((aDt.equals(DATE_DT) || aDt.equals(DATETIME_DT)) &&
                 (bDt.equals(DATE_DT) || bDt.equals(DATETIME_DT))) {
        val x = tsMicros(aLex, zone); if (x.isEmpty) return null
        val y = tsMicros(bLex, zone); if (y.isEmpty) return null
        cmpToBool(op, java.lang.Long.compare(x.get, y.get))
      } else null
    } else null
  }

  /** Effective boolean value (SPARQL 1.1 §17.2.2); null = type error.
    * Invalid boolean/numeric lexical forms → false per rule 1. */
  def ebv(a: InternalRow): java.lang.Boolean = {
    val kind = a.getInt(0)
    if (kind != TermKind.LITERAL) return null
    val lex = a.getUTF8String(1); val dt = a.getUTF8String(2)
    if (dt.equals(BOOLEAN_DT)) {
      val b = boolVal(lex)
      if (b == null) java.lang.Boolean.FALSE else b
    } else if (classOfDt.get(dt) != null) {
      val d = parseDouble(lex)
      if (d == null) java.lang.Boolean.FALSE
      else java.lang.Boolean.valueOf(d.doubleValue() != 0.0)
    } else if (dt.equals(STRING_DT) || dt.equals(LANGSTRING_DT))
      java.lang.Boolean.valueOf(lex.numBytes() > 0)
    else null
  }

  // ----- total-order sort key -----

  private val SK_TYPE: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("num",
        org.apache.spark.sql.types.DecimalType(38, 12), nullable = false),
      org.apache.spark.sql.types.StructField("dbl",
        org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("lex",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("dt",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType, nullable = false)))

  private val BOOLEAN_DT = UTF8String.fromString(XSD.boolean)
  private val STRING_DT = UTF8String.fromString(XSD.string)
  private val LANGSTRING_DT = UTF8String.fromString(XSD.langString)
  private val DATE_DT = UTF8String.fromString(XSD.date)
  private val DATETIME_DT = UTF8String.fromString(XSD.dateTime)
  private val decMaxBD = new JBigDecimal("9" * 26).setScale(12)
  private val DEC_ZERO = org.apache.spark.sql.types.Decimal(JBigDecimal.ZERO.setScale(12), 38, 12)
  private val DEC_MAX = org.apache.spark.sql.types.Decimal(decMaxBD, 38, 12)
  private val DEC_MIN = org.apache.spark.sql.types.Decimal(decMaxBD.negate(), 38, 12)

  /** The saturation bounds [[TermSortKey]]'s `num` field falls back to
    * when a numeric lexical does not fit decimal(38,12) — exposed so
    * the dict store's sidecar sort key can reproduce the exact same
    * ordering without a term in hand. */
  def decSatMaxBD: JBigDecimal = decMaxBD
  def decSatMinBD: JBigDecimal = decMaxBD.negate()

  private def skRow(rank: Int, num: org.apache.spark.sql.types.Decimal,
                    dbl: Double, lex: UTF8String, dt: UTF8String,
                    lang: UTF8String): InternalRow =
    new GenericInternalRow(Array[Any](rank, num, dbl, lex, dt, lang))

  /** Canonical sortable key; matches TermFns.sortKey field-for-field
    * (rank: unbound 0 < BNode 1 < IRI 2 < numeric 3 < dateTime 4 <
    * boolean 5 < string 6 < other 7; exact numerics order through
    * DECIMAL with ±max saturation; invalid numeric lexicals sink to
    * (-max, -Inf); temporal/boolean order through the double field). */
  def sortKey(a: InternalRow, zoneId: java.time.ZoneId): InternalRow = {
    if (a == null)
      return skRow(0, DEC_ZERO, Double.NegativeInfinity, EMPTY, EMPTY, EMPTY)
    val kind = a.getInt(0)
    val lex = a.getUTF8String(1); val dt = a.getUTF8String(2)
    val lang = a.getUTF8String(3)
    if (kind == TermKind.BNODE)
      return skRow(1, DEC_ZERO, Double.NegativeInfinity, lex, dt, lang)
    if (kind == TermKind.IRI)
      return skRow(2, DEC_ZERO, Double.NegativeInfinity, lex, dt, lang)
    // literal
    val cls = classOfDt.get(dt)
    if (cls != null) { // numeric
      val d = parseDouble(lex)
      val dbl = if (d == null) Double.NegativeInfinity else d.doubleValue()
      val num = {
        val bd =
          try new JBigDecimal(lex.toString.trim).setScale(12, RoundingMode.HALF_UP)
          catch { case _: NumberFormatException => null }
        if (bd != null && bd.precision <= 38)
          org.apache.spark.sql.types.Decimal(bd, 38, 12)
        else if (d != null && d.doubleValue() >= 0) DEC_MAX
        else DEC_MIN
      }
      return skRow(3, num, dbl, lex, dt, lang)
    }
    if (dt.equals(DATE_DT) || dt.equals(DATETIME_DT)) {
      // epoch seconds, matching cast(timestamp as double) under the
      // session timezone
      val micros = org.apache.spark.sql.catalyst.util.DateTimeUtils
        .stringToTimestamp(lex, zoneId)
      val dbl =
        if (micros.isEmpty) Double.NegativeInfinity
        else micros.get.toDouble / 1e6
      val num =
        if (micros.isEmpty) DEC_ZERO
        else org.apache.spark.sql.types.Decimal(
          new JBigDecimal(dbl).setScale(12, RoundingMode.HALF_UP), 38, 12)
      return skRow(4, num, dbl, lex, dt, lang)
    }
    if (dt.equals(BOOLEAN_DT)) {
      val s = lex.toString
      val b: java.lang.Boolean =
        if (s == "true" || s == "1") java.lang.Boolean.TRUE
        else if (s == "false" || s == "0") java.lang.Boolean.FALSE
        else null // invalid lexical → sinks like the coalesce defaults
      if (b == null)
        return skRow(5, DEC_ZERO, Double.NegativeInfinity, lex, dt, lang)
      val dbl = if (b) 1.0 else 0.0
      val num = org.apache.spark.sql.types.Decimal(
        new JBigDecimal(dbl).setScale(12), 38, 12)
      return skRow(5, num, dbl, lex, dt, lang)
    }
    if (dt.equals(STRING_DT) || dt.equals(LANGSTRING_DT))
      return skRow(6, DEC_ZERO, Double.NegativeInfinity, lex, dt, lang)
    skRow(7, DEC_ZERO, Double.NegativeInfinity, lex, dt, lang)
  }

  case class TermSortKey(child: Expression, zoneIdStr: String)
      extends UnaryExpression {
    override def dataType: DataType = SK_TYPE
    override def nullable: Boolean = false
    override def prettyName: String = "term_sort_key"
    @transient private lazy val zone = java.time.ZoneId.of(zoneIdStr)

    override def eval(input: InternalRow): Any =
      sortKey(child.eval(input).asInstanceOf[InternalRow], zone)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      // NOT nullSafeCodeGen: a NULL (unbound) input produces the rank-0
      // row, same as the Column form's when(isNull, 0) branch
      val childGen = child.genCode(ctx)
      val zoneRef = ctx.addReferenceObj("zone", zone, "java.time.ZoneId")
      val code =
        code"""
           |${childGen.code}
           |org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
           |  graft.functions.TermMath.sortKey(
           |    ${childGen.isNull} ? null : ${childGen.value}, $zoneRef);
         """.stripMargin
      ev.copy(code = code,
        isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def sortKeyCol(a: Column, zoneId: String): Column =
    GraftColumnBridge.column(TermSortKey(GraftColumnBridge.expression(a), zoneId))

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

  case class TermValueEq(left: Expression, right: Expression, zoneIdStr: String)
      extends BinaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.BooleanType
    override def nullable: Boolean = true
    override def prettyName: String = "term_value_eq"
    @transient private lazy val zone = java.time.ZoneId.of(zoneIdStr)

    override def nullSafeEval(a: Any, b: Any): Any =
      valueEq(a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow], zone)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val zoneRef = ctx.addReferenceObj("zone", zone, "java.time.ZoneId")
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val tmp = ctx.freshName("veq")
        s"""
           |java.lang.Boolean $tmp =
           |  graft.functions.TermMath.valueEq($a, $b, $zoneRef);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $tmp.booleanValue(); }
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  case class TermValueCmp(op: Int, left: Expression, right: Expression,
                          zoneIdStr: String) extends BinaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.BooleanType
    override def nullable: Boolean = true
    override def prettyName: String = "term_value_cmp"
    @transient private lazy val zone = java.time.ZoneId.of(zoneIdStr)

    override def nullSafeEval(a: Any, b: Any): Any =
      valueCmp(op, a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow], zone)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val zoneRef = ctx.addReferenceObj("zone", zone, "java.time.ZoneId")
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val tmp = ctx.freshName("vcmp")
        s"""
           |java.lang.Boolean $tmp =
           |  graft.functions.TermMath.valueCmp($op, $a, $b, $zoneRef);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $tmp.booleanValue(); }
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  case class TermEbv(child: Expression) extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.BooleanType
    override def nullable: Boolean = true
    override def prettyName: String = "term_ebv"

    override def nullSafeEval(a: Any): Any = ebv(a.asInstanceOf[InternalRow])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val tmp = ctx.freshName("ebv")
        s"""
           |java.lang.Boolean $tmp = graft.functions.TermMath.ebv($a);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $tmp.booleanValue(); }
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
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
  private val cmpCodes = Map("<" -> LT, "<=" -> LE, ">" -> GT, ">=" -> GE)
  def valueEqCol(a: Column, b: Column, zoneId: String): Column =
    GraftColumnBridge.column(TermValueEq(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b), zoneId))
  def valueCmpCol(op: String, a: Column, b: Column, zoneId: String): Column =
    GraftColumnBridge.column(TermValueCmp(cmpCodes(op),
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b), zoneId))
  def ebvCol(a: Column): Column =
    GraftColumnBridge.column(TermEbv(GraftColumnBridge.expression(a)))
}
