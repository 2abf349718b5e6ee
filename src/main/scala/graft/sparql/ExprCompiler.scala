package graft.sparql

import graft.rdf.{BNode, Iri, Lit, Term, TermKind, XSD}
import Algebra._
import TermFns._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compiles SPARQL scalar expressions to native Catalyst Columns.
  *
  * `value` produces a term-struct Column (NULL = unbound/error);
  * `bool` produces a Spark BooleanType Column (NULL = error) — Spark's
  * three-valued AND/OR/NOT coincide exactly with SPARQL's
  * (false && error = false, true || error = true), so logical operators
  * lower directly.
  *
  * Replaces the reference's per-row rdf4j StrictEvaluationStrategy
  * calls (Interpreter.scala:39-69) with codegen-able expressions; the
  * SPARQL builtin surface follows SURVEY.md §2.2.
  */
final class ExprCompiler(env: String => Column) {

  def termCol(t: Term): Column = t match {
    case Iri(v) => struct(lit(TermKind.IRI).as("kind"), lit(v).as("lex"),
      lit("").as("dt"), lit("").as("lang"))
    case BNode(id) => struct(lit(TermKind.BNODE).as("kind"), lit(id).as("lex"),
      lit("").as("dt"), lit("").as("lang"))
    case l: Lit => struct(lit(TermKind.LITERAL).as("kind"), lit(l.lex).as("lex"),
      lit(l.dt).as("dt"), lit(l.lang).as("lang"))
  }

  private def nullBool: Column = lit(null).cast(BooleanType)

  /** Spark boolean with SPARQL error = NULL. */
  def bool(e: Expr): Column = e match {
    case FuncE("&&", List(a, b)) => bool(a) && bool(b)
    case FuncE("||", List(a, b)) => bool(a) || bool(b)
    case FuncE("!", List(a)) => !bool(a)
    case FuncE("=", List(a, b)) => valueEq(value(a), value(b))
    case FuncE("!=", List(a, b)) => !valueEq(value(a), value(b))
    case FuncE(op @ ("<" | "<=" | ">" | ">="), List(a, b)) =>
      valueCmp(op)(value(a), value(b))
    case InE(x, list, negated) =>
      val v = value(x)
      val anyEq = list.map(i => valueEq(v, value(i)))
        .reduceOption(_ || _).getOrElse(lit(false))
      if (negated) !anyEq else anyEq
    case FuncE("BOUND", List(VarE(n))) => env(n).isNotNull
    case FuncE("BOUND", _) =>
      throw new IllegalArgumentException("BOUND requires a variable argument")
    case FuncE("SAMETERM", List(a, b)) => value(a) === value(b)
    case FuncE("ISIRI" | "ISURI", List(a)) =>
      val v = value(a)
      when(v.isNull, nullBool).otherwise(kind(v) === TermKind.IRI)
    case FuncE("ISBLANK", List(a)) =>
      val v = value(a)
      when(v.isNull, nullBool).otherwise(kind(v) === TermKind.BNODE)
    case FuncE("ISLITERAL", List(a)) =>
      val v = value(a)
      when(v.isNull, nullBool).otherwise(kind(v) === TermKind.LITERAL)
    case FuncE("ISNUMERIC", List(a)) =>
      val v = value(a)
      when(v.isNull, nullBool).otherwise(isNumeric(v))
    case FuncE("CONTAINS", List(a, b)) => str2bool(a, b)(_.contains(_))
    case FuncE("STRSTARTS", List(a, b)) => str2bool(a, b)(_.startsWith(_))
    case FuncE("STRENDS", List(a, b)) => str2bool(a, b)(_.endsWith(_))
    case FuncE("REGEX", args) =>
      // safe expression, not rlike: an invalid pattern or flag is a
      // SPARQL expression error (→ NULL), not a job-aborting
      // PatternSyntaxException; XPath flags incl. q translate properly
      val v = value(args.head)
      val flags = args.drop(2).headOption
        .map(f => lex(value(f))).getOrElse(lit(""))
      when(v.isNull || !isStringish(v), nullBool)
        .otherwise(graft.functions.RegexExprs.regexMatch(
          lex(v), lex(value(args(1))), flags))
    case FuncE("LANGMATCHES", List(a, b)) =>
      val tag = value(a); val range = value(b)
      val t = lower(lex(tag)); val r = lower(lex(range))
      when(tag.isNull || range.isNull, nullBool)
        .when(r === "*", t =!= "")
        .otherwise(t === r || t.startsWith(concat(r, lit("-"))))
    case _: ExistsE =>
      throw new IllegalArgumentException(
        "EXISTS is only supported as a (negated) top-level FILTER conjunct")
    case other => ebv(value(other))
  }

  private def str2bool(a: Expr, b: Expr)(f: (Column, Column) => Column): Column = {
    val va = value(a); val vb = value(b)
    when(va.isNull || vb.isNull || !isStringish(va) || !isStringish(vb), nullBool)
      .otherwise(f(lex(va), lex(vb)))
  }

  /** Term-struct Column. */
  def value(e: Expr): Column = e match {
    case VarE(n) => env(n)
    case ConstE(t) => termCol(t)
    case InE(_, _, _) => boolTerm(bool(e))
    case FuncE(op @ ("+" | "-" | "*" | "/"), List(a, b)) =>
      arith(op)(value(a), value(b))
    case FuncE("UMINUS", List(a)) => uminus(value(a))
    case FuncE(("&&" | "||" | "!" | "=" | "!=" | "<" | "<=" | ">" | ">=" |
                "BOUND" | "SAMETERM" | "ISIRI" | "ISURI" | "ISBLANK" |
                "ISLITERAL" | "ISNUMERIC" | "CONTAINS" | "STRSTARTS" |
                "STRENDS" | "REGEX" | "LANGMATCHES"), _) =>
      boolTerm(bool(e))
    case FuncE("IF", List(c, t, f)) =>
      val cb = bool(c)
      when(cb, value(t)).when(!cb, value(f)).otherwise(nullTerm)
    case FuncE("COALESCE", Nil) => nullTerm // no evaluable branch → unbound
    case FuncE("COALESCE", args) => coalesce(args.map(value): _*)
    case FuncE("STR", List(a)) =>
      val v = value(a)
      when(v.isNull || kind(v) === TermKind.BNODE, nullTerm)
        .otherwise(strTerm(lex(v)))
    case FuncE("LANG", List(a)) =>
      val v = value(a)
      when(v.isNull || !isLiteral(v), nullTerm).otherwise(strTerm(lang(v)))
    case FuncE("DATATYPE", List(a)) =>
      val v = value(a)
      when(v.isNull || !isLiteral(v), nullTerm).otherwise(iriTerm(dt(v)))
    case FuncE("IRI" | "URI", List(a)) =>
      val v = value(a)
      when(v.isNull, nullTerm)
        .when(kind(v) === TermKind.IRI, v)
        .when(isSimpleString(v), iriTerm(lex(v)))
        .otherwise(nullTerm)
    case FuncE("BNODE", Nil) => bnodeTerm(expr("uuid()"))
    case FuncE("BNODE", List(a)) => bnodeTerm(lex(value(a)))
    case FuncE("STRDT", List(a, d)) =>
      val v = value(a); val dtv = value(d)
      when(v.isNull || !isSimpleString(v) || dtv.isNull, nullTerm)
        .otherwise(dtLitDyn(lex(v), lex(dtv)))
    case FuncE("STRLANG", List(a, l)) =>
      val v = value(a); val lv = value(l)
      when(v.isNull || !isSimpleString(v) || lv.isNull, nullTerm)
        .otherwise(langTerm(lex(v), lex(lv)))
    case FuncE("STRLEN", List(a)) =>
      strishOp(a)(v => intTerm(length(lex(v))))
    case FuncE("SUBSTR", a :: b :: rest) =>
      // XPath fn:substring: keep positions p with round(start) <= p <
      // round(start) + round(len), intersected with [1, strlen].
      // Spark's substr diverges for start < 1 (0 extends the window,
      // negatives count from the END) and truncates instead of
      // rounding — clamp/adjust explicitly. Arguments round via
      // floor(x + 0.5) (fn:round half-up toward +inf), clamped into
      // int range so the length arithmetic cannot overflow under ANSI.
      val v = value(a)
      def rnd(e: Expr): Column =
        greatest(least(floor(numD(value(e)) + lit(0.5)).try_cast(LongType),
          lit(Int.MaxValue.toLong)), lit(Int.MinValue.toLong))
      val start = rnd(b)
      val lenOpt = rest.headOption.map(rnd)
      val s1 = greatest(start, lit(1L)).cast(IntegerType)
      val len = lenOpt
        .map(l => greatest(l + least(start - lit(1L), lit(0L)), lit(0L))
          .cast(IntegerType))
        .getOrElse(lit(Int.MaxValue))
      when(v.isNull || !isStringish(v) || start.isNull ||
        lenOpt.map(_.isNull).getOrElse(lit(false)), nullTerm)
        .otherwise(sameStrKind(v, lex(v).substr(s1, len)))
    case FuncE("UCASE", List(a)) => strishOp(a)(v => sameStrKind(v, upper(lex(v))))
    case FuncE("LCASE", List(a)) => strishOp(a)(v => sameStrKind(v, lower(lex(v))))
    case FuncE("STRBEFORE", List(a, b)) =>
      val va = value(a); val vb = value(b)
      val p = call_function("locate", lex(vb), lex(va))
      when(va.isNull || vb.isNull || !isStringish(va) || !isStringish(vb), nullTerm)
        .otherwise(sameStrKind(va,
          when(p > 0, lex(va).substr(lit(1), p - 1)).otherwise(lit(""))))
    case FuncE("STRAFTER", List(a, b)) =>
      val va = value(a); val vb = value(b)
      val p = call_function("locate", lex(vb), lex(va))
      when(va.isNull || vb.isNull || !isStringish(va) || !isStringish(vb), nullTerm)
        .otherwise(sameStrKind(va,
          when(p > 0, lex(va).substr(p + length(lex(vb)), lit(Int.MaxValue)))
            .otherwise(lit(""))))
    case FuncE("ENCODE_FOR_URI", List(a)) =>
      strishOp(a)(v => strTerm(
        regexp_replace(call_function("url_encode", lex(v)), "\\+", "%20")))
    case FuncE("CONCAT", Nil) => strTerm(lit(""))
    case FuncE("CONCAT", args) =>
      val vs = args.map(value)
      val anyBad = vs.map(v => v.isNull || !isStringish(v)).reduce(_ || _)
      when(anyBad, nullTerm).otherwise(strTerm(concat(vs.map(lex): _*)))
    case FuncE("REPLACE", a :: p :: r :: rest) =>
      val v = value(a)
      val flags = rest.headOption.map(f => lex(value(f))).getOrElse(lit(""))
      // safe expression: invalid pattern/flags → NULL (see REGEX)
      val rep = graft.functions.RegexExprs.regexReplace(
        lex(v), lex(value(p)), lex(value(r)), flags)
      when(v.isNull || !isStringish(v) || rep.isNull, nullTerm)
        .otherwise(sameStrKind(v, rep))
    case FuncE("ABS", List(a)) => numericOp(a)(d => abs(d), d => abs(d))
    case FuncE("CEIL", List(a)) => numericOp(a)(ceil(_).cast(DEC), d => ceil(d).cast(DoubleType))
    case FuncE("FLOOR", List(a)) => numericOp(a)(floor(_).cast(DEC), d => floor(d).cast(DoubleType))
    case FuncE("ROUND", List(a)) => numericOp(a)(round(_, 0), d => round(d, 0))
    case FuncE("RAND", Nil) => doubleTerm(rand())
    case FuncE("NOW", Nil) =>
      dtLit(date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"),
        XSD.dateTime)
    case FuncE("YEAR", List(a)) => tsOp(a)(t => intTerm(year(t)))
    case FuncE("MONTH", List(a)) => tsOp(a)(t => intTerm(month(t)))
    case FuncE("DAY", List(a)) => tsOp(a)(t => intTerm(dayofmonth(t)))
    case FuncE("HOURS", List(a)) => tsOp(a)(t => intTerm(hour(t)))
    case FuncE("MINUTES", List(a)) => tsOp(a)(t => intTerm(minute(t)))
    case FuncE("SECONDS", List(a)) => tsOp(a)(t => decTerm(second(t).cast(DEC)))
    case FuncE("TZ", List(a)) =>
      val v = value(a)
      when(v.isNull || !isDateTimeish(v), nullTerm)
        .otherwise(strTerm(regexp_extract(lex(v), "(Z|[+-]\\d{2}:\\d{2})$", 1)))
    case FuncE("TIMEZONE", List(a)) =>
      // SPARQL 1.1 §17.4.5.8: canonical xsd:dayTimeDuration of the
      // literal's timezone offset ("-05:00" → "-PT5H"); error (unbound)
      // when the literal carries no timezone
      val v = value(a)
      val tzs = regexp_extract(lex(v), "(Z|[+-]\\d{2}:\\d{2})$", 1)
      val hh = substring(tzs, 2, 2).try_cast(IntegerType)
      val mm = substring(tzs, 5, 2).try_cast(IntegerType)
      val dur =
        when(tzs === "Z" || (hh === 0 && mm === 0), lit("PT0S"))
          .otherwise(concat(
            when(tzs.startsWith("-"), lit("-")).otherwise(lit("")),
            lit("PT"),
            when(hh > 0, concat(hh.cast(StringType), lit("H"))).otherwise(lit("")),
            when(mm > 0, concat(mm.cast(StringType), lit("M"))).otherwise(lit(""))))
      when(v.isNull || !isDateTimeish(v) || tzs === "", nullTerm)
        .otherwise(dtLit(dur, XSD.dayTimeDuration))
    case FuncE("MD5", List(a)) => strishOp(a)(v => strTerm(md5(lex(v))))
    case FuncE("SHA1", List(a)) => strishOp(a)(v => strTerm(sha1(lex(v))))
    case FuncE("SHA256", List(a)) => strishOp(a)(v => strTerm(sha2(lex(v), 256)))
    case FuncE("SHA384", List(a)) => strishOp(a)(v => strTerm(sha2(lex(v), 384)))
    case FuncE("SHA512", List(a)) => strishOp(a)(v => strTerm(sha2(lex(v), 512)))
    case FuncE("UUID", Nil) => iriTerm(concat(lit("urn:uuid:"), expr("uuid()")))
    case FuncE("STRUUID", Nil) => strTerm(expr("uuid()"))
    case FuncE(castName, List(a)) if castName.startsWith("cast:") =>
      castTo(castName.stripPrefix("cast:"), value(a))
    case _: ExistsE =>
      throw new IllegalArgumentException(
        "EXISTS is only supported as a (negated) top-level FILTER conjunct")
    case a: AggE =>
      throw new IllegalStateException(s"unlifted aggregate $a in scalar position")
    case other =>
      throw new IllegalArgumentException(s"unsupported expression: $other")
  }

  /** Keep lang/string-ness of the first argument (per SPARQL string fns). */
  private def sameStrKind(src: Column, newLex: Column): Column =
    when(lang(src) =!= "", langTerm(newLex, lang(src))).otherwise(strTerm(newLex))

  private def strishOp(a: Expr)(f: Column => Column): Column = {
    val v = value(a)
    when(v.isNull || !isStringish(v), nullTerm).otherwise(f(v))
  }
  private def tsOp(a: Expr)(f: Column => Column): Column = {
    val v = value(a)
    when(v.isNull || !isDateTimeish(v), nullTerm).otherwise(f(ts(v)))
  }
  /** Type-preserving numeric op: decimal path for exact, double path else. */
  private def numericOp(a: Expr)(fd: Column => Column, fx: Column => Column): Column = {
    val v = value(a)
    when(v.isNull || !isNumeric(v), nullTerm)
      .when(isFloating(v), dtLitDyn(fx(numD(v)).cast(StringType), dt(v)))
      .when(isIntegerTyped(v), intTermFromDec(fd(numDec(v))))
      .otherwise(decTerm(fd(numDec(v))))
  }

  private def castTo(dtIri: String, v: Column): Column = dtIri match {
    case XSD.string =>
      when(v.isNull || kind(v) === TermKind.BNODE, nullTerm)
        .otherwise(strTerm(lex(v)))
    case XSD.integer =>
      when(v.isNull, nullTerm)
        .when(isBool(v), intTerm(when(boolVal(v), 1).otherwise(0)))
        .when(isNumeric(v), intTermFromDec(numDec(v)))
        .when(isStringish(v) && lex(v).rlike("^[+-]?\\d+$"),
          // try_cast: a 40-digit string passes the rlike but overflows
          // DEC(38,12) — error→unbound, not an ANSI throw
          intTermFromDec(lex(v).try_cast(DEC)))
        .otherwise(nullTerm)
    case XSD.decimal =>
      when(v.isNull, nullTerm)
        .when(isBool(v), decTerm(when(boolVal(v), 1).otherwise(0).cast(DEC)))
        .when(isNumeric(v), decTerm(numDec(v)))
        // try_cast: SPARQL §17.5 cast of an unparseable string is an
        // error (→ unbound), not a job crash (ANSI cast would throw)
        .when(isStringish(v), decTerm(lex(v).try_cast(DEC)))
        .otherwise(nullTerm)
    case XSD.double | XSD.float =>
      when(v.isNull, nullTerm)
        .when(isBool(v), dtLit(when(boolVal(v), 1.0).otherwise(0.0).cast(StringType), dtIri))
        .when(isNumeric(v), dtLit(numD(v).cast(StringType), dtIri))
        .when(isStringish(v), dtLit(lex(v).try_cast(DoubleType).cast(StringType), dtIri))
        .otherwise(nullTerm)
    case XSD.boolean =>
      when(v.isNull, nullTerm)
        .when(isBool(v), v)
        .when(isNumeric(v), boolTerm(numD(v) =!= 0.0))
        .when(isStringish(v) && lex(v).isin("true", "false", "1", "0"),
          boolTerm(lex(v).isin("true", "1")))
        .otherwise(nullTerm)
    case XSD.dateTime =>
      when(v.isNull, nullTerm)
        .when(isStringish(v) && lex(v).try_cast(TimestampType).isNotNull,
          dtLit(lex(v), XSD.dateTime))
        .when(isDateTimeish(v), dtLit(lex(v), XSD.dateTime))
        .otherwise(nullTerm)
    case XSD.date =>
      when(v.isNull, nullTerm)
        .when(isStringish(v) && lex(v).try_cast(DateType).isNotNull,
          dtLit(lex(v), XSD.date))
        .when(isDateTimeish(v), dtLit(lex(v), XSD.date))
        .otherwise(nullTerm)
    case other =>
      throw new IllegalArgumentException(s"unsupported cast to <$other>")
  }
}
