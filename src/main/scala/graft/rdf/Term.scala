package graft.rdf

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** RDF term model.
  *
  * The reference engine's value universe is rdf4j's `Value` hierarchy
  * (IRI | BNode | Literal(lex, datatype, lang)) — see
  * /root/reference/src/main/scala/es/jolivar/scio/sparql/ValueEvaluators.scala:1-55
  * and SURVEY.md §1.2. We re-express it two ways:
  *
  *  - driver-side, as the small ADT below (parsing fixtures, building
  *    constant columns, decoding test results);
  *  - executor-side, as a flat Spark struct column `(kind, lex, dt, lang)`
  *    — [[TermSchema.termType]] — so every SPARQL variable is ONE nullable
  *    struct column of a DataFrame and all operators stay inside
  *    Catalyst/Tungsten (no JVM object graphs per row, unlike the
  *    reference's per-row `BindingSet`, SURVEY.md §1.3).
  *
  * Invariant: a BOUND term has all four fields non-null (empty string for
  * not-applicable dt/lang) so struct equality `===` behaves as term
  * identity; an UNBOUND variable is a NULL struct. This single choice
  * makes SPARQL's absent-binding semantics coincide with Spark NULL
  * semantics for joins, grouping and filters.
  */
sealed trait Term {
  def lex: String
}
final case class Iri(value: String) extends Term { def lex: String = value }
final case class BNode(id: String) extends Term { def lex: String = id }
sealed abstract case class Lit private[rdf] (lex: String, dt: String, lang: String)
    extends Term

object Lit {
  /** Smart constructor enforcing RDF 1.1: a language-tagged literal's
    * datatype IS rdf:langString, always — so two spellings of the same
    * term can't produce different structs (struct equality = term
    * identity must hold for joins/grouping). The abstract-case-class
    * pattern suppresses the synthesized apply/copy that would bypass
    * this normalization. */
  def apply(lex: String, dt: String = XSD.string, lang: String = ""): Lit =
    if (lang.nonEmpty) new Lit(lex, XSD.langString, lang.toLowerCase) {}
    else new Lit(lex, dt, "") {}
}

object XSD {
  val ns = "http://www.w3.org/2001/XMLSchema#"
  val string = ns + "string"
  val integer = ns + "integer"
  val decimal = ns + "decimal"
  val double = ns + "double"
  val float = ns + "float"
  val boolean = ns + "boolean"
  val date = ns + "date"
  val dateTime = ns + "dateTime"
  val time = ns + "time"
  val langString = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
  val anyURI = ns + "anyURI"
  val dayTimeDuration = ns + "dayTimeDuration"

  /** xsd:integer and its derived types — all promote like integer. */
  val integerFamily: Set[String] = Set(
    integer,
    ns + "long", ns + "int", ns + "short", ns + "byte",
    ns + "nonNegativeInteger", ns + "nonPositiveInteger",
    ns + "negativeInteger", ns + "positiveInteger",
    ns + "unsignedLong", ns + "unsignedInt",
    ns + "unsignedShort", ns + "unsignedByte"
  )

  /** Numeric datatypes participating in XPath-style promotion
    * (integer-derived types included — SPARQL arithmetic/comparison
    * must treat xsd:long etc. as numeric, like rdf4j's MathUtil). */
  val numeric: Set[String] = integerFamily ++ Set(decimal, double, float)

  /** Exact (non-floating) numerics: computed in DecimalType. */
  val exactNumeric: Set[String] = integerFamily + decimal
}

object RDF {
  val ns = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  val typ = ns + "type"
  val first = ns + "first"
  val rest = ns + "rest"
  val nil = ns + "nil"
}

object TermKind {
  val IRI = 0
  val BNODE = 1
  val LITERAL = 2
}

object TermSchema {
  /** The executor-side encoding of one RDF term (SURVEY.md §1.4). */
  val termType: StructType = StructType(Seq(
    StructField("kind", IntegerType, nullable = false),
    StructField("lex", StringType, nullable = false),
    StructField("dt", StringType, nullable = false),
    StructField("lang", StringType, nullable = false)
  ))

  /** One giant quad table: the classic relational RDF encoding the
    * reference also uses (SURVEY.md §1.1); `g` NULL = default graph. */
  val quadType: StructType = StructType(Seq(
    StructField("s", termType, nullable = false),
    StructField("p", termType, nullable = false),
    StructField("o", termType, nullable = false),
    StructField("g", termType, nullable = true)
  ))

  def toRow(t: Term): Row = t match {
    case Iri(v)            => Row(TermKind.IRI, v, "", "")
    case BNode(id)         => Row(TermKind.BNODE, id, "", "")
    case Lit(lex, dt, lang) => Row(TermKind.LITERAL, lex, dt, lang)
  }

  def fromRow(r: Row): Option[Term] =
    if (r == null) None
    else Some(r.getInt(0) match {
      case TermKind.IRI     => Iri(r.getString(1))
      case TermKind.BNODE   => BNode(r.getString(1))
      case TermKind.LITERAL => Lit(r.getString(1), r.getString(2), r.getString(3))
      case k => throw new IllegalArgumentException(s"unknown term kind: $k")
    })

  // ----- InternalRow builders (native-expression ingest path) -----

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.unsafe.types.UTF8String

  private val EMPTY = UTF8String.fromString("")

  private def toInternal(t: Term): InternalRow = t match {
    case Iri(v) => new GenericInternalRow(
      Array[Any](TermKind.IRI, UTF8String.fromString(v), EMPTY, EMPTY))
    case BNode(id) => new GenericInternalRow(
      Array[Any](TermKind.BNODE, UTF8String.fromString(id), EMPTY, EMPTY))
    case Lit(lex, dt, lang) => new GenericInternalRow(
      Array[Any](TermKind.LITERAL, UTF8String.fromString(lex),
        UTF8String.fromString(dt), UTF8String.fromString(lang)))
  }

  /** Quad as an [[InternalRow]] of [[quadType]] — lets parsing
    * expressions emit quads straight into generated code with no
    * Row-codec round-trip. */
  def quadToInternal(q: Quad): InternalRow = new GenericInternalRow(
    Array[Any](toInternal(q.s), toInternal(q.p), toInternal(q.o),
      q.g.map(toInternal).orNull))
}

final case class Quad(s: Term, p: Term, o: Term, g: Option[Term]) {
  def toRow: Row = Row(
    TermSchema.toRow(s), TermSchema.toRow(p), TermSchema.toRow(o),
    g.map(TermSchema.toRow).orNull)
}
