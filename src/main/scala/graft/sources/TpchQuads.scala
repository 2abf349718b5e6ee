package graft.sources

import graft.rdf.{TermKind, XSD}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational → RDF quad projections of the driver's TPC-H-ish parquet
  * tables (TESTDATA.md). Used by the CORRECTNESS battery: each SPARQL
  * operator demo runs over these quads while the DuckDB oracle runs
  * equivalent SQL over the original tables — so every SPARQL answer is
  * independently checkable.
  *
  * Entity IRIs: `urn:c:<custkey>`, `urn:n:<nationkey>`, `urn:r:<regionkey>`,
  * `urn:s:<suppkey>`, `urn:o:<orderkey>`; predicates under `urn:p:`.
  * All quads live in the default graph (g = NULL) except [[graphQuads]],
  * which namespaces each table into its own named graph for GRAPH tests.
  *
  * The projections are pure column expressions over the parquet scans —
  * no collect, no UDFs — so at 100 TB this is a streaming re-shape, and
  * unused predicates are pruned away by Catalyst when a query only
  * scans a subset (each union branch keeps its pushed-down filters).
  */
object TpchQuads {
  val P = "urn:p:"

  private val nullTerm = lit(null).cast(graft.rdf.TermSchema.termType)

  /** A NULL source column must become an UNBOUND term (NULL struct),
    * never a bound literal with a NULL lex — that would violate the
    * term-struct invariant (Term.scala) and silently drop rows from
    * joins/DISTINCT with neither bound nor unbound semantics. */
  private def guarded(lexCol: Column)(build: Column => Column): Column =
    when(lexCol.isNull, nullTerm).otherwise(build(lexCol))

  private def iriStruct(lexCol: Column): Column = guarded(lexCol)(l => struct(
    lit(TermKind.IRI).as("kind"), l.as("lex"),
    lit("").as("dt"), lit("").as("lang")))
  def entity(prefix: String, key: Column): Column =
    iriStruct(concat(lit(prefix), key.cast(StringType)))
  def pred(name: String): Column = iriStruct(lit(P + name))
  def strLit(c: Column): Column = guarded(c.cast(StringType))(l => struct(
    lit(TermKind.LITERAL).as("kind"), l.as("lex"),
    lit(XSD.string).as("dt"), lit("").as("lang")))
  def dblLit(c: Column): Column = guarded(c.cast(DoubleType).cast(StringType))(l =>
    struct(lit(TermKind.LITERAL).as("kind"), l.as("lex"),
      lit(XSD.double).as("dt"), lit("").as("lang")))
  def intLit(c: Column): Column = guarded(c.cast(LongType).cast(StringType))(l =>
    struct(lit(TermKind.LITERAL).as("kind"), l.as("lex"),
      lit(XSD.integer).as("dt"), lit("").as("lang")))
  def dateTimeLit(c: Column): Column =
    guarded(date_format(c, "yyyy-MM-dd'T'HH:mm:ss"))(l =>
      struct(lit(TermKind.LITERAL).as("kind"), l.as("lex"),
        lit(XSD.dateTime).as("dt"), lit("").as("lang")))

  /** One (s, p, o) projection per predicate, unioned; g = NULL. Rows
    * whose subject or object is unbound (NULL source value) are
    * dropped — a quad can't have an absent position. */
  def mk(df: DataFrame, subj: Column, pairs: (String, Column)*): DataFrame =
    pairs.map { case (p, o) =>
      df.select(subj.as("s"), pred(p).as("p"), o.as("o"),
        lit(null).cast(graft.rdf.TermSchema.termType).as("g"))
        .filter(col("s").isNotNull && col("o").isNotNull)
    }.reduce(_ union _)

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = {
    val df = t(spark, dir, "region")
    mk(df, entity("urn:r:", col("r_regionkey")),
      "rname" -> strLit(col("r_name")))
  }

  def nation(spark: SparkSession, dir: String): DataFrame = {
    val df = t(spark, dir, "nation")
    mk(df, entity("urn:n:", col("n_nationkey")),
      "nname" -> strLit(col("n_name")),
      "inRegion" -> entity("urn:r:", col("n_regionkey")))
  }

  def customer(spark: SparkSession, dir: String): DataFrame = {
    val df = t(spark, dir, "customer")
    mk(df, entity("urn:c:", col("c_custkey")),
      "cname" -> strLit(col("c_name")),
      "acctbal" -> dblLit(col("c_acctbal")),
      "mktsegment" -> strLit(col("c_mktsegment")),
      "inNation" -> entity("urn:n:", col("c_nationkey")))
  }

  def supplier(spark: SparkSession, dir: String): DataFrame = {
    val df = t(spark, dir, "supplier")
    mk(df, entity("urn:s:", col("s_suppkey")),
      "sname" -> strLit(col("s_name")),
      "sacctbal" -> dblLit(col("s_acctbal")),
      "inNation" -> entity("urn:n:", col("s_nationkey")))
  }

  def orders(spark: SparkSession, dir: String): DataFrame = {
    val df = t(spark, dir, "orders")
    mk(df, entity("urn:o:", col("o_orderkey")),
      "customer" -> entity("urn:c:", col("o_custkey")),
      "totalprice" -> dblLit(col("o_totalprice")),
      "orderstatus" -> strLit(col("o_orderstatus")),
      "orderdate" -> dateTimeLit(col("o_orderdate")),
      "orderpriority" -> strLit(col("o_orderpriority")))
  }

  def part(spark: SparkSession, dir: String): DataFrame = {
    val df = t(spark, dir, "part")
    mk(df, entity("urn:pt:", col("p_partkey")),
      "pname" -> strLit(col("p_name")),
      "brand" -> strLit(col("p_brand")),
      "ptype" -> strLit(col("p_type")),
      "psize" -> intLit(col("p_size")),
      "retailprice" -> dblLit(col("p_retailprice")))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = {
    val df = t(spark, dir, "lineitem")
    val subj = iriStruct(concat(lit("urn:l:"), col("l_orderkey").cast(StringType),
      lit("-"), col("l_linenumber").cast(StringType)))
    mk(df, subj,
      "order" -> entity("urn:o:", col("l_orderkey")),
      "partRef" -> entity("urn:pt:", col("l_partkey")),
      "suppRef" -> entity("urn:s:", col("l_suppkey")),
      "quantity" -> dblLit(col("l_quantity")),
      "extendedprice" -> dblLit(col("l_extendedprice")),
      "discount" -> dblLit(col("l_discount")),
      "returnflag" -> strLit(col("l_returnflag")))
  }

  /** GENERALIZED-RDF projection of orders: the SUBJECT is the bare
    * `xsd:integer` order key (legal in this engine's term model, as
    * in the reference's scan — every position matches identically),
    * exercising the v6 subject-position typed sidecar. One predicate
    * per measure, like [[orders]]. */
  def ordersKeyedBySubject(spark: SparkSession, dir: String): DataFrame = {
    val df = t(spark, dir, "orders")
    mk(df, intLit(col("o_orderkey")),
      "sprice" -> dblLit(col("o_totalprice")),
      "spriority" -> strLit(col("o_orderpriority")))
  }

  /** `:partOf` containment chain customer → nation → region (only this
    * one predicate — keeps the transitive-closure node set clean). */
  def partOfChain(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    mk(c, entity("urn:c:", col("c_custkey")),
      "partOf" -> entity("urn:n:", col("c_nationkey")))
      .union(mk(n, entity("urn:n:", col("n_nationkey")),
        "partOf" -> entity("urn:r:", col("n_regionkey"))))
  }

  /** Customer + nation quads, each table in its own named graph. */
  def graphQuads(spark: SparkSession, dir: String): DataFrame = {
    def inGraph(df: DataFrame, g: String): DataFrame =
      df.withColumn("g", iriStruct(lit(g)))
    inGraph(customer(spark, dir), "urn:graph:customer")
      .union(inGraph(nation(spark, dir), "urn:graph:nation"))
  }
}
