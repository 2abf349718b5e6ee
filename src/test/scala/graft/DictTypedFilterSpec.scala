package graft

import graft.io.DictStore
import graft.rdf.{Iri, Lit, Quad, Term, XSD}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** The typed object sidecar (round-11 #6): numeric/temporal FILTER
  * conditions in id space with zero dict joins, matching the hybrid
  * decode path value-for-value on every comparable-class edge. */
class DictTypedFilterSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def lit_(lex: String, dt: String) = Lit(lex, dt, "")
  private def q(s: String, p: String, o: Term) =
    Quad(Iri(s"urn:$s"), Iri(s"urn:p:$p"), o, None)

  /** A store whose :v objects cover every comparable-class edge:
    * exact/float numerics, bad lexicals, overflow, strings, IRIs,
    * dates. */
  private lazy val store: DictStore = {
    val quads = Seq(
      q("a", "v", lit_("5", XSD.integer)),
      q("b", "v", lit_("5.000000000001", XSD.decimal)),
      q("c", "v", lit_("5.5", XSD.double)),
      q("d", "v", lit_("NaN", XSD.double)),
      q("e", "v", lit_("abc", XSD.integer)), // bad lexical: error->drop
      q("f", "v", lit_("9" * 40, XSD.integer)), // beyond decimal(38,12)
      q("g", "v", lit_("7", XSD.string)), // string "7" is NOT numeric
      q("h", "v", Iri("urn:not-a-number")),
      q("i", "v", lit_("2024-03-01T00:00:00", XSD.dateTime)),
      q("j", "v", lit_("2024-06-01", XSD.date)),
      q("k", "v", lit_("-0.0", XSD.double)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(quads.map(_.toRow), 2),
      graft.rdf.TermSchema.quadType)
    val dir = java.nio.file.Files.createTempDirectory("dict-typed").toString
    DictStore.encode(df, dir)
  }

  private val pfx = "PREFIX : <urn:p:>\n"
  private def ids(df: DataFrame): Set[String] =
    df.collect().map(_.getStruct(0).getString(1)).toSet

  behavior of "the typed sidecar filter"

  it should "match hybrid numeric semantics on every class edge" in {
    // > 5 : decimal 5.000000000001 and double 5.5 qualify; NaN orders
    // ABOVE everything (Double.compare / Spark agree); integer 5 is
    // not > 5; bad lexical, overflow, string, IRI, dates all drop
    ids(store.sparql(pfx +
      "SELECT ?s { ?s :v ?x FILTER(?x > 5) }")) shouldBe
      Set("urn:b", "urn:c", "urn:d")
    // >= with a decimal constant: exact-exact compares in decimal
    ids(store.sparql(pfx +
      "SELECT ?s { ?s :v ?x FILTER(?x >= 5.0) }")) shouldBe
      Set("urn:a", "urn:b", "urn:c", "urn:d")
    // float constant: every numeric compares as double; -0.0 < 0.5
    ids(store.sparql(pfx +
      "SELECT ?s { ?s :v ?x FILTER(?x < 0.5e0) }")) shouldBe Set("urn:k")
    // numeric equality across classes: 5 = 5.0 (decimal) but not 5.5;
    // the string literal "7" and IRIs stay dropped (type error/false)
    ids(store.sparql(pfx +
      "SELECT ?s { ?s :v ?x FILTER(?x = 5.0) }")) shouldBe Set("urn:a")
    // constant on the LEFT flips the comparison, not the semantics
    ids(store.sparql(pfx +
      "SELECT ?s { ?s :v ?x FILTER(5 < ?x) }")) shouldBe
      Set("urn:b", "urn:c", "urn:d")
  }

  it should "match hybrid temporal semantics (UTC sessions)" in {
    ids(store.sparql(pfx +
      """SELECT ?s { ?s :v ?x
        |  FILTER(?x > "2024-04-01T00:00:00"^^<http://www.w3.org/2001/XMLSchema#dateTime>) }"""
        .stripMargin)) shouldBe Set("urn:j")
    ids(store.sparql(pfx +
      """SELECT ?s { ?s :v ?x
        |  FILTER(?x = "2024-06-01"^^<http://www.w3.org/2001/XMLSchema#date>) }"""
        .stripMargin)) shouldBe Set("urn:j")
  }

  it should "leave != and var-var comparisons on the hybrid path" in {
    // IRI != 5 is TRUE under RDFterm-equal (kinds differ -> not equal)
    // — a typed NULL would wrongly drop it; this is exactly why != is
    // excluded from the sidecar path
    val ne = ids(store.sparql(pfx +
      "SELECT ?s { ?s :v ?x FILTER(?x != 5) }"))
    ne should contain("urn:h") // the IRI row survives
    ne should not contain "urn:a"
  }

  it should "plan ZERO dict joins before the filter and push the comparison" in {
    val df = store.sparql(pfx +
      "SELECT ?s ?x { ?s :v ?x FILTER(?x > 3.0e0 && ?x <= 9.5e0) }")
    df.write.mode("overwrite").format("noop").save()
    // walk the physical tree (through AQE stages): no join may sit
    // BELOW the Filter node that carries the o_dbl comparison — the
    // only joins allowed are the post-filter term materialization
    val nodes = graft.plans.PlanLint.walk(df.queryExecution.executedPlan)
    // alias elimination pushes the filter through the carrying
    // projection, so the surviving FilterExec references the sidecar
    // column itself
    val typedFilters = nodes.collect {
      case f: org.apache.spark.sql.execution.FilterExec
          if f.condition.toString.contains("o_dbl") ||
            f.condition.toString.contains("__td_") => f
    }
    typedFilters should not be empty
    for (f <- typedFilters)
      graft.plans.PlanLint.walk(f).count(_.isInstanceOf[
        org.apache.spark.sql.execution.joins.BaseJoinExec]) shouldBe 0
    // and the double range comparison reaches the parquet scan as a
    // pushed row-group filter — the 100 TB pruning story
    val scanStrs = nodes.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metadata.getOrElse("PushedFilters", "")
    }
    scanStrs.exists(s =>
      s.contains("GreaterThan(o_dbl,3.0") &&
        s.contains("LessThanOrEqual(o_dbl,9.5")) shouldBe true
  }

  it should "pre-filter OPTIONAL right sides on the sidecar, join-free" in {
    // the OPTIONAL face: a right-only numeric condition evaluates on
    // the typed columns BEFORE the left-outer join — unmatched
    // subjects still pad with an unbound ?x
    val df = store.sparql(pfx +
      """SELECT ?s ?x { ?s :v ?y .
        |  OPTIONAL { ?s :v ?x FILTER(?x >= 5.0e0) } }""".stripMargin)
    val rows = df.collect()
      .map(r => (r.getStruct(0).getString(1), Option(r.getStruct(1))
        .map(_.getString(1))))
      .toSet
    rows shouldBe Set(
      // float promotion: every numeric compares as double vs 5.0e0 —
      // 5 >= 5.0, the 40-nines integer parses to 1e40, NaN orders last
      ("urn:a", Some("5")), ("urn:b", Some("5.000000000001")),
      ("urn:c", Some("5.5")), ("urn:d", Some("NaN")),
      ("urn:f", Some("9" * 40)),
      // bad lexical, string "7", IRI, dates, -0.0 < 5: all unbound
      ("urn:e", None), ("urn:g", None), ("urn:h", None),
      ("urn:i", None), ("urn:j", None), ("urn:k", None))
    df.write.mode("overwrite").format("noop").save()
    val nodes = graft.plans.PlanLint.walk(df.queryExecution.executedPlan)
    val typedFilters = nodes.collect {
      case f: org.apache.spark.sql.execution.FilterExec
          if f.condition.toString.contains("o_dbl") => f
    }
    typedFilters should not be empty
    for (f <- typedFilters)
      graft.plans.PlanLint.walk(f).count(_.isInstanceOf[
        org.apache.spark.sql.execution.joins.BaseJoinExec]) shouldBe 0
  }

  it should "keep old stores (no sidecar) on the hybrid path, same answers" in {
    val quads = Seq(
      q("a", "v", lit_("5", XSD.integer)),
      q("c", "v", lit_("5.5", XSD.double)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(quads.map(_.toRow), 1),
      graft.rdf.TermSchema.quadType)
    val dir = java.nio.file.Files.createTempDirectory("dict-old").toString
    val st = DictStore.encode(df, dir)
    ids(st.sparql(pfx +
      "SELECT ?s { ?s :v ?x FILTER(?x > 5) }")) shouldBe Set("urn:c")
    // simulate a pre-sidecar store: same dict, typed columns stripped
    val dir2 = java.nio.file.Files.createTempDirectory("dict-old2").toString
    spark.read.parquet(s"$dir/quads").select("s", "p", "o", "g")
      .write.parquet(s"$dir2/quads")
    spark.read.parquet(s"$dir/dict").write.parquet(s"$dir2/dict")
    val reloaded = DictStore.load(spark, dir2)
    ids(reloaded.sparql(pfx + // hybrid path, same answer
      "SELECT ?s { ?s :v ?x FILTER(?x > 5) }")) shouldBe Set("urn:c")
  }
}
