package graft

import graft.io.DictStore
import graft.rdf.{Iri, Lit, Quad, Term, XSD}
import org.apache.spark.sql.DataFrame
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** The SUBJECT-position typed sidecar (round-14): generalized-RDF
  * quads can carry literal subjects, and a numeric/temporal FILTER on
  * a subject var now runs on the s_cls/s_dbl/s_num/s_ts columns
  * persisted at encode — zero dict joins, parquet-pushed — exactly
  * like the object-position fast path. The differential reference is
  * the SAME store with the s_* columns stripped (a v5 layout), where
  * the identical queries take the hybrid decode path. */
class DictSubjectFilterSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark

  private def lit_(lex: String, dt: String) = Lit(lex, dt, "")
  private def q(s: Term, p: String, o: Term) =
    Quad(s, Iri(s"urn:p:$p"), o, None)

  /** Subjects cover every comparable-class edge the object spec
    * covers: exact/float numerics, NaN, bad lexical, overflow,
    * string, IRI, temporals, -0.0. */
  private val quads = Seq(
    q(lit_("5", XSD.integer), "tag", lit_("a", XSD.string)),
    q(lit_("5.000000000001", XSD.decimal), "tag", lit_("b", XSD.string)),
    q(lit_("5.5", XSD.double), "tag", lit_("c", XSD.string)),
    q(lit_("NaN", XSD.double), "tag", lit_("d", XSD.string)),
    q(lit_("abc", XSD.integer), "tag", lit_("e", XSD.string)),
    q(lit_("9" * 40, XSD.integer), "tag", lit_("f", XSD.string)),
    q(lit_("7", XSD.string), "tag", lit_("g", XSD.string)),
    q(Iri("urn:not-a-number"), "tag", lit_("h", XSD.string)),
    q(lit_("2024-03-01T00:00:00", XSD.dateTime), "tag", lit_("i", XSD.string)),
    q(lit_("2024-06-01", XSD.date), "tag", lit_("j", XSD.string)),
    q(lit_("-0.0", XSD.double), "tag", lit_("k", XSD.string)))

  private def df(quads: Seq[Quad]): DataFrame = spark.createDataFrame(
    spark.sparkContext.parallelize(quads.map(_.toRow), 2),
    graft.rdf.TermSchema.quadType)

  private lazy val store: DictStore = {
    val dir = java.nio.file.Files.createTempDirectory("dict-subj").toString
    DictStore.encode(df(quads), dir)
  }

  /** The same store with the subject sidecar stripped — the v5
    * layout, forcing every subject FILTER onto the hybrid path. */
  private lazy val v5Store: DictStore = {
    val dir = java.nio.file.Files.createTempDirectory("dict-subj-v6").toString
    DictStore.encode(df(quads), dir)
    val dir2 = java.nio.file.Files.createTempDirectory("dict-subj-v5").toString
    spark.read.parquet(s"$dir/quads")
      .drop("s_cls", "s_dbl", "s_num", "s_ts")
      .write.parquet(s"$dir2/quads")
    spark.read.parquet(s"$dir/dict").write.parquet(s"$dir2/dict")
    DictStore.load(spark, dir2)
  }

  private val pfx = "PREFIX : <urn:p:>\n"
  private def tags(d: DataFrame): Set[String] =
    d.collect().map(_.getStruct(0).getString(1)).toSet

  private val probes = Seq(
    // exact constant: decimal compare for exact rows, double for float
    "SELECT ?t { ?s :tag ?t FILTER(?s > 5) }",
    "SELECT ?t { ?s :tag ?t FILTER(?s >= 5.0) }",
    // float constant: everything numeric compares as double
    "SELECT ?t { ?s :tag ?t FILTER(?s < 0.5e0) }",
    // numeric equality across classes
    "SELECT ?t { ?s :tag ?t FILTER(?s = 5.0) }",
    // constant on the left flips operands, not semantics
    "SELECT ?t { ?s :tag ?t FILTER(5 < ?s) }",
    // temporal subject via s_ts (UTC sessions both sides)
    """SELECT ?t { ?s :tag ?t
      |  FILTER(?s > "2024-04-01T00:00:00"^^<http://www.w3.org/2001/XMLSchema#dateTime>) }"""
      .stripMargin)

  behavior of "the subject-position typed sidecar"

  it should "answer exactly like the hybrid path on every class edge" in {
    for (p <- probes) withClue(s"$p\n") {
      tags(store.sparql(pfx + p)) shouldBe tags(v5Store.sparql(pfx + p))
    }
    // and the expected sets themselves, pinned once (mirrors the
    // object-position spec's semantics table)
    tags(store.sparql(pfx + probes.head)) shouldBe Set("b", "c", "d")
    tags(store.sparql(pfx + probes(2))) shouldBe Set("k")
    tags(store.sparql(pfx + probes(3))) shouldBe Set("a")
    tags(store.sparql(pfx + probes(5))) shouldBe Set("j")
  }

  it should "leave != on the hybrid path (IRI != 5 is TRUE)" in {
    val ne = tags(store.sparql(pfx +
      "SELECT ?t { ?s :tag ?t FILTER(?s != 5) }"))
    ne should contain("h") // the IRI-subject row survives RDFterm-equal
    ne should not contain "a"
  }

  it should "plan ZERO dict joins below the filter and push s_* to parquet" in {
    val d = store.sparql(pfx +
      "SELECT ?s ?t { ?s :tag ?t FILTER(?s > 3.0e0 && ?s <= 9.5e0) }")
    d.write.mode("overwrite").format("noop").save()
    val nodes = graft.plans.PlanLint.walk(d.queryExecution.executedPlan)
    val typedFilters = nodes.collect {
      case f: org.apache.spark.sql.execution.FilterExec
          if f.condition.toString.contains("s_dbl") ||
            f.condition.toString.contains("__td_") => f
    }
    typedFilters should not be empty
    for (f <- typedFilters)
      graft.plans.PlanLint.walk(f).count(_.isInstanceOf[
        org.apache.spark.sql.execution.joins.BaseJoinExec]) shouldBe 0
    val scanStrs = nodes.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metadata.getOrElse("PushedFilters", "")
    }
    scanStrs.exists(s =>
      s.contains("GreaterThan(s_dbl,3.0") &&
        s.contains("LessThanOrEqual(s_dbl,9.5")) shouldBe true
  }

  it should "serve subject and object conjuncts from ONE scan set" in {
    // one scan carries BOTH sidecars under different per-var names —
    // the battery entry's shape (q_dict_subject_filter)
    val mixed = Seq(
      q(lit_("1", XSD.integer), "w", lit_("10.0", XSD.double)),
      q(lit_("2", XSD.integer), "w", lit_("20.0", XSD.double)),
      q(lit_("3", XSD.integer), "w", lit_("30.0", XSD.double)))
    val dir = java.nio.file.Files.createTempDirectory("dict-subj-mix").toString
    val st = DictStore.encode(df(mixed), dir)
    val d = st.sparql(pfx +
      "SELECT ?s ?x { ?s :w ?x FILTER(?s >= 2 && ?x < 25.0e0) }")
    d.collect().map(_.getStruct(0).getString(1)).toSet shouldBe Set("2")
    d.queryExecution.executedPlan // plan resolves without ambiguity
  }

  it should "keep v5 stores (no s_*) on the hybrid path, same answers" in {
    // v5Store IS the stripped layout; re-assert it loads and answers
    tags(v5Store.sparql(pfx +
      "SELECT ?t { ?s :tag ?t FILTER(?s > 5) }")) shouldBe
      Set("b", "c", "d")
  }
}
