package graft

import graft.io.DictStore
import graft.rdf.{Iri, Lit, Quad, Term, XSD}
import graft.sparql.Sparql._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** The sidecar threshold top-k: ORDER BY a class-pinned object var +
  * LIMIT runs its phase-1 cut on the persisted o_num/o_dbl/o_ts
  * columns — no dictionary join before the boundary — then refines
  * the k+ties candidates on REAL sort keys, so the result is exactly
  * the hybrid path's.
  *
  * Determinism note: the full term sort key ends in (lex, dt, lang),
  * so the SEQUENCE of sort-var terms in a limited result is fully
  * deterministic — only the accompanying rows of value-identical
  * terms may differ between paths. Tests on the sort var alone
  * compare exactly; tests carrying other vars use the
  * sequence+subset checker. */
class DictThresholdTopKSpec extends AnyFlatSpec with Matchers
    with org.scalatest.BeforeAndAfterAll {
  private val spark = TestSpark.spark
  // toy dicts broadcast, which would auto-disable the threshold path
  // and silently turn every differential below into a plain-top-k
  // test — force it on for this suite
  override def beforeAll(): Unit =
    spark.conf.set("spark.graft.topk.threshold", "always")
  override def afterAll(): Unit =
    spark.conf.unset("spark.graft.topk.threshold")

  private def lit_(lex: String, dt: String) = Lit(lex, dt, "")
  private def q(s: String, p: String, o: Term) =
    Quad(Iri(s"urn:$s"), Iri(s"urn:p:$p"), o, None)

  private def mk(quads: Seq[Quad], tag: String)
      : (DictStore, org.apache.spark.sql.DataFrame) = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(quads.map(_.toRow), 2),
      graft.rdf.TermSchema.quadType)
    val dir = java.nio.file.Files.createTempDirectory(s"dict-topk-$tag").toString
    (DictStore.encode(df, dir), df)
  }

  /** The numeric edge store: every saturation/parse branch of the
    * phase-1 surrogate key, plus value-ties spread over subjects. */
  private lazy val (store, quads) = mk(Seq(
    q("a", "v", lit_("5", XSD.integer)),
    q("b", "v", lit_("5.000000000001", XSD.decimal)),
    q("c", "v", lit_("5.5", XSD.double)),
    q("d", "v", lit_("NaN", XSD.double)),
    q("e", "v", lit_("abc", XSD.integer)), // bad lexical: filter drops
    q("f", "v", lit_("9" * 40, XSD.integer)), // beyond decimal(38,12)
    q("g", "v", lit_("-INF", XSD.double)),
    q("h", "v", lit_("7", XSD.string)), // not numeric: filter drops
    q("i", "v", Iri("urn:not-a-number")),
    q("j", "v", lit_("-0.0", XSD.double)),
    q("k", "v", lit_("2", XSD.integer)),
    q("l", "v", lit_("2.0", XSD.decimal)), // value-tie with k, lex differs
    q("m", "v", lit_("2", XSD.integer)), // exact term tie with k
    q("n", "v", lit_("1e30", XSD.double))), "num")

  private val pfx = "PREFIX : <urn:p:>\n"

  private def terms(df: org.apache.spark.sql.DataFrame): Seq[Seq[Term]] =
    df.collect().toSeq.map(r => r.schema.indices.map(i =>
      if (r.isNullAt(i)) null
      else graft.rdf.TermSchema.fromRow(r.getStruct(i)).orNull))

  /** Exact comparison on sort-var-only projections (deterministic by
    * the lex tie-break); both engines must produce the same LIST. */
  private def sameList(qy: String): Unit = withClue(s"$qy\n") {
    terms(store.sparql(qy)) shouldBe terms(quads.sparql(qy))
  }

  /** Sequence+subset check when non-sort vars ride along: the
    * sort-var term sequence matches the reference exactly, and every
    * returned row appears in the UNLIMITED reference result. */
  private def validTopK(qLimited: String, qFull: String, sortIdx: Int): Unit =
    withClue(s"$qLimited\n") {
      val got = terms(store.sparql(qLimited))
      val ref = terms(quads.sparql(qLimited))
      got.map(_(sortIdx)) shouldBe ref.map(_(sortIdx))
      val full = terms(quads.sparql(qFull))
        .groupBy(identity).view.mapValues(_.size).toMap
      got.groupBy(identity).foreach { case (row, n) =>
        assert(full.getOrElse(row, 0) >= n.size,
          s"row $row over-represented vs the unlimited result")
      }
    }

  behavior of "the sidecar threshold top-k"

  it should "match the term path on every saturation edge, asc and desc" in {
    for {
      cmp <- Seq("?x > 0.5e0", "?x >= 2", "?x < 6.0", "?x > -1e40")
      dir <- Seq("ASC(?x)", "DESC(?x)")
      k <- Seq(1, 2, 3, 5, 20)
    } sameList(pfx +
      s"SELECT ?x { ?s :v ?x FILTER($cmp) } ORDER BY $dir LIMIT $k")
  }

  it should "handle UNPINNED sorts over mixed ranks (unknown rows as candidates)" in {
    // no FILTER: the sort var binds IRIs, strings, bad lexicals,
    // dates, and numerics — the sidecar can rank only the last two,
    // everything else becomes an unconditional candidate, and the
    // result must still be exactly the term path's (rank ordering
    // IRI < numeric < date < string included)
    for {
      dir <- Seq("ASC(?x)", "DESC(?x)")
      k <- Seq(1, 2, 4, 6, 11, 20)
    } sameList(pfx + s"SELECT ?x { ?s :v ?x } ORDER BY $dir LIMIT $k")
    for (off <- Seq(1, 5))
      sameList(pfx +
        s"SELECT ?x { ?s :v ?x } ORDER BY DESC(?x) LIMIT 3 OFFSET $off")
    // mixed ranks UNDER a filter that doesn't pin the sort var
    sameList(pfx + """SELECT ?x { ?s :v ?x . ?s :v ?y
      |  FILTER(?y >= "abc") } ORDER BY ?x LIMIT 4""".stripMargin)
  }

  it should "threshold on the PRIMARY key of a multi-key sort" in {
    // secondary keys only break primary ties, so the first-key
    // boundary still prunes; with ?s as tie-break the full row list
    // is deterministic and must equal the term path's exactly
    for {
      dir <- Seq("ASC(?x) ?s", "DESC(?x) ?s", "DESC(?x) DESC(?s)")
      k <- Seq(1, 3, 5, 12)
    } sameList(pfx +
      s"SELECT ?s ?x { ?s :v ?x } ORDER BY $dir LIMIT $k")
    // value-tied rows (2 vs 2.0 vs the duplicated 2): the secondary
    // key decides among them across the boundary
    sameList(pfx +
      "SELECT ?s ?x { ?s :v ?x FILTER(?x >= 2) } ORDER BY ?x ?s LIMIT 3")
    // an EXPRESSION secondary key rides through the candidate frame
    sameList(pfx +
      "SELECT ?s ?x { ?s :v ?x FILTER(?x > 0) } " +
      "ORDER BY DESC(?x) (STR(?s)) LIMIT 4")
  }

  it should "honor OFFSET through the threshold cut" in {
    for (off <- Seq(0, 1, 3, 7))
      sameList(pfx +
        s"SELECT ?x { ?s :v ?x FILTER(?x > 0.5e0) } " +
        s"ORDER BY ?x LIMIT 3 OFFSET $off")
  }

  it should "carry non-sort vars through boundary ties correctly" in {
    validTopK(
      pfx + "SELECT ?s ?x { ?s :v ?x FILTER(?x >= 2) } ORDER BY ?x LIMIT 2",
      pfx + "SELECT ?s ?x { ?s :v ?x FILTER(?x >= 2) }", 1)
    validTopK(
      pfx + "SELECT ?s ?x { ?s :v ?x FILTER(?x < 9) } ORDER BY DESC(?x) LIMIT 4",
      pfx + "SELECT ?s ?x { ?s :v ?x FILTER(?x < 9) }", 1)
  }

  it should "match the term path on a pinned-temporal sort" in {
    val (ts, tq) = mk(Seq(
      q("a", "t", lit_("2024-03-01T00:00:00", XSD.dateTime)),
      q("b", "t", lit_("2024-06-01", XSD.date)),
      q("c", "t", lit_("2023-12-31T23:59:59.5", XSD.dateTime)),
      q("d", "t", lit_("2024-06-01T00:00:00", XSD.dateTime)), // ties b's instant
      q("e", "t", lit_("not-a-date", XSD.dateTime)), // filter drops
      q("f", "t", lit_("5", XSD.integer))), "ts")
    for {
      dir <- Seq("ASC(?x)", "DESC(?x)")
      k <- Seq(1, 2, 3, 9)
    } {
      val qy = pfx + "SELECT ?x { ?s :t ?x FILTER(?x >= " +
        "\"2020-01-01T00:00:00\"^^<http://www.w3.org/2001/XMLSchema#dateTime>) } " +
        s"ORDER BY $dir LIMIT $k"
      withClue(s"$qy\n") { terms(ts.sparql(qy)) shouldBe terms(tq.sparql(qy)) }
    }
  }

  it should "agree with the term path on randomized data and cuts" in {
    val seed = System.getProperty("graft.fuzz.seed", "1312").toLong
    val rnd = new scala.util.Random(seed)
    val dts = Seq(XSD.integer, XSD.decimal, XSD.double, XSD.ns + "long")
    def lex(): String = rnd.nextInt(6) match {
      case 0 => rnd.nextInt(20).toString
      case 1 => (rnd.nextDouble() * 40 - 20).toString
      case 2 => s"${rnd.nextInt(10)}.${rnd.nextInt(1000000000)}"
      case 3 => Seq("NaN", "INF", "-INF")(rnd.nextInt(3))
      case 4 => "9" * (30 + rnd.nextInt(20))
      case _ => rnd.nextInt(8).toString // dense value ties
    }
    // a quarter of the rows are NON-numeric (strings, IRIs, dates,
    // malformed temporals): the unpinned path must carry them as
    // unknown-rank candidates and still match the term path exactly
    def term(): Term = rnd.nextInt(8) match {
      case 0 => lit_(s"str${rnd.nextInt(6)}", XSD.string)
      case 1 if rnd.nextBoolean() => Iri(s"urn:o:${rnd.nextInt(5)}")
      case 1 => lit_(
        if (rnd.nextBoolean()) s"2024-0${1 + rnd.nextInt(9)}-01T00:00:00"
        else "not-a-date", XSD.dateTime)
      case _ => lit_(lex(), dts(rnd.nextInt(dts.size)))
    }
    val data = (0 until 60).map(i => q(s"s$i", "w", term()))
    val (fs, fq) = mk(data, s"fuzz$seed")
    for (round <- 0 until 40) {
      val op = Seq(">", ">=", "<", "<=")(rnd.nextInt(4))
      val c = rnd.nextInt(4) match {
        case 0 => rnd.nextInt(15).toString
        case 1 => s"${rnd.nextInt(15)}.5"
        case 2 => s"${(rnd.nextDouble() * 20 - 5).toFloat}e0"
        case _ => "0.0e0"
      }
      val filter = // a third of the rounds run UNPINNED (no filter)
        if (round % 3 == 2) "" else s" FILTER(?x $op $c)"
      val dir = if (rnd.nextBoolean()) "ASC(?x)" else "DESC(?x)"
      val k = 1 + rnd.nextInt(12)
      val off = if (rnd.nextBoolean()) 0 else rnd.nextInt(5)
      val qy = pfx + s"SELECT ?x { ?s :w ?x$filter } " +
        s"ORDER BY $dir LIMIT $k OFFSET $off"
      withClue(s"round $round seed $seed: $qy\n") {
        terms(fs.sparql(qy)) shouldBe terms(fq.sparql(qy))
      }
    }
  }

  it should "plan the phase-2 threshold join-free below the boundary filter" in {
    val df = store.sparql(pfx +
      "SELECT ?s ?x { ?s :v ?x FILTER(?x > 0.5e0) } ORDER BY DESC(?x) LIMIT 3")
    df.write.mode("overwrite").format("noop").save()
    val nodes = graft.plans.PlanLint.walk(df.queryExecution.executedPlan)
    // the threshold comparison evaluates on the sidecar columns
    // (o_num / o_dbl references), with NO join anywhere beneath it —
    // the dictionary only ever sees boundary candidates
    val thresholdFilters = nodes.collect {
      case f: org.apache.spark.sql.execution.FilterExec
          if f.condition.toString.contains("o_num") => f
    }
    thresholdFilters should not be empty
    for (f <- thresholdFilters)
      graft.plans.PlanLint.walk(f).count(_.isInstanceOf[
        org.apache.spark.sql.execution.joins.BaseJoinExec]) shouldBe 0
  }

  it should "auto-route only SINGLE-SCAN blocks when the dict won't broadcast" in {
    // the round-14 30× measurement (TOPK_REGIME_r14.json): phase 1
    // re-executes the id frame, so a multi-scan block pays its star
    // join twice — auto keeps those on the plain path even in the
    // non-broadcast regime, and routes single-scan blocks (where the
    // replay is one pushed scan) to the threshold
    val mixed = Seq(
      q("a", "v", lit_("1.0", XSD.double)), q("a", "w", lit_("x", XSD.string)),
      q("b", "v", lit_("2.0", XSD.double)), q("b", "w", lit_("y", XSD.string)),
      q("c", "v", lit_("3.0", XSD.double)), q("c", "w", lit_("z", XSD.string)))
    val (st, _) = mk(mixed, "auto-route")
    def boundaryFilters(qy: String): Int = {
      val df = st.sparql(pfx + qy)
      df.write.mode("overwrite").format("noop").save()
      graft.plans.PlanLint.walk(df.queryExecution.executedPlan).count {
        case f: org.apache.spark.sql.execution.FilterExec =>
          f.condition.toString.contains("o_num")
        case _ => false
      }
    }
    spark.conf.set("spark.graft.topk.threshold", "auto")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      boundaryFilters(
        "SELECT ?x { ?s :v ?x } ORDER BY DESC(?x) LIMIT 2") should be > 0
      boundaryFilters(
        "SELECT ?x ?y { ?s :v ?x . ?s :w ?y } ORDER BY DESC(?x) LIMIT 2"
      ) shouldBe 0
      // and in the broadcast regime both shapes stay plain
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      boundaryFilters(
        "SELECT ?x { ?s :v ?x } ORDER BY DESC(?x) LIMIT 2") shouldBe 0
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.graft.topk.threshold", "always") // suite default
    }
  }

  it should "leave v4 stores (exact-only o_dec) off the threshold path, same answers" in {
    import org.apache.spark.sql.functions.col
    val qdir = java.nio.file.Files.createTempDirectory("dict-topk-v4q").toString
    spark.read.parquet(s"${storePath(store)}/quads")
      .withColumn("o_dec", org.apache.spark.sql.functions
        .when(col("o_cls") === 1, col("o_num")))
      .drop("o_num")
      .write.parquet(s"$qdir/quads")
    spark.read.parquet(s"${storePath(store)}/dict").write.parquet(s"$qdir/dict")
    val v4 = DictStore.load(spark, qdir)
    val qy = pfx +
      "SELECT ?x { ?s :v ?x FILTER(?x > 0.5e0) } ORDER BY ?x LIMIT 4"
    terms(v4.sparql(qy)) shouldBe terms(quads.sparql(qy))
  }

  // the encode path doesn't expose its dir; recover it from the scan
  private def storePath(st: DictStore): String = {
    val files = st.idQuads.inputFiles
    files.head.replaceAll("/quads/.*$", "")
  }
}
