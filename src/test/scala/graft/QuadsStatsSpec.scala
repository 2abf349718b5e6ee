package graft

import graft.io.QuadsIO
import graft.rdf.{Iri, Lit, Quad}
import graft.sparql.{Algebra, BgpOptimizer, QuadsStats, SparqlParser}
import graft.sparql.Algebra._
import graft.sparql.Sparql._

/** Cost-based BGP ordering: stats computation, cardinality estimates,
  * greedy order decisions a structural heuristic cannot make, JSON
  * persistence, and result-equivalence (stats may only change join
  * ORDER, never the answer).
  */
class QuadsStatsSpec extends SparqlSpecBase {

  private val E = "urn:st:"

  /** Skewed dataset: :common on 40 subjects, :rare on 2 of them. Both
    * patterns have exactly one constant (the predicate), so the
    * structural heuristic scores them identically; real counts don't. */
  private lazy val skewed = QuadsIO.fromQuads(spark,
    (1 to 40).map(i =>
      Quad(Iri(E + s"s$i"), Iri(E + "common"), Lit(i.toString), None)) ++
      (1 to 2).map(i =>
        Quad(Iri(E + s"s$i"), Iri(E + "rare"), Lit("x"), None)))

  private lazy val stats = QuadsStats.compute(skewed)

  "QuadsStats.compute" should "count per predicate with distinct ends" in {
    stats.total shouldBe 42
    stats.preds(E + "common").count shouldBe 40
    stats.preds(E + "rare").count shouldBe 2
    // HLL estimates: right magnitude is all ordering needs
    stats.preds(E + "common").ndvSubj.toDouble shouldBe 40.0 +- 5.0
    stats.preds(E + "rare").ndvObj shouldBe 1
  }

  it should "estimate pattern shapes from the model" in {
    def scan(q: String): Scan =
      SparqlParser.parseAny(s"SELECT * { $q }") match {
        case SparqlParser.SelectQuery(op, _) =>
          def find(o: Op): Scan = o match {
            case s: Scan => s
            case Project(c, _) => find(c)
            case Distinct(c) => find(c)
            case other => fail(s"unexpected $other")
          }
          find(op)
        case other => fail(s"$other")
      }
    stats.estimate(scan(s"?s <${E}common> ?o")) shouldBe 40.0
    stats.estimate(scan(s"?s <${E}rare> ?o")) shouldBe 2.0
    // bound subject divides by distinct subjects (avg out-degree ~1)
    stats.estimate(scan(s"<${E}s1> <${E}common> ?o")) should be <= 2.0
    // unknown predicate with complete table → floor, not total
    stats.estimate(scan(s"?s <${E}nope> ?o")) should be < 1.0
    // variable predicate → whole dataset
    stats.estimate(scan("?s ?p ?o")) shouldBe 42.0
  }

  it should "order the genuinely rarer pattern first where the structural " +
    "heuristic ties" in {
    val q =
      s"""SELECT ?s ?a ?b
         |{ ?s <${E}common> ?a . ?s <${E}rare> ?b }""".stripMargin
    val op = SparqlParser.parseAny(q) match {
      case SparqlParser.SelectQuery(o, _) => o
      case other => fail(s"$other")
    }
    def firstLeaf(o: Op): Scan = o match {
      case Project(c, _) => firstLeaf(c)
      case Join(l, _) => firstLeaf(l)
      case s: Scan => s
      case other => fail(s"unexpected $other")
    }
    firstLeaf(BgpOptimizer.optimize(op, Some(stats)))
      .p shouldBe T(Iri(E + "rare"))
    // and the structural heuristic indeed cannot distinguish them:
    // whichever it picks, the stats pick is driven by the counts
    stats.preds(E + "rare").count should be < stats.preds(E + "common").count
  }

  it should "round-trip through JSON including escapes" in {
    val tricky = QuadsStats(7,
      Map("urn:p:\"quoted\"\\back" -> QuadsStats.PredStat(5, 3, 2)), 0.5)
    val back = QuadsStats.fromJson(tricky.toJson)
    back shouldBe tricky
  }

  it should "round-trip control characters in predicate lexicals" in {
    // toJson writes chars < 0x20 as \uXXXX; fromJson must decode them
    // or estimate() lookups for that predicate silently miss
    val tricky = QuadsStats(3,
      Map("urn:p:tab\there\nnewline" -> QuadsStats.PredStat(3, 2, 1)), 0.5)
    QuadsStats.fromJson(tricky.toJson) shouldBe tricky
  }

  it should "persist and reload via the sidecar writer" in {
    val dir = java.nio.file.Files.createTempDirectory("graft-stats").toString
    QuadsStats.write(spark, stats, s"$dir/stats")
    QuadsStats.read(spark, s"$dir/stats") shouldBe stats
  }

  "sparql(query, stats)" should "return identical results to the " +
    "structural path on every join shape" in {
    val queries = Seq(
      s"SELECT ?s ?a ?b { ?s <${E}common> ?a . ?s <${E}rare> ?b }",
      s"SELECT ?s { ?s <${E}rare> ?b . FILTER(?b = \"x\") }",
      s"""SELECT ?s ?a { ?s <${E}common> ?a .
         |OPTIONAL { ?s <${E}rare> ?b } }""".stripMargin,
      s"SELECT (COUNT(*) AS ?n) { ?s <${E}common> ?a . ?s <${E}rare> ?b }")
    queries.foreach { q =>
      assertResult(collect(skewed.sparql(q, stats)), collect(skewed.sparql(q)))
    }
  }

  it should "work through analyze()" in {
    val st = skewed.analyze()
    st.total shouldBe 42
    collect(skewed.sparql(s"SELECT ?s { ?s <${E}rare> ?o }", st))
      .size shouldBe 2
  }

  "DictStore" should "carry ingest-time stats through encode and load" in {
    val dir = java.nio.file.Files.createTempDirectory("graft-dict-stats").toString
    val st = graft.io.DictStore.encode(skewed, dir)
    st.stats shouldBe defined
    st.stats.get.preds(E + "rare").count shouldBe 2
    val reloaded = graft.io.DictStore.load(spark, dir)
    reloaded.stats shouldBe defined
    // and the fast path still answers correctly with stats-driven order
    collect(reloaded.sparql(
      s"SELECT ?s ?a ?b { ?s <${E}common> ?a . ?s <${E}rare> ?b }"))
      .size shouldBe 2
  }
}
