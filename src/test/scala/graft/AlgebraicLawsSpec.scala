package graft

import graft.io.QuadsIO
import graft.rdf._
import graft.sparql.Sparql._
import org.apache.spark.sql.DataFrame

/** Algebraic laws over seeded-random quad graphs — the property-style
  * coverage the reference lacks (SURVEY.md §5): cardinality bounds and
  * operator identities that must hold on ANY input. */
class AlgebraicLawsSpec extends SparqlSpecBase {
  private val E = "urn:r:"

  /** Deterministic random graph: ~n quads over a small term pool. */
  private def randomGraph(seed: Int, n: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val subjects = (1 to 6).map(i => Iri(E + "s" + i))
    val preds = Seq(Iri(E + "p1"), Iri(E + "p2"), Iri(E + "p3"))
    val objects: Seq[Term] =
      (1 to 4).map(i => Lit(i.toString, XSD.integer)) ++
        subjects.take(3) ++ Seq(Lit("x"), BNode("b1"))
    val quads = (1 to n).map { _ =>
      Quad(subjects(rnd.nextInt(subjects.size)),
        preds(rnd.nextInt(preds.size)),
        objects(rnd.nextInt(objects.size)), None)
    }
    QuadsIO.fromQuads(spark, quads.distinct)
  }

  private val seeds = 1 to 8
  private val P = s"PREFIX : <$E>\n"

  "LIMIT" should "never return more than n rows" in {
    seeds.foreach { s =>
      val g = randomGraph(s, 30)
      val n = s % 5 + 1
      g.sparql(P + s"SELECT * { ?a ?b ?c } LIMIT $n").count() should be <= n.toLong
    }
  }

  "DISTINCT" should "be idempotent and bounded by the bag" in {
    seeds.foreach { s =>
      val g = randomGraph(s, 30)
      val bag = g.sparql(P + "SELECT ?o { ?x :p1 ?o }").count()
      val d1 = g.sparql(P + "SELECT DISTINCT ?o { ?x :p1 ?o }")
      d1.count() should be <= bag
      d1.dropDuplicates().count() shouldBe d1.count()
    }
  }

  "UNION" should "be commutative as a multiset" in {
    seeds.foreach { s =>
      val g = randomGraph(s, 25)
      val ab = collect(g.sparql(P + "SELECT ?x { { ?x :p1 ?o } UNION { ?x :p2 ?o } }"))
      val ba = collect(g.sparql(P + "SELECT ?x { { ?x :p2 ?o } UNION { ?x :p1 ?o } }"))
      assertResult(ab, ba)
    }
  }

  "OPTIONAL" should "preserve left cardinality when the right side misses" in {
    seeds.foreach { s =>
      val g = randomGraph(s, 25)
      val left = g.sparql(P + "SELECT ?x ?o { ?x :p1 ?o }").count()
      val opt = g.sparql(P +
        "SELECT ?x ?o ?y { ?x :p1 ?o OPTIONAL { ?x :nothere ?y } }").count()
      opt shouldBe left
    }
  }

  "MINUS and FILTER NOT EXISTS" should "return subsets of the left side" in {
    seeds.foreach { s =>
      val g = randomGraph(s, 25)
      val left = g.sparql(P + "SELECT ?x { ?x :p1 ?o }").count()
      g.sparql(P + "SELECT ?x { ?x :p1 ?o MINUS { ?x :p2 ?o } }")
        .count() should be <= left
      g.sparql(P + "SELECT ?x { ?x :p1 ?o FILTER NOT EXISTS { ?x :p2 ?z } }")
        .count() should be <= left
    }
  }

  "EXISTS + NOT EXISTS" should "partition the left side" in {
    seeds.foreach { s =>
      val g = randomGraph(s, 25)
      val left = g.sparql(P + "SELECT ?x { ?x :p1 ?o }").count()
      val e = g.sparql(P + "SELECT ?x { ?x :p1 ?o FILTER EXISTS { ?x :p2 ?z } }").count()
      val ne = g.sparql(P + "SELECT ?x { ?x :p1 ?o FILTER NOT EXISTS { ?x :p2 ?z } }").count()
      (e + ne) shouldBe left
    }
  }

  "join with the unit pattern" should "be an identity" in {
    seeds.foreach { s =>
      val g = randomGraph(s, 20)
      val base = collect(g.sparql(P + "SELECT ?x ?o { ?x :p1 ?o }"))
      val unit = collect(g.sparql(P + "SELECT ?x ?o { ?x :p1 ?o . {} }"))
      assertResult(unit, base)
    }
  }

  "property path identities" should "hold: p+ ≡ p/p* and p? ≡ p|zero" in {
    seeds.take(4).foreach { s =>
      val g = randomGraph(s, 20)
      val plus = collect(g.sparql(P + "SELECT ?a ?b { ?a :p1+ ?b }"))
      val seqStar = collect(g.sparql(P + "SELECT ?a ?b { ?a :p1/:p1* ?b }"))
      // p+ is a set-like closure; p/p* can reach the same pair along
      // several prefixes — compare as sets
      plus.map(norm).toSet shouldBe seqStar.map(norm).toSet
    }
  }

  "UNION" should "be associative as a multiset" in {
    seeds.take(4).foreach { s =>
      val g = randomGraph(s, 20)
      val l = collect(g.sparql(P +
        "SELECT ?x { { { ?x :p1 ?o } UNION { ?x :p2 ?o } } UNION { ?x :p3 ?o } }"))
      val r = collect(g.sparql(P +
        "SELECT ?x { { ?x :p1 ?o } UNION { { ?x :p2 ?o } UNION { ?x :p3 ?o } } }"))
      assertResult(l, r)
    }
  }

  "COUNT(*)" should "equal the row count of the pattern" in {
    seeds.foreach { s =>
      val g = randomGraph(s, 30)
      val rows = g.sparql(P + "SELECT * { ?a ?b ?c }").count()
      val counted = collect(g.sparql(P + "SELECT (COUNT(*) AS ?n) { ?a ?b ?c }"))
      counted.head("n") shouldBe Lit(rows.toString, XSD.integer)
    }
  }

  /** Random graph with quads spread across named graphs g1/g2 plus the
    * default graph. */
  private def randomNamedGraph(seed: Int, n: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val graphs = Seq(None, Some(Iri(E + "g1")), Some(Iri(E + "g2")))
    val quads = (1 to n).map { _ =>
      Quad(Iri(E + "s" + rnd.nextInt(6)), Iri(E + "p" + (rnd.nextInt(3) + 1)),
        Lit(rnd.nextInt(4).toString, XSD.integer),
        graphs(rnd.nextInt(graphs.size)))
    }
    QuadsIO.fromQuads(spark, quads.distinct)
  }

  "FROM g" should "equal GRAPH g on the same pattern" in {
    seeds.take(5).foreach { s =>
      val g = randomNamedGraph(s, 40)
      val from = collect(g.sparql(P + s"SELECT ?a ?o FROM <${E}g1> { ?a :p1 ?o }"))
      val graph = collect(g.sparql(P +
        s"SELECT ?a ?o { GRAPH <${E}g1> { ?a :p1 ?o } }"))
      assertResult(from, graph)
    }
  }

  "FROM g1 g2" should "equal the union of the per-graph FROMs (bag)" in {
    seeds.take(5).foreach { s =>
      val g = randomNamedGraph(s, 40)
      val both = collect(g.sparql(P +
        s"SELECT ?a ?o FROM <${E}g1> FROM <${E}g2> { ?a :p1 ?o }"))
      val g1 = collect(g.sparql(P + s"SELECT ?a ?o FROM <${E}g1> { ?a :p1 ?o }"))
      val g2 = collect(g.sparql(P + s"SELECT ?a ?o FROM <${E}g2> { ?a :p1 ?o }"))
      assertResult(both, g1 ++ g2)
    }
  }

  "SERVICE over the same dataset" should "be an identity for the pattern" in {
    import graft.sparql.Sparql
    seeds.take(5).foreach { s =>
      val g = randomGraph(s, 30)
      Sparql.registerService(E + "self", g)
      try {
        val direct = collect(g.sparql(P + "SELECT ?x ?o { ?x :p1 ?o }"))
        val viaSvc = collect(g.sparql(P +
          s"SELECT ?x ?o { SERVICE <${E}self> { ?x :p1 ?o } }"))
        assertResult(viaSvc, direct)
      } finally Sparql.unregisterService(E + "self")
    }
  }
}
