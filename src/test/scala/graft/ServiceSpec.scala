package graft

import graft.io.QuadsIO
import graft.rdf._
import graft.sparql.Sparql
import graft.sparql.Sparql._

/** SPARQL 1.1 federated query over registered datasets: SERVICE joins,
  * SILENT degradation, graph-context isolation, endpoint validation. */
class ServiceSpec extends SparqlSpecBase {
  private val E = "urn:sv:"
  private val P = s"PREFIX : <$E>\n"

  private lazy val people = QuadsIO.fromQuads(spark, Seq(
    Quad(Iri(E + "alice"), Iri(E + "worksAt"), Iri(E + "acme"), None),
    Quad(Iri(E + "bob"), Iri(E + "worksAt"), Iri(E + "globex"), None),
    Quad(Iri(E + "carol"), Iri(E + "worksAt"), Iri(E + "initech"), None)))

  private lazy val companies = QuadsIO.fromQuads(spark, Seq(
    Quad(Iri(E + "acme"), Iri(E + "city"), Lit("Springfield"), None),
    Quad(Iri(E + "globex"), Iri(E + "city"), Lit("Cypress Creek"), None),
    // a quad in a NAMED graph of the remote dataset — must NOT be
    // visible to a SERVICE pattern (which sees the remote default graph)
    Quad(Iri(E + "initech"), Iri(E + "city"), Lit("Austin"), Some(Iri(E + "g")))))

  private def withEndpoints[A](body: => A): A = {
    Sparql.registerService(E + "companies", companies)
    try body finally Sparql.unregisterService(E + "companies")
  }

  "SERVICE" should "join the service solutions with the local pattern" in
    withEndpoints {
      val rows = collect(people.sparql(P +
        """SELECT ?p ?city
          |{ ?p :worksAt ?co . SERVICE <urn:sv:companies> { ?co :city ?city } }""".stripMargin))
      rows.map(r => (r("p"), r("city"))).toSet shouldBe Set(
        (iri(E + "alice"), str("Springfield")),
        (iri(E + "bob"), str("Cypress Creek")))
    }

  it should "see the remote default graph, not an enclosing GRAPH context" in
    withEndpoints {
      // initech's city quad lives in a named graph remotely → invisible
      val local = people.sparql(P +
        """SELECT ?co ?city
          |{ SERVICE <urn:sv:companies> { ?co :city ?city } }""".stripMargin)
      collect(local).map(_("co")).toSet shouldBe
        Set(iri(E + "acme"), iri(E + "globex"))
    }

  it should "fail loudly for an unregistered endpoint" in {
    an[IllegalArgumentException] should be thrownBy collect(people.sparql(P +
      "SELECT ?s { SERVICE <urn:sv:nowhere> { ?s ?p ?o } }"))
  }

  "SERVICE SILENT" should "degrade to one empty solution on failure" in {
    val rows = collect(people.sparql(P +
      """SELECT ?p ?city
        |{ ?p :worksAt ?co . SERVICE SILENT <urn:sv:nowhere> { ?co :city ?city } }""".stripMargin))
    // the empty solution joins compatibly with every local row
    rows should have size 3
    rows.foreach(r => r.contains("city") shouldBe false)
  }

  "a correlated filter inside SERVICE within EXISTS" should "fail loudly" in
    withEndpoints {
      // silently evaluating ?p against NULL would be a wrong answer
      an[IllegalArgumentException] should be thrownBy collect(people.sparql(P +
        """SELECT ?p { ?p :worksAt ?co FILTER EXISTS {
          |  SERVICE <urn:sv:companies> { ?co :city ?c2 FILTER(?c2 != ?p) } } }""".stripMargin))
    }

  "SERVICE SILENT on a registered endpoint" should "keep equi-join keys" in
    withEndpoints {
      val df = people.sparql(P +
        """SELECT ?p ?city
          |{ ?p :worksAt ?co . SERVICE SILENT <urn:sv:companies> { ?co :city ?city } }""".stripMargin)
      collect(df) should have size 2
      // registered → child's assured vars propagate → no nested-loop join
      df.queryExecution.executedPlan.toString should not include "NestedLoop"
    }

  // ----- variable endpoints (§2.3: iterate the registry) -----

  private lazy val companies2 = QuadsIO.fromQuads(spark, Seq(
    Quad(Iri(E + "initech"), Iri(E + "city"), Lit("Austin"), None)))

  private def withTwoEndpoints[A](body: => A): A = {
    Sparql.registerService(E + "companies", companies)
    Sparql.registerService(E + "companies2", companies2)
    try body finally {
      Sparql.unregisterService(E + "companies")
      Sparql.unregisterService(E + "companies2")
    }
  }

  "SERVICE ?var" should "iterate every registered endpoint and bind the variable" in
    withTwoEndpoints {
      val rows = collect(people.sparql(P +
        """SELECT ?p ?ep ?city
          |{ ?p :worksAt ?co . SERVICE ?ep { ?co :city ?city } }""".stripMargin))
      rows.map(r => (r("p"), r("ep"), r("city"))).toSet shouldBe Set(
        (iri(E + "alice"), iri(E + "companies"), str("Springfield")),
        (iri(E + "bob"), iri(E + "companies"), str("Cypress Creek")),
        (iri(E + "carol"), iri(E + "companies2"), str("Austin")))
    }

  it should "constrain through a VALUES binding of the endpoint variable" in
    withTwoEndpoints {
      val rows = collect(people.sparql(P +
        """SELECT ?p ?city
          |{ ?p :worksAt ?co . SERVICE ?ep { ?co :city ?city }
          |  VALUES ?ep { <urn:sv:companies2> } }""".stripMargin))
      rows.map(r => (r("p"), r("city"))).toSet shouldBe Set(
        (iri(E + "carol"), str("Austin")))
    }

  it should "merge an optionally-unbound endpoint variable (not drop the row)" in
    withTwoEndpoints {
      // ?ep is bound inside the child only when the OPTIONAL matches —
      // never, here. Per compatibility an unbound ?ep merges with the
      // endpoint IRI; dropping those rows would be a wrong answer.
      val rows = collect(people.sparql(P +
        """SELECT ?p ?ep ?city
          |{ ?p :worksAt ?co .
          |  SERVICE ?ep { ?co :city ?city OPTIONAL { ?co :nosuch ?ep } } }""".stripMargin))
      rows.map(r => (r("p"), r("ep"), r("city"))).toSet shouldBe Set(
        (iri(E + "alice"), iri(E + "companies"), str("Springfield")),
        (iri(E + "bob"), iri(E + "companies"), str("Cypress Creek")),
        (iri(E + "carol"), iri(E + "companies2"), str("Austin")))
    }

  it should "yield zero solutions when no endpoint is registered" in {
    Sparql.clearServices()
    collect(people.sparql(P +
      "SELECT ?s ?ep { SERVICE ?ep { ?s :city ?c } }")) shouldBe empty
  }

  it should "treat the endpoint variable as assured (no nested-loop join)" in
    withTwoEndpoints {
      val df = people.sparql(P +
        """SELECT ?p ?ep ?city
          |{ ?p :worksAt ?co . SERVICE ?ep { ?co :city ?city } }""".stripMargin)
      df.queryExecution.executedPlan.toString should not include "NestedLoop"
    }

  "OPTIONAL SERVICE" should "leave non-matching rows unbound" in
    withEndpoints {
      val rows = collect(people.sparql(P +
        """SELECT ?p ?city
          |{ ?p :worksAt ?co
          |  OPTIONAL { SERVICE <urn:sv:companies> { ?co :city ?city } } }""".stripMargin))
      rows should have size 3
      rows.collect { case r if !r.contains("city") => r("p") } shouldBe
        Seq(iri(E + "carol"))
    }
}
