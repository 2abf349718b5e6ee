package graft

import graft.rdf.Term

/** ORDER BY / LIMIT / OFFSET — ports reference LimitsTest.scala; we
  * additionally implement real ORDER BY (the reference ignores it
  * without a slice, README.md:40-55 — capability superset). */
class LimitsSpec extends SparqlSpecBase {

  private def objValues(rows: Seq[Binding]): Seq[Term] = rows.map(_("c"))

  "Slice" should "apply LIMIT without ORDER (cardinality only)" in {
    run("values.ttl", "SELECT * { ?a ?b ?c } LIMIT 2") should have size 2
  }

  it should "apply OFFSET without ORDER (cardinality only)" in {
    run("values.ttl", "SELECT * { ?a ?b ?c } OFFSET 3") should have size 2
  }

  it should "apply ORDER BY + LIMIT as sorted top-k" in {
    val rows = run("values.ttl", "SELECT * { ?a ?b ?c } ORDER BY ?c LIMIT 3")
    objValues(rows) shouldBe Seq(int(23), int(42), str("Priceless SPARQL"))
  }

  it should "apply ORDER BY + OFFSET + LIMIT" in {
    val rows = run("values.ttl",
      "SELECT * { ?a ?b ?c } ORDER BY ?c OFFSET 1 LIMIT 3")
    objValues(rows) shouldBe Seq(int(42), str("Priceless SPARQL"),
      str("SPARQL Tutorial"))
  }

  it should "apply ORDER BY + OFFSET alone" in {
    val rows = run("values.ttl", "SELECT * { ?a ?b ?c } ORDER BY ?c OFFSET 1")
    objValues(rows) shouldBe Seq(int(42), str("Priceless SPARQL"),
      str("SPARQL Tutorial"), str("The Semantic Web"))
  }

  "ORDER BY" should "sort without a slice (superset of the reference)" in {
    val rows = run("values.ttl", "SELECT * { ?a ?b ?c } ORDER BY ?c")
    objValues(rows) shouldBe Seq(int(23), int(42), str("Priceless SPARQL"),
      str("SPARQL Tutorial"), str("The Semantic Web"))
  }

  it should "preserve ordering through DISTINCT (and slice the sorted rows)" in {
    // dropDuplicates must not unsort the output: DISTINCT dedups first,
    // then the sort applies on top
    val rows = run("group_by.ttl",
      """PREFIX : <http://example.com/data/#>
        |SELECT DISTINCT ?y { ?x :p ?y } ORDER BY ?y LIMIT 3""".stripMargin)
    rows.map(_("y")) shouldBe Seq(bn("b2"), int(1), dec("1.0"))
  }

  it should "sort DESC with expression keys" in {
    val rows = run("values.ttl",
      """PREFIX ns: <http://example.org/ns#>
        |SELECT ?b ?p { ?b ns:price ?p } ORDER BY DESC(?p)""".stripMargin)
    rows.map(_("p")) shouldBe Seq(int(42), int(23))
  }
}
