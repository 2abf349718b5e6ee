package graft

/** VALUES + BIND — ports reference ValuesTest.scala. */
class ValuesSpec extends SparqlSpecBase {
  private val prologue =
    """PREFIX dc:   <http://purl.org/dc/elements/1.1/>
      |PREFIX :     <http://example.org/book/>
      |PREFIX ns:   <http://example.org/ns#>
      |""".stripMargin
  private val B = "http://example.org/book/"

  "VALUES" should "constrain by a single-var value list" in {
    val q = prologue +
      """SELECT ?book ?title ?price
        |{
        |   VALUES ?book { :book1 :book3 }
        |   ?book dc:title ?title ;
        |         ns:price ?price .
        |}""".stripMargin
    check("values.ttl", q, Seq(
      Map("book" -> iri(B + "book1"), "title" -> str("SPARQL Tutorial"),
        "price" -> int(42))))
  }

  it should "treat UNDEF as matching anything" in {
    val q = prologue +
      """SELECT ?book ?title ?price
        |{
        |   ?book dc:title ?title ;
        |         ns:price ?price .
        |   VALUES (?book ?title)
        |   { (UNDEF "SPARQL Tutorial")
        |     (:book2 UNDEF)
        |   }
        |}""".stripMargin
    check("values.ttl", q, Seq(
      Map("book" -> iri(B + "book1"), "title" -> str("SPARQL Tutorial"),
        "price" -> int(42)),
      Map("book" -> iri(B + "book2"), "title" -> str("The Semantic Web"),
        "price" -> int(23))))
  }

  it should "handle anonymous blank-node subjects in a UNION" in {
    val q = prologue +
      """SELECT ?price
        |{
        |   {
        |     :book2 dc:title ?title;
        |            ns:price ?price .
        |   }
        |   UNION
        |   {
        |     [] dc:title "SPARQL Tutorial";
        |        ns:price ?price .
        |   }
        |}""".stripMargin
    check("values.ttl", q, Seq(
      Map("price" -> int(23)),
      Map("price" -> int(42))))
  }

  it should "evaluate BIND of constants and arithmetic" in {
    val q = prologue +
      """SELECT ?book ?title ?price
        |{
        |   BIND(:book1 as ?book)
        |   ?book dc:title ?title ;
        |         ns:price ?hiddenPrice .
        |   BIND((?hiddenPrice * ?hiddenPrice) as ?price)
        |}""".stripMargin
    check("values.ttl", q, Seq(
      Map("book" -> iri(B + "book1"), "title" -> str("SPARQL Tutorial"),
        "price" -> int(1764))))
  }
}
