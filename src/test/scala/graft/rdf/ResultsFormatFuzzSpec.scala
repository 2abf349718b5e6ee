package graft.rdf

import graft.sparql.Sparql
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import scala.util.Random

/** Round-trip fuzzing of the SPARQL results writers — the escaping
  * surfaces (TSV term tokens, JSON string escapes) where an
  * example-based test proves one path and a fuzz corpus proves the
  * grammar. Seeded frames of adversarial terms (quotes, backslashes,
  * newlines, tabs, unicode, empty strings, lang/datatype literals,
  * bnodes, NULLs) write through [[Sparql.writeResultsTsv]] /
  * [[Sparql.writeResultsJson]] and must re-parse — via the N-Triples
  * term grammar and the shared JSON reader — to the exact original
  * solution multiset. Lives in `graft.rdf` to reach the package-
  * private [[Json]] reader. */
class ResultsFormatFuzzSpec extends AnyFlatSpec with Matchers {
  private val spark = graft.TestSpark.spark

  private val vars = Seq("a", "b", "c")

  private def genTerm(rnd: Random): Term = rnd.nextInt(8) match {
    case 0 => Iri(s"urn:x:${rnd.nextInt(30)}")
    case 1 => BNode(s"bn${rnd.nextInt(9)}")
    case 2 => Lit(s"plain ${rnd.nextInt(9)}")
    case 3 => Lit(rnd.nextInt(100).toString, XSD.integer)
    case 4 => Lit(s"w${rnd.nextInt(5)}", lang = if (rnd.nextBoolean()) "en" else "fr")
    case 5 => // escaping stress: the escaped chars + CR + unicode
      Lit(Seq("\"q\"", "back\\slash", "nl\nnl", "tab\there", "ünï∂",
        "cr\rcr", "mix\"\\\n\t\r!").apply(rnd.nextInt(7)))
    case 6 => Lit("") // empty literal ≠ unbound
    case _ => Lit(s"dt${rnd.nextInt(5)}", "urn:my:type")
  }

  /** A random solutions frame: term-struct columns with NULL holes. */
  private def genFrame(seed: Int): (org.apache.spark.sql.DataFrame,
      Seq[Map[String, Term]]) = {
    val rnd = new Random(seed)
    val sols = (0 until 1 + rnd.nextInt(12)).map { _ =>
      vars.flatMap(v =>
        if (rnd.nextDouble() < 0.25) None
        else Some(v -> genTerm(rnd))).toMap
    }
    val rows: java.util.List[org.apache.spark.sql.Row] = new java.util.ArrayList()
    sols.foreach { s =>
      rows.add(org.apache.spark.sql.Row(
        vars.map(v => s.get(v).map(TermSchema.toRow).orNull): _*))
    }
    val schema = org.apache.spark.sql.types.StructType(vars.map(v =>
      org.apache.spark.sql.types.StructField(v, TermSchema.termType,
        nullable = true)))
    (spark.createDataFrame(rows, schema), sols)
  }

  private def multiset[T](xs: Seq[T]) =
    xs.groupBy(identity).view.mapValues(_.size).toMap

  /** Part files concatenated in name order — the documented contract
    * of the distributed text writers. */
  private def readDoc(dir: String): String = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-")).sortBy(_.getName)
    files.map(f => java.nio.file.Files.readString(f.toPath)).mkString
  }

  private def parseTsvCell(cell: String): Option[Term] =
    if (cell.isEmpty) None
    else graft.rdf.TurtleParser
      .parseNTriplesLine(s"<urn:rt:s> <urn:rt:p> $cell .")
      .map(_.o)

  "writeResultsTsv" should "round-trip adversarial frames through the NT term grammar" in {
    for (seed <- Seq(1, 2, 3, 4, 5)) {
      val (df, sols) = genFrame(seed)
      val dir = java.nio.file.Files.createTempDirectory(s"rt-tsv-$seed").toString
      Sparql.writeResultsTsv(df, dir)
      val lines = readDoc(dir).split("\n", -1).toSeq.filter(_.nonEmpty)
      withClue(s"seed=$seed\n") {
        lines.head shouldBe vars.map("?" + _).mkString("\t")
        val parsed = lines.tail.map { l =>
          val cells = l.split("\t", -1)
          cells.length shouldBe vars.length
          vars.zip(cells).flatMap { case (v, c) =>
            parseTsvCell(c).map(v -> _) }.toMap
        }
        multiset(parsed) shouldBe multiset(sols)
      }
    }
  }

  private def jsonTerm(o: Json.JObj): Term = {
    val value = o.get("value") match { case Some(Json.JStr(s)) => s
      case other => fail(s"bad value: $other") }
    o.get("type") match {
      case Some(Json.JStr("uri")) => Iri(value)
      case Some(Json.JStr("bnode")) => BNode(value)
      case Some(Json.JStr("literal")) =>
        val lang = o.get("xml:lang")
          .collect { case Json.JStr(l) => l }.getOrElse("")
        val dt = o.get("datatype")
          .collect { case Json.JStr(d) => d }.getOrElse(XSD.string)
        if (lang.nonEmpty) Lit(value, lang = lang) else Lit(value, dt)
      case other => fail(s"bad type: $other")
    }
  }

  "writeResultsCsv" should "round-trip the lexical forms (the documented lossy view)" in {
    // CSV is the W3C-sanctioned LOSSY form: bare lexicals, no
    // type/lang, unbound = empty (indistinguishable from an empty
    // literal — so the generator here skips empty-string literals)
    for (seed <- Seq(31, 32, 33)) {
      val (df0, sols0) = genFrame(seed)
      val keep = sols0.map(_.filter { case (_, t) =>
        t match { case l: Lit => l.lex.nonEmpty; case _ => true } })
      val rows: java.util.List[org.apache.spark.sql.Row] = new java.util.ArrayList()
      keep.foreach { s =>
        rows.add(org.apache.spark.sql.Row(
          vars.map(v => s.get(v).map(TermSchema.toRow).orNull): _*))
      }
      val df = spark.createDataFrame(rows, df0.schema)
      val dir = java.nio.file.Files.createTempDirectory(s"rt-csv-$seed").toString
      Sparql.writeResultsCsv(df, dir)
      val back = spark.read.option("header", "true")
        .option("multiLine", "true").option("escape", "\"")
        .csv(dir)
      back.columns.toSeq shouldBe vars
      val parsed = back.collect().toSeq.map { r =>
        vars.zipWithIndex.flatMap { case (v, i) =>
          Option(r.getString(i)).filter(_.nonEmpty).map(v -> _) }.toMap
      }
      val expect = keep.map(_.map { case (v, t) => v -> t.lex })
      withClue(s"seed=$seed\n") { multiset(parsed) shouldBe multiset(expect) }
    }
  }

  "the boolean (ASK) documents" should "round-trip through JSON and XML" in {
    import graft.TestSpark.spark.implicits._
    for (v <- Seq(true, false)) {
      val ask = Seq(Tuple1(v)).toDF("ask")
      val jd = java.nio.file.Files.createTempDirectory(s"rt-askj-$v").toString
      Sparql.writeResultsJson(ask, jd)
      new Json.JsonReader(readDoc(jd)).parseDocument()
        .asInstanceOf[Json.JObj].get("boolean") shouldBe Some(Json.JBool(v))
      val xd = java.nio.file.Files.createTempDirectory(s"rt-askx-$v").toString
      Sparql.writeResultsXml(ask, xd)
      readDoc(xd) should include(s"<boolean>$v</boolean>")
    }
  }

  "writeResultsXml" should "round-trip adversarial frames through a StAX parse" in {
    import javax.xml.stream.{XMLInputFactory, XMLStreamConstants => C}
    for (seed <- Seq(21, 22, 23, 24, 25)) {
      val (df, sols) = genFrame(seed)
      val dir = java.nio.file.Files.createTempDirectory(s"rt-xml-$seed").toString
      Sparql.writeResultsXml(df, dir)
      withClue(s"seed=$seed\n") {
        val f = XMLInputFactory.newInstance()
        f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
        val r = f.createXMLStreamReader(new java.io.StringReader(readDoc(dir)))
        val parsed = Vector.newBuilder[Map[String, Term]]
        var cur = Map.empty[String, Term]
        var curVar: String = null
        var termKind: String = null; var lang = ""; var dt = ""
        val text = new StringBuilder
        while (r.hasNext) r.next() match {
          case C.START_ELEMENT => r.getLocalName match {
            case "result" => cur = Map.empty
            case "binding" => curVar = r.getAttributeValue(null, "name")
            case k @ ("uri" | "bnode" | "literal") =>
              termKind = k; text.clear()
              lang = Option(r.getAttributeValue(
                "http://www.w3.org/XML/1998/namespace", "lang")).getOrElse("")
              dt = Option(r.getAttributeValue(null, "datatype")).getOrElse("")
            case _ => ()
          }
          case C.CHARACTERS | C.CDATA =>
            if (termKind != null) { text.append(r.getText); () }
          case C.END_ELEMENT => r.getLocalName match {
            case "result" => parsed += cur
            case "uri" => cur += curVar -> Iri(text.toString); termKind = null
            case "bnode" => cur += curVar -> BNode(text.toString); termKind = null
            case "literal" =>
              cur += curVar -> (if (lang.nonEmpty) Lit(text.toString, lang = lang)
                else Lit(text.toString,
                  if (dt.nonEmpty) dt else XSD.string))
              termKind = null
            case _ => ()
          }
          case _ => ()
        }
        multiset(parsed.result()) shouldBe multiset(sols)
      }
    }
  }

  "writeResultsJson" should "round-trip adversarial frames through the JSON reader" in {
    for (seed <- Seq(11, 12, 13, 14, 15)) {
      val (df, sols) = genFrame(seed)
      val dir = java.nio.file.Files.createTempDirectory(s"rt-json-$seed").toString
      Sparql.writeResultsJson(df, dir)
      withClue(s"seed=$seed\n") {
        val doc = new Json.JsonReader(readDoc(dir)).parseDocument()
          .asInstanceOf[Json.JObj]
        doc.get("head").flatMap(_.asInstanceOf[Json.JObj].get("vars"))
          .get.asInstanceOf[Json.JArr].items shouldBe
          vars.map(Json.JStr).toVector
        val bindings = doc.get("results").get.asInstanceOf[Json.JObj]
          .get("bindings").get.asInstanceOf[Json.JArr].items
        val parsed = bindings.map { b =>
          b.asInstanceOf[Json.JObj].fields.map { case (v, t) =>
            v -> jsonTerm(t.asInstanceOf[Json.JObj]) }.toMap
        }
        multiset(parsed.toSeq) shouldBe multiset(sols)
      }
    }
  }
}
