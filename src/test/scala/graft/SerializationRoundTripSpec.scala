package graft

import graft.io.QuadsIO
import graft.rdf._
import graft.sparql.Sparql
import graft.sparql.Sparql._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based round-trips for the term serializers — escaping bugs
  * live exactly here: adversarial lexical forms (quotes, backslashes,
  * control characters, unicode) must survive SPARQL surface syntax
  * (serialize → parse via VALUES) and the N-Quads writer → reader.
  * Generators are sampled with FIXED seeds: deterministic in CI,
  * reproducible on failure (the seed is the loop index). */
class SerializationRoundTripSpec extends SparqlSpecBase {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error(s"generator gave up at seed $seed"))

  // lexical forms biased toward escaping hazards
  private val nastyLex: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.someOf(Seq("\\", "\"", "\n", "\r", "\t", "'", "a", "π", "💡",
      "x\\y", "end\\", "\"quoted\"", "line1\nline2")).map(_.mkString),
    Gen.listOf(Gen.oneOf('a', 'b', '\\', '"', '\n', '\t', ' ')).map(_.mkString))

  private val langGen: Gen[String] =
    Gen.oneOf("en", "en-us", "de", "fr-ca")

  private val dtGen: Gen[String] = Gen.oneOf(
    XSD.string, XSD.integer, XSD.decimal, XSD.double, XSD.boolean,
    "http://example.org/custom#dt")

  private val litGen: Gen[Lit] = for {
    lex <- nastyLex
    kind <- Gen.choose(0, 2)
    lang <- langGen
    dt <- dtGen
  } yield kind match {
    case 0 => Lit(lex)
    case 1 => Lit(lex, lang = lang)
    case _ => Lit(lex, dt)
  }

  private val iriGen: Gen[Iri] = for {
    host <- Gen.alphaNumStr.suchThat(_.nonEmpty)
    path <- Gen.alphaNumStr
  } yield Iri(s"http://$host.org/$path")

  private val termGen: Gen[Term] =
    Gen.frequency(3 -> litGen, 2 -> iriGen,
      1 -> Gen.alphaNumStr.suchThat(_.nonEmpty).map(BNode(_)))

  "SPARQL surface serialization" should "round-trip literals through VALUES" in {
    val base = QuadsIO.fromQuads(spark, Seq(
      Quad(Iri("urn:x"), Iri("urn:p"), Lit("v"), None)))
    (1 to 20).foreach { seed =>
      val lits = sample(Gen.listOfN(8, litGen), seed)
      // grammar conformance: a raw line break inside a quoted string is
      // invalid SPARQL — the serializer must emit \n escapes instead
      lits.map(Sparql.serialize).foreach { s =>
        s should not include "\n"
        s should not include "\r"
      }
      val values = lits.map(Sparql.serialize).mkString(" ")
      val rows = collect(base.sparql(s"SELECT ?v { VALUES ?v { $values } }"))
      withClue(s"seed $seed, literals $lits: ") {
        rows.map(_("v")).groupBy(identity).view.mapValues(_.size).toMap shouldBe
          lits.map(l => l: Term).groupBy(identity).view.mapValues(_.size).toMap
      }
    }
  }

  "the N-Quads writer" should "round-trip arbitrary quads through the parser" in {
    val quadGen = for {
      s <- Gen.oneOf(iriGen, Gen.alphaNumStr.suchThat(_.nonEmpty).map(BNode(_)))
      p <- iriGen
      o <- termGen
      g <- Gen.option(iriGen)
    } yield Quad(s, p, o, g)
    (1 to 15).foreach { seed =>
      // N-Triples is a line format: terms containing raw line breaks
      // must be escaped by the writer — that is the point of the test
      val quadList = sample(Gen.listOfN(12, quadGen), 1000L + seed)
      val tmp = java.nio.file.Files.createTempDirectory("nq-prop")
        .resolve("out.nq").toString
      val df = QuadsIO.fromQuads(spark, quadList)
      QuadsIO.writeNQuads(df, tmp)
      val back = QuadsIO.readNTriples(spark, tmp)
      def ms(d: org.apache.spark.sql.DataFrame) =
        d.collect().toSeq.map(_.toString).groupBy(identity)
          .view.mapValues(_.size).toMap
      withClue(s"seed $seed: ") { ms(back) shouldBe ms(df) }
    }
  }
}
