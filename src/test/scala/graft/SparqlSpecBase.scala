package graft

import graft.io.QuadsIO
import graft.rdf._
import graft.sparql.Sparql._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Shared harness for the ported reference test corpus.
  *
  * Mirrors the reference's differential-test discipline
  * (SparqlPipelineTest.scala:32-56): multiset comparison, order-
  * insensitive unless the query sorts, numeric literals compared at
  * 1e-4 tolerance. Expected results are hand-computed SPARQL-spec
  * answers (we ship no rdf4j oracle).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private val fixtureCache = scala.collection.mutable.Map.empty[String, DataFrame]
  def fixture(name: String): DataFrame = fixtureCache.getOrElseUpdate(name, {
    val in = getClass.getResourceAsStream(s"/$name")
    require(in != null, s"missing fixture $name")
    val text = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    QuadsIO.fromQuads(spark, TurtleParser.parse(text)).cache()
  })
}

abstract class SparqlSpecBase extends AnyFlatSpec with Matchers {
  protected def spark: SparkSession = TestSpark.spark

  type Binding = Map[String, Term]

  /** Run a query against a fixture; rows as var→term maps (unbound absent). */
  def run(fixtureName: String, query: String): Seq[Binding] =
    collect(TestSpark.fixture(fixtureName).sparql(query))

  def collect(df: DataFrame): Seq[Binding] = {
    val names = df.columns
    df.collect().toSeq.map { row =>
      names.zipWithIndex.flatMap { case (n, i) =>
        val sub = if (row.isNullAt(i)) null else row.getStruct(i)
        TermSchema.fromRow(sub).map(n -> _)
      }.toMap
    }
  }

  /** Term normalization for comparison: numeric literals by value
    * (1e-4-scale), everything else exact. */
  def norm(t: Term): Any = t match {
    case l: Lit if XSD.numeric.contains(l.dt) =>
      ("num", BigDecimal(l.lex).setScale(4, BigDecimal.RoundingMode.HALF_UP))
    case other => other
  }
  def norm(b: Binding): Map[String, Any] = b.map { case (k, v) => k -> norm(v) }

  def assertResult(actual: Seq[Binding], expected: Seq[Binding]): Unit = {
    val a = actual.map(norm).groupBy(identity).view.mapValues(_.size).toMap
    val e = expected.map(norm).groupBy(identity).view.mapValues(_.size).toMap
    withClue(s"actual=${actual.mkString("\n")}\nexpected=${expected.mkString("\n")}\n") {
      a shouldBe e
    }
  }

  def check(fixtureName: String, query: String, expected: Seq[Binding]): Unit =
    assertResult(run(fixtureName, query), expected)

  // term shorthands for expectations
  def iri(s: String): Term = Iri(s)
  def bn(s: String): Term = BNode(s)
  def str(s: String): Term = Lit(s)
  def int(i: Long): Term = Lit(i.toString, XSD.integer)
  def dec(s: String): Term = Lit(s, XSD.decimal)
  def dbl(s: String): Term = Lit(s, XSD.double)
  def date(s: String): Term = Lit(s, XSD.date)
}
