package graft

import graft.pipeline.Fuzzy
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Blocked fuzzy join: edit-distance boundary cases, block scoping,
  * NULL strings, and argument validation. */
class FuzzySpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private lazy val l = Seq(
    ("b1", "kitten", 1L),
    ("b1", "exact", 2L),
    ("b2", "kitten", 3L),   // same string, different block → no cross match
    ("b1", null.asInstanceOf[String], 4L)
  ).toDF("blk", "lname", "lid")

  private lazy val r = Seq(
    ("b1", "sitten", 10L),  // distance 1
    ("b1", "sittin", 11L),  // distance 2 from kitten
    ("b1", "exact", 12L),   // distance 0
    ("b1", null.asInstanceOf[String], 13L)
  ).toDF("blk", "rname", "rid")

  "blockedFuzzyJoin" should "honor the distance threshold inclusively" in {
    def pairs(k: Int) =
      Fuzzy.blockedFuzzyJoin(l, r, Seq("blk"), "lname", "rname", k)
        .collect().map(x => (x.getAs[Long]("lid"), x.getAs[Long]("rid"),
          x.getAs[Int]("edit_dist"))).toSet
    pairs(0) shouldBe Set((2L, 12L, 0))
    pairs(1) shouldBe Set((2L, 12L, 0), (1L, 10L, 1))
    pairs(2) should contain allOf ((1L, 10L, 1), (1L, 11L, 2))
  }

  it should "never match across blocks or against NULL strings" in {
    val matched = Fuzzy.blockedFuzzyJoin(l, r, Seq("blk"), "lname", "rname", 9)
      .collect().map(x => (x.getAs[Long]("lid"), x.getAs[Long]("rid"))).toSet
    matched.map(_._1) should not contain 3L // b2 row saw no b2 partners
    matched.map(_._1) should not contain 4L // NULL left string
    matched.map(_._2) should not contain 13L // NULL right string
  }

  it should "reject unblocked joins and overlapping columns" in {
    an[IllegalArgumentException] should be thrownBy
      Fuzzy.blockedFuzzyJoin(l, r, Nil, "lname", "rname", 1)
    an[IllegalArgumentException] should be thrownBy
      Fuzzy.blockedFuzzyJoin(l, r.withColumnRenamed("rname", "lname"),
        Seq("blk"), "lname", "lname", 1)
    an[IllegalArgumentException] should be thrownBy
      Fuzzy.blockedFuzzyJoin(l, r, Seq("blk"), "lname", "rname", -1)
    an[IllegalArgumentException] should be thrownBy
      Fuzzy.blockedFuzzyJoin(
        l.withColumn("edit_dist", l("lid")), r, Seq("blk"),
        "lname", "rname", 1) // would silently overwrite
  }

  it should "collapse exact duplicates with identical pair multiplicity" in {
    // duplicate-heavy corpus: every value appears several times per
    // block — the collapsed default must return EXACTLY the direct
    // form's multiset of row pairs (expansion restores multiplicity),
    // while verifying only distinct value pairs
    val seed = sys.props.get("graft.fuzz.seed").map(_.toInt).getOrElse(19)
    val rnd = new scala.util.Random(seed)
    val words = Seq("kitten", "sitten", "mitten", "smitten", "kitchen",
      "fitting", "bitten", "bidden")
    def rows(n: Int, idBase: Long) = (0 until n).map { i =>
      ("b" + rnd.nextInt(3), words(rnd.nextInt(words.size)), idBase + i)
    }
    val dl = rows(60, 100).toDF("blk", "lname", "lid")
    val dr = rows(80, 1000).toDF("blk", "rname", "rid")
    def multiset(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(x => (x.getAs[Long]("lid"), x.getAs[Long]("rid"),
        x.getAs[Int]("edit_dist"))).sorted.toSeq
    val collapsed = multiset(
      Fuzzy.blockedFuzzyJoin(dl, dr, Seq("blk"), "lname", "rname", 2))
    val direct = multiset(
      Fuzzy.blockedFuzzyJoin(dl, dr, Seq("blk"), "lname", "rname", 2,
        collapseExact = false))
    collapsed should not be empty
    collapsed shouldBe direct
    // and the collapsed plan really verifies on the DISTINCT pair set:
    // an aggregate sits below the levenshtein filter
    val df = Fuzzy.blockedFuzzyJoin(dl, dr, Seq("blk"), "lname", "rname", 2)
    df.write.mode("overwrite").format("noop").save()
    // the verify predicate lives in a FilterExec or (pushed) in the
    // candidate join's condition — either way, every node carrying it
    // must sit ABOVE the distinct aggregates
    val nodes = graft.plans.PlanLint.walk(df.queryExecution.executedPlan)
    val verifiers = nodes.filter {
      case f: org.apache.spark.sql.execution.FilterExec =>
        f.condition.toString.toLowerCase.contains("levenshtein")
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
        j.condition.exists(_.toString.toLowerCase.contains("levenshtein"))
      case _ => false
    }
    verifiers should not be empty
    def isAgg(p: org.apache.spark.sql.execution.SparkPlan) = p match {
      case _: org.apache.spark.sql.execution.aggregate.HashAggregateExec => true
      case _: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => true
      case _: org.apache.spark.sql.execution.aggregate.SortAggregateExec => true
      case _ => false
    }
    for (v <- verifiers)
      graft.plans.PlanLint.walk(v).drop(1).exists(isAgg) shouldBe true
  }
}
