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
}
