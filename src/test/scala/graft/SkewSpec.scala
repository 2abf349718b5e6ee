package graft

import graft.pipeline.Skew
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Salted join: multiset equivalence with the plain join on a skewed
  * fixture (inner and left outer, NULL keys included), salt spread on
  * the hot key, and argument validation. */
class SkewSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  // 90% of the fact rows share key 1 (the hot key); dim has extra and
  // missing keys so outer semantics are exercised; NULL keys must
  // behave exactly as the plain join (never match; survive left outer)
  private lazy val fact = ((1 to 900).map(i => (1L, i.toLong)) ++
    (901 to 1000).map(i => ((i % 7 + 2).toLong, i.toLong)) :+
    (99L, 9999L)) // no dim match
    .toDF("k", "payload")
    .union(Seq((null.asInstanceOf[java.lang.Long], 7777L),
      (null.asInstanceOf[java.lang.Long], 8888L)).toDF("k", "payload"))
  private lazy val dim = (1 to 8).map(i => (i.toLong, s"dim$i"))
    .toDF("k", "attr")

  private def multiset(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap

  "saltedJoin" should "equal the plain inner join as a multiset" in {
    multiset(Skew.saltedJoin(fact, dim, Seq("k"), salts = 8)
      .select("k", "payload", "attr")) shouldBe
      multiset(fact.join(dim, Seq("k")).select("k", "payload", "attr"))
  }

  it should "equal the plain left join, unmatched rows emitted once" in {
    multiset(Skew.saltedJoin(fact, dim, Seq("k"), 8, "left")
      .select("k", "payload", "attr")) shouldBe
      multiset(fact.join(dim, Seq("k"), "left").select("k", "payload", "attr"))
  }

  it should "spread the hot key across many salts even for identical rows" in {
    // row-unique salt source: byte-identical hot-key rows (the
    // pre-enrichment shape) must still spread — a content hash puts
    // them all in ONE salt
    val dupes = (1 to 800).map(_ => (1L, 0L)).toDF("k", "payload")
    val salted = dupes.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(8L)))
    salted.select("__salt").distinct().count() should be >= 6L
  }

  it should "reject unsupported join types and bad salt counts" in {
    an[IllegalArgumentException] should be thrownBy
      Skew.saltedJoin(fact, dim, Seq("k"), 8, "right")
    an[IllegalArgumentException] should be thrownBy
      Skew.saltedJoin(fact, dim, Seq("k"), 1)
    an[IllegalArgumentException] should be thrownBy
      Skew.saltedJoin(fact, dim, Nil, 8)
    an[IllegalArgumentException] should be thrownBy
      Skew.saltedJoin(fact.withColumn("__salt", lit(1)), dim, Seq("k"), 8)
  }

  "detectHotKeys" should "find exactly the keys above the share floor" in {
    // key 1 holds ~90% of fact; every other key is far below 10%
    Skew.detectHotKeys(fact, Seq("k"), m = 64, minShare = 0.1) shouldBe Seq("1")
    // a floor nothing reaches → empty
    Skew.detectHotKeys(fact, Seq("k"), m = 64, minShare = 0.95) shouldBe empty
    // a floor below 1/m voids the retention guarantee → rejected
    an[IllegalArgumentException] should be thrownBy
      Skew.detectHotKeys(fact, Seq("k"), m = 64, minShare = 0.001)
    // multi-column keys detect on the composite
    val two = fact.withColumn("k2", lit("x"))
    Skew.detectHotKeys(two, Seq("k", "k2"), 64, 0.1) shouldBe Seq("1\u0001x")
  }

  it should "not pool composite string keys containing the metacharacters" in {
    // ("a\u0001b","c") and ("a","b\u0001c") must encode to DIFFERENT
    // key strings (the raw separator is escaped), and a literal
    // "\u0000null" string must not collide with a NULL key — either
    // collision pools counts and can spuriously flag cold keys hot
    import spark.implicits._
    val tricky = (
      Seq.fill(40)(("a\u0001b", "c")) ++ Seq.fill(40)(("a", "b\u0001c")) ++
        Seq.fill(40)(("\u0000null", "z")) ++
        Seq.fill(40)((null.asInstanceOf[String], "z")) ++
        (1 to 800).map(i => (s"cold$i", "w"))
    ).toDF("k1", "k2")
    // each tricky key holds ~4.2% — below a 6% floor — so ANY hot
    // report means two of them pooled into one encoded key
    Skew.detectHotKeys(tricky, Seq("k1", "k2"), m = 64,
      minShare = 0.06) shouldBe empty
  }

  "skewAwareJoin" should "equal the plain inner and left joins" in {
    for (jt <- Seq("inner", "left")) {
      multiset(Skew.skewAwareJoin(fact, dim, Seq("k"), salts = 8,
        joinType = jt, m = 64, hotShare = 0.1)
        .select("k", "payload", "attr")) shouldBe
        multiset(fact.join(dim, Seq("k"), jt).select("k", "payload", "attr"))
    }
  }

  it should "replicate the right side only for hot keys" in {
    // peek at the operator's internals via the same construction: the
    // replicated right under hotShare=0.1 must carry dim once per cold
    // key and `salts` times for the single hot key
    val hot = Skew.detectHotKeys(fact, Seq("k"), 64, 0.1)
    hot shouldBe Seq("1")
    val replicated = dim.withColumn("__salt",
      explode(when(concat_ws("", col("k").cast("string")).isin(hot: _*),
        sequence(lit(0L), lit(7L))).otherwise(array(lit(0L)))))
    replicated.count() shouldBe (dim.count() - 1) + 8
  }

  it should "fall back to the plain join when nothing is hot" in {
    val uniform = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("k", "payload")
    val j = Skew.skewAwareJoin(uniform, dim, Seq("k"), salts = 8,
      m = 64, hotShare = 0.5)
    j.columns should not contain "__salt"
    multiset(j.select("k", "payload", "attr")) shouldBe
      multiset(uniform.join(dim, Seq("k")).select("k", "payload", "attr"))
  }
}
