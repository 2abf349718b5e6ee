package graft

import graft.pipeline.Temporal
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Property-based differential tests: each temporal operator against a
  * brute-force plain-Scala reference over random small event sets —
  * ties, duplicates, dense collisions and empty sides all arise
  * naturally. Fixed seeds: deterministic in CI, reproducible on
  * failure (the seed is the loop index). */
class TemporalPropertySpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error(s"generator gave up at seed $seed"))

  // dense domains so equal keys/times/ties actually occur
  private val rowGen: Gen[List[(Long, Long, Long)]] =
    Gen.listOfN(30, for {
      k <- Gen.choose(0L, 3L)
      t <- Gen.choose(0L, 15L)
      tie <- Gen.choose(0L, 100L)
    } yield (k, t, tie))

  "asofJoin" should "match a brute-force reference on random inputs" in {
    for (seed <- 1 to 25) {
      val lRows = sample(rowGen, seed).zipWithIndex
        .map { case ((k, t, _), i) => (k, t, i.toLong) }
      val rRows = sample(rowGen, seed + 1000).map { case (k, t, tie) =>
        (k, t, tie, tie.toDouble / 7.0)
      }.distinctBy(r => (r._1, r._2, r._3)) // unique (k, t, tie)
      val left = lRows.toDF("k", "t", "lid")
      val right = rRows.toDF("k", "t", "tie", "px")

      val got = Temporal.asofJoin(left, right, "k", "t",
        Seq("px"), "tie", tolerance = Some(5L))
        .collect().map(r => r.getAs[Long]("lid") ->
          Option(r.getAs[java.lang.Double]("asof_px"))).toMap

      val expected = lRows.map { case (k, t, lid) =>
        val cand = rRows.filter(r => r._1 == k && r._2 <= t && t - r._2 <= 5L)
        lid -> (if (cand.isEmpty) None
                else Some(cand.maxBy(r => (r._2, r._3))._4))
      }.toMap
      withClue(s"seed=$seed ") { got shouldBe expected }
    }
  }

  "asofLookup" should "agree with asofJoin on random inputs" in {
    for (seed <- 1 to 15) {
      val lRows = sample(rowGen, seed).zipWithIndex
        .map { case ((k, t, _), i) => (k, t, i.toLong) }
      val rRows = sample(rowGen, seed + 3000).map { case (k, t, tie) =>
        (k, t, tie, tie.toDouble / 7.0)
      }.distinctBy(r => (r._1, r._2, r._3))
      val left = lRows.toDF("k", "t", "lid")
      val right = rRows.toDF("k", "t", "tie", "px")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getAs[Long]("lid") ->
          ((Option(r.getAs[java.lang.Double]("asof_px")),
            Option(r.getAs[java.lang.Long]("asof_t"))))).toMap
      for (tol <- Seq(None, Some(4L))) {
        withClue(s"seed=$seed tolerance=$tol ") {
          rows(Temporal.asofLookup(left, right, "k", "t",
            Seq("px"), "tie", tol)) shouldBe
            rows(Temporal.asofJoin(left, right, "k", "t",
              Seq("px"), "tie", tol))
        }
      }
    }
  }

  "sessionize" should "match a brute-force reference on random inputs" in {
    for (seed <- 1 to 25) {
      val rows = sample(rowGen, seed)
        .map { case (k, t, _) => (k, t) }.distinct // (k,t) duplicates fold
      val got = Temporal.sessionize(rows.toDF("k", "t"), "k", "t", gap = 3L)
        .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("session_idx")) ->
          ((r.getAs[Long]("session_start"), r.getAs[Long]("session_end"),
            r.getAs[Long]("n_events")))).toMap

      val expected = rows.groupBy(_._1).flatMap { case (k, ev) =>
        val ts = ev.map(_._2).sorted
        val sessions = ts.tail.foldLeft(List(List(ts.head))) { (acc, t) =>
          if (t - acc.head.head <= 3L) (t :: acc.head) :: acc.tail
          else List(t) :: acc
        }.map(_.reverse).reverse
        sessions.zipWithIndex.map { case (s, i) =>
          (k, (i + 1).toLong) -> ((s.min, s.max, s.size.toLong))
        }
      }.toMap
      withClue(s"seed=$seed ") { got shouldBe expected }
    }
  }

  "funnel" should "match a brute-force reference on random inputs" in {
    val steps = Seq("s0", "s1", "s2")
    val evGen: Gen[List[(Long, String, Long)]] =
      Gen.listOfN(40, for {
        k <- Gen.choose(0L, 4L)
        s <- Gen.oneOf("s0", "s1", "s2", "noise")
        t <- Gen.choose(0L, 20L)
      } yield (k, s, t))
    for (seed <- 1 to 25) {
      val rows = sample(evGen, seed)
      val got = Temporal.funnel(rows.toDF("k", "s", "t"), "k", "s", "t", steps)
        .collect().map(r => r.getAs[Long]("k") -> r.getAs[Int]("funnel_depth"))
        .toMap
      val expected = rows.groupBy(_._1).map { case (k, ev) =>
        val mins = steps.map(st =>
          ev.filter(_._2 == st).map(_._3).minOption)
        val depth = Iterator.iterate(0)(_ + 1)
          .takeWhile { d =>
            d < steps.length && mins(d).isDefined &&
              (d == 0 || mins(d).get >= mins(d - 1).get)
          }.length
        k -> depth
      }
      // reference only covers keys with at least one event, like funnel
      withClue(s"seed=$seed ") { got shouldBe expected }
    }
  }

  "saltedJoin" should "equal the plain join on random skewed inputs" in {
    val factGen: Gen[List[(Long, Long)]] =
      Gen.listOfN(60, for {
        k <- Gen.frequency(5 -> Gen.const(1L), 2 -> Gen.choose(2L, 6L))
        p <- Gen.choose(0L, 3L) // duplicates likely
      } yield (k, p))
    for (seed <- 1 to 15) {
      val fact = sample(factGen, seed).toDF("k", "payload")
      val dim = (1L to 4L).map(i => (i, s"d$i")).toDF("k", "attr")
      def multiset(df: org.apache.spark.sql.DataFrame) =
        df.select("k", "payload", "attr").collect().map(_.toSeq)
          .groupBy(identity).view.mapValues(_.length).toMap
      for (jt <- Seq("inner", "left")) {
        withClue(s"seed=$seed joinType=$jt ") {
          multiset(graft.pipeline.Skew.saltedJoin(fact, dim, Seq("k"), 5, jt)) shouldBe
            multiset(fact.join(dim, Seq("k"), jt))
        }
      }
    }
  }

  "rangeJoin" should "match a brute-force reference on random inputs" in {
    for (seed <- 1 to 25) {
      val pts = sample(rowGen, seed).zipWithIndex
        .map { case ((_, t, _), i) => (i.toLong, t - 8L) } // negative axis too
      val ivs = sample(rowGen, seed + 2000).zipWithIndex
        .map { case ((_, lo, len), i) =>
          (1000L + i, lo - 8L, lo - 8L + (len % 7) - 1) // some backwards
        }
      val got = Temporal.rangeJoin(
        pts.toDF("pid", "x"), ivs.toDF("iid", "lo", "hi"),
        "x", "lo", "hi", bucketWidth = 4L)
        .collect().map(r => (r.getAs[Long]("pid"), r.getAs[Long]("iid")))
        .sorted
      val expected = (for {
        (pid, x) <- pts
        (iid, lo, hi) <- ivs
        if lo <= hi && x >= lo && x <= hi
      } yield (pid, iid)).sorted
      withClue(s"seed=$seed ") { got.toSeq shouldBe expected }
    }
  }
}
