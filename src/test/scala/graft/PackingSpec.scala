package graft

import graft.pipeline.Packing
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Deterministic corpus shuffle + sequence packing: plain-Scala order
  * replay, rank contiguity, prefix/offset arithmetic, straddling,
  * partition invariance, seed independence, NULL handling, and the
  * no-single-partition-window plan shape. */
class PackingSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def md5hash48(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(6).map(b => f"$b%02x").mkString, 16)
  }

  private val docs = (0L until 100L).map(i => (i, 10L + i % 7))
  private def df = docs.toDF("id", "toks").repartition(7)

  /** The independent replay: sort by (hash48("id:seed"), id). */
  private def replayOrder(seed: Long): Seq[(Long, Long)] =
    docs.sortBy { case (id, _) => (md5hash48(s"$id:$seed"), id) }

  "shuffleRank" should "equal the plain-Scala hash-order replay, contiguously" in {
    val got = Packing.shuffleRank(df, "id", seed = 0L)
      .select("id", "toks", "shuffle_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._3)
    got.map(_._3) shouldBe (0L until 100L) // contiguous 0..N-1
    got.map(r => (r._1, r._2)) shouldBe replayOrder(0L)
  }

  it should "be partition-invariant and seed-dependent" in {
    def ranks(parts: Int, seed: Long) =
      Packing.shuffleRank(docs.toDF("id", "toks").repartition(parts),
        "id", seed).select("id", "shuffle_rank").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    ranks(1, 0L) shouldBe ranks(13, 0L)
    ranks(7, 1L) should not be ranks(7, 0L) // a different permutation
    ranks(7, 1L).map(_._2).sorted shouldBe (0L until 100L) // still a permutation
  }

  "packSequences" should "match the concat-and-chunk prefix arithmetic exactly" in {
    val budget = 64L
    val got = Packing.packSequences(df, "id", "toks", budget)
      .select("id", "seq_id", "seq_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    var prefix = 0L
    val expect = replayOrder(0L).map { case (id, t) =>
      val e = (id, prefix / budget, prefix % budget); prefix += t; e
    }
    got.sortBy(_._1) shouldBe expect.sortBy(_._1)
    // offsets always inside the budget; seq ids cover 0..total/budget
    got.foreach { case (_, _, off) => off should be < budget }
    got.map(_._2).max shouldBe (docs.map(_._2).sum - 1) / budget
  }

  it should "drop NULL token rows and document straddling" in {
    val in = Seq((1L, Some(60L)), (2L, Some(10L)), (3L, None))
      .toDF("id", "toks")
    val out = Packing.packSequences(in, "id", "toks", budget = 64L)
      .select("id", "seq_id", "seq_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    out.map(_._1) shouldBe Seq(1L, 2L) // NULL-length row dropped
    // whichever doc hashes first starts seq 0 at offset 0; the second
    // starts at the first's length — doc 1's 60 tokens guarantee the
    // 64-budget stream cuts INSIDE one of them (straddling is legal)
    val (first, second) =
      if (md5hash48("1:0") < md5hash48("2:0")) (1L, 2L) else (2L, 1L)
    val firstLen = if (first == 1L) 60L else 10L
    out.find(_._1 == first).get shouldBe ((first, 0L, 0L))
    out.find(_._1 == second).get shouldBe ((second, 0L, firstLen))
  }

  it should "reject reserved columns and non-positive budgets" in {
    an[IllegalArgumentException] should be thrownBy
      Packing.packSequences(df.withColumn("__pid", lit(1)), "id", "toks", 10L)
    an[IllegalArgumentException] should be thrownBy
      Packing.packSequences(df, "id", "toks", 0L)
  }

  it should "never plan a single-partition (empty-frame) window" in {
    for (plan <- Seq(
        Packing.shuffleRank(df, "id").queryExecution.executedPlan.toString,
        Packing.packSequences(df, "id", "toks", 64L)
          .queryExecution.executedPlan.toString)) {
      // every Window node must carry a partition spec (__pid)
      plan.linesIterator.filter(_.contains("Window")).foreach { l =>
        if (l.trim.startsWith("Window")) l should include("__pid")
      }
    }
    // and the plan lints clean (no cartesian, no oversized broadcast)
    graft.plans.PlanLint.lint(Packing.packSequences(df, "id", "toks", 64L))
      .filter(_.severity == "error") shouldBe empty
  }

  "packSequencesBy" should "pack each group independently, matching the global form per group" in {
    val grouped = (0L until 60L).map(i => (i, s"src${i % 3}", 10L + i % 5))
      .toDF("id", "src", "toks").repartition(5)
    val by = Packing.packSequencesBy(grouped, Seq("src"), "id", "toks", 32L)
      .select("id", "src", "seq_id", "seq_offset").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    val perGroup = (0 until 3).flatMap { g =>
      Packing.packSequences(grouped.filter(col("src") === s"src$g"),
        "id", "toks", 32L)
        .select("id", "src", "seq_id", "seq_offset").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    }.toSet
    by shouldBe perGroup
    // and no partition-less window in the grouped plan either
    val plan = Packing.packSequencesBy(grouped, Seq("src"), "id", "toks", 32L)
      .queryExecution.executedPlan.toString
    plan.linesIterator.filter(_.trim.startsWith("Window")).foreach { l =>
      l should include("src")
    }
  }

  "packSequencesByGlobal" should
    "match packSequencesBy exactly while windowing only within partitions" in {
    val grouped = (0L until 80L)
      .map(i => (i, if (i % 7 == 0) null else s"src${i % 3}", 10L + i % 5))
      .toDF("id", "src", "toks").repartition(5)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("id", "src", "seq_id", "seq_offset").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    val global = Packing.packSequencesByGlobal(
      grouped, Seq("src"), "id", "toks", 32L)
    // identical packing to the one-window-per-group form — including
    // the NULL group, which the null-safe offsets join must carry
    pairs(global) shouldBe
      pairs(Packing.packSequencesBy(grouped, Seq("src"), "id", "toks", 32L))
    // the whole point: every window partitions by __pid (+ group), so
    // a single giant stratum can never serialize onto one task
    val plan = global.queryExecution.executedPlan.toString
    plan.linesIterator.filter(_.trim.startsWith("Window")).foreach { l =>
      l should include("__pid")
    }
    graft.plans.PlanLint.lint(global)
      .filter(_.severity == "error") shouldBe empty
    // degenerate mixture: ONE component holding the whole corpus still
    // equals the plain global pack (same stream, same cuts)
    val one = grouped.withColumn("src", lit("all"))
    pairs(Packing.packSequencesByGlobal(one, Seq("src"), "id", "toks", 32L))
      .map(t => (t._1, t._3, t._4)) shouldBe
      Packing.packSequences(one, "id", "toks", 32L)
        .select("id", "seq_id", "seq_offset").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  it should "pack an empty corpus to an empty result" in {
    val empty = Seq.empty[(Long, Long)].toDF("id", "toks")
    Packing.packSequences(empty, "id", "toks", 64L).count() shouldBe 0L
    Packing.shuffleRank(empty, "id").count() shouldBe 0L
  }
}
