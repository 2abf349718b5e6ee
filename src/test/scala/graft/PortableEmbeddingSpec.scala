package graft

import graft.pipeline.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Portable embedding near-dup: planted near-identical vectors are
  * found, reported pairs are a subset of the brute-force truth at the
  * same threshold, and the ±1 plane family is deterministic. */
class PortableEmbeddingSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 16
  private def vec(seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(dim)(r.nextFloat() * 2 - 1)
  }
  private lazy val emb = {
    val base = vec(1)
    val near = base.clone(); near(0) += 0.01f // ~identical to base
    Seq((1L, base), (2L, near), (3L, vec(3)), (4L, vec(4)), (5L, vec(5)))
      .toDF("vec_id", "embedding")
  }

  "portableEmbeddingCandidates" should "find the planted near-identical pair" in {
    val pairs = Dedup.portableEmbeddingCandidates(
      emb, "vec_id", "embedding", dim, numPlanes = 2, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain((1L, 2L))
  }

  it should "report only pairs the brute-force truth confirms" in {
    val thr = 0.5
    val pairs = Dedup.portableEmbeddingCandidates(
      emb, "vec_id", "embedding", dim, numPlanes = 2, threshold = thr)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = emb.select(col("vec_id").as("idA"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("idB"), col("embedding").as("eb"))
    val brute = a.crossJoin(b).filter(col("idA") < col("idB"))
      .withColumn("cos", Dedup.cosine(col("ea"), col("eb")))
      .filter(col("cos") >= thr)
      .select("idA", "idB")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs.subsetOf(brute) shouldBe true
  }

  "portableLshTopK" should "rank the planted near-duplicate first after the query itself" in {
    val q = emb.filter($"vec_id" === 1).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val top = graft.pipeline.Similarity.portableLshTopK(
      emb, "vec_id", "embedding", q, k = 3, numPlanes = 1)
      .collect().map(_.getLong(0)).toSeq
    // one plane → 2 buckets, probe ring covers both → exact search
    top.take(2) shouldBe Seq(1L, 2L)
  }

  it should "return candidates only from the probe ring" in {
    val q = emb.filter($"vec_id" === 1).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val planes = 2
    val got = graft.pipeline.Similarity.portableLshTopK(
      emb, "vec_id", "embedding", q, k = 5, numPlanes = planes)
      .collect().map(_.getLong(0)).toSet
    // with 2 planes the ring misses bucket qSig^3: verify against a
    // manual recomputation of the ring membership
    import graft.pipeline.{Dedup => D}
    val qSig = graft.pipeline.Similarity.portableSignatureOf(q, planes)
    val ring = (qSig +: (0 until planes).map(b => qSig ^ (1L << b))).toSet
    val sigs = emb.select($"vec_id",
      graft.functions.VectorExprs.rhpSignature($"embedding",
        D.portableHyperplanes(planes, dim)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach(id => ring should contain(sigs(id)))
  }

  "portableHyperplaneLiterals" should "be deterministic ±1 literals" in {
    val l1 = Dedup.portableHyperplaneLiterals(3, 8)
    val l2 = Dedup.portableHyperplaneLiterals(3, 8)
    l1 shouldBe l2
    l1 should have size 3
    all(l1) should fullyMatch regex """\[(-?1\.0(, )?)+\]"""
  }
}
