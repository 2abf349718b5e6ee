package graft

import graft.functions.VectorExprs
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Embedding prep expressions: L2 normalization and int8 quantization
  * — hand-checked values, degenerate vectors, and the round-trip
  * error bound. */
class EmbedOpsSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def one(vec: Array[Float]) =
    Seq(Tuple1(vec)).toDF("v")

  "l2Normalize" should "produce a unit vector" in {
    val r = one(Array(3f, 4f))
      .select(VectorExprs.l2Normalize(col("v"))).head().getSeq[Double](0)
    r(0) shouldBe 0.6 +- 1e-12
    r(1) shouldBe 0.8 +- 1e-12
  }

  it should "be NULL for zero and non-finite vectors" in {
    one(Array(0f, 0f)).select(VectorExprs.l2Normalize(col("v")))
      .filter(col("vec_l2_normalize(v)").isNull).count() shouldBe 1
    one(Array(Float.NaN, 1f)).select(VectorExprs.l2Normalize(col("v")).as("n"))
      .filter(col("n").isNull).count() shouldBe 1
  }

  "quantizeInt8" should "match hand-computed codes with half-away rounding" in {
    val r: Row = one(Array(1f, -0.5f, 0.25f))
      .select(VectorExprs.quantizeInt8(col("v")).as("q")).select("q.*").head()
    r.getDouble(0) shouldBe (1.0 / 127.0) +- 1e-15
    // -0.5/scale = -63.5 → -64 (away from zero); 0.25/scale = 31.75 → 32
    r.getSeq[Byte](1) shouldBe Seq[Byte](127, -64, 32)
  }

  it should "quantize the all-zero vector to scale 0 and zero codes" in {
    val r: Row = one(Array(0f, 0f, 0f))
      .select(VectorExprs.quantizeInt8(col("v")).as("q")).select("q.*").head()
    r.getDouble(0) shouldBe 0.0
    r.getSeq[Byte](1) shouldBe Seq[Byte](0, 0, 0)
  }

  it should "be NULL for non-finite vectors" in {
    one(Array(Float.PositiveInfinity, 1f))
      .select(VectorExprs.quantizeInt8(col("v")).as("q"))
      .filter(col("q").isNull).count() shouldBe 1
  }

  it should "round-trip within scale/2 per component" in {
    val vec = Array.tabulate(32)(i => (math.sin(i * 1.7) * (i + 1)).toFloat)
    val r: Row = one(vec)
      .select(VectorExprs.quantizeInt8(col("v")).as("q")).select("q.*").head()
    val scale = r.getDouble(0)
    val codes = r.getSeq[Byte](1)
    vec.zip(codes).foreach { case (v, c) =>
      math.abs(v - c * scale) should be <= (scale / 2 + 1e-9)
    }
  }
}
