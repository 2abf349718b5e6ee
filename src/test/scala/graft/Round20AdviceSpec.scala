package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Regressions for the round-19 ADVICE items.
  *
  *  1. `TextStatsExprs.tokenPairs` stored UTF8String references from
  *     the child ArrayData into the returned rows without copying —
  *     a latent aliasing hazard when the child is backed by reused
  *     unsafe/columnar memory and a consumer buffers the result
  *     across input rows. Fixed: tokens are `.clone()`d to the heap;
  *     pinned here by overwriting the unsafe backing buffer after the
  *     call and checking the pairs keep their original values.
  *  2. The q_compact scatter fixture guard checked `_SUCCESS` directly
  *     instead of going through the shared buildOnce/_DONE helper.
  *     Fixed: routed through buildOnce (CacheVersion-keyed path,
  *     marker written last); pinned by running the entry twice and
  *     checking the scatter files are not rewritten.
  *  3. `ImageIO.setUseCache(false)` was a side effect of ImageCodec's
  *     class initialization that sibling codecs relied on by accident.
  *     Fixed: a shared explicit [[graft.pipeline.Multimodal]] init that
  *     every ImageIO-touching codec calls in its own initializer.
  */
class Round20AdviceSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  behavior of "tokenPairs unsafe-memory aliasing (advice #1)"

  it should "survive the child array's backing buffer being reused" in {
    val proj = UnsafeProjection.create(
      Array[DataType](ArrayType(StringType, containsNull = false)))
    def input(ws: String*) = InternalRow(
      new GenericArrayData(ws.map(UTF8String.fromString).toArray[Any]))
    // UnsafeProjection reuses its output buffer across applies — the
    // ADVICE scenario: arr's UTF8Strings are views into that buffer
    val row = proj(input("alpha", "beta", "gamma"))
    val arr = row.getArray(0)
    val pairs = graft.functions.TextStatsExprs.tokenPairs(arr)
    pairs.numElements() shouldBe 2
    // overwrite the shared buffer with different, same-length tokens
    proj(input("XXXXX", "YYYY", "ZZZZZ"))
    val p0 = pairs.getStruct(0, 2)
    val p1 = pairs.getStruct(1, 2)
    p0.getUTF8String(0).toString shouldBe "alpha"
    p0.getUTF8String(1).toString shouldBe "beta"
    p1.getUTF8String(0).toString shouldBe "beta"
    p1.getUTF8String(1).toString shouldBe "gamma"
  }

  behavior of "q_compact scatter fixture via buildOnce (advice #2)"

  it should "build the scatter once, behind a _DONE marker written last" in {
    val dir = java.nio.file.Files.createTempDirectory("r20-compact").toString
    (0L until 200L).map(i =>
        (i, i % 7, (i % 13).toDouble, i * 1000000L, s"t${i % 3}", "{}"))
      .toDF("event_id", "user_id", "value", "ts", "event_type", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val fixture = new java.io.File(SparkEntry.tmpPath("compact_in", dir))
    def scatterMtimes: Map[String, Long] = {
      val sc = new java.io.File(fixture, "scatter")
      sc.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }

    val first = SparkEntry.queries("q_compact")(spark, dir)
    val n1 = first.agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0)
    n1 shouldBe 200L
    new java.io.File(fixture, "_DONE") should exist
    val mt = scatterMtimes
    mt should not be empty

    val second = SparkEntry.queries("q_compact")(spark, dir)
    val n2 = second.agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0)
    n2 shouldBe 200L
    scatterMtimes shouldBe mt // fixture untouched on the second pass
  }

  behavior of "shared ImageIO init (advice #3)"

  it should "leave the process-global stream cache off after any codec touch" in {
    // both ImageIO-touching codecs run the shared init in their own
    // initializer, so neither depends on the other being loaded first
    graft.pipeline.Multimodal.VideoCodec.featureDim shouldBe 8
    javax.imageio.ImageIO.getUseCache shouldBe false
    graft.pipeline.Multimodal.ImageCodec.featureDim shouldBe 8
    javax.imageio.ImageIO.getUseCache shouldBe false
  }
}
