package graft

import graft.io.Layout
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Z-order layout: round-trip identity, multi-column clustering
  * (selective predicates on EITHER column touch few files where a
  * hash-scattered layout touches nearly all), NULL safety, and
  * argument validation. */
class LayoutSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  // 20k rows over two independent dimensions
  private lazy val data = (1 to 20000).map { i =>
    (i.toLong, (i * 7919) % 200L, ((i * 104729) % 1000).toDouble)
  }.toDF("id", "k", "v")

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).resolve("t").toString

  "zorderWrite" should "preserve content exactly and cluster BOTH columns" in {
    val zpath = tmp("zorder")
    val npath = tmp("naive")
    Layout.zorderWrite(data, Seq("k", "v"), zpath, numFiles = 32)
    data.repartition(32).write.mode("overwrite").parquet(npath)

    // identity: nothing lost, duplicated, or altered
    val back = spark.read.parquet(zpath)
    back.count() shouldBe 20000
    back.select(sum("id"), sum("k"), sum("v")).head() shouldBe
      data.select(sum("id"), sum("k"), sum("v")).head()

    // clustering: a selective predicate on EITHER dimension touches
    // a fraction of the zordered files but ~all naive files
    for (pred <- Seq(col("k") === 42L, col("v") >= 990.0)) {
      val zTouched = Layout.filesTouched(spark, zpath, pred)
      val nTouched = Layout.filesTouched(spark, npath, pred)
      withClue(s"predicate $pred: z=$zTouched naive=$nTouched ") {
        zTouched.toDouble should be <= nTouched.toDouble / 2.0
        zTouched should be <= 12L
      }
    }
  }

  it should "tolerate NULLs in clustering columns" in {
    val withNulls = data.withColumn("k",
      when(col("id") % 100 === 0, lit(null)).otherwise(col("k")))
    val p = tmp("zorder-null")
    Layout.zorderWrite(withNulls, Seq("k", "v"), p, numFiles = 8)
    spark.read.parquet(p).count() shouldBe 20000
  }

  it should "reject bad arguments" in {
    an[IllegalArgumentException] should be thrownBy
      Layout.zorderWrite(data, Nil, tmp("x"), 8)
    an[IllegalArgumentException] should be thrownBy
      Layout.zorderWrite(data, Seq("k"), tmp("x"), 0)
    an[IllegalArgumentException] should be thrownBy
      Layout.zorderWrite(data, Seq("k", "v"), tmp("x"), 8, bits = 32)
  }
}
