package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns next to typed metadata, and per-row media
  * transforms run as `mapPartitions` batch functions over the binary
  * column (the Scala analogue of a pandas-UDF batch loop).
  *
  * The actual codec calls are STUBBED — this container ships no
  * image/audio libraries — behind [[StubCodec]], which produces
  * deterministic fake features from the bytes. Everything Spark-side
  * (schema, batching, partitioning, output shape) is real and tested;
  * swapping StubCodec for a JNI/codec-backed implementation changes no
  * plumbing.
  */
object Multimodal {

  /** Canonical media row schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("format", StringType, nullable = true)
    )), nullable = true)
  ))

  /** STUB decoder: deterministic pseudo-decode of a payload.
    * A real implementation would call an image/audio codec here; the
    * container has none, so features derive from a hash of the bytes.
    * The function signature (bytes → fixed-width float vector) is the
    * real contract a codec-backed version must satisfy. */
  object StubCodec {
    val featureDim = 8
    def features(bytes: Array[Byte]): Array[Float] = {
      var h = 1125899906842597L // deterministic FNV-ish fold
      bytes.foreach(b => h = h * 31 + b)
      Array.tabulate(featureDim)(i => (((h >>> (i * 8)) & 0xFF).toFloat - 128f) / 128f)
    }
    def dimensions(bytes: Array[Byte]): (Int, Int) =
      (bytes.length % 640 + 1, bytes.length % 480 + 1)
  }

  private def featSchema(base: StructType): StructType =
    StructType(base.fields.filterNot(_.name == "bytes") :+
      StructField("features", ArrayType(FloatType), nullable = false))

  /** Batch feature extraction: one pass per partition over the binary
    * column; bytes are dropped from the output (decode early, carry
    * features — at 100 TB you never shuffle raw media after decode). */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = featSchema(media.schema)
    val byteIdx = media.schema.fieldIndex("bytes")
    val rdd = media.rdd.mapPartitions { rows =>
      rows.map { r =>
        val kept = r.toSeq.zipWithIndex.collect {
          case (v, i) if i != byteIdx => v
        }
        Row.fromSeq(kept :+ StubCodec.features(r.getAs[Array[Byte]](byteIdx)).toSeq)
      }
    }
    spark.createDataFrame(rdd, out)
  }

  /** Resize plumbing: rewrites meta dimensions (stub: payload kept,
    * a real codec would re-encode). Pure column expression. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta",
      struct(lit(w).as("width"), lit(h).as("height"),
        col("meta.sample_rate").as("sample_rate"),
        col("meta.format").as("format")))

  /** Frame sampling for video rows: explode n frame indices per video,
    * non-video rows pass through with frame_idx 0. The stub "frame" is
    * the original payload; a codec version would cut real frames. */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"frame count must be >= 1, got $n") // sequence(0, n-1)
    media.withColumn("frame_idx",
      explode(when(col("kind") === "video",
        sequence(lit(0), lit(n - 1))).otherwise(array(lit(0)))))
  }

  /** Synthetic media table for tests/demos: payload bytes derived from
    * the documents table (deterministic). */
  def synthetic(spark: SparkSession, documentsDir: String): DataFrame = {
    val docs = spark.read.parquet(documentsDir)
    docs.select(
      col("doc_id").as("media_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast(IntegerType)).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      struct(lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(16000).as("sample_rate"),
        lit("synthetic").as("format")).as("meta"))
  }
}
