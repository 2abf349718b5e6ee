package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Distributed ingest for RAW DOCUMENT corpora — the face a 100 TB
  * training-data pipeline actually starts from: newline-delimited
  * JSON (jsonl, optionally compressed) and WARC (the Common Crawl
  * container). The RDF side has had this breadth since round 1
  * ([[QuadsIO]]); these readers feed the cleaning chain
  * ([[graft.pipeline.Scrub]]) the same way: declarative scans,
  * per-file parallelism, a `skipMalformed` knob whose STRICT default
  * fails loudly with the offending file in the message.
  *
  * Scale shape: jsonl on gzip/bzip2/deflate rides Spark's distributed
  * text reader (bzip2 splits WITHIN files; gzip is one task per file
  * — ship many medium files, the same rule as the reference's
  * whole-file formats); zstd/xz/lz4 jsonl and all WARC read
  * one-file-per-task via the binaryFile source (neither codec nor
  * container is splittable — Common Crawl WARCs compress each record
  * as its own gzip member, which concatenated-member decoding
  * handles). Parsing stays in whole-stage codegen end to end:
  * `from_json` for jsonl, native Catalyst expressions
  * ([[graft.functions.DocParse]]) for WARC framing and whole-file
  * line decode — no RDD hop, so file-size statistics survive for the
  * planner. */
object DocsIO {

  /** A useful default row shape for jsonl corpora (Dolma/RedPajama
    * style): callers with richer sidecars pass their own schema. */
  val docSchema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("text",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("url",
      org.apache.spark.sql.types.StringType)))

  private val CorruptCol = "_graft_corrupt"

  /** Read a jsonl corpus (file, directory, or glob) into `schema`.
    * Strict mode (default) raises on the FIRST malformed record with
    * the file and the offending line in the message — a corrupt
    * corpus shard should stop an ingest, not silently thin it;
    * `skipMalformed = true` drops bad records (and blank lines)
    * instead. Compression is recognized per FILE by suffix for the
    * text-reader codecs (gz/bz2/deflate — Hadoop decodes them
    * transparently, bzip2 splittably); pass a path whose files end in
    * .zst/.zstd/.xz/.lz4 to take the whole-file route instead.
    *
    * MEMORY BOUND on the whole-file route: one fully DECOMPRESSED
    * shard is buffered per task (the same parity the whole-file RDF
    * readers document), so shard size — not corpus size — is the
    * executor-memory constraint. Write such corpora in ingest-sized
    * shards (≲256 MB decompressed, the usual jsonl.zst corpus
    * convention); the line-oriented codecs stream and carry no such
    * bound. */
  def readJsonl(spark: SparkSession, path: String,
                schema: StructType = docSchema,
                skipMalformed: Boolean = false): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema may not contain the reserved column $CorruptCol")
    val wholeFile = QuadsIO.splitCompression(path)._2
      .exists(Set("zst", "zstd", "xz", "lz4"))
    val lines: DataFrame =
      if (wholeFile)
        spark.read.format("binaryFile").load(path)
          .select(col("path").as("__file"),
            explode(graft.functions.DocParse
              .decodeLinesCol(col("path"), col("content"))).as("__line"))
      else
        spark.read.textFile(path).toDF("__line")
          .select(input_file_name().as("__file"), col("__line"))
    parseJsonLines(lines, schema, skipMalformed)
  }

  /** The shared jsonl tail: blank lines drop (both modes — a blank
    * line is jsonl formatting, not data), malformed records either
    * raise with file context or drop. PERMISSIVE + corrupt-record
    * column instead of FAILFAST so the error can NAME THE FILE — at
    * 100k-shard scale "malformed JSON" without a path is not
    * actionable. */
  private def parseJsonLines(lines: DataFrame, schema: StructType,
                             skipMalformed: Boolean): DataFrame = {
    val withCorrupt = schema.add(CorruptCol,
      org.apache.spark.sql.types.StringType)
    val parsed = lines
      // whitespace-only is blank too: trim() strips only ASCII
      // spaces, so a tab-only line (or a stray CR from a non-line-
      // oriented source) must not reach strict-mode parsing
      .filter(!col("__line").rlike("^\\s*$"))
      .select(col("__file"), from_json(col("__line"), withCorrupt,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> CorruptCol)).as("__doc"))
    val bad = col("__doc").isNull || col(s"__doc.$CorruptCol").isNotNull
    val checked =
      if (skipMalformed) parsed.filter(!bad)
      else parsed.select(col("__file"),
        when(bad, raise_error(concat(
          lit("malformed JSON record in "), col("__file"), lit(": "),
          coalesce(col(s"__doc.$CorruptCol"), lit("<unparsed>")))))
          .otherwise(col("__doc")).as("__doc"))
    checked.select(schema.fieldNames.map(f => col(s"__doc.$f").as(f))
      .toIndexedSeq: _*)
  }

  /** Read WARC files (plain or .gz with per-record members) into one
    * row per record: `(warc_type, record_id, target_uri, warc_date,
    * content_type, body)`. One file per task — the Common Crawl
    * consumption shape. Strict mode fails the load with file+offset;
    * `skipMalformed` keeps each file's records up to its first torn
    * frame (Content-Length is the only walk; there is no
    * resynchronization point after a bad frame). */
  def readWarc(spark: SparkSession, path: String,
               skipMalformed: Boolean = false): DataFrame =
    spark.read.format("binaryFile").load(path)
      .select(col("path").as("warc_file"),
        explode(graft.functions.DocParse
          .parseWarcCol(col("path"), col("content"),
            permissive = skipMalformed)).as("r"))
      .select(col("warc_file"), col("r.warc_type").as("warc_type"),
        col("r.record_id").as("record_id"),
        col("r.target_uri").as("target_uri"),
        col("r.warc_date").as("warc_date"),
        col("r.content_type").as("content_type"),
        col("r.body").as("body"))

  /** HTTP payload of a WARC `response` body (bytes after the first
    * CRLFCRLF; the whole body when there is no header block — the
    * `resource` record shape). */
  def httpPayload(body: Column): Column =
    graft.functions.DocParse.httpPayloadCol(body)
}
