package graft.io

import graft.rdf.{Quad, TermSchema, TurtleParser}
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}

/** Quad ingest and storage.
  *
  * Reference equivalent: `ScioContext.readTriples`
  * (/root/reference/src/main/scala/es/jolivar/scio/sparql/TriplesReader.scala:34-77),
  * which re-parses RDF text per pipeline with one worker per file. Our
  * design separates one-time ingest from steady-state querying:
  *
  *  - Turtle/TriG (not line-splittable) parse driver-side — they are
  *    config/fixture-scale inputs;
  *  - N-Triples/N-Quads (line-splittable — THE bulk RDF interchange
  *    format at 100 TB) parse distributed, one partition per file split;
  *  - both land in canonical quads **Parquet** `(s,p,o,g)` term-struct
  *    columns, so every query after ingest gets columnar scans,
  *    predicate pushdown and min/max pruning instead of text re-parsing.
  */
object QuadsIO {

  /** Distributed scale path: newline-delimited N-Triples/N-Quads. */
  def readNTriples(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.textFile(path)
    val rows = lines.rdd.flatMap(l => TurtleParser.parseNTriplesLine(l).map(_.toRow))
    spark.createDataFrame(rows, TermSchema.quadType)
  }

  /** Driver-side parse of a (small) Turtle/TriG file into a quads DF. */
  def readTurtle(spark: SparkSession, path: String): DataFrame = {
    val text = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
    fromQuads(spark, TurtleParser.parse(text))
  }

  /** Build a quads DataFrame from driver-side quads (fixtures, tests). */
  def fromQuads(spark: SparkSession, quads: Seq[Quad]): DataFrame = {
    val rows: java.util.List[Row] = new java.util.ArrayList[Row]()
    quads.foreach(q => rows.add(q.toRow))
    spark.createDataFrame(rows, TermSchema.quadType)
  }

  /** Canonical storage: Parquet, repartitioned by predicate then subject
    * so same-predicate scans touch few files (vertical-partitioning-lite)
    * and same-subject stars co-locate within row groups. */
  def writeParquet(quads: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    quads
      .repartition(quads.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt,
        quads("p"), quads("s"))
      .sortWithinPartitions("p", "s")
      .write.mode(mode).parquet(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Bucketed table layout: hash-bucket + sort on the subject column.
    * BGP star queries are subject-subject self-joins; with both sides
    * bucketed on `s`, Spark plans a sort-merge join with NO exchange —
    * at 100 TB this removes the dominant shuffle from every star query.
    * (Bucketing requires the table catalog, hence saveAsTable.) */
  def writeBucketedTable(quads: DataFrame, table: String,
                         buckets: Int = 64): Unit =
    quads.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, "s")
      .sortBy("s")
      .saveAsTable(table)
}
