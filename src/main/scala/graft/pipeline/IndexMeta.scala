package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Shared sidecar I/O for persisted index metadata — one copy of the
  * Hadoop-FS read/write logic (index paths may be HDFS/S3 on a
  * cluster), so the ANN and IVF sidecar handling cannot drift apart. */
private[pipeline] object IndexMeta {

  def write(spark: SparkSession, path: String, json: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  def read(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Extract simple string/number fields of a flat JSON object. */
  def fields(json: String): Map[String, String] =
    """"(\w+)":"?([^",}\[]+)"?""".r.findAllMatchIn(json)
      .map(m => m.group(1) -> m.group(2)).toMap

  /** The sidecar is written by interpolation and read by regex — both
    * assume identifier-shaped column names. Enforce that at build time
    * so a quote/comma/brace in a name fails loudly instead of writing a
    * sidecar that mis-parses on read. */
  def requireSimpleCol(name: String): Unit =
    require(name.matches("[A-Za-z0-9_]+"),
      s"index column names must match [A-Za-z0-9_]+ (sidecar format), got '$name'")
}
