package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.Paths
/** Dev helper: dump a SUBSET of battery entries (args after the first
  * two) plus the full oracle_sql.json — same layout as [[Verify]], for
  * iterating on one entry's oracle without running the whole battery. */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(Paths.get(outDir, name).toString)
    }
    Verify.writeOracleJson(outDir)
    spark.stop()
  }
}
