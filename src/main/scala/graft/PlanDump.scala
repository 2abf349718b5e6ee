package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (round-19 optimization): dump `.explain("formatted")` for
  * battery entries to files — the before/after plan evidence committed
  * under plans/r19/. Session settings mirror [[Bench]] (local[32],
  * shuffle.partitions=32) so the captured plan is the one the bench
  * actually runs, not a dev-shell variant.
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> <entry> [entry...]
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    new java.io.File(outDir).mkdirs()
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(2).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
