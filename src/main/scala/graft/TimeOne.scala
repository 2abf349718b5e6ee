package graft
import org.apache.spark.sql.SparkSession

/** Dev helper: time a SUBSET of battery entries in isolation (3 passes
  * each, noop sink) — for separating a real regression from the
  * shared-host contention the full Bench's calibration fields flag.
  * Usage: runMain graft.TimeOne <sfDir> <entry> [entry...] */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    args.drop(1).foreach { q =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir).write.mode("overwrite").format("noop").save()
        println(f"$q pass$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
