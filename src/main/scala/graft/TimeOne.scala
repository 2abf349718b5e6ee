package graft
import org.apache.spark.sql.SparkSession

/** Dev helper: time a SUBSET of battery entries in isolation (3 passes
  * each, noop sink) — for separating a real regression from the
  * shared-host contention the full Bench's calibration fields flag.
  * Emits the same fixed calibration probe as Bench before and after
  * (quiet host ≈ 0.10 s), so an isolated re-timing carries its own
  * validity evidence.
  * Usage: runMain graft.TimeOne <sfDir> <entry> [entry...] */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    def calibrate(): Double = {
      val xs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        spark.range(0, 50000000L, 1, 32).selectExpr("sum(id * 2 + 1)").collect()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      xs(1)
    }
    println(f"calib_before: ${calibrate()}%.3f s (quiet host ~0.10)")
    args.drop(1).foreach { q =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir).write.mode("overwrite").format("noop").save()
        println(f"$q pass$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    println(f"calib_after: ${calibrate()}%.3f s (quiet host ~0.10)")
    spark.stop()
  }
}
