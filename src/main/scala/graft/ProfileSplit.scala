package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling harness (round-19 optimization): split an entry's
  * steady-state wall time into PLANNING (DataFrame construction +
  * analysis + optimization + physical planning, via executedPlan) and
  * EXECUTION (the noop-sink run of a pre-planned frame), so
  * optimization effort lands on the part that actually costs. Each
  * entry is warmed once untimed; reported numbers are medians of 3.
  *
  * Usage: runMain graft.ProfileSplit q_optional q_pagerank ...
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
  */
object ProfileSplit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    args.foreach { name =>
      // warm-up (builds /tmp artifacts, loads code paths)
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      val plans = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.queryExecution.executedPlan // force full planning
        (System.nanoTime() - t0) / 1e9
      }
      val execs = (1 to 3).map { _ =>
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.queryExecution.executedPlan
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      val fulls = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s plan=${med(plans)}%.3f exec=${med(execs)}%.3f " +
        f"full=${med(fulls)}%.3f")
    }
    spark.stop()
  }
}
