package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling harness: time individual battery queries at a chosen
  * scale factor with warm-up, so optimization work measures steady
  * state (same noop-sink materialization as [[Bench]]).
  *
  * Usage: runMain graft.Profile q_dedup_minhash q_optional
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_REPS (default 3)
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def exec(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    args.foreach { name =>
      val times = (1 to reps).map(_ => exec(name))
      println(f"$name%-24s warm=${times.head}%.3f " +
        times.tail.map(t => f"$t%.3f").mkString("steady=[", " ", "]"))
    }
    spark.stop()
  }
}
