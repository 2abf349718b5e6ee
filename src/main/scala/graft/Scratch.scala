package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway measurement main (round-20): quantify the dict-store
  * small-file/row-group tax by timing the q_dict_subject_filter scan
  * shape against the store as written (32 files x 12 row groups) vs a
  * 1-file rewrite of the same rows. Deleted before round end. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = "/tmp/graft_dicts__root_testdata_sf0.1_v6"
    val one = "/tmp/scratch_quads_1f"
    spark.read.parquet(s"$base/quads").coalesce(1)
      .sortWithinPartitions("p", "s")
      .write.mode("overwrite").option("compression", "zstd").parquet(one)
    val oneDict = "/tmp/scratch_dict_1f"
    spark.read.parquet(s"$base/dict").coalesce(1)
      .write.mode("overwrite").option("compression", "zstd").parquet(oneDict)
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-28s med=${med(ts)}%.3f")
    }
    val osBean = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def cpuTime(tag: String)(f: => Unit): Unit = {
      f
      val c0 = osBean.getProcessCpuTime; val t0 = System.nanoTime()
      (1 to 5).foreach(_ => f)
      println(f"$tag%-28s wall5=${(System.nanoTime() - t0) / 1e9}%.3f cpu5=${(osBean.getProcessCpuTime - c0) / 1e9}%.3f")
    }
    def q(path: String) =
      spark.read.parquet(path)
        .filter(col("p") === 266287981663L && col("g").isNull &&
          col("s_num") > 3000 && col("s_num") <= 4500)
        .select("s", "o")
    cpuTime("quads 32f x 12rg") { q(s"$base/quads").write.mode("overwrite").format("noop").save() }
    cpuTime("quads 1f") { q(one).write.mode("overwrite").format("noop").save() }
    def d(path: String) =
      spark.read.parquet(path).select(col("id"), col("term.lex"))
    cpuTime("dict 32f") { d(s"$base/dict").write.mode("overwrite").format("noop").save() }
    cpuTime("dict 1f") { d(oneDict).write.mode("overwrite").format("noop").save() }
    spark.stop()
  }
}
