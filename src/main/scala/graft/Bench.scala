package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the full battery on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. An untimed warm-up pass absorbs session/JIT
  * startup so per-query numbers measure the queries, and failures are
  * reported per-query (ok=false + nonzero exit) instead of silently
  * inflating the total. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Materialize EVERY output column (count() would let Catalyst prune
    // the computed columns away and under-measure).
    def exec(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()

    // untimed warm-up: session bring-up, codegen, parquet footers —
    // one query per input family (tpch quads, documents, embeddings)
    // and per heavy generated-code shape (the 64-column minhash/simhash
    // aggregates and the iterative CC rounds each pay 1-2 s of Janino
    // compilation on first execution; steady-state is what we measure)
    Seq("q_bgp_join", "q_dedup_exact", "q_ann_brute",
      "q_dedup_minhash", "q_dedup_simhash", "q_dedup_cluster").foreach { q =>
      try exec(q) catch { case _: Throwable => () }
    }

    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val t0 = System.nanoTime()
      try exec(name)
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    // total covers SUCCESSFUL queries only: a failed query's partial
    // elapsed time (parse-error-fast vs fails-after-100s) would make
    // cross-round totals incomparable for identical coverage
    val total = results.collect {
      case (k, v) if !failed.contains(k) => v
    }.sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
