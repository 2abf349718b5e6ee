package graft

import org.apache.spark.sql.SparkSession

/** Dev harness (round-20 optimization): print an entry's FINAL
  * adaptive plan — the one AQE actually executed, with runtime
  * ReusedExchange/AQEShuffleRead nodes — which `explain` on an
  * unexecuted frame cannot show (it prints isFinalPlan=false).
  *
  * Usage: runMain graft.PlanFinal q_dict_subject_filter ...
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
  */
object PlanFinal {
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
    // per-stage task metrics: where executor CPU actually goes
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val m = i.taskMetrics
          stages.add(f"stage ${i.stageId}%4d tasks=${i.numTasks}%4d " +
            f"run=${m.executorRunTime / 1e3}%7.2fs " +
            f"cpu=${m.executorCpuTime / 1e9}%7.2fs " +
            f"deser=${m.executorDeserializeTime / 1e3}%6.2fs " +
            f"  ${i.name.takeWhile(_ != '\n').take(80)}")
        }
      })
    args.foreach { name =>
      stages.clear() // before construction: iterative entries run eager jobs there
      val df = SparkEntry.queries(name)(spark, sfDir)
      // execute THIS QueryExecution (noop write / foreachPartition
      // both plan their OWN), so the printed AdaptiveSparkPlan is the
      // final one with runtime ReusedExchange nodes
      df.queryExecution.toRdd.count()
      Thread.sleep(300) // let the listener drain
      println(s"========== $name (final adaptive plan) ==========")
      println(df.queryExecution.executedPlan.toString)
      println(s"---------- $name stages (execution only) ----------")
      stages.forEach(s => println(s))
    }
    spark.stop()
  }
}
