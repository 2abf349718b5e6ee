package graft
import org.apache.spark.sql.SparkSession
import graft.sparql.Sparql._
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    args.foreach {
      case "quads_parquet" =>
        // steady-state layout: quads persisted as parquet, scan one predicate
        val q = graft.sources.TpchQuads.customer(spark, dir)
        graft.io.QuadsIO.writeParquet(q, "/tmp/quads_pq")
        val quads = graft.io.QuadsIO.readParquet(spark, "/tmp/quads_pq")
        println("========== quads-parquet scan ==========")
        quads.sparql("PREFIX : <urn:p:> SELECT ?c ?n { ?c :cname ?n }").explain("formatted")
      case q =>
        println(s"========== $q ==========")
        SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
