package graft

import graft.rdf.{Iri, Lit, Quad, XSD}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Exchange budgets for the MAINTENANCE ops (round-11 #4): the
  * per-query battery budgets cannot see a shuffle quietly added to
  * ingest or table-maintenance code, so the four write-side ops pin
  * their total shuffle-exchange counts here — and the pin is shown to
  * TRIP on a deliberately added extra shuffle. */
class MaintenanceBudgetSpec extends AnyFlatSpec with Matchers {
  // OWN session (shared context): the QueryExecutionListener below is
  // session-scoped, and suites run in parallel on the shared session —
  // a concurrent suite's shuffle landing inside a countShuffles window
  // flaked this spec (seen once at round 17). An isolated session's
  // listener manager only ever sees this spec's executions.
  private val spark = TestSpark.spark.newSession()
  import spark.implicits._

  /** Total ShuffleExchange nodes across every SQL execution `body`
    * runs (final adaptive plans, through AQE stages). */
  private def countShuffles(body: => Unit): Int = {
    val counter = new java.util.concurrent.atomic.AtomicInteger
    val l = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        counter.addAndGet(graft.plans.PlanLint.walk(qe.executedPlan)
          .count(_.isInstanceOf[ShuffleExchangeLike]))
      override def onFailure(f: String, qe: QueryExecution,
                             e: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      body
      org.apache.spark.GraftTestBridge
        .waitUntilListenerBusEmpty(spark.sparkContext)
      counter.get()
    } finally spark.listenerManager.unregister(l)
  }

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private def quadsDf(n: Int) = {
    val rows = (1 to n).map(i => Quad(Iri(s"urn:s:$i"), Iri("urn:p:v"),
      Lit((i * 3 % 97).toString, XSD.integer, ""), None).toRow)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), graft.rdf.TermSchema.quadType)
  }

  behavior of "maintenance-op exchange budgets"

  it should "pin DictStore.encode and trip on an extra input shuffle" in {
    val base = countShuffles {
      graft.io.DictStore.encode(quadsDf(500), tmp("mb-enc"))
    }
    // budget: dict write = distinct (1) + lex range partition (1);
    // quads write = repartition(p,s) (1) — the four encode joins
    // broadcast the dict side; stats sidecar = one groupBy (1).
    // Anything above 5 is a quietly added pass over the data.
    base should be <= 5
    // the gate trips: a stray repartition on the input is visible as
    // MORE exchanges (one per action that scans the input)
    val extra = countShuffles {
      graft.io.DictStore.encode(quadsDf(500).repartition(7), tmp("mb-enc2"))
    }
    extra should be > base
  }

  it should "pin DictStore.append" in {
    val dir = tmp("mb-app")
    graft.io.DictStore.encode(quadsDf(500), dir)
    val rows = (400 to 900).map(i => Quad(Iri(s"urn:s:$i"), Iri("urn:p:v"),
      Lit((i * 5 % 89).toString, XSD.integer, ""), None).toRow)
    val more = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), graft.rdf.TermSchema.quadType)
    val n = countShuffles { graft.io.DictStore.append(more, dir) }
    // new-term anti-join against the dict (broadcastable dict side,
    // but the distinct + lex range partition shuffle the batch: 2-3);
    // quads write = repartition(p,s) (1); stats groupBy (1); the max
    // (id) ceiling probe and encode joins broadcast. Anything above 6
    // is a quietly added full pass over the APPEND batch — the whole
    // point of append is never to re-shuffle the existing store.
    n should be <= 6
  }

  it should "pin DictStore.compact" in {
    val dir = tmp("mb-cmp")
    graft.io.DictStore.encode(quadsDf(400), dir)
    val rows = (300 to 700).map(i => Quad(Iri(s"urn:s:$i"), Iri("urn:p:v"),
      Lit((i % 83).toString, XSD.integer, ""), None).toRow)
    graft.io.DictStore.append(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      graft.rdf.TermSchema.quadType), dir)
    val n = countShuffles { graft.io.DictStore.compact(spark, dir) }
    // quads rewrite = one hash repartition; dict rewrite = one range
    // repartition — compaction is pure movement, anything more is a
    // quietly added pass
    n should be <= 2
  }

  it should "pin DictStore.encodeBucketed" in {
    val n = countShuffles {
      graft.io.DictStore.encodeBucketed(quadsDf(500), tmp("mb-bkt"),
        buckets = 4)
    }
    // dict phase 1 = distinct + lex range partition (2); phase 2
    // re-bucket of the frozen copy (1); quads bucketed write =
    // repartition on s (1); stats groupBy (1)
    n should be <= 6
  }

  it should "pin Layout.compact: zero shuffles plain, one when re-sorting" in {
    val src = tmp("mb-cmp-src")
    spark.range(0, 20000).select(col("id"), (col("id") % 13).as("k"))
      .repartition(16).write.mode("overwrite").parquet(src)
    countShuffles {
      graft.io.Layout.compact(spark, src, tmp("mb-cmp-out"),
        targetFileBytes = 1L << 20)
    } shouldBe 0 // coalesce-only: map-side merge, the whole point
    countShuffles {
      graft.io.Layout.compact(spark, src, tmp("mb-cmp-out2"),
        targetFileBytes = 1L << 20, sortCols = Seq("k"))
    } shouldBe 1 // the one range partition clustering pays for
  }

  it should "pin Layout.zorderWrite: two shuffles (quantile pre-pass + range write)" in {
    val df = spark.range(0, 20000)
      .select(col("id").as("x"), (col("id") * 7 % 1000).as("y"))
    countShuffles {
      graft.io.Layout.zorderWrite(df, Seq("x", "y"), tmp("mb-z"),
        numFiles = 4)
    } shouldBe 2 // boundary estimation reduces map-side partial
    // quantile sketches through ONE single-partition exchange (bounded
    // bytes — (2^bits - 1) doubles per column); the write pays the one
    // range partition clustering needs anyway
  }
}
