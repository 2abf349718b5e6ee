package graft

import graft.io.DictStore
import graft.sources.TpchQuads
import org.apache.spark.GraftListenerBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Scale evidence for the dictionary-encoded store (SURVEY §11): the
  * same BGP shuffles far fewer bytes when join keys are 8-byte ids
  * than when they are term structs. Measured via SparkListener task
  * metrics with broadcast joins and AQE disabled, so both plans are
  * forced through real shuffle exchanges — at 100 TB neither side of a
  * fact-fact join broadcasts, which is exactly the regime the dict
  * store exists for. The COUNT form measures the §11 claim in
  * isolation (pure BGP join shuffle, no result materialization); the
  * projection form is reported for context — late materialization
  * joins the string dictionary back in, which at toy scale costs
  * bytes comparable to the BGP itself but at 100 TB touches only the
  * post-filter survivors. The asserted floor is conservative (≥3×);
  * the measured factor is logged for SURVEY §13. */
class DictShuffleVolumeSpec extends SparqlSpecBase {

  private val sf = "/root/testdata/sf0.01"
  private val query =
    """PREFIX : <urn:p:>
      |SELECT ?cname ?nname
      |{ ?c :cname ?cname . ?c :inNation ?n . ?n :nname ?nname .
      |  ?n :inRegion ?r . ?r :rname "ASIA" }""".stripMargin
  private val countQuery =
    """PREFIX : <urn:p:>
      |SELECT (COUNT(*) AS ?cnt)
      |{ ?c :cname ?cname . ?c :inNation ?n . ?n :nname ?nname .
      |  ?n :inRegion ?r . ?r :rname "ASIA" }""".stripMargin

  /** (uncompressed exchange dataSize, compressed bytes hit the wire).
    * dataSize is the §11 claim — bytes carried per shuffled row;
    * bytesWritten additionally reflects lz4, which on synthetic
    * TPC-H URNs compresses strings unrealistically well. */
  private def shuffleBytes(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val wire = new java.util.concurrent.atomic.AtomicLong()
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) wire.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val plan = df.queryExecution.executedPlan
      plan.execute().foreachPartition((_: Iterator[_]) => ())
      GraftListenerBridge.waitUntilEmpty(spark.sparkContext)
      val dataSize = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          e.metrics("dataSize").value
      }.sum
      (dataSize, wire.get)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  "dict-encoded BGP joins" should "shuffle far fewer bytes than term-struct joins" in {
    import graft.sparql.Sparql._
    val quads = TpchQuads.customer(spark, sf)
      .union(TpchQuads.nation(spark, sf)).union(TpchQuads.region(spark, sf))
    val dictDir = java.nio.file.Files
      .createTempDirectory("graft-dict-shufflevol").toString
    val store = DictStore.encode(quads, dictDir)

    val prevBroadcast =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // results must agree before the byte counts mean anything
      val viaDict = collect(store.sparql(query))
      val viaTerms = collect(quads.sparql(query))
      viaDict.size shouldBe viaTerms.size
      viaDict.toSet shouldBe viaTerms.toSet

      val (dictBgp, dictBgpWire) = shuffleBytes(store.sparql(countQuery))
      val (termBgp, termBgpWire) = shuffleBytes(quads.sparql(countQuery))
      val (dictFull, _) = shuffleBytes(store.sparql(query))
      val (termFull, _) = shuffleBytes(quads.sparql(query))
      info(f"BGP-only shuffle dataSize: dict=$dictBgp%,d terms=$termBgp%,d " +
        f"factor=${termBgp.toDouble / dictBgp.max(1)}%.1f× " +
        f"(wire: $dictBgpWire%,d vs $termBgpWire%,d)")
      info(f"with materialization: dict=$dictFull%,d terms=$termFull%,d " +
        f"factor=${termFull.toDouble / dictFull.max(1)}%.1f×")
      dictBgp should be > 0L // the BGP really shuffled
      termBgp.toDouble should be > dictBgp.toDouble * 3
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  /** Total shuffle bytes hitting the wire across ALL jobs of an
    * eagerly-executing action (the transitive closure runs its rounds
    * during compile, so per-plan dataSize cannot see them). */
  private def wireBytes(run: => Unit): Long = {
    val wire = new java.util.concurrent.atomic.AtomicLong()
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) wire.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      run
      GraftListenerBridge.waitUntilEmpty(spark.sparkContext)
      wire.get
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  "id-space transitive closure" should "shuffle fewer wire bytes than the term-struct closure" in {
    import graft.sparql.Sparql._
    val quads = TpchQuads.partOfChain(spark, sf)
    val dictDir = java.nio.file.Files
      .createTempDirectory("graft-dict-alpvol").toString
    val store = DictStore.encode(quads, dictDir)
    val q = "PREFIX : <urn:p:>\nSELECT ?s ?x { ?s :partOf+ ?x }"
    val prevBroadcast =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val viaDict = collect(store.sparql(q))
      val viaTerms = collect(quads.sparql(q))
      viaDict.size shouldBe viaTerms.size
      viaDict.toSet shouldBe viaTerms.toSet
      // end-to-end wire bytes, closure rounds included (the dict side
      // pays its final materialization joins inside this too)
      val dictW = wireBytes(store.sparql(q).write.mode("overwrite")
        .format("noop").save())
      val termW = wireBytes(quads.sparql(q).write.mode("overwrite")
        .format("noop").save())
      info(f"ALP closure wire bytes: dict=$dictW%,d terms=$termW%,d " +
        f"factor=${termW.toDouble / dictW.max(1)}%.1f×")
      dictW should be > 0L
      // strictly fewer, but the toy-scale factor is compressed (~1.1×):
      // these synthetic URNs are 9-13 chars — barely wider than an
      // 8-byte long — and lz4 squeezes their shared prefixes, while
      // the forced-shuffle dict decode of the FULL closure result is
      // charged to the dict side. The uncompressed per-row width claim
      // (5.5× dataSize) is pinned by the BGP test above; real IRIs
      // (30-80 bytes) widen both factors.
      termW should be > dictW
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  "id-space SUM aggregation" should "shuffle fewer bytes than term-struct grouping" in {
    import graft.sparql.Sparql._
    // group keys stay longs and only ?bal hybrid-decodes; the standard
    // path shuffles term-struct rows into the groupBy. The dict side
    // pays its two dictionary joins inside the same measurement, so
    // the factor is an honest end-to-end comparison.
    val aggQuery =
      """PREFIX : <urn:p:>
        |SELECT ?nname (SUM(?bal) AS ?t)
        |{ ?n2 :nname ?nname . ?c :inNation ?n2 . ?c :acctbal ?bal }
        |GROUP BY ?nname""".stripMargin
    val quads = TpchQuads.customer(spark, sf)
      .union(TpchQuads.nation(spark, sf))
    val dictDir = java.nio.file.Files
      .createTempDirectory("graft-dict-aggvol").toString
    val store = DictStore.encode(quads, dictDir)
    val prevBroadcast =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // double SUM is addition-order-dependent: compare at the base
      // class's numeric tolerance, not bit-exactly
      assertResult(collect(store.sparql(aggQuery)),
        collect(quads.sparql(aggQuery)))
      val (dictB, dictWire) = shuffleBytes(store.sparql(aggQuery))
      val (termB, termWire) = shuffleBytes(quads.sparql(aggQuery))
      info(f"SUM agg shuffle dataSize: dict=$dictB%,d terms=$termB%,d " +
        f"factor=${termB.toDouble / dictB.max(1)}%.1f× " +
        f"(wire: $dictWire%,d vs $termWire%,d)")
      dictB should be > 0L
      termB should be > dictB
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  "id-space OPTIONAL" should "shuffle far fewer bytes than the term-struct left join" in {
    import graft.sparql.Sparql._
    // COUNT over an OPTIONAL spine: the left-outer join is the
    // measured shuffle (no result materialization), exactly the shape
    // the round-9 ext-block rewrite moved into id space
    val optionalCount =
      """PREFIX : <urn:p:>
        |SELECT (COUNT(*) AS ?cnt)
        |{ ?n :nname ?nname . ?n :inRegion ?r . ?r :rname "ASIA" .
        |  OPTIONAL { ?c :inNation ?n . ?c :cname ?cname } }""".stripMargin
    val quads = TpchQuads.customer(spark, sf)
      .union(TpchQuads.nation(spark, sf)).union(TpchQuads.region(spark, sf))
    val dictDir = java.nio.file.Files
      .createTempDirectory("graft-dict-optvol").toString
    val store = DictStore.encode(quads, dictDir)
    val prevBroadcast =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val viaDict = collect(store.sparql(optionalCount))
      val viaTerms = collect(quads.sparql(optionalCount))
      viaDict shouldBe viaTerms
      val (dictB, dictWire) = shuffleBytes(store.sparql(optionalCount))
      val (termB, termWire) = shuffleBytes(quads.sparql(optionalCount))
      info(f"OPTIONAL shuffle dataSize: dict=$dictB%,d terms=$termB%,d " +
        f"factor=${termB.toDouble / dictB.max(1)}%.1f× " +
        f"(wire: $dictWire%,d vs $termWire%,d)")
      dictB should be > 0L
      termB.toDouble should be > dictB.toDouble * 3
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
