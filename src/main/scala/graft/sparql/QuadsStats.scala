package graft.sparql

import graft.sparql.Algebra._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest-time statistics for cost-based BGP join ordering — the
  * SPARQL counterpart of `ANALYZE TABLE` feeding Spark's CBO, which
  * cannot see through our term-struct scans on its own.
  *
  * One pass over the quads collects, per predicate: quad count and
  * approximate distinct subject/object counts. That is the classic
  * selectivity model for RDF stores (Stocker et al., "SPARQL Basic
  * Graph Pattern Optimization Using Selectivity Estimation", WWW'08):
  * predicates are the low-cardinality axis of any real RDF dataset
  * (schema-bounded — thousands at most, while subjects/objects run to
  * billions), so a per-predicate table is tiny and driver-resident,
  * yet estimates every triple-pattern shape:
  *
  *  - `?s <p> ?o` → count(p)
  *  - `<s> <p> ?o` → count(p) / ndvSubj(p)   (avg out-degree)
  *  - `?s <p> <o>` → count(p) / ndvObj(p)    (avg in-degree)
  *  - variable predicate → total (÷ heuristics for bound s/o)
  *
  * The greedy reorderer ([[BgpOptimizer]]) consumes these estimates in
  * place of its structural constant-counting heuristic. At 100 TB the
  * difference is not a constant factor: starting a 6-pattern BGP from
  * a 10^4-row predicate instead of a 10^9-row one changes every
  * intermediate shuffle after it.
  *
  * The predicate table is capped at [[QuadsStats.MaxPredicates]]
  * entries (kept by descending count, so the head — the predicates
  * that matter for ordering — is exact); datasets beyond the cap fall
  * back to `defaultCount` (an upper bound on any tail predicate:
  * no tail count can exceed the smallest kept count, nor the whole
  * dropped quad mass) for unlisted predicates. Stats are advisory:
  * they influence only join ORDER, never results, so staleness is
  * safe.
  *
  * The reference has no counterpart — it executes joins strictly as
  * written (Interpreter.scala:438 via SURVEY.md §4).
  */
final case class QuadsStats(total: Long,
                            preds: Map[String, QuadsStats.PredStat],
                            defaultCount: Double) {

  /** Estimated result rows of one triple/quad pattern. */
  def estimate(sc: Scan): Double = {
    val base = sc.p match {
      case T(t) => preds.get(t.lex) match {
        case Some(ps) => ps.count.toDouble
        case None => defaultCount
      }
      case _ => total.toDouble
    }
    def ndv(f: QuadsStats.PredStat => Long): Double = sc.p match {
      case T(t) => preds.get(t.lex).map(ps => f(ps).max(1L).toDouble)
        .getOrElse(QuadsStats.UnknownNdv)
      case _ => QuadsStats.UnknownNdv
    }
    var est = base
    sc.s match {
      case T(_) => est /= ndv(_.ndvSubj)
      case V(_) => ()
    }
    sc.o match {
      case T(_) => est /= ndv(_.ndvObj)
      case V(_) => ()
    }
    // repeated variable in one pattern (?s p ?s): rough 1/ndv filter
    val vs = List(sc.s, sc.o).collect { case V(n) => n } ++
      (sc.p match { case V(n) => List(n); case _ => Nil })
    if (vs.distinct.size < vs.size) est /= QuadsStats.UnknownNdv
    est.max(QuadsStats.MinEstimate)
  }

  /** JSON for persistence alongside the data it describes
    * ([[graft.io.DictStore.encode]] writes it; hand-rolled like
    * Verify's dump — no JSON library in the dependency budget). */
  def toJson: String = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val ps = preds.toSeq.sortBy(-_._2.count).map { case (p, st) =>
      s"""{"p":"${esc(p)}","n":${st.count},"ns":${st.ndvSubj},"no":${st.ndvObj}}"""
    }.mkString("[", ",", "]")
    s"""{"total":$total,"defaultCount":$defaultCount,"preds":$ps}"""
  }
}

object QuadsStats {

  final case class PredStat(count: Long, ndvSubj: Long, ndvObj: Long)

  /** Cap on the driver-resident predicate table. Real RDF vocabularies
    * are schema-bounded; 100k covers every published dataset while
    * keeping the table < ~10 MB. */
  val MaxPredicates = 100000

  /** Divisor applied for a bound position whose distinct count is
    * unknown (variable predicate, or predicate past the cap). */
  val UnknownNdv = 1000.0

  /** Floor so estimates stay positive and orderable. */
  val MinEstimate = 0.01

  /** One aggregation pass: per-predicate count + approx distinct
    * subjects/objects (HLL at default 5% error — ordering only needs
    * the right magnitude). Every quad has exactly one predicate, so in
    * the common (uncapped) case `total` is the sum of the per-predicate
    * counts already in hand; only a dataset that trips the predicate
    * cap pays a second scan for the grand total. */
  def compute(quads: DataFrame): QuadsStats = {
    val agg = quads.groupBy(col("p.lex").as("p"))
      .agg(count(lit(1)).as("n"),
        approx_count_distinct(col("s")).as("ns"),
        approx_count_distinct(col("o")).as("no"))
      .orderBy(col("n").desc)
      .limit(MaxPredicates + 1)
      .collect()
    val capped = agg.length > MaxPredicates
    val kept = agg.take(MaxPredicates)
    val preds = kept.map { r =>
      r.getString(0) -> PredStat(r.getLong(1), r.getLong(2), r.getLong(3))
    }.toMap
    val keptTotal = kept.map(_.getLong(1)).sum
    val total = if (capped) quads.count() else keptTotal
    val defaultCount =
      if (capped) {
        val droppedQuads = math.max(1L, total - keptTotal)
        // upper bound for any one tail predicate: it cannot hold more
        // quads than the smallest kept predicate (the table is sorted
        // by count) nor more than the whole dropped mass
        math.min(kept.lastOption.map(_.getLong(1)).getOrElse(1L).toDouble,
          droppedQuads.toDouble)
      } else MinEstimate // complete table: unknown predicate ⇒ absent
    QuadsStats(total, preds, defaultCount)
  }

  /** Additive merge for incremental ingest ([[graft.io.DictStore.append]]):
    * per-predicate counts and the grand total add exactly; the HLL
    * ndv fields cannot (the overlap between the two sides is
    * unknown), so they take the union-bounded sum `min(count, a+b)` —
    * an overestimate by at most 2×, which is magnitude-correct for
    * the join ORDERING these stats feed. `defaultCount` keeps the
    * larger bound (it is itself an upper bound on any tail
    * predicate). */
  def merge(a: QuadsStats, b: QuadsStats): QuadsStats = {
    val preds = (a.preds.keySet ++ b.preds.keySet).map { p =>
      (a.preds.get(p), b.preds.get(p)) match {
        case (Some(x), Some(y)) =>
          val n = x.count + y.count
          p -> PredStat(n, math.min(n, x.ndvSubj + y.ndvSubj),
            math.min(n, x.ndvObj + y.ndvObj))
        case (Some(x), None) => p -> x
        case (None, Some(y)) => p -> y
        case (None, None) => throw new IllegalStateException("unreachable")
      }
    }.toMap
    QuadsStats(a.total + b.total, preds,
      math.max(a.defaultCount, b.defaultCount))
  }

  /** Parse [[QuadsStats.toJson]] output (persisted stats sidecar). */
  def fromJson(json: String): QuadsStats = {
    // tolerant hand parser for our own writer's output shape
    def field(src: String, name: String): String = {
      val i = src.indexOf(s""""$name":""")
      require(i >= 0, s"stats json missing $name")
      src.substring(i + name.length + 3)
    }
    val total = field(json, "total").takeWhile(c => c.isDigit).toLong
    val defaultCount = field(json, "defaultCount")
      .takeWhile(c => c.isDigit || c == '.' || c == 'E' || c == '-').toDouble
    val predsStr = json.substring(json.indexOf("\"preds\":") + 8)
    val entry = """\{"p":"((?:[^"\\]|\\.)*)","n":(\d+),"ns":(\d+),"no":(\d+)\}""".r
    val preds = entry.findAllMatchIn(predsStr).map { m =>
      unescape(m.group(1)) -> PredStat(m.group(2).toLong, m.group(3).toLong,
        m.group(4).toLong)
    }.toMap
    QuadsStats(total, preds, defaultCount)
  }

  /** Inverse of [[QuadsStats.toJson]]'s escaping — including the
    * \\uXXXX control-character form (a predicate containing one must
    * round-trip, or its estimate() lookups silently miss after a
    * reload and fall back to defaultCount). */
  private def unescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) s.charAt(i + 1) match {
        case '"' => sb.append('"'); i += 2
        case '\\' => sb.append('\\'); i += 2
        case 'u' if i + 5 < s.length =>
          sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
          i += 6
        case _ => sb.append(c); i += 1
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Persist stats as a one-row text file next to the data. */
  def write(spark: SparkSession, stats: QuadsStats, path: String): Unit =
    Sparql.oneLine(spark, stats.toJson)
      .write.mode("overwrite").text(path)

  def read(spark: SparkSession, path: String): QuadsStats =
    fromJson(spark.read.text(path).head().getString(0))
}
