package graft.sparql

import graft.rdf.{BNode, Iri, Lit, Term, XSD}
import org.apache.spark.sql.DataFrame

/** Public entry points — the analogue of the reference's
  * `SCollection[Statement].executeSparql` implicit syntax
  * (Interpreter.scala:164-205, SURVEY.md §2.11).
  *
  * {{{
  * import graft.sparql.Sparql._
  * val results: DataFrame = quadsDf.sparql("SELECT ?s WHERE { ?s ?p ?o }")
  * }}}
  *
  * Result schema: one nullable term-struct column per projected
  * variable (NULL = unbound). Use [[Compiler.lexical]] to flatten to
  * lexical strings.
  */
object Sparql {

  // ----- SERVICE endpoint registry (SPARQL 1.1 federated query) -----
  // The Spark-native reading of federation: an "endpoint" is another
  // quads DataFrame — a different table, bucket, or source — registered
  // under a constant IRI. SERVICE <iri> { … } then evaluates its
  // pattern against that dataset and joins the solutions, letting one
  // query span datasets without materializing their union.
  private val services =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** Register `quads` as the dataset behind `SERVICE <endpoint>`.
    * The registry is JVM-global and holds a strong reference: a
    * registered DataFrame (and its lineage) lives until unregistered,
    * and one bound to a stopped SparkSession goes stale rather than
    * vanishing — unregister (or [[clearServices]]) when a session
    * ends. */
  def registerService(endpoint: String, quads: DataFrame): Unit =
    services.put(endpoint, quads)

  def unregisterService(endpoint: String): Unit = services.remove(endpoint)

  /** Drop every registered endpoint (e.g. on session teardown). */
  def clearServices(): Unit = services.clear()

  // ----- W3C SPARQL 1.1 Query Results exports (CSV / TSV) -----

  /** Write SELECT results as SPARQL 1.1 Results CSV (one header line,
    * bare lexical forms, unbound = empty) — distributed, one part file
    * per partition like any Spark CSV sink. */
  def writeResultsCsv(results: DataFrame, path: String): Unit =
    Compiler.lexical(results)
      .write.mode("overwrite").option("header", "true").csv(path)

  /** Write SELECT results as SPARQL 1.1 Results TSV: a `?var` header
    * line and full term syntax per cell (`<iri>`, `"lit"@lang`,
    * `"lit"^^<dt>`, `_:b`), unbound = empty — the lossless text form,
    * serialized by the same codegen'd token expressions as the N-Quads
    * writer. */
  def writeResultsTsv(results: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.functions._
    val cols = results.columns
    val header = cols.map("?" + _).mkString("\t")
    val body = results.select(concat_ws("\t",
      cols.map(c => coalesce(graft.io.QuadsIO.ntToken(results(c)), lit(""))): _*)
      .as("value"))
    // W3C TSV has ONE header line: emit it as its own single-row first
    // partition (part-00000) so the concatenated part files in name
    // order form a valid document — the write itself stays distributed
    val spark = results.sparkSession
    import scala.jdk.CollectionConverters._
    val headerDf = spark.createDataFrame(
      Seq(org.apache.spark.sql.Row(header)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType, nullable = false))))
    headerDf.coalesce(1).union(body).write.mode("overwrite").text(path)
  }

  private[sparql] def serviceFor(endpoint: String): Option[DataFrame] =
    Option(services.get(endpoint))

  /** Serialize a term into SPARQL surface syntax (for pre-binding).
    * Control characters use the grammar's string escapes — a raw line
    * break inside a quoted string is invalid SPARQL, so the output
    * stays parseable by conforming processors, not just ours. */
  def serialize(t: Term): String = t match {
    case Iri(v) => s"<$v>"
    case BNode(id) => s"_:$id"
    case l: Lit =>
      val q = "\"" + l.lex.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t") + "\""
      if (l.lang.nonEmpty) s"$q@${l.lang}"
      else if (l.dt == XSD.string) q
      else s"$q^^<${l.dt}>"
  }

  /** Textual pre-binding — the analogue of the reference's
    * rdf4j-QueryStringUtil substitution (Interpreter.scala:179-205),
    * but done by injecting `BIND(<term> AS ?var)` at the head of the
    * WHERE group: the variable stays projectable AND constrains every
    * pattern via the natural join, without corrupting the SELECT list. */
  def preBind(query: String, bindings: Map[String, Term]): String = {
    val idx = query.indexOf('{')
    require(idx >= 0, "query has no WHERE group to bind into")
    val binds = bindings.map { case (name, term) =>
      s"BIND(${serialize(term)} AS ?$name)"
    }.mkString(" ", " ", " ")
    query.substring(0, idx + 1) + binds + query.substring(idx + 1)
  }

  /** Construct the query dataset per SPARQL 1.1 §13.2: `FROM` graphs
    * merge into the default graph (their g column nulled), `FROM
    * NAMED` graphs stay addressable by GRAPH; everything else — the
    * original default graph included — drops out. Pure filters on the
    * one quads scan, so Catalyst pushes the graph selection into the
    * source. Bag semantics throughout (the documented source-duplicate
    * contract): a triple present in two FROM graphs appears twice in
    * the merged default graph. */
  def applyDataset(quads: DataFrame,
                   ds: SparqlParser.DatasetSpec): DataFrame =
    if (ds.isEmpty) quads
    else {
      import org.apache.spark.sql.functions._
      def graphs(sel: Seq[Term]) =
        quads.filter(col("g").isNotNull &&
          col("g").getField("lex").isin(sel.map(_.lex): _*))
      val default =
        if (ds.from.isEmpty) None
        else Some(graphs(ds.from).withColumn("g",
          lit(null).cast(graft.rdf.TermSchema.termType)))
      val named =
        if (ds.fromNamed.isEmpty) None else Some(graphs(ds.fromNamed))
      (default ++ named).reduceOption(_ union _).getOrElse(quads.limit(0))
    }

  implicit class QuadsOps(private val quads: DataFrame) extends AnyVal {
    /** Execute a SPARQL 1.1 query over this quads DataFrame.
      * SELECT → one term-struct column per variable; ASK → single
      * boolean `ask` row; CONSTRUCT/DESCRIBE → a quads DataFrame
      * (s,p,o,g). */
    def sparql(query: String): DataFrame = SparqlParser.parseAny(query) match {
      case SparqlParser.SelectQuery(op, ds) =>
        Compiler.run(applyDataset(quads, ds), BgpOptimizer.optimize(op))
      case SparqlParser.AskQuery(op, ds) =>
        Compiler.runAsk(applyDataset(quads, ds), BgpOptimizer.optimize(op))
      case SparqlParser.ConstructQuery(template, op, ds) =>
        Compiler.runConstruct(applyDataset(quads, ds), template,
          BgpOptimizer.optimize(op))
      case SparqlParser.DescribeQuery(targets, star, op, ds) =>
        Compiler.runDescribe(applyDataset(quads, ds), targets, star,
          op.map(BgpOptimizer.optimize))
    }

    /** Execute with pre-bound variables (textual substitution). */
    def sparql(query: String, bindings: Map[String, Term]): DataFrame =
      sparql(preBind(query, bindings))

    /** SPARQL 1.1 Update (INSERT DATA / DELETE DATA / DELETE WHERE /
      * DELETE…INSERT…WHERE) as a pure transform: returns the updated
      * quads DataFrame; write it back (e.g. QuadsIO.writeParquet) to
      * commit — an atomic snapshot swap at scale. */
    def sparqlUpdate(update: String): DataFrame =
      Compiler.runUpdate(quads, SparqlParser.parseUpdate(update))

    /** Execute and flatten term structs to lexical strings. */
    def sparqlLex(query: String): DataFrame =
      Compiler.lexical(sparql(query))
  }
}
