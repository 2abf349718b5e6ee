package graft

import graft.functions.{GraftFunctions, TextHashExprs}
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** SQL surface of the native function library: both registration paths
  * (FunctionRegistry on a live session; SparkSessionExtensions via
  * config) must expose the same codegen'd expressions to spark.sql
  * strings, agreeing with the Column API. */
class GraftFunctionsSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  "GraftFunctions.register" should "expose vec_cosine / vec_dot to spark.sql" in {
    GraftFunctions.register(spark)
    Seq((1L, Array(1.0f, 0.0f), Array(0.0f, 2.0f)),
      (2L, Array(1.0f, 1.0f), Array(1.0f, 1.0f)))
      .toDF("id", "a", "b").createOrReplaceTempView("vecs_v")
    val rows = spark.sql(
      "SELECT id, vec_dot(a, b) AS d, round(vec_cosine(a, b), 9) AS c FROM vecs_v")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    rows shouldBe Set((1L, 0.0, 0.0), (2L, 2.0, 1.0))
  }

  it should "expose the text-hash functions, matching the Column API" in {
    GraftFunctions.register(spark)
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "text")
      .withColumn("toks", Dedup.tokens(col("text")))
    docs.createOrReplaceTempView("docs_v")
    val viaSql = spark.sql(
      """SELECT id, simhash_sig(toks) AS sig,
        |  minhash_from_hashes(shingle_hashes(toks, 3), 8) AS mh
        |FROM docs_v""".stripMargin).collect().head
    val viaCol = docs.select(col("id"),
      TextHashExprs.simHashSigCol(col("toks")).as("sig"),
      TextHashExprs.minHashFromHashesCol(
        TextHashExprs.shingleHashesCol(col("toks"), 3), 8).as("mh"))
      .collect().head
    viaSql.getLong(1) shouldBe viaCol.getLong(1)
    viaSql.getSeq[Long](2) shouldBe viaCol.getSeq[Long](2)
  }

  it should "reject a non-literal k and wrong arity loudly" in {
    GraftFunctions.register(spark)
    Seq((1L, Array("a", "b", "c", "d")))
      .toDF("id", "toks").createOrReplaceTempView("toks_v")
    an[Exception] should be thrownBy
      spark.sql("SELECT shingle_hashes(toks, id) FROM toks_v").collect()
    an[Exception] should be thrownBy
      spark.sql("SELECT vec_cosine(toks) FROM toks_v").collect()
  }

  "GraftExtensions" should "inject every function into a fresh registry" in {
    // the spark.sql.extensions config path, exercised without a second
    // SparkSession (getOrCreate would return the shared test session
    // and silently skip extensions): apply the installer to a bare
    // SparkSessionExtensions and materialize its registrations
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val reg = org.apache.spark.sql.catalyst.analysis.FunctionRegistry
      .builtin.clone()
    org.apache.spark.sql.GraftTestBridge.registerFunctions(ext, reg)
    Seq("vec_dot", "vec_cosine", "shingle_hashes", "minhash_from_hashes",
      "simhash_sig", "portable_fingerprints", "portable_minhash",
      "parse_ntriple").foreach { n =>
      reg.functionExists(FunctionIdentifier(n)) shouldBe true
    }
    // and the injected builder produces the real expression
    reg.lookupFunction(FunctionIdentifier("simhash_sig"),
      Seq(org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array("a", "b"),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)))) shouldBe
      a[TextHashExprs.SimHashSigExpr]
  }

  it should "expose parse_ntriple and portable_fingerprints to spark.sql" in {
    GraftFunctions.register(spark)
    Seq("<urn:a> <urn:p> \"v\" .", "junk line", "# comment")
      .toDF("value").createOrReplaceTempView("nt_lines_v")
    val quads = spark.sql(
      """SELECT q.s.lex AS s, q.o.lex AS o
        |FROM (SELECT explode(parse_ntriple(value, true)) AS q
        |      FROM nt_lines_v)""".stripMargin).collect()
    quads.map(r => (r.getString(0), r.getString(1))).toSeq shouldBe
      Seq(("urn:a", "v"))
    // strict mode surfaces the parse error
    intercept[Exception](spark.sql(
      "SELECT explode(parse_ntriple(value, false)) FROM nt_lines_v").collect())

    Seq((1L, "a b c d e f g h i j"))
      .toDF("id", "text").createOrReplaceTempView("fp_docs_v")
    val viaSql = spark.sql(
      """SELECT portable_fingerprints(
        |  filter(split(lower(trim(text)), '\\s+'), x -> x != ''), 8, 4) AS f
        |FROM fp_docs_v""".stripMargin).head().getSeq[Long](0)
    val viaCol = Seq((1L, "a b c d e f g h i j")).toDF("id", "text")
      .select(graft.pipeline.TextAnalysis
        .portableRollingFingerprints(col("text")).as("f"))
      .head().getSeq[Long](0)
    viaSql shouldBe viaCol
  }

  it should "expose the kmv_distinct aggregate to spark.sql" in {
    graft.functions.GraftFunctions.register(spark)
    (1 to 100).map(i => ("g", i.toLong)).toDF("g", "v")
      .createOrReplaceTempView("kmv_v")
    val viaSql = spark.sql(
      """SELECT kmv_distinct(
        |  CAST(conv(substring(md5(CAST(v AS STRING)), 1, 12), 16, 10)
        |       AS BIGINT), 16, 281474976710656) AS s
        |FROM kmv_v GROUP BY g""".stripMargin)
      .select("s.n_retained", "s.kth_min", "s.estimate").head()
    val viaCol = graft.pipeline.Sketches
      .distinctCountSketch(spark.table("kmv_v"), Seq("g"), "v", 16)
      .select("n_retained", "kth_min", "estimate").head()
    viaSql shouldBe viaCol
  }

  it should "expose topk_freq and bottomk_sample aggregates to spark.sql" in {
    graft.functions.GraftFunctions.register(spark)
    (1 to 30).flatMap(i => Seq.fill(i)(("g", s"w$i", i.toLong)))
      .toDF("g", "w", "id").createOrReplaceTempView("sk_v")
    // heavy hitters: SQL face returns the full sorted counter array;
    // INT literals (the documented calling convention) must coerce,
    // not ClassCastException
    val hh = spark.sql(
      "SELECT topk_freq(w, 1, 0, 64) AS s FROM sk_v GROUP BY g")
      .select(explode(col("s")).as("c"))
      .select("c.item", "c.count", "c.err")
      .limit(2).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    hh shouldBe Array(("w30", 30L, 0L), ("w29", 29L, 0L))
    // bottom-k sample: same retained set as the Column-level sketch
    val viaSql = spark.sql(
      """SELECT bottomk_sample(
        |  CAST(conv(substring(md5(CAST(id AS STRING)), 1, 12), 16, 10)
        |       AS BIGINT), CAST(id AS DOUBLE), 8) AS s
        |FROM sk_v GROUP BY g""".stripMargin)
      .select(col("s")).head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getDouble(1)))
    viaSql should have size 8
    viaSql.map(_._1) shouldBe viaSql.map(_._1).sorted
  }

  it should "expose bpe_encode / bpe_count, matching the Column API" in {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq((1L, "The Customer ORDER row"), (2L, "  vector  batch "),
      (3L, null.asInstanceOf[String])).toDF("id", "text")
    df.createOrReplaceTempView("bpe_v")
    // committed-vocab form: SQL and Column must agree cell for cell
    val viaSql = spark.sql(
      "SELECT id, bpe_encode(text) AS toks, bpe_count(text) AS n " +
        "FROM bpe_v ORDER BY id").collect()
    val viaCol = df.select(col("id"),
        graft.functions.BpeExprs.bpeTokensCol(col("text")).as("toks"),
        graft.functions.BpeExprs.bpeTokenCountCol(col("text")).as("n"))
      .orderBy("id").collect()
    viaSql.map(_.toSeq) shouldBe viaCol.map(_.toSeq)
    viaSql(0).getLong(2) shouldBe viaSql(0).getSeq[String](1).size.toLong
    viaSql(2).isNullAt(1) shouldBe true // NULL text -> NULL, not error

    // literal merge-table form round-trips through renderMerges
    val custom = graft.functions.Bpe.trainFromCounts(
      Seq(("abab", 10L), ("ab", 5L)), numMerges = 2)
    val lit = graft.functions.Bpe.renderMerges(custom)
    graft.functions.Bpe.parseMerges(lit) shouldBe custom
    val sql2 = spark.sql(
      s"SELECT bpe_encode('abab', '$lit') AS t").head().getSeq[String](0)
    val col2 = Seq("abab").toDF("t")
      .select(graft.functions.BpeExprs.bpeTokensCol(col("t"), custom))
      .head().getSeq[String](0)
    sql2 shouldBe col2
    sql2.mkString shouldBe "abab" // tokens reassemble the word

    // a non-literal merges argument is rejected loudly, not miscompiled
    an[Exception] should be thrownBy
      spark.sql("SELECT bpe_encode(text, text) FROM bpe_v").collect()
  }
}
