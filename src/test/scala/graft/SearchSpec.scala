package graft

import graft.pipeline.Search
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** BM25 search: hand-computed scores on a tiny corpus, ranking order,
  * top-k cut, and deterministic ties. */
class SearchSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark join spark"),
    (2L, "join window"),
    (3L, "other words here"),
    (4L, "spark")
  ).toDF("doc_id", "text")

  // N=4, avgdl=2.25; df(spark)=df(join)=2 → idf = ln 2 for both
  private val ln2 = math.log(2.0)

  "bm25" should "match hand-computed scores" in {
    val s = Search.bm25(docs, "doc_id", "text", "spark join")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    s.keySet shouldBe Set(1L, 2L, 4L)
    // doc1: spark tf2 dl3 → 2*2.2/3.5; join tf1 → 2.2/2.5
    s(1L) shouldBe (ln2 * (2 * 2.2 / 3.5) + ln2 * (2.2 / 2.5)) +- 1e-9
    // doc2: join tf1 dl2 → 2.2/2.1
    s(2L) shouldBe (ln2 * (2.2 / 2.1)) +- 1e-9
    // doc4: spark tf1 dl1 → 2.2/1.7
    s(4L) shouldBe (ln2 * (2.2 / 1.7)) +- 1e-9
  }

  "bm25TopK" should "rank by score desc and honor k" in {
    val top = Search.bm25TopK(docs, "doc_id", "text", "spark join", k = 2)
      .collect().map(_.getLong(0)).toSeq
    top shouldBe Seq(1L, 4L)
  }

  it should "break exact ties by doc id" in {
    val dup = Seq((10L, "spark alpha"), (9L, "spark alpha"), (3L, "beta"))
      .toDF("doc_id", "text")
    val top = Search.bm25TopK(dup, "doc_id", "text", "spark", k = 2)
      .collect().map(_.getLong(0)).toSeq
    top shouldBe Seq(9L, 10L)
  }

  it should "ignore repeated and empty query tokens" in {
    val a = Search.bm25TopK(docs, "doc_id", "text", "  spark   spark ", k = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = Search.bm25TopK(docs, "doc_id", "text", "spark", k = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    a shouldBe b
  }

  it should "case-fold the query exactly like the corpus tokens" in {
    val a = Search.bm25TopK(docs, "doc_id", "text", "SPARK Join", k = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = Search.bm25TopK(docs, "doc_id", "text", "spark join", k = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    a shouldBe b
  }

  it should "skip NULL-text rows in corpus statistics" in {
    val withNull = docs.unionByName(
      Seq((99L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val a = Search.bm25(withNull, "doc_id", "text", "spark join")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val b = Search.bm25(docs, "doc_id", "text", "spark join")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    a shouldBe b // a NULL doc must not perturb avgdl or N-dependent idf
  }

  it should "reject an all-whitespace query" in {
    an[IllegalArgumentException] should be thrownBy
      Search.bm25(docs, "doc_id", "text", "   ")
  }

  "rrfFuse" should "fuse rankings with missing documents scoring 0 there" in {
    val kw = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val vec = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    val fused = Search.rrfFuse(Seq("kw" -> kw, "vec" -> vec), k = 10, rrfK = 60)
      .collect().map(r => (r.getLong(0), r.getDouble(r.fieldIndex("rrf"))))
    // doc 20 appears in both lists → highest fused score
    fused.head._1 shouldBe 20L
    fused.head._2 shouldBe (1.0 / 62 + 1.0 / 61)
    val m = fused.toMap
    m(10L) shouldBe 1.0 / 61 // kw only
    m(40L) shouldBe 1.0 / 62 // vec only
    m.keySet shouldBe Set(10L, 20L, 30L, 40L)
  }

  "hybridTopK" should "surface keyword-only and vector-only hits" in {
    val corpus = Seq(
      (1L, "spark shuffle join internals explained with diagrams today"),
      (2L, "gardening tips for tomatoes in raised beds this spring"),
      (3L, "spark window functions and join strategies compared"))
      .toDF("doc_id", "text")
    // embeddings: doc 2 is closest to the query vector, docs 1/3 not
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(0.7f, 0.7f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Search.hybridTopK(corpus, "doc_id", "text", "spark join",
      emb, "vec_id", "embedding", Seq(0.0, 1.0, 0.0), k = 3, poolK = 3)
      .collect().map(r => (r.getLong(0),
        Option(r.getAs[Integer]("kw_rank")).map(_.toInt),
        Option(r.getAs[Integer]("vec_rank")).map(_.toInt)))
    val byId = out.map(o => o._1 -> o).toMap
    byId(2L)._2 shouldBe None  // no keyword hit
    byId(2L)._3 shouldBe Some(1) // best vector
    byId(1L)._2.isDefined shouldBe true
    // a doc in both pools must outrank single-arm docs of similar rank
    out.map(_._1).toSet shouldBe Set(1L, 2L, 3L)
    an[IllegalArgumentException] should be thrownBy
      Search.hybridTopK(corpus, "doc_id", "text", "spark",
        emb, "vec_id", "embedding", Seq(1.0, 0.0, 0.0), k = 5, poolK = 3)
  }
}
