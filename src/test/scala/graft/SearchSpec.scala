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
}
