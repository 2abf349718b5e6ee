package graft

import graft.functions.TextHashExprs
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Bit-for-bit parity of the native map-only text-hash expressions
  * against the Spark Column forms they replaced — the dedup pipeline's
  * signatures must be stable across the rewrite (persisted signature
  * tables keep working, and the banding keys don't move). */
class TextHashExprsSpec extends AnyFlatSpec with Matchers {
  private val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "a b c d e f g a b c d e"), // repeated shingles → dedup inside
    (3L, "  Mixed   CASE\ttokens\nwith   oddwhitespace  "),
    (4L, "unicode tökens écrit 中文 emoji 😀 mixed in"),
    (5L, "one two"), // fewer tokens than shingleK after the >= k gate
    (6L, "")
  ).toDF("doc_id", "text")

  "shingle_hashes" should "match the explode + xxhash64(concat_ws(slice)) form as a set" in {
    val k = 3
    val toks = docs.select(col("doc_id"), Dedup.tokens(col("text")).as("ws"))
      .filter(org.apache.spark.sql.functions.size(col("ws")) >= k)
    val native = toks
      .select(col("doc_id"), explode(TextHashExprs.shingleHashesCol(col("ws"), k)).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val oracle = toks
      .select(col("doc_id"),
        explode(sequence(lit(0), org.apache.spark.sql.functions.size(col("ws")) - k)).as("i"), col("ws"))
      .select(col("doc_id"),
        xxhash64(concat_ws(" ", slice(col("ws"), col("i") + 1, lit(k)))).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    native shouldBe oracle
    native.nonEmpty shouldBe true
  }

  it should "deduplicate repeated shingles in-row" in {
    val ws = Dedup.tokens(lit("x y x y x y x y"))
    val hs = docs.limit(1)
      .select(TextHashExprs.shingleHashesCol(ws, 2).as("hs"))
      .head().getSeq[Long](0)
    hs.distinct.size shouldBe hs.size
    hs.size shouldBe 2 // "x y" and "y x"
  }

  "minhash_from_hashes" should "match min(xxhash64(s, i)) aggregates bit-for-bit" in {
    val k = 3
    val num = 16
    val toks = docs.select(col("doc_id"), Dedup.tokens(col("text")).as("ws"))
      .filter(org.apache.spark.sql.functions.size(col("ws")) >= k)
    val native = toks
      .select(col("doc_id"),
        TextHashExprs.minHashFromHashesCol(
          TextHashExprs.shingleHashesCol(col("ws"), k), num).as("mh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val shRows = toks
      .select(col("doc_id"),
        explode(sequence(lit(0), org.apache.spark.sql.functions.size(col("ws")) - k)).as("i"), col("ws"))
      .select(col("doc_id"),
        xxhash64(concat_ws(" ", slice(col("ws"), col("i") + 1, lit(k)))).as("s"))
    val aggs = (0 until num).map(i => min(xxhash64(col("s"), lit(i))).as(s"h$i"))
    val oracle = shRows.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to num).map(r.getLong)).toMap
    native.keySet shouldBe oracle.keySet
    native.foreach { case (id, mh) => mh shouldBe oracle(id) }
  }

  "simhash_sig" should "match the Column-form simHash on every document" in {
    val native = docs.select(col("doc_id"),
      TextHashExprs.simHashSigCol(
        Dedup.tokens(coalesce(col("text"), lit("")))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val oracle = docs.select(col("doc_id"), Dedup.simHash(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    native shouldBe oracle
    native(6L) shouldBe 0L // token-less → 0
  }

  it should "survive the interpreted (non-codegen) eval path too" in {
    // force interpreted eval by calling nullSafeEval directly
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val arr = ArrayData.toArrayData(
      Array("alpha", "beta", "gamma", "alpha").map(UTF8String.fromString))
    val sh = TextHashExprs.shingleHashes(arr, 2)
    sh.numElements() shouldBe 3 // (alpha beta)(beta gamma)(gamma alpha)
    val mh = TextHashExprs.minHashFromHashes(sh, 8)
    mh.numElements() shouldBe 8
    TextHashExprs.minHashFromHashes(
      ArrayData.toArrayData(Array.emptyLongArray), 8) shouldBe null
    val sig = TextHashExprs.simHashSig(arr)
    sig shouldBe TextHashExprs.simHashSig(arr) // deterministic
  }
}
