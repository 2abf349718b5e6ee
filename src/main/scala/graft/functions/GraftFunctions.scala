package graft.functions

import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** SQL registration of the native expression library, so `spark.sql`
  * strings (and any SQL-speaking client of a session) can call the
  * codegen'd text-hash / vector functions directly:
  *
  *   SELECT vec_cosine(a.embedding, b.embedding) FROM ...
  *   SELECT simhash_sig(tokens) FROM ...
  *
  * Two entry points, the standard pair for a Spark library:
  *  - config `spark.sql.extensions=graft.GraftExtensions` installs the
  *    functions into every session of the application at build time
  *    (the [[SparkSessionExtensions]] path);
  *  - [[GraftFunctions.register]] adds them to an already-running
  *    session.
  *
  * Only data-facing functions register here; the SPARQL-internal term
  * expressions (TermMath) stay internal — their semantics only make
  * sense on term structs produced by the compiler.
  */
object GraftFunctions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(getClass.getName, null, name, usage, "")

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Long, LongType) => v
    case Literal(v: Int, IntegerType) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def strLit(e: Expression, what: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, StringType) =>
      v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def arity(name: String, n: Int, args: Seq[Expression]): Unit =
    require(args.length == n,
      s"$name expects $n arguments, got ${args.length}")

  /** (name, usage, builder) for every public SQL function. */
  private val functions: Seq[(String, String, Seq[Expression] => Expression)] =
    Seq(
      ("vec_dot", "vec_dot(a, b) - dot product of two float/double arrays",
        { args => arity("vec_dot", 2, args)
          VectorExprs.DotProduct(args(0), args(1)) }),
      ("vec_cosine", "vec_cosine(a, b) - cosine similarity; NULL for zero norms",
        { args => arity("vec_cosine", 2, args)
          VectorExprs.CosineSim(args(0), args(1)) }),
      ("vec_l2_normalize",
        "vec_l2_normalize(v) - unit-norm copy; NULL for zero/non-finite norms",
        { args => arity("vec_l2_normalize", 1, args)
          VectorExprs.L2Normalize(args(0)) }),
      ("vec_quantize_int8",
        "vec_quantize_int8(v) - struct{scale, q tinyint[]}: scale = " +
          "max|v|/127, codes rounded half-away-from-zero",
        { args => arity("vec_quantize_int8", 1, args)
          VectorExprs.QuantizeInt8(args(0)) }),
      ("shingle_hashes",
        "shingle_hashes(tokens, k) - distinct xxhash64 values of k-token shingles",
        { args => arity("shingle_hashes", 2, args)
          TextHashExprs.ShingleHashesExpr(args(0), intLit(args(1), "k")) }),
      ("minhash_from_hashes",
        "minhash_from_hashes(hashes, n) - n-element MinHash vector over shingle hashes",
        { args => arity("minhash_from_hashes", 2, args)
          TextHashExprs.MinHashFromHashesExpr(args(0), intLit(args(1), "n")) }),
      ("simhash_sig",
        "simhash_sig(tokens) - 64-bit SimHash signature of a token array",
        { args => arity("simhash_sig", 1, args)
          TextHashExprs.SimHashSigExpr(args(0)) }),
      ("portable_fingerprints",
        "portable_fingerprints(tokens, k, keep) - keep smallest distinct " +
          "md5-prefix k-token window hashes (replayable in any SQL engine)",
        { args => arity("portable_fingerprints", 3, args)
          TextHashExprs.PortableFpExpr(args(0),
            intLit(args(1), "k"), intLit(args(2), "keep")) }),
      ("portable_minhash",
        "portable_minhash(hashes, n) - n-element MinHash vector over " +
          "portable_fingerprints hashes via (a*x+b) mod 2^61-1 " +
          "(md5-derived coefficients, replayable in any SQL engine)",
        { args => arity("portable_minhash", 2, args)
          TextHashExprs.PortableMinHashExpr(args(0), intLit(args(1), "n")) }),
      ("portable_simhash",
        "portable_simhash(tokens) - 64-bit SimHash signature over md5 " +
          "token hashes (replayable in any SQL engine)",
        { args => arity("portable_simhash", 1, args)
          TextHashExprs.PortableSimHashExpr(args(0)) }),
      ("repetition_stats",
        "repetition_stats(text) - struct of Gopher-style repetition/layout " +
          "quality signals (dup-line/top-token/top-bigram fractions, " +
          "bullet/ellipsis line shares)",
        { args => arity("repetition_stats", 1, args)
          RepetitionExprs.RepetitionStatsExpr(args(0)) }),
      ("kmv_distinct",
        "kmv_distinct(hash, k, space) - aggregate: KMV (bottom-k) " +
          "distinct-count sketch over an already-hashed LONG column; " +
          "returns struct(n_retained, kth_min, estimate). Replayable: " +
          "the state is the k smallest hashes",
        { args => arity("kmv_distinct", 3, args)
          SketchExprs.KmvSketch(args(0), intLit(args(1), "k"),
            longLit(args(2), "space")).toAggregateExpression() }),
      ("topk_freq",
        "topk_freq(item, weight, err, m) - aggregate: Space-Saving " +
          "heavy-hitter sketch over a STRING item column; returns " +
          "array<struct(item, count, err)> sorted by count desc " +
          "(count overestimates by at most err; exact while distinct " +
          "<= m). Pass weight=1, err=0 for raw data; stored counters " +
          "re-insert as (count, err) to merge persisted sketches",
        { args => arity("topk_freq", 4, args)
          SketchExprs.SpaceSavingTopK(args(0), args(1), args(2),
            intLit(args(3), "m")).toAggregateExpression() }),
      ("unicode_normalize",
        "unicode_normalize(text, form) - Unicode normalization; form is " +
          "a string literal NFC | NFD | NFKC | NFKD (NFC is " +
          "nfc_normalize-replayable in external engines; NFKC also " +
          "folds compatibility characters)",
        { args => arity("unicode_normalize", 2, args)
          TextCleanExprs.UnicodeNormalizeExpr(args(0),
            strLit(args(1), "form")) }),
      ("clean_text",
        "clean_text(text) - the standard corpus cleaning recipe: NFC, " +
          "line-ending normalization, control strip (keep \\n\\t), " +
          "space-run collapse, two-newline paragraph cap, trim",
        { args => arity("clean_text", 1, args)
          graft.pipeline.Scrub.cleanTextExpr(args(0)) }),
      ("strip_html",
        "strip_html(text) - C4-style regex HTML strip: script/style " +
          "with contents, comments, tags to spaces, the five dominant " +
          "entities unescaped (&amp; last)",
        { args => arity("strip_html", 1, args)
          graft.pipeline.Scrub.stripHtmlExpr(args(0)) }),
      ("canonicalize_url",
        "canonicalize_url(url) - dedup-key URL folding: fragment and " +
          "tracking params dropped, scheme+authority lowercased " +
          "(paths stay case-sensitive)",
        { args => arity("canonicalize_url", 1, args)
          graft.pipeline.Scrub.canonicalizeUrlExpr(args(0)) }),
      ("url_host",
        "url_host(url) - lowercased host component (authority minus " +
          "userinfo/port) - the per-domain cap / host-dedup key; '' " +
          "for non-URL strings",
        { args => arity("url_host", 1, args)
          graft.pipeline.Scrub.urlHostExpr(args(0)) }),
      ("fix_mojibake",
        "fix_mojibake(text) - repair UTF-8 text mis-decoded as " +
          "windows-1252 (possibly twice): cafÃ© -> café. Conservative: " +
          "only marker-bearing strings repair, and only when the " +
          "round-trip is lossless and strictly reduces markers",
        { args => arity("fix_mojibake", 1, args)
          TextCleanExprs.FixMojibakeExpr(args(0)) }),
      ("cm_sketch",
        "cm_sketch(item, weight, depth, width) - aggregate: Count-Min " +
          "frequency sketch over a STRING item column; returns the " +
          "depth*width cell array (row-major). Point estimate of an " +
          "item = min over rows r of cm[r*width + bucket_r(item)]; " +
          "merge persisted sketches by cellwise sum — exactly " +
          "reproducible in every regime",
        { args => arity("cm_sketch", 4, args)
          SketchExprs.CmSketch(args(0), args(1),
            intLit(args(2), "depth"),
            intLit(args(3), "width")).toAggregateExpression() }),
      ("bottomk_sample",
        "bottomk_sample(hash, value, k) - aggregate: deterministic " +
          "uniform k-sample (rows whose LONG hash of a unique row key " +
          "is smallest) carrying a DOUBLE measure; returns " +
          "array<struct(h, v)> sorted by hash — read quantiles off " +
          "the sorted measures",
        { args => arity("bottomk_sample", 3, args)
          SketchExprs.BottomKSample(args(0), args(1),
            intLit(args(2), "k")).toAggregateExpression() }),
      ("bpe_encode",
        "bpe_encode(text[, merges]) - subword tokens (array<string>) " +
          "via the committed BPE vocabulary, or a literal merge table " +
          "(one 'left right' pair per newline, rank order — " +
          "Bpe.renderMerges of a trained model). Pre-tokenizes like " +
          "the dedup shingler: trim, lowercase, split \\s+",
        { args =>
          require(args.length == 1 || args.length == 2,
            s"bpe_encode expects 1 or 2 arguments, got ${args.length}")
          val model = if (args.length == 2)
            Bpe.parseMerges(strLit(args(1), "merges"))
          else Bpe.committed
          BpeExprs.BpeEncodeExpr(args(0), model) }),
      ("bpe_count",
        "bpe_count(text[, merges]) - BPE token count (bigint) without " +
          "materializing the token array; same vocabulary resolution " +
          "as bpe_encode",
        { args =>
          require(args.length == 1 || args.length == 2,
            s"bpe_count expects 1 or 2 arguments, got ${args.length}")
          val model = if (args.length == 2)
            Bpe.parseMerges(strLit(args(1), "merges"))
          else Bpe.committed
          BpeExprs.BpeCountExpr(args(0), model) }),
      ("lang_id_ct",
        "lang_id_ct(text) - Cavnar-Trenkle n-gram language id over " +
          "the committed seed profiles (Latin/Cyrillic/Greek/Arabic/" +
          "CJK script classes); 'und' for empty input",
        { args => arity("lang_id_ct", 1, args)
          LangIdExprs.LangIdCtExpr(args(0)) }),
      ("lang_id_ct_score",
        "lang_id_ct_score(text) - lang_id_ct with the und gate's raw " +
          "evidence: struct(lang, best_dist, second_dist, k); route " +
          "on margin instead of trusting the label",
        { args => arity("lang_id_ct_score", 1, args)
          LangIdExprs.LangIdCtScoreExpr(args(0)) }),
      ("quality_model_score",
        "quality_model_score(text) - trained hashed-n-gram Naive Bayes " +
          "quality score under the committed seed model: struct(score, " +
          "n_grams); keep score > 0 (quality_score stays the rule-based " +
          "heuristic - this is the trained scorer beside it)",
        { args => arity("quality_model_score", 1, args)
          QualityExprs.QualityScoreExpr(args(0),
            QualityExprs.defaultWeights) }),
      ("quality_grams",
        "quality_grams(text) - hashed unigram+bigram feature buckets " +
          "(array<int>, with multiplicity) - the quality model's " +
          "training featurizer; explode + aggregate to train",
        { args => arity("quality_grams", 1, args)
          QualityExprs.GramBucketsExpr(args(0)) }),
      ("parse_ntriple",
        "parse_ntriple(line, permissive) - 0/1-element array of quad structs " +
          "from one N-Triples/N-Quads line; explode it (permissive: drop " +
          "malformed lines instead of erroring)",
        { args => arity("parse_ntriple", 2, args)
          val perm = args(1) match {
            case Literal(b: Boolean, _) => b
            case other => throw new IllegalArgumentException(
              s"permissive must be a boolean literal, got $other")
          }
          NtParse.ParseNTripleExpr(args(0), perm) })
    )

  /** Register every function into a running session (idempotent:
    * re-registration overwrites with identical definitions). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, usage, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info(name, usage), builder)
    }

  private[graft] def inject(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
}
