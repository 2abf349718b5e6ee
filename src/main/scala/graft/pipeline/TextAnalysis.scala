package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis signals for training-data curation: token counting,
  * quality scoring, language ID (marker-word heuristic), and document
  * fingerprinting. All native column expressions — each signal is a
  * map-only pass that fuses into whatever scan produces the text. */
object TextAnalysis {

  /** Whitespace token count. Native single-pass stats — no token
    * array materialized (round-19); NULL text ⇒ NULL count as before. */
  def tokenCount(text: Column): Column =
    graft.functions.TextStatsExprs.tokenStatsCol(text).getField("ntok")

  /** BPE-ish subword count: alphabetic runs, single digits, and single
    * non-alphanumeric marks each count as one token (the classic
    * pre-tokenizer upper bound on BPE length). For REAL merge-table
    * subword accounting use [[bpeTokenCount]]. */
  def bpeishTokenCount(text: Column): Column =
    size(call_function("regexp_extract_all", text,
      lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0))).cast(LongType)

  /** Real subword tokens under a trained BPE merge table
    * ([[graft.functions.Bpe]]): one native codegen'd pass per document,
    * fuses into the scan. Default model = the committed sf0.01-trained
    * vocabulary; train a corpus-specific one with
    * [[graft.functions.Bpe.train]]. */
  def bpeTokens(text: Column,
      model: graft.functions.BpeModel = graft.functions.Bpe.committed): Column =
    graft.functions.BpeExprs.bpeTokensCol(text, model)

  /** BPE subword token count — the unit a training run actually
    * consumes (whitespace counts misprice token budgets 1.3–2×).
    * Array-free native expression; plug the resulting column into
    * [[Sampling.tokenBudgetSample]] / [[Packing.packSequences]] /
    * [[Curation.corpusReport]] wherever a token count is taken. */
  def bpeTokenCount(text: Column,
      model: graft.functions.BpeModel = graft.functions.Bpe.committed): Column =
    graft.functions.BpeExprs.bpeTokenCountCol(text, model)

  /** Fraction of tokens that are (English) stopwords. Native
    * single-pass token stats (round-19: the previous form counted
    * stopwords through an interpreted higher-order `filter` lambda and
    * rebuilt the token array per signal); NULL semantics unchanged —
    * the struct is NULL for NULL text, so the ratio stays NULL. */
  def stopwordRatio(text: Column): Column = {
    val st = graft.functions.TextStatsExprs.tokenStatsCol(text)
    when(st.getField("ntok") === 0L, lit(0.0))
      .otherwise(st.getField("nstop").cast(DoubleType) /
        st.getField("ntok").cast(DoubleType))
  }

  /** Mean token length (same single-pass token stats; the previous
    * form folded lengths through an interpreted `aggregate` lambda). */
  def avgWordLen(text: Column): Column = {
    val st = graft.functions.TextStatsExprs.tokenStatsCol(text)
    when(st.getField("ntok") === 0L, lit(0.0))
      .otherwise(st.getField("sumlen").cast(DoubleType) /
        st.getField("ntok").cast(DoubleType))
  }

  /** Fraction of non-alphanumeric, non-space characters. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise((length(text) -
        length(regexp_replace(text, "[^A-Za-z0-9\\s]", ""))).cast(DoubleType) /
        length(text).cast(DoubleType))

  /** Composite quality score in [0,1]: rewards mid-length documents
    * with low punctuation noise and a natural stopword rate. ONE
    * native codegen'd pass per document (round-19; formula, rounding
    * and the NULL⇒0.7 least()-skips-null contract replicated exactly —
    * [[graft.functions.TextStatsExprs.ruleQuality]]). */
  def qualityScore(text: Column): Column =
    graft.functions.TextStatsExprs.ruleQualityCol(text)

  /** Marker-word language ID: deterministic rule, mirrored exactly by
    * the DuckDB oracle in the battery. ONE native codegen'd pass per
    * document (round-19; branch order and the NULL⇒"und" contract
    * replicated exactly). */
  def langId(text: Column): Column =
    graft.functions.TextStatsExprs.markerLangIdCol(text)

  /** Cavnar–Trenkle n-gram language ID — the production-grade
    * sibling of [[langId]]: character 1–3-gram profiles cover the
    * CJK/Arabic/Cyrillic/Greek script classes a stopword list cannot
    * see. Map-only codegen'd expression; profiles committed and
    * oracle-replayable ([[graft.functions.LangIdExprs]]). */
  def langIdCt(text: Column): Column =
    graft.functions.LangIdExprs.langIdCtCol(text)

  /** [[langIdCt]] with the gate's evidence attached: struct
    * `(lang, best_dist, second_dist, k)` — route on margin instead of
    * trusting the label blindly. */
  def langIdCtScored(text: Column): Column =
    graft.functions.LangIdExprs.langIdCtScoreCol(text)

  /** Gopher-style repetition/layout quality signals (Rae et al.,
    * arXiv:2112.11446 §A1.1) as ONE native codegen'd expression call:
    * struct {n_lines, dup_line_frac, dup_line_char_frac,
    * bullet_line_frac, ellipsis_line_frac, top_token_frac,
    * top_bigram_char_frac}. One generated pass per document — fuses
    * into the scan, no exploded line/token rows, no interpreted array
    * lambdas. Signal definitions: [[graft.functions.RepetitionExprs]]. */
  def repetitionStats(text: Column): Column =
    graft.functions.RepetitionExprs.repetitionStatsCol(text)

  /** Canonical content fingerprint: md5 of the normalized text
    * (lowercased, whitespace collapsed) — the exact-dedup key. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Rolling-hash window fingerprints (Rabin–Karp style) for partial-
    * overlap detection: hash of every `window`-token run, sampled to
    * the numerically smallest `keep` DISTINCT hashes (winnowing-lite).
    * The window hashes come from the native shingle expression — the
    * whole computation is map-only generated code (the previous
    * `transform(sequence…)` form was an interpreted per-row lambda). */
  def rollingFingerprints(text: Column, window: Int = 8, keep: Int = 4): Column = {
    val ts = Dedup.tokens(text)
    val hs = when(size(ts) >= window,
      graft.functions.TextHashExprs.shingleHashesCol(ts, window))
      .otherwise(array(xxhash64(concat_ws(" ", ts))))
    slice(array_sort(hs), 1, keep)
  }

  /** Portable variant of [[rollingFingerprints]]: the `keep` smallest
    * DISTINCT 32-bit md5-prefix window hashes, replayable bit-for-bit
    * in any SQL engine (same trick as [[Sampling.portableBucket]] —
    * DuckDB: `('0x' || substr(md5(win), 1, 8))::BIGINT`). Runs as ONE
    * native codegen'd expression per row ([[graft.functions
    * .TextHashExprs.portableFingerprints]]): building window strings
    * with an interpreted `transform` lambda and hashing them with the
    * md5/conv/cast expression tree measured ~8× slower at sf0.1 —
    * per-element interpreted dispatch, not md5, was the cost. */
  def portableRollingFingerprints(text: Column, window: Int = 8,
                                  keep: Int = 4): Column =
    graft.functions.TextHashExprs.portableFingerprintsCol(
      Dedup.tokens(text), window, keep)

  /** Context-window chunking: split each document into
    * `chunkTokens`-token chunks overlapping by `overlap` tokens (stride
    * = chunkTokens − overlap) — the training-prep step that turns
    * documents into model-sized sequences. Chunk `j` starts at token
    * `j*stride + 1`; chunks are emitted while the start is ≤
    * max(1, n − overlap), so every token is covered, the final chunk
    * ends at the document's last token, and no chunk is fully contained
    * in its predecessor. Zero-token documents yield no chunks.
    *
    * Output: `(id, chunk_idx, chunk_text, n_tokens)`. Map-only
    * (tokenize → per-row index explode → slice): chunking fuses into
    * the scan and shuffles nothing.
    *
    * `tokenizer` picks the accounting unit: whitespace tokens by
    * default, or [[bpeTokens]] for model-true subword chunks (then
    * `chunk_text` is the subword tokens joined by single spaces). */
  def chunkTable(df: org.apache.spark.sql.DataFrame, idCol: String,
                 textCol: String, chunkTokens: Int = 512,
                 overlap: Int = 64,
                 tokenizer: Column => Column = Dedup.tokens)
      : org.apache.spark.sql.DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens=$chunkTokens must be >= 1")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap=$overlap must be in [0, chunkTokens)")
    val stride = chunkTokens - overlap
    val ts = tokenizer(col(textCol))
    df.select(col(idCol), ts.as("__ts"), size(ts).as("__n"))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__ts"), col("__n"),
        posexplode(sequence(lit(0),
          floor((greatest(lit(1), col("__n") - overlap) - 1) / stride)
            .cast("int"))).as(Seq("__p", "j")))
      .select(col(idCol), col("j").cast("long").as("chunk_idx"),
        concat_ws(" ",
          slice(col("__ts"), col("j") * stride + 1, lit(chunkTokens)))
          .as("chunk_text"),
        least(lit(chunkTokens), col("__n") - col("j") * stride)
          .cast("long").as("n_tokens"))
  }

  /** Corpus-scale portable fingerprinting: (id, fp) rows — the
    * exploded form of [[portableRollingFingerprints]]. Map-only: the
    * signature fuses into the scan, no shuffle anywhere; NULL-text
    * rows yield no fingerprints (nothing to overlap on). */
  def portableRollingFingerprintTable(df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String,
      window: Int = 8, keep: Int = 4): org.apache.spark.sql.DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(col(idCol),
        explode(portableRollingFingerprints(col(textCol), window, keep))
          .as("fp"))

  /** Statistical quality score: per-document mean log-probability
    * under a corpus-trained add-α bigram language model — the CCNet
    * shape (Wenzek et al., LREC '20: perplexity under a corpus LM
    * separates fluent text from boilerplate/noise far better than any
    * single heuristic; here the LM is the corpus's own bigram stats
    * rather than an external model, so the pipeline is closed and the
    * score exactly replayable). Higher (closer to 0) = more typical
    * text. P(w2|w1) = (C(w1,w2) + α) / (C(w1) + α·V) with V the
    * corpus vocabulary size. Output `(id, n_bigrams, avg_logprob)`
    * (6-dp rounded — libm-ln/summation-order differences between
    * engines are unobservable at 6 dp); documents with fewer than two
    * tokens carry no bigrams and are absent.
    *
    * Scale shape: the bigram stream is exploded once and
    * checkpoint-free — Spark reuses the hashpartitioning(w1, w2)
    * exchange between the count aggregation and the stats join, so
    * the count and the join-back cost ONE shuffle of the stream, the
    * context-count join shuffles on w1, and the per-document rollup
    * is the final aggregation. V broadcasts as a single row. A
    * mega-hot bigram ("of the") is one row in the count table — join
    * fan-out, no skewed build side; AQE splits any skewed partition. */
  def bigramLogProbTable(df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String,
      alpha: Double = 0.1): org.apache.spark.sql.DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val ts = Dedup.tokens(col(textCol))
    val toks = df.filter(col(textCol).isNotNull)
      .select(col(idCol), ts.as("__ts"))
    // native adjacent-pair expression (round-19): the transform(
    // sequence…) form built each pair through an interpreted
    // per-element lambda — same rows, one generated call per doc
    val bigrams = toks
      .filter(size(col("__ts")) >= 2)
      .select(col(idCol), explode(
        graft.functions.TextStatsExprs.tokenPairsCol(col("__ts"))).as("__b"))
      .select(col(idCol), col("__b.w1").as("w1"), col("__b.w2").as("w2"))
    val bigramCounts = bigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("__c12"))
    // context count c1 = Σ_{w2} c12 — derived from the bigram-count
    // table instead of a second full explode+shuffle of the corpus
    // (round-19: the previous form re-exploded every bigram and
    // shuffled the full stream by w1; this window-sums only the
    // DISTINCT bigram counts — integer-identical result, two fewer
    // full-data passes, same exchange ceiling). Both count columns
    // then ride ONE join of the exploded stream on (w1, w2).
    val counts = bigramCounts.withColumn("__c1",
      sum(col("__c12")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("w1"))))
    val vocab = toks.select(explode(col("__ts")).as("__w"))
      .agg(countDistinct(col("__w")).as("__v"))
    bigrams
      .join(counts, Seq("w1", "w2"))
      .crossJoin(broadcast(vocab))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log((col("__c12") + alpha) /
          (col("__c1") + lit(alpha) * col("__v")))), 6).as("avg_logprob"))
  }
}
