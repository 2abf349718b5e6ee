package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.RowOrdering
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-data deduplication operators, all bucketed — no all-pairs
  * comparison anywhere, so every candidate generation step is a
  * hash-partitioned shuffle that scales linearly with input (the only
  * quadratic work is WITHIN a bucket, which LSH keeps tiny).
  *
  * Family (per the 100 TB pipeline requirements):
  *  - [[exact]]            hash-groupBy exact dedup (single shuffle)
  *  - [[minHashCandidates]] MinHash + banded LSH near-dup pairs
  *  - [[simHash64]] / [[simHashCandidates]] SimHash + pigeonhole buckets
  *  - [[jaccard]]          n-gram Jaccard verification expression
  *  - [[embeddingCandidates]] random-hyperplane LSH over embeddings
  *    with exact cosine verification of in-bucket candidates
  *  - [[repeatedSpanStats]] cross-document repeated-span fractions
  *    (window-level substring dedup signal)
  *  - [[removeRepeatedSpans]] the rewrite form: cut every
  *    cross-document duplicated span out of every document
  *  - [[removeRepeatedSpansAgainst]] / [[spanInventoryTable]] /
  *    [[foldSpanInventory]] the incremental form: cut batch spans
  *    already present in a persisted corpus inventory
  *  - [[topSharedSpans]] / [[spanBankSet]] / [[removeSpansWithBank]]
  *    the curated-bank workflow: mine the most-shared boilerplate
  *    spans, review, cut statelessly (batch or streaming)
  */
object Dedup {

  /** Exact dedup: one surviving row per distinct `key`, the one with
    * the smallest `tieBreak` — remaining columns break tieBreak TIES
    * lexicographically, so the survivor is a pure function of the data
    * (min_by alone picks an aggregation-order-dependent row on ties,
    * which would break reproducible corpus builds). Single shuffle
    * (groupBy + struct min); no window, no sort of the full data. */
  def exact(df: DataFrame, key: String, tieBreak: String): DataFrame = {
    val unorderable = df.schema.fields
      .filterNot(f => RowOrdering.isOrderable(f.dataType)).map(_.name)
    require(unorderable.isEmpty,
      s"exact() compares whole rows, so every column must be orderable; " +
        s"map-typed columns are not: ${unorderable.mkString(", ")} — " +
        "drop or serialize them (e.g. to_json) first")
    val others = df.columns.filterNot(_ == key).toSeq
    val ordered = tieBreak +: others.filterNot(_ == tieBreak)
    // Struct ordering is NULLS FIRST; leading isNull field keeps rows
    // with a NULL tieBreak from always winning their key group.
    df.groupBy(col(key))
      .agg(min(struct(col(tieBreak).isNull.as("__tb_null") +:
        ordered.map(col): _*)).as("__rest"))
      .select(col(key) +: others.map(c => col(s"__rest.$c").as(c)): _*)
  }

  /** Whitespace word tokens, lowercased, empties removed. array_remove,
    * not a filter() lambda — higher-order-function lambdas are
    * interpreted per row, and tokenization is on every hot path. */
  def tokens(text: Column): Column =
    array_remove(split(lower(trim(text)), "\\s+"), "")

  /** Word k-shingles (k consecutive tokens joined by one space),
    * deduplicated. Shorter-than-k texts yield their whole token run. */
  def shingles(text: Column, k: Int = 3): Column = {
    val ws = tokens(text)
    array_distinct(
      when(size(ws) >= k,
        transform(sequence(lit(0), size(ws) - k),
          i => concat_ws(" ", slice(ws, i + 1, lit(k)))))
        .otherwise(array(concat_ws(" ", ws))))
  }

  /** MinHash signature: array<long> of length `numHashes` over the
    * shingle set. h_i(S) = min over shingles of
    * xxhash64(xxhash64(shingle), i) — independent seeded hashes
    * instead of affine permutations (which would overflow-multiply
    * under ANSI mode), chained through the shingle's OWN hash so the
    * values are IDENTICAL to [[minHashSignTable]]'s `mh` column: a
    * signature from this Column form bands/joins correctly against a
    * persisted signature table. (Interpreted higher-order fns — the
    * pipeline itself uses the codegen'd native expressions.) */
  def minHashSignature(shinglesCol: Column, numHashes: Int = 64): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), i =>
      array_min(transform(shinglesCol, s => xxhash64(xxhash64(s), i))))

  /** Exact n-gram Jaccard similarity between two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) === 0, lit(0.0))
      .otherwise(size(array_intersect(a, b)).cast(DoubleType) /
        size(array_union(a, b)).cast(DoubleType))

  /** Near-duplicate candidate pairs via banded MinHash-LSH, verified
    * with exact Jaccard. Output: (idA, idB, jaccard) with idA < idB and
    * jaccard >= threshold.
    *
    * Plan shape: shingle+sign (map-only) → explode bands (×bands) →
    * shuffle on (band, bucket) self-join → distinct pairs → one join
    * back for verification. Bucket width r = numHashes/bands controls
    * the S-curve; no all-pairs stage exists. */
  /** Drop (key…) buckets whose population exceeds `cap` via a broadcast
    * anti-join: the oversized-key list is at most rows(keyed)/cap
    * entries (n·bands/cap for banded inputs — size the cap so this
    * stays broadcastable), so the guard costs one small aggregate —
    * never a shuffle of the data. `cap <= 0` disables the guard.
    * A hot bucket makes the candidate self-join quadratic (cap² pairs
    * per bucket); at web scale the standard move is to drop such
    * mega-buckets from CANDIDATE generation — their members are either
    * trivial duplicates (catch them with [[exact]] first: identical
    * docs have identical fingerprints) or a degenerate shingle/plane
    * collision that verification would reject pair-by-pair anyway. */
  private[pipeline] def capBuckets(keyed: DataFrame, keys: Seq[String], cap: Int): DataFrame =
    if (cap <= 0) keyed
    else {
      val oversized = keyed.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__n")).filter(col("__n") > cap).drop("__n")
      keyed.join(broadcast(oversized), keys, "left_anti")
    }

  /** Persistable MinHash signature table `(id, sh, mh)` — MAP-ONLY:
    * one native expression computes the distinct shingle-hash set
    * in-row (the verification set), a second derives all minhash mins
    * from it; no explode, no aggregate, no shuffle. Texts shorter than
    * `shingleK` tokens are dropped (left to [[exact]] dedup). Sign a
    * corpus ONCE, persist this table, and every later re-banding,
    * re-thresholding or incremental batch
    * ([[minHashCandidatesAgainst]]) starts from it without re-reading
    * the text. */
  def minHashSignTable(df: DataFrame, idCol: String, textCol: String,
                       numHashes: Int = 64, shingleK: Int = 3,
                       keep: Seq[String] = Nil): DataFrame = {
    // `keep`: extra columns carried verbatim alongside (id, sh, mh) —
    // the streaming wrapper threads its event-time column through the
    // signing so the pair-collapse can watermark on it
    val kept = keep.map(col)
    df.select(col(idCol).as("id") +: tokens(col(textCol)).as("ws") +: kept: _*)
      .filter(size(col("ws")) >= shingleK)
      .select(col("id") +:
        graft.functions.TextHashExprs.shingleHashesCol(col("ws"), shingleK)
          .as("sh") +: kept: _*)
      .select(col("id") +: col("sh") +:
        graft.functions.TextHashExprs.minHashFromHashesCol(col("sh"), numHashes)
          .as("mh") +: kept: _*)
  }

  /** `(id, band, bucket)` banding rows of a signature table — one
    * murmur3 bucket per band over that band's slice of `mh`; only
    * these three small columns ride the candidate shuffle. */
  /** Per-band murmur3 bucket keys over the `mh` column, as an array. */
  private def bandKeyArray(numHashes: Int, bands: Int): Column = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    array((0 until bands).map { j =>
      hash(((j * r) until ((j + 1) * r)).map(i => col("mh")(i)) :+ lit(j): _*)
    }: _*)
  }

  /** Loud once-per-row signature-length check, as a FILTER (assert_true
    * returns NULL when the predicate holds, throws otherwise). Indexing
    * past a shorter persisted signature would yield NULLs that hash()
    * skips, silently collapsing those bands into one global bucket for
    * every document (all-pairs in the candidate join) — a numHashes
    * config mismatch must fail loudly. A filter evaluates ONCE per row;
    * wrapping the array expression itself would be re-inlined by
    * Catalyst into every one of the 64 index sites (measured 2×
    * slow-down). */
  private def requireSigLength(sigs: DataFrame, numHashes: Int): DataFrame =
    sigs.filter(assert_true(size(col("mh")) === numHashes, concat(
      lit("MinHash signature length "), size(col("mh")).cast("string"),
      lit(s" != numHashes = $numHashes — banding must match the " +
        "signature table's numHashes"))).isNull)

  private def minHashBands(sigs: DataFrame, numHashes: Int,
                           bands: Int): DataFrame =
    requireSigLength(sigs, numHashes).select(col("id"),
      posexplode(bandKeyArray(numHashes, bands)).as(Seq("band", "bucket")))

  def minHashCandidates(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 64, bands: Int = 16,
                        shingleK: Int = 3, threshold: Double = 0.5,
                        maxBucketSize: Int = 100000): DataFrame = {
    // lazily checkpointed because three join branches (banding + both
    // verification sides) consume the signature table
    val sigs = minHashSignTable(df, idCol, textCol, numHashes, shingleK)
      .localCheckpoint(eager = false)
    val base = sigs.select(col("id"), col("sh"))
    val banded = capBuckets(minHashBands(sigs, numHashes, bands),
      Seq("band", "bucket"), maxBucketSize)
    val pairs = banded.select(col("band"), col("bucket"), col("id").as("idA"))
      .join(banded.select(col("band"), col("bucket"), col("id").as("idB")),
        Seq("band", "bucket"))
      .filter(col("idA") < col("idB"))
      .select("idA", "idB")
      .dropDuplicates("idA", "idB")
    // verification join: fetch the two shingle sets per surviving pair
    pairs
      .join(base.select(col("id").as("idA"), col("sh").as("shA")), Seq("idA"))
      .join(base.select(col("id").as("idB"), col("sh").as("shB")), Seq("idB"))
      .withColumn("jaccard", jaccard(col("shA"), col("shB")))
      .filter(col("jaccard") >= threshold)
      .select(col("idA"), col("idB"), col("jaccard"))
  }

  /** Portable MinHash signature table `(id, sh, mh)` — same map-only
    * shape as [[minHashSignTable]], but every hash is replayable in any
    * SQL engine: shingle hashes are md5-prefix values
    * ([[graft.functions.TextHashExprs.portableFingerprints]]) and the
    * signature uses the affine family (a_i*x + b_i) mod 2^61-1 with
    * md5-derived coefficients ([[graft.functions.TextHashExprs.portableCoeffs]]).
    * ~3× the signing cost of the xxhash64 form (md5 per shingle) — use
    * it when an external engine must audit or re-derive the exact
    * candidate set (the DuckDB CORRECTNESS oracle does precisely that);
    * the xxhash64 form remains the throughput path. */
  def portableMinHashSignTable(df: DataFrame, idCol: String, textCol: String,
                               numHashes: Int = 32, shingleK: Int = 3): DataFrame =
    df.select(col(idCol).as("id"), tokens(col(textCol)).as("ws"))
      .filter(size(col("ws")) >= shingleK)
      .select(col("id"), graft.functions.TextHashExprs
        .portableFingerprintsCol(col("ws"), shingleK, Int.MaxValue).as("sh"))
      .select(col("id"), col("sh"), graft.functions.TextHashExprs
        .portableMinHashCol(col("sh"), numHashes).as("mh"))

  /** Per-band bucket keys for the portable path: the band's signature
    * slice verbatim as a ':'-joined string — no engine-specific hash
    * in the key, so an external engine reproduces the exact buckets. */
  private def portableBandKeyArray(numHashes: Int, bands: Int): Column = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    array((0 until bands).map { j =>
      concat_ws(":",
        ((j * r) until ((j + 1) * r)).map(i => col("mh")(i).cast(StringType)): _*)
    }: _*)
  }

  /** [[minHashCandidates]] with every hash portable/replayable —
    * identical plan shape (map-only sign → banded candidate join →
    * exact-Jaccard verify), different hash family. Output:
    * (idA, idB, jaccard) with idA < idB and jaccard >= threshold.
    *
    * @note `maxBucketSize` defaults to 0 (UNCAPPED) — a behavior
    *       change from the original capped default, made so external
    *       replays match bit-for-bit (see README "Behavior changes").
    *       Production corpora should pass an explicit cap: a hot
    *       bucket of boilerplate docs is O(n²) pairs uncapped. */
  def portableMinHashCandidates(df: DataFrame, idCol: String, textCol: String,
                                numHashes: Int = 32, bands: Int = 8,
                                shingleK: Int = 3, threshold: Double = 0.5,
                                maxBucketSize: Int = 0): DataFrame = {
    // default UNCAPPED: the portable form exists for exact external
    // replay, and a bucket cap silently drops pairs an uncapped
    // replayer would report — set a cap only if the replayer applies
    // the identical cap
    val sigs = portableMinHashSignTable(df, idCol, textCol, numHashes, shingleK)
      .localCheckpoint(eager = false)
    val base = sigs.select(col("id"), col("sh"))
    val banded = capBuckets(
      requireSigLength(sigs, numHashes).select(col("id"),
        posexplode(portableBandKeyArray(numHashes, bands)).as(Seq("band", "bucket"))),
      Seq("band", "bucket"), maxBucketSize)
    val pairs = banded.select(col("band"), col("bucket"), col("id").as("idA"))
      .join(banded.select(col("band"), col("bucket"), col("id").as("idB")),
        Seq("band", "bucket"))
      .filter(col("idA") < col("idB"))
      .select("idA", "idB")
      .dropDuplicates("idA", "idB")
    pairs
      .join(base.select(col("id").as("idA"), col("sh").as("shA")), Seq("idA"))
      .join(base.select(col("id").as("idB"), col("sh").as("shB")), Seq("idB"))
      .withColumn("jaccard", jaccard(col("shA"), col("shB")))
      .filter(col("jaccard") >= threshold)
      .select(col("idA"), col("idB"), col("jaccard"))
  }

  /** [[minHashCandidatesAgainst]] with every hash portable/replayable
    * — [[portableMinHashSignTable]] signatures on BOTH sides and band
    * keys that are the signature slices verbatim, so an external
    * engine re-derives each side's shingle hashes, affine signatures,
    * band buckets and every surviving pair's exact Jaccard (the
    * DuckDB CORRECTNESS oracle does precisely that). Identical plan
    * shape to the xxhash64 form: the corpus band rows are SEMI-JOINED
    * against the broadcast set of the batch's (band, bucket) keys
    * before any pair generation, so post-scan corpus work is
    * proportional to the batch. Output: (idNew, idCorpus, jaccard >=
    * threshold). `maxBucketSize` defaults to 0 (UNCAPPED) like the
    * other portable forms — a cap silently drops pairs an uncapped
    * replayer would report; production corpora pass an explicit cap
    * replayed identically. */
  def portableMinHashCandidatesAgainst(newSigs: DataFrame,
                                       corpusSigs: DataFrame,
                                       numHashes: Int = 32, bands: Int = 8,
                                       threshold: Double = 0.5,
                                       maxBucketSize: Int = 0): DataFrame = {
    def bandsOf(sigs: DataFrame) =
      requireSigLength(sigs, numHashes).select(col("id"),
        posexplode(portableBandKeyArray(numHashes, bands))
          .as(Seq("band", "bucket")))
    val nb = capBuckets(bandsOf(newSigs), Seq("band", "bucket"),
      maxBucketSize)
      .localCheckpoint(eager = false) // feeds the key set AND the pair join
    val keys = nb.select("band", "bucket").distinct()
    val cb = capBuckets(
      bandsOf(corpusSigs)
        .join(broadcast(keys), Seq("band", "bucket"), "left_semi"),
      Seq("band", "bucket"), maxBucketSize)
    val pairs = nb.select(col("band"), col("bucket"), col("id").as("idNew"))
      .join(cb.select(col("band"), col("bucket"), col("id").as("idCorpus")),
        Seq("band", "bucket"))
      .filter(col("idNew") =!= col("idCorpus"))
      .select("idNew", "idCorpus")
      .dropDuplicates("idNew", "idCorpus")
    pairs
      .join(newSigs.select(col("id").as("idNew"), col("sh").as("shA")),
        Seq("idNew"))
      .join(corpusSigs.select(col("id").as("idCorpus"), col("sh").as("shB")),
        Seq("idCorpus"))
      .withColumn("jaccard", jaccard(col("shA"), col("shB")))
      .filter(col("jaccard") >= threshold)
      .select(col("idNew"), col("idCorpus"), col("jaccard"))
  }

  /** Incremental dedup: near-duplicate pairs BETWEEN a (small) new
    * batch and an existing signed corpus — the operation a continuous
    * ingest pipeline actually runs. Both inputs are signature tables
    * from [[minHashSignTable]] (the corpus one persisted; it is never
    * re-signed and never self-joined). Output: (idNew, idCorpus,
    * jaccard >= threshold).
    *
    * Scale shape: the corpus band rows are SEMI-JOINED against the
    * broadcast set of the batch's (band, bucket) keys before any
    * pair generation, so the corpus-side work after the scan is
    * proportional to the batch's bucket population, not the corpus —
    * and a corpus bands table persisted partitioned/bucketed by
    * (band, bucket) turns even that scan into a pruned read. Within-
    * batch duplicates are NOT reported (run [[minHashCandidates]] on
    * the batch for those). */
  def minHashCandidatesAgainst(newSigs: DataFrame, corpusSigs: DataFrame,
                               numHashes: Int = 64, bands: Int = 16,
                               threshold: Double = 0.5,
                               maxBucketSize: Int = 100000): DataFrame = {
    val nb = capBuckets(minHashBands(newSigs, numHashes, bands),
      Seq("band", "bucket"), maxBucketSize)
      .localCheckpoint(eager = false) // feeds the key set AND the pair join
    val keys = nb.select("band", "bucket").distinct()
    // the corpus side is capped TOO (after the prune, so the count
    // aggregate only scans surviving rows): one hot corpus bucket — a
    // never-exact-deduped boilerplate cluster — would otherwise emit
    // |bucket| pairs per agreeing band and void the bound the cap
    // promises
    val cb = capBuckets(
      minHashBands(corpusSigs, numHashes, bands)
        .join(broadcast(keys), Seq("band", "bucket"), "left_semi"),
      Seq("band", "bucket"), maxBucketSize)
    val pairs = nb.select(col("band"), col("bucket"), col("id").as("idNew"))
      .join(cb.select(col("band"), col("bucket"), col("id").as("idCorpus")),
        Seq("band", "bucket"))
      .filter(col("idNew") =!= col("idCorpus"))
      .select("idNew", "idCorpus")
      .dropDuplicates("idNew", "idCorpus")
    pairs
      .join(newSigs.select(col("id").as("idNew"), col("sh").as("shA")),
        Seq("idNew"))
      .join(corpusSigs.select(col("id").as("idCorpus"), col("sh").as("shB")),
        Seq("idCorpus"))
      .withColumn("jaccard", jaccard(col("shA"), col("shB")))
      .filter(col("jaccard") >= threshold)
      .select(col("idNew"), col("idCorpus"), col("jaccard"))
  }

  /** STATELESS streaming variant of [[minHashCandidatesAgainst]]:
    * `newSigs` may be a STREAMING signature table (each micro-batch is
    * signed map-only — no aggregation state anywhere), stream-static-
    * joined against the persisted corpus bands. Differences from the
    * batch form, both forced by statelessness: no broadcast key-set
    * prune (a streaming key set cannot be collected — the per-batch
    * stream side is small, so the static side carries the join), and
    * no pair dedup, so a pair surfaces once per agreeing band (≤
    * `bands` times; callers with event time collapse duplicates with
    * `dropDuplicatesWithinWatermark("idNew", "idCorpus")`). The
    * verification shingle sets ride the band explode instead of
    * joining back — a per-pair join of two streaming frames would be a
    * stream-stream join needing watermarks. */
  private[graft] def minHashCandidatesAgainstStream(
      newSigs: DataFrame, corpusSigs: DataFrame, numHashes: Int = 64,
      bands: Int = 16, threshold: Double = 0.5,
      maxBucketSize: Int = 100000, keep: Seq[String] = Nil): DataFrame = {
    val kept = keep.map(col)
    val nb = requireSigLength(newSigs, numHashes)
      .select(col("id").as("idNew") +: col("sh").as("shA") +:
        posexplode(bandKeyArray(numHashes, bands)).as(Seq("band", "bucket")) +:
        kept: _*)
    // the corpus side is STATIC, so its hot buckets can (and must) be
    // capped like the batch path — a mega-bucket would otherwise fan
    // every matching micro-batch row into |bucket| pairs
    val cb = capBuckets(
      requireSigLength(corpusSigs, numHashes)
        .select(col("id").as("idCorpus"), col("sh").as("shB"),
          posexplode(bandKeyArray(numHashes, bands)).as(Seq("band", "bucket"))),
      Seq("band", "bucket"), maxBucketSize)
    nb.join(cb, Seq("band", "bucket"))
      .filter(col("idNew") =!= col("idCorpus"))
      .withColumn("jaccard", jaccard(col("shA"), col("shB")))
      .filter(col("jaccard") >= threshold)
      .select(col("idNew") +: col("idCorpus") +: col("jaccard") +: kept: _*)
  }

  /** Stream-safe [[simHashCandidatesAgainstSigs]]: the new side's
    * combination keys explode MAP-SIDE (no checkpoint, no state) and
    * stream-static-join the capped static corpus keys. A pair within
    * the radius surfaces once PER AGREEING COMBINATION KEY (up to
    * C(maxHamming+cleanChunks, cleanChunks) times) — stateless
    * streams cannot dedup pairs; collapse downstream with a
    * watermarked dropDuplicates or in foreachBatch, the
    * [[minHashCandidatesAgainstStream]] contract. */
  private[graft] def simHashCandidatesAgainstStream(
      newSigs: DataFrame, corpusSigs: DataFrame, maxHamming: Int = 6,
      cleanChunks: Int = 2, maxBucketSize: Int = 100000,
      keep: Seq[String] = Nil): DataFrame = {
    val kept = keep.map(col)
    val nk = simHashKeys(newSigs, maxHamming, cleanChunks)
      .select(col("k") +: col("id").as("idNew") +: col("sig").as("sigA") +:
        kept: _*)
    val ck = capBuckets(simHashKeys(corpusSigs, maxHamming, cleanChunks),
      Seq("k"), maxBucketSize)
      .select(col("k"), col("id").as("idCorpus"), col("sig").as("sigB"))
    nk.join(ck, Seq("k"))
      // self-pair exclusion is part of the *AgainstStream contract: an
      // at-least-once source can replay a row already in the corpus,
      // and (id, id, 0) would read as "duplicate of itself" downstream
      .filter(col("idNew") =!= col("idCorpus"))
      .withColumn("hamming", bit_count(col("sigA").bitwiseXOR(col("sigB"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("idNew") +: col("idCorpus") +: col("hamming") +: kept: _*)
  }

  /** 64-bit SimHash over word tokens (unit weights): bit b of the
    * signature is 1 iff the sum over tokens of ±1 (sign of that
    * token's hash bit b) is positive. */
  def simHash(text: Column): Column = {
    val hs = transform(tokens(text), w => xxhash64(w))
    aggregate(
      sequence(lit(0), lit(63)),
      lit(0L),
      (acc, b) => {
        val vote = aggregate(hs, lit(0L), (a, h) =>
          a + when(call_function("shiftrightunsigned", h, b)
            .bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
        acc + when(vote > 0, call_function("shiftleft", lit(1L), b)).otherwise(0L)
      })
  }

  /** SimHash signatures via one native scalar expression over the
    * in-row token array — same result as [[simHash]], MAP-ONLY: no
    * explode, no aggregate, no shuffle; the signature fuses into the
    * scan. NULL text coalesces to "" so every document keeps a row
    * (token-less → signature 0, matching the column form). */
  private def simHashSigs(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      graft.functions.TextHashExprs.simHashSigCol(
        tokens(coalesce(col(textCol), lit("")))).as("sig"))

  /** SimHash candidate pairs with a scale-safe banding scheme.
    *
    * Pigeonhole, generalized: split the 64-bit signature into
    * `m = maxHamming + cleanChunks` chunks — a pair within the Hamming
    * radius has at most `maxHamming` dirty chunks, hence agrees EXACTLY
    * on at least `cleanChunks` of them, so keying every
    * `cleanChunks`-combination of chunk values finds it with
    * certainty. Versus single-chunk banding (key width 64/m bits →
    * ≤2^16 buckets → O(n²/65k) candidate pairs, a cliff at billions of
    * docs) the combination key carries `cleanChunks·64/m` bits, so
    * bucket population stays bounded as n grows; an adversarial corpus
    * sharing ONE chunk no longer collapses into one bucket. Combo keys
    * are xxhash64-mixed to a long — hash collisions only add verify
    * work (bit_count filter), never lose recall. Emits C(m, cleanChunks)
    * keys per doc (10 at h=3, 28 at h=6).
    *
    * The pigeonhole guarantee holds UNLESS a combo bucket exceeds
    * `maxBucketSize` and is dropped from candidate generation (see
    * [[capBuckets]]) — run [[exact]] first so mega-clusters of
    * identical docs never reach this stage. */
  def simHashCandidates(df: DataFrame, idCol: String, textCol: String,
                        maxHamming: Int = 3, cleanChunks: Int = 2,
                        maxBucketSize: Int = 100000): DataFrame =
    simHashCandidatesFromSigs(simHashSigs(df, idCol, textCol),
      maxHamming, cleanChunks, maxBucketSize)

  /** Candidate stage over precomputed signatures `(id: any, sig: long)`
    * — at scale the signature table is computed once and persisted, so
    * re-banding with a different radius never re-reads the corpus. */
  /** `(id, sig, k)` combination-key rows of a signature table `(id,
    * sig)` — one xxhash64-mixed key per `cleanChunks`-combination of
    * chunk values (see [[simHashCandidatesFromSigs]] for why). */
  private def simHashKeys(sigs: DataFrame, maxHamming: Int,
                          cleanChunks: Int): DataFrame = {
    require(cleanChunks >= 1, "cleanChunks must be >= 1")
    val m = maxHamming + cleanChunks
    require(m <= 64, "maxHamming + cleanChunks must be <= 64")
    // chunk i covers bits [lo_i, lo_{i+1}); widths differ by ≤1 bit
    val lows = (0 to m).map(i => i * 64 / m)
    def chunkVal(i: Int): Column = {
      val width = lows(i + 1) - lows(i)
      val mask = if (width == 64) -1L else (1L << width) - 1L
      call_function("shiftrightunsigned", col("sig"), lit(lows(i)))
        .bitwiseAND(lit(mask))
    }
    val combos = (0 until m).combinations(cleanChunks).toSeq
    val keys = array(combos.zipWithIndex.map { case (combo, cid) =>
      xxhash64((lit(cid) +: combo.map(chunkVal)): _*)
    }: _*)
    // any extra input columns (e.g. a stream's event-time column)
    // ride along with the exploded keys
    val extra = sigs.columns.filterNot(Set("id", "sig")).map(col).toSeq
    sigs.select(col("id") +: col("sig") +: explode(keys).as("k") +: extra: _*)
  }

  /** [[simHashKeys]] with engine-neutral keys: the `cleanChunks`
    * chunk values ride the key VERBATIM (':'-joined, cid-prefixed)
    * instead of xxhash64-mixed, so an external SQL engine reproduces
    * the exact buckets. Key width is bounded (≤ cleanChunks·20 chars
    * for 13-bit chunks) — wider than a mixed long but still tiny
    * relative to the rows it keys. */
  private def portableSimHashKeys(sigs: DataFrame, maxHamming: Int,
                                  cleanChunks: Int): DataFrame = {
    require(cleanChunks >= 1, "cleanChunks must be >= 1")
    val m = maxHamming + cleanChunks
    require(m <= 64, "maxHamming + cleanChunks must be <= 64")
    val lows = (0 to m).map(i => i * 64 / m)
    def chunkVal(i: Int): Column = {
      val width = lows(i + 1) - lows(i)
      val mask = if (width == 64) -1L else (1L << width) - 1L
      call_function("shiftrightunsigned", col("sig"), lit(lows(i)))
        .bitwiseAND(lit(mask))
    }
    val combos = (0 until m).combinations(cleanChunks).toSeq
    val keys = array(combos.zipWithIndex.map { case (combo, cid) =>
      concat_ws(":",
        (lit(cid.toString) +: combo.map(i => chunkVal(i).cast(StringType))): _*)
    }: _*)
    sigs.select(col("id"), col("sig"), explode(keys).as("k"))
  }

  /** [[simHashCandidates]] with every hash portable/replayable:
    * md5-based token hashes ([[graft.functions.TextHashExprs.portableSimHash]])
    * and verbatim chunk-value bucket keys — identical pigeonhole
    * pipeline, reproducible bit-for-bit by an external SQL engine
    * (the DuckDB CORRECTNESS oracle re-derives every vote, bit,
    * bucket and Hamming distance). Output: (idA, idB, hamming).
    *
    * @note `maxBucketSize` defaults to 0 (UNCAPPED) for exact external
    *       replay — same caveat as [[portableMinHashCandidates]]:
    *       production corpora should pass an explicit cap. */
  def portableSimHashCandidates(df: DataFrame, idCol: String, textCol: String,
                                maxHamming: Int = 3, cleanChunks: Int = 2,
                                maxBucketSize: Int = 0): DataFrame = {
    // default UNCAPPED — same exact-replay contract as
    // [[portableMinHashCandidates]]
    val sigs = df.select(col(idCol).as("id"),
      graft.functions.TextHashExprs.portableSimHashCol(
        tokens(coalesce(col(textCol), lit("")))).as("sig"))
    val keyed = capBuckets(portableSimHashKeys(sigs, maxHamming, cleanChunks),
      Seq("k"), maxBucketSize)
    val l = keyed.select(col("k"), col("id").as("idA"), col("sig").as("sigA"))
    val r = keyed.select(col("k"), col("id").as("idB"), col("sig").as("sigB"))
    l.join(r, Seq("k"))
      .filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB"), col("sigA"), col("sigB"))
      .dropDuplicates("idA", "idB")
      .withColumn("hamming", bit_count(col("sigA").bitwiseXOR(col("sigB"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("idA"), col("idB"), col("hamming").cast(LongType).as("hamming"))
  }

  def simHashCandidatesFromSigs(sigs: DataFrame, maxHamming: Int = 3,
                                cleanChunks: Int = 2,
                                maxBucketSize: Int = 100000): DataFrame = {
    val keyed = capBuckets(simHashKeys(sigs, maxHamming, cleanChunks),
      Seq("k"), maxBucketSize)
    val l = keyed.select(col("k"), col("id").as("idA"), col("sig").as("sigA"))
    val r = keyed.select(col("k"), col("id").as("idB"), col("sig").as("sigB"))
    l.join(r, Seq("k"))
      .filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB"), col("sigA"), col("sigB"))
      .dropDuplicates("idA", "idB")
      .withColumn("hamming", bit_count(col("sigA").bitwiseXOR(col("sigB"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("idA"), col("idB"), col("hamming"))
  }

  /** Incremental SimHash dedup: pairs within the Hamming radius
    * BETWEEN a new batch and an existing signed corpus, both as
    * `(id, sig)` signature tables (corpus persisted — computing one is
    * map-only via the simhash_sig expression). Same semi-join shape as
    * [[minHashCandidatesAgainst]]: corpus key rows are pruned against
    * the broadcast batch key set before any pair generation, so
    * post-scan corpus work scales with the batch. */
  def simHashCandidatesAgainstSigs(newSigs: DataFrame, corpusSigs: DataFrame,
                                   maxHamming: Int = 3, cleanChunks: Int = 2,
                                   maxBucketSize: Int = 100000): DataFrame = {
    val nk = capBuckets(simHashKeys(newSigs, maxHamming, cleanChunks),
      Seq("k"), maxBucketSize)
      .localCheckpoint(eager = false) // feeds the key set AND the pair join
    val keys = nk.select("k").distinct()
    // corpus side capped too — see minHashCandidatesAgainst
    val ck = capBuckets(
      simHashKeys(corpusSigs, maxHamming, cleanChunks)
        .join(broadcast(keys), Seq("k"), "left_semi"),
      Seq("k"), maxBucketSize)
    nk.select(col("k"), col("id").as("idNew"), col("sig").as("sigA"))
      .join(ck.select(col("k"), col("id").as("idCorpus"), col("sig").as("sigB")),
        Seq("k"))
      .filter(col("idNew") =!= col("idCorpus"))
      .select(col("idNew"), col("idCorpus"), col("sigA"), col("sigB"))
      .dropDuplicates("idNew", "idCorpus")
      .withColumn("hamming", bit_count(col("sigA").bitwiseXOR(col("sigB"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("idNew"), col("idCorpus"), col("hamming"))
  }

  /** Persistable SimHash signature table `(id, sig)` — map-only. */
  def simHashSignTable(df: DataFrame, idCol: String,
                       textCol: String): DataFrame =
    simHashSigs(df, idCol, textCol)

  // ----- embedding-space near-dup -----
  /** Deterministic pseudo-random hyperplanes (seeded). */
  private[pipeline] def hyperplanes(numPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    require(numPlanes <= 64,
      s"RHP signature is a 64-bit word: at most 64 planes, got $numPlanes")
    val rnd = new scala.util.Random(7)
    (1 to numPlanes).map(_ => Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Codegen'd dot product (native Expression — higher-order-function
    * lambdas are interpreted per-row and were the measured bottleneck). */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExprs.dot(a, b)

  /** NULL (not NaN) for zero-norm vectors — NaN compares GREATER than
    * every double in Spark's total ordering, so it would pass >=
    * threshold filters and rank FIRST in descending top-k. Single
    * fused traversal (dot + both norms) in generated code. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExprs.cosine(a, b)

  /** Random-hyperplane LSH signature (one bit per plane) packed into a
    * long — vectors with high cosine land in the same bucket. Reads
    * array<float> natively; no per-row cast. */
  def rhpSignature(emb: Column, numPlanes: Int, dim: Int): Column =
    graft.functions.VectorExprs.rhpSignature(emb, hyperplanes(numPlanes, dim))

  /** Embedding near-dup candidate pairs: bucket on the RHP signature,
    * verify exact cosine within buckets. */
  def embeddingCandidates(df: DataFrame, idCol: String, embCol: String,
                          dim: Int, numPlanes: Int = 12,
                          threshold: Double = 0.9,
                          maxBucketSize: Int = 100000): DataFrame =
    embeddingCandidatesWith(df, idCol, embCol,
      hyperplanes(numPlanes, dim), threshold, maxBucketSize, roundCos = false)

  /** ±1 (Rademacher) hyperplanes derived from md5 bits: plane `p`
    * element `i` is +1 when the first md5 byte of "p:i" is odd, else
    * -1. Sign random projections preserve the cosine-LSH guarantee,
    * and the exact literal values inline into an external engine's SQL
    * — no float formatting, no precision loss. */
  def portableHyperplanes(numPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    require(numPlanes <= 64,
      s"RHP signature is a 64-bit word: at most 64 planes, got $numPlanes")
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until numPlanes).map { p =>
      (0 until dim).map { i =>
        val d = md.digest(s"$p:$i".getBytes("UTF-8"))
        if ((d(0) & 1) == 1) 1.0 else -1.0
      }
    }
  }

  /** The ±1 plane matrix as SQL list literals, for inlining into an
    * oracle query (one `[1.0, -1.0, ...]` literal per plane). */
  def portableHyperplaneLiterals(numPlanes: Int, dim: Int): Seq[String] =
    portableHyperplanes(numPlanes, dim).map(
      _.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ", ", "]"))

  /** [[embeddingCandidates]] with a fully replayable hash family: the
    * md5-derived ±1 planes of [[portableHyperplaneLiterals]], verbatim
    * signature buckets, exact-cosine verification, cosine rounded to 6
    * in the output — the embedding family's end-to-end hash-checked
    * form (dot products of ±1 planes with float vectors are exact in
    * double, so any engine reproduces the identical buckets). Same
    * plan shape as the gaussian form: map-only signature → bucket
    * self-join → cosine verify. */
  def portableEmbeddingCandidates(df: DataFrame, idCol: String,
                                  embCol: String, dim: Int,
                                  numPlanes: Int = 4,
                                  threshold: Double = 0.2,
                                  maxBucketSize: Int = 0): DataFrame =
    // default UNCAPPED — same exact-replay contract as
    // [[portableMinHashCandidates]]: a cap would silently drop pairs
    // an uncapped replayer reports
    embeddingCandidatesWith(df, idCol, embCol,
      portableHyperplanes(numPlanes, dim), threshold, maxBucketSize,
      roundCos = true)

  private def embeddingCandidatesWith(df: DataFrame, idCol: String,
                                      embCol: String,
                                      planes: Seq[Seq[Double]],
                                      threshold: Double, maxBucketSize: Int,
                                      roundCos: Boolean): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(embCol).as("emb"))
    val sigs = capBuckets(base.select(col("id"),
      graft.functions.VectorExprs.rhpSignature(col("emb"), planes).as("bucket")),
      Seq("bucket"), maxBucketSize)
      .localCheckpoint(eager = false) // both sides of the bucket join read it
    // candidate pairs carry ids only; vectors join back once per pair
    val pairs = sigs.select(col("bucket"), col("id").as("idA"))
      .join(sigs.select(col("bucket"), col("id").as("idB")), Seq("bucket"))
      .filter(col("idA") < col("idB"))
      .select("idA", "idB")
      .dropDuplicates("idA", "idB")
    pairs
      .join(base.select(col("id").as("idA"), col("emb").as("embA")), Seq("idA"))
      .join(base.select(col("id").as("idB"), col("emb").as("embB")), Seq("idB"))
      .withColumn("cos", cosine(col("embA"), col("embB")))
      .filter(col("cos") >= threshold)
      .select(col("idA"), col("idB"),
        (if (roundCos) round(col("cos"), 6) else col("cos")).as("cos"))
  }

  /** Persistable embedding signature table `(id, emb, bucket)` — the
    * embedding family's [[minHashSignTable]] analogue: sign a corpus
    * ONCE (map-only), persist, and every later incremental batch
    * ([[embeddingCandidatesAgainst]]) or stream
    * ([[graft.streaming.StreamingOps.embeddingNearDupStream]]) starts
    * from it. `portable = true` uses the md5-derived ±1 planes so any
    * engine re-derives every bucket. A table persisted partitioned by
    * `bucket` turns the incremental join's corpus scan into a pruned
    * read. */
  def embeddingSignTable(df: DataFrame, idCol: String, embCol: String,
                         dim: Int, numPlanes: Int = 12,
                         portable: Boolean = false): DataFrame =
    df.select(col(idCol).as("id"), col(embCol).as("emb"))
      .filter(col("emb").isNotNull)
      .withColumn("bucket", graft.functions.VectorExprs.rhpSignature(
        col("emb"),
        if (portable) portableHyperplanes(numPlanes, dim)
        else hyperplanes(numPlanes, dim)))

  /** Incremental embedding near-dup: a NEW batch's signatures
    * ([[embeddingSignTable]], same planes) against the persisted
    * corpus table — the embedding analogue of
    * [[minHashCandidatesAgainst]]. Output `(idNew, idCorpus, cos)`
    * for candidate pairs at cosine ≥ `threshold`; within-batch
    * duplicates are NOT reported (run [[embeddingCandidates]] on the
    * batch for those). `roundCos` rounds to 6 decimals for the
    * portable hash-checked form.
    *
    * Scale shape: corpus bucket rows are SEMI-JOINED against the
    * broadcast set of the batch's buckets before pair generation, so
    * post-scan corpus work scales with the batch; both sides' hot
    * buckets are capped like every LSH family. Each vector has ONE
    * bucket, so a pair can surface at most once — no dedup pass
    * needed (unlike the multi-band minhash form). */
  def embeddingCandidatesAgainst(newSigs: DataFrame, corpusSigs: DataFrame,
                                 threshold: Double = 0.9,
                                 maxBucketSize: Int = 100000,
                                 roundCos: Boolean = false): DataFrame = {
    val nb = capBuckets(
      newSigs.select(col("id").as("idNew"), col("emb").as("__embA"),
        col("bucket")),
      Seq("bucket"), maxBucketSize)
      .localCheckpoint(eager = false) // feeds the key set AND the pair join
    val keys = nb.select("bucket").distinct()
    val cb = capBuckets(
      corpusSigs.select(col("id").as("idCorpus"), col("emb").as("__embB"),
          col("bucket"))
        .join(broadcast(keys), Seq("bucket"), "left_semi"),
      Seq("bucket"), maxBucketSize)
    nb.join(cb, Seq("bucket"))
      .filter(col("idNew") =!= col("idCorpus"))
      .withColumn("cos", cosine(col("__embA"), col("__embB")))
      .filter(col("cos") >= threshold)
      .select(col("idNew"), col("idCorpus"),
        (if (roundCos) round(col("cos"), 6) else col("cos")).as("cos"))
  }

  /** Stream-safe [[embeddingCandidatesAgainst]]: the new side may be a
    * STREAMING signature table (signing is map-only — no state),
    * stream-static-joined against the capped persisted corpus. No
    * broadcast key-set prune (a streaming key set cannot be
    * collected — the per-batch stream side is small, so the static
    * side carries the join); pairs still surface at most once because
    * each vector has one bucket. */
  private[graft] def embeddingCandidatesAgainstStream(
      newSigs: DataFrame, corpusSigs: DataFrame, threshold: Double = 0.9,
      maxBucketSize: Int = 100000): DataFrame = {
    val nb = newSigs.select(col("id").as("idNew"), col("emb").as("__embA"),
      col("bucket"))
    val cb = capBuckets(
      corpusSigs.select(col("id").as("idCorpus"), col("emb").as("__embB"),
        col("bucket")),
      Seq("bucket"), maxBucketSize)
    nb.join(cb, Seq("bucket"))
      .filter(col("idNew") =!= col("idCorpus"))
      .withColumn("cos", cosine(col("__embA"), col("__embB")))
      .filter(col("cos") >= threshold)
      .select(col("idNew"), col("idCorpus"), col("cos"))
  }

  /** Cross-document repeated-span statistics — the corpus-level
    * duplicated-text signal (window-granularity form of the
    * suffix-array substring dedup of Lee et al., "Deduplicating
    * Training Data Makes Language Models Better", arXiv:2107.06499):
    * for each document, how much of it also appears verbatim elsewhere
    * in the corpus. A span is a `window`-token run; a span is REPEATED
    * when its hash occurs in at least `minDocs` distinct documents.
    * Output: `(id, n_windows, dup_windows, dup_frac)` counted over the
    * DISTINCT window hashes of each document. Documents shorter than
    * `window` tokens contribute their whole token run as one span;
    * NULL-text rows carry no spans and are absent from the output.
    *
    * Hashes are the portable md5-prefix window hashes of
    * [[Decontaminate.fingerprintTable]], so an external SQL engine
    * replays every count (and the rounded fraction) bit-for-bit.
    *
    * Scale shape: signing is one generated map-only pass fused into the
    * scan, checkpointed once because inventory and rollup both read it;
    * the shared-span inventory is ONE fp-keyed count (the signature
    * expression already dedups within a document, so `(id, fp)` rows
    * are globally distinct and a plain count — map-side partial, no
    * distinct pre-shuffle — counts documents); the back-join keys on fp
    * against one row per shared span (a mega-hot boilerplate span still
    * produces one output row per occurrence — AQE splits any skewed
    * partition), and the per-document rollup is the final aggregation.
    * No all-pairs stage anywhere: cost is linear in total windows. */
  def repeatedSpanStats(df: DataFrame, idCol: String, textCol: String,
                        window: Int = 8, minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2,
      s"minDocs=$minDocs must be >= 2 (every span occurs in its own document)")
    val fps = Decontaminate.fingerprintTable(df, idCol, textCol, window)
      .localCheckpoint(eager = false) // read twice: inventory + back-join
    val shared = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("__docs")) // (id, fp) distinct ⇒ count = docs
      .filter(col("__docs") >= minDocs)
      .select(col("fp"), lit(1).as("__dup"))
    fps.join(shared, Seq("fp"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_windows"),
        count(col("__dup")).as("dup_windows")) // count skips unmatched NULLs
      .withColumn("dup_frac",
        round(col("dup_windows").cast(DoubleType) /
          col("n_windows").cast(DoubleType), 6))
  }

  /** The corpus minus documents over-duplicated at the span level:
    * drops every document whose [[repeatedSpanStats]] `dup_frac`
    * exceeds `maxDupFrac`. NULL-text rows carry no spans and always
    * survive. The anti-join keys on `idCol` — the corpus is shuffled
    * once, against an already-reduced offender list. */
  def dropOverDuplicated(df: DataFrame, idCol: String, textCol: String,
                         maxDupFrac: Double, window: Int = 8,
                         minDocs: Int = 2): DataFrame = {
    val over = repeatedSpanStats(df, idCol, textCol, window, minDocs)
      .filter(col("dup_frac") > maxDupFrac)
      .select(col(idCol))
    df.join(over, Seq(idCol), "left_anti")
  }

  /** Cross-document duplicated-span REMOVAL — the rewrite form of
    * [[repeatedSpanStats]] (the ExactSubstr dedup of Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better",
    * arXiv:2107.06499, at window granularity): every token covered by
    * a `window`-token run whose hash occurs in at least `minDocs`
    * distinct documents is CUT from every document carrying it, and
    * the surviving tokens are rejoined. Output one row per input row:
    * `(id, text_clean, n_tokens, removed_tokens, n_spans)` where
    * `n_spans` counts the merged (overlapping/adjacent windows
    * coalesced) removed spans. Shorter-than-`window` documents are one
    * whole-run span — a short doc duplicated elsewhere empties out.
    * NULL-text rows pass through (`text_clean` NULL, zero counts).
    *
    * Granularity and normalization caveats, deliberate and documented
    * rather than hidden: (a) removal is window-resolution — a span is
    * cut from its first covering window's start to its last covering
    * window's end, so up to `window-1` tokens adjacent to a true
    * duplicated run go with it (Lee et al. §4.1 make the same
    * suffix-window over-approximation argument in reverse); (b)
    * `text_clean` is rebuilt from whitespace-split tokens joined by
    * single spaces — ORIGINAL case (tokenization boundaries are
    * case-insensitive: Unicode lowercasing never creates or destroys
    * whitespace, so the lowercased fingerprint tokens and the
    * original-case output tokens align position-for-position), but
    * whitespace shape is normalized, the same contract as every other
    * token-space rewrite here.
    *
    * Everything is portable: hashes are the positional md5-prefix
    * window hashes ([[graft.functions.TextHashExprs
    * .positionalFingerprints]]), interval merging is pure integer
    * arithmetic, and the battery oracle replays the whole rewrite —
    * windows, shared-hash inventory, island merge, surviving-token
    * reassembly — in SQL.
    *
    * Scale shape: signing is map-only fused into the scan,
    * checkpointed once (inventory + rewrite both read it); the
    * shared-hash inventory is one fp-keyed aggregation; the back-join
    * keys on fp against one row per shared hash; duplicated positions
    * roll up per document (sorted small arrays — a document carries at
    * most `n_tokens` positions); the rewrite itself is pure column
    * arithmetic over the position array, linear per document because
    * the constant window width makes interval ends monotonic (no
    * running max, no quadratic accumulate). No all-pairs stage; cost
    * is linear in total windows, like [[repeatedSpanStats]]. */
  def removeRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
                          window: Int = 8, minDocs: Int = 2): DataFrame = {
    require(window >= 1, s"window=$window must be >= 1")
    require(minDocs >= 2,
      s"minDocs=$minDocs must be >= 2 (every span occurs in its own document)")
    val base = spanBase(df, idCol, textCol, window)
      .localCheckpoint(eager = false) // read twice: inventory + rewrite
    val wins = spanWins(base, idCol)
    val shared = wins.groupBy(col("__fp"))
      .agg(countDistinct(col(idCol)).as("__docs"))
      .filter(col("__docs") >= minDocs)
      .select(col("__fp"))
    cutSpans(base, wins, shared, idCol, textCol, window)
  }

  /** `(id, text, __tso, __fps)` signing frame shared by the batch and
    * incremental span rewrites: original-case tokens for output
    * reassembly, positional lowercased window hashes for matching. */
  private def spanBase(df: DataFrame, idCol: String, textCol: String,
                       window: Int): DataFrame =
    df.select(col(idCol), col(textCol),
      array_remove(split(trim(col(textCol)), "\\s+"), "").as("__tso"),
      graft.functions.TextHashExprs
        .positionalFingerprintsCol(tokens(col(textCol)), window).as("__fps"))

  /** One `(id, __pos, __fp)` row per window of a [[spanBase]] frame. */
  private def spanWins(base: DataFrame, idCol: String): DataFrame =
    base.select(col(idCol), posexplode(col("__fps")).as(Seq("__pos", "__fp")))

  /** The rewrite core: join each document's duplicated window
    * positions (windows of `wins` whose `__fp` is in `shared`), merge
    * them into spans, and cut. Pure column arithmetic after one
    * fp-keyed join and one id-keyed rollup. */
  private def cutSpans(base: DataFrame, wins: DataFrame, shared: DataFrame,
                       idCol: String, textCol: String,
                       window: Int): DataFrame = {
    val dups = wins.join(shared.select(col("__fp")), Seq("__fp"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("__pos"))).as("__dups"))
    spanRewrite(base.join(dups, Seq(idCol), "left"), idCol, textCol, window)
  }

  /** Pure-column span cut over a frame carrying `(idCol, textCol,
    * __tso, __dups)` — `__dups` the ascending duplicated window starts
    * (NULL ⇒ none). No shuffle, no UDF; shared by the joining batch /
    * incremental forms and the stateless [[removeSpansWithBank]]
    * guard. */
  private def spanRewrite(joined: DataFrame, idCol: String,
                          textCol: String, window: Int): DataFrame = {
    val n = size(col("__tso"))
    val dp = coalesce(col("__dups"), array().cast("array<int>"))
    // Constant window width ⇒ window ends are monotonic in their
    // starts, so islands split exactly where the gap to the PREVIOUS
    // position exceeds the width — no running max needed.
    val ss = filter(dp, (p, i) =>
      (i === 0) || (p > element_at(dp, i) + window))
    val es = transform(
      filter(dp, (p, i) =>
        (i === size(dp) - 1) || (element_at(dp, i + 2) > p + window)),
      p => least(p + window, n) - 1)
    val m = size(ss)
    // Survivors are the gaps between spans: gap i runs from span
    // (i-1)'s end + 1 to span i's start - 1, with the document edges
    // as sentinels.
    val survived = flatten(transform(sequence(lit(0), m), i => {
      val gs = when(i === 0, lit(0)).otherwise(element_at(es, i) + 1)
      val ge = when(i === m, n - 1).otherwise(element_at(ss, i + 1) - 1)
      when(ge >= gs, slice(col("__tso"), gs + 1, ge - gs + 1))
        .otherwise(array().cast("array<string>"))
    }))
    joined.select(col(idCol),
      when(col(textCol).isNull, lit(null).cast(StringType))
        .otherwise(concat_ws(" ", survived)).as("text_clean"),
      coalesce(n.cast(LongType), lit(0L)).as("n_tokens"),
      coalesce((n - size(survived)).cast(LongType), lit(0L))
        .as("removed_tokens"),
      coalesce(m.cast(LongType), lit(0L)).as("n_spans"))
  }

  /** Persistable span-hash inventory of a corpus: one `(fp, docs)` row
    * per distinct window hash with the number of distinct documents
    * carrying it — the state [[removeRepeatedSpansAgainst]] matches
    * new batches against (the same persisted-signature pattern as
    * [[minHashSignTable]] / [[paragraphFpTable]]). ~12 bytes per
    * distinct window after the map-side partial aggregation; one
    * shuffle. */
  def spanInventoryTable(df: DataFrame, idCol: String, textCol: String,
                         window: Int = 8): DataFrame =
    spanWins(spanBase(df, idCol, textCol, window), idCol)
      .groupBy(col("__fp"))
      .agg(countDistinct(col(idCol)).as("docs"))
      .select(col("__fp").as("fp"), col("docs"))

  /** Merge a processed batch into a persisted span inventory —
    * read-back-and-union compaction, like [[foldParagraphFps]]: doc
    * counts sum per hash. Overwrite the store with the result (write
    * to a temp path first when overwriting in place). */
  def foldSpanInventory(corpusInv: DataFrame, batch: DataFrame,
                        idCol: String, textCol: String,
                        window: Int = 8): DataFrame =
    corpusInv.unionByName(spanInventoryTable(batch, idCol, textCol, window))
      .groupBy(col("fp")).agg(sum(col("docs")).as("docs"))

  /** Boilerplate miner: the `k` most-shared window spans of a corpus,
    * WITH exemplar text — `(fp, docs, span_text)` ordered by
    * distinct-document count descending. This is where a curated span
    * BANK comes from: mine → human-review → [[spanBankSet]] →
    * [[removeSpansWithBank]] / [[graft.streaming.StreamingOps
    * .spanCutStream]] (the C4 workflow: find the cookie banners and
    * license headers first, then cut them everywhere, including on
    * streams).
    *
    * Deterministic: ties in `docs` break by `fp` ascending; the
    * exemplar is the corpus-minimum `(id, pos)` occurrence, so the
    * emitted text is a pure function of the data (and lowercased —
    * window hashes are computed over lowercased tokens, and the
    * exemplar must render WHAT WAS HASHED, not one carrier's
    * casing).
    *
    * Scale shape: the inventory count never carries text (12-byte
    * rows); only the top-k hashes — k rows — join back, twice, each
    * time as a BROADCAST against the (id, pos, fp) window stream and
    * the token arrays, so the text of exactly k windows is ever
    * materialized. No sort of the full inventory: the top-k is a
    * TakeOrdered over the count table. */
  def topSharedSpans(df: DataFrame, idCol: String, textCol: String,
                     window: Int = 8, k: Int = 20,
                     minDocs: Int = 2): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(minDocs >= 2,
      s"minDocs=$minDocs must be >= 2 (every span occurs in its own document)")
    val base = spanBase(df, idCol, textCol, window)
      .localCheckpoint(eager = false) // read twice: inventory + exemplar
    val wins = spanWins(base, idCol)
    val top = wins.groupBy(col("__fp"))
      .agg(countDistinct(col(idCol)).as("docs"))
      .filter(col("docs") >= minDocs)
      .orderBy(col("docs").desc, col("__fp").asc)
      .limit(k)
    // corpus-minimum occurrence of each top hash → exemplar (id, pos)
    val exemplar = wins.join(broadcast(top.select(col("__fp"))), Seq("__fp"))
      .groupBy(col("__fp"))
      .agg(min(struct(col(idCol), col("__pos"))).as("__occ"))
      .select(col("__fp"), col(s"__occ.$idCol").as(idCol),
        col("__occ.__pos").as("__pos"))
    // render the window from the exemplar doc's LOWERCASED tokens
    // (what the hash was computed over); shorter-than-window docs are
    // one whole-run span
    val n = size(col("__ts"))
    val toks = base.select(col(idCol), tokens(col(textCol)).as("__ts"))
    toks.join(broadcast(exemplar.join(top, Seq("__fp"))), Seq(idCol))
      .select(col("__fp").as("fp"), col("docs"),
        concat_ws(" ",
          when(n >= window, slice(col("__ts"), col("__pos") + 1, lit(window)))
            .otherwise(col("__ts"))).as("span_text"))
      .orderBy(col("docs").desc, col("fp").asc) // k-row output sort
  }

  /** A span inventory as a driver-side sorted hash array — the
    * stateless-guard form for [[removeSpansWithBank]] and
    * [[graft.streaming.StreamingOps.spanCutStream]]. The collect is
    * bounded by the BANK size, the same small-side contract as
    * [[Decontaminate.benchFingerprintSet]]: this is for curated span
    * banks (license headers, cookie banners, navigation boilerplate —
    * the C4-style known-boilerplate cut), NOT a full-corpus inventory;
    * cutting against a corpus-sized inventory is the joining
    * [[removeRepeatedSpansAgainst]]'s job. */
  def spanBankSet(inv: DataFrame): Array[Long] =
    inv.select(col("fp")).distinct().collect().map(_.getLong(0)).sorted

  /** Stateless duplicated-span removal against a driver-built span
    * bank ([[spanBankSet]]): every window whose hash is in the bank is
    * cut, map-only — the bank rides into generated code as a sorted
    * array probed by binary search, so there is no join, no shuffle
    * and no state. Output schema matches [[removeRepeatedSpans]].
    * Safe under Structured Streaming (see
    * [[graft.streaming.StreamingOps.spanCutStream]]). */
  def removeSpansWithBank(df: DataFrame, idCol: String, textCol: String,
                          bank: Array[Long], window: Int = 8): DataFrame = {
    require(window >= 1, s"window=$window must be >= 1")
    val base = spanBase(df, idCol, textCol, window)
    val marked = base.withColumn("__dups",
      graft.functions.TextHashExprs
        .positionsInSortedSetCol(col("__fps"), bank))
    spanRewrite(marked, idCol, textCol, window)
  }

  /** Incremental duplicated-span removal: cut from each BATCH document
    * every window whose hash occurs in at least `minDocs` distinct
    * documents of batch ∪ corpus — the batch contributes its own
    * distinct-document count, the persisted inventory
    * ([[spanInventoryTable]]) its `docs` column (absent hash ⇒ 0),
    * and the two SUM per hash (batch ids are new by the incremental
    * contract, the same disjointness assumption as
    * [[dedupParagraphsAgainst]]) — so batch ∪ corpus sees exactly the
    * spans the batch rewrite would, at every `minDocs`, not just the
    * default 2. Output schema matches [[removeRepeatedSpans]].
    *
    * Scale shape: the batch signs map-only and checkpoints once; the
    * batch-internal inventory is one fp aggregation; the corpus
    * inventory contributes ONE fp-keyed left join carrying only its
    * 12-byte `(fp, docs)` rows — corpus text is never re-read;
    * rollup and rewrite as in the batch form. Cost is linear in batch
    * windows + matched inventory rows, independent of corpus size. */
  def removeRepeatedSpansAgainst(corpusInv: DataFrame, batch: DataFrame,
                                 idCol: String, textCol: String,
                                 window: Int = 8,
                                 minDocs: Int = 2): DataFrame = {
    require(window >= 1, s"window=$window must be >= 1")
    require(minDocs >= 2,
      s"minDocs=$minDocs must be >= 2 (every span occurs in its own document)")
    val base = spanBase(batch, idCol, textCol, window)
      .localCheckpoint(eager = false) // read twice: inventory + rewrite
    val wins = spanWins(base, idCol)
    val batchCounts = wins.groupBy(col("__fp"))
      .agg(countDistinct(col(idCol)).as("__bdocs"))
    val corpusCounts = corpusInv
      .select(col("fp").as("__fp"), col("docs").cast(LongType).as("__cdocs"))
    val shared = batchCounts.join(corpusCounts, Seq("__fp"), "left")
      .filter(col("__bdocs") + coalesce(col("__cdocs"), lit(0L)) >= minDocs)
      .select(col("__fp"))
    cutSpans(base, wins, shared, idCol, textCol, window)
  }

  /** Paragraph fingerprints WITHOUT text: one (`idCol`, `__pos`,
    * `__fp`) row per non-whitespace paragraph, the md5 computed
    * map-side so only ~44 bytes per paragraph ever leave the scan.
    * Shared by the batch and incremental paragraph dedups. */
  private def paragraphMeta(df: DataFrame, idCol: String, textCol: String,
                            splitRe: String): DataFrame =
    df.select(col(idCol), posexplode(split(col(textCol), splitRe))
        .as(Seq("__pos", "__para")))
      .filter(trim(col("__para")) =!= "")
      .select(col(idCol), col("__pos"),
        md5(col("__para").cast("binary")).as("__fp"))

  /** Paragraph occurrences that LOSE the first-occurrence election:
    * every (`idCol`, `__pos`) whose fingerprint's minimal (id, pos)
    * is some other occurrence. Unique paragraphs (the bulk of any
    * corpus) produce NO output — the frame is sized by the duplicate
    * fraction, not the corpus. */
  private def losingOccurrences(meta: DataFrame, idCol: String): DataFrame = {
    val winners = meta
      .groupBy(col("__fp"))
      .agg(min(struct(col(idCol).as("__wid"), col("__pos").as("__wpos")))
        .as("__w"))
    // meta feeds the election and this join on the SAME key, so the
    // exchange is planned once and reused; a mega-hot boilerplate
    // fingerprint skews one SMJ partition, which AQE's skew-join
    // split handles (unlike a window over __fp, which it cannot)
    meta.join(winners, Seq("__fp"))
      .filter(not(col(idCol) === col("__w.__wid") &&
        col("__pos") === col("__w.__wpos")))
      .select(col(idCol), col("__pos"))
  }

  /** Rewrite `textCol` by re-splitting it MAP-SIDE and keeping the
    * paragraphs that are non-whitespace and not in the row's
    * `__drop` position list; survivors re-join with `joinSep`,
    * all-lose and NULL-text documents become empty strings. */
  private def rebuildText(df: DataFrame, originalCols: Seq[String],
                          textCol: String, splitRe: String,
                          joinSep: String): DataFrame = {
    val noDrops = array().cast("array<int>")
    df.withColumn(textCol, coalesce(
        array_join(
          filter(split(col(textCol), splitRe), (p, i) =>
            trim(p) =!= "" &&
              !array_contains(coalesce(col("__drop"), noDrops), i)),
          joinSep),
        lit("")))
      .select(originalCols.map(col): _*) // original column order
  }

  /** Paragraph-level corpus dedup — the C4/RefinedWeb pass: every
    * distinct paragraph survives exactly ONCE in the whole corpus, at
    * its first occurrence in (`idCol`, position) order; later copies —
    * in other documents or later in the same one — are removed and the
    * survivors re-join with `joinSep`. Documents whose paragraphs all
    * lose become empty strings (kept — dropping rows is the caller's
    * curation decision). `idCol` must be unique per row and orderable;
    * `splitRe` splits (default: blank lines), whitespace-only
    * paragraphs are dropped outright.
    *
    * Scale shape: paragraph TEXT crosses NO shuffle on the happy
    * path. Only (id, pos, 128-bit md5) rows enter the election, the
    * losing occurrences reduce to one integer position list per
    * AFFECTED document, and that list joins back to the ORIGINAL rows
    * where the text is re-split and filtered map-side — so the
    * shuffled volume is sized by the duplicate fraction, never the
    * corpus. (When the affected-document list outgrows the broadcast
    * threshold, AQE plans the final join as a shuffle and text
    * crosses exactly once — still strictly less than the corpus-text
    * volume, and a fraction of the previous two-text-shuffle shape;
    * ParagraphShuffleSpec pins the measured bytes.) A 128-bit
    * collision (~2^-64 at corpus scale) would silently merge two
    * distinct paragraphs — the standard accepted risk of every
    * fingerprint dedup in production (same contract as [[exact]]'s
    * hash grouping discipline elsewhere in this file). */
  def dedupParagraphs(df: DataFrame, idCol: String, textCol: String,
                      splitRe: String = "\n{2,}",
                      joinSep: String = "\n\n"): DataFrame = {
    Seq("__pos", "__para", "__fp", "__drop").foreach(c =>
      require(!df.columns.contains(c),
        s"input already has a $c column — rename it first"))
    val meta = paragraphMeta(df, idCol, textCol, splitRe)
    val removed = losingOccurrences(meta, idCol)
      .groupBy(col(idCol))
      .agg(collect_list(col("__pos")).as("__drop"))
    rebuildText(df.join(removed, Seq(idCol), "left_outer"),
      df.columns.toSeq, textCol, splitRe, joinSep)
  }

  /** Persistable paragraph-fingerprint table for INCREMENTAL paragraph
    * dedup: one row per distinct paragraph fingerprint (`pfp`,
    * 128-bit md5 hex). Store it with the corpus; each new batch
    * dedups against it with [[dedupParagraphsAgainst]] and appends
    * the batch's own new fingerprints. */
  def paragraphFpTable(df: DataFrame, textCol: String,
                       splitRe: String = "\n{2,}"): DataFrame =
    df.select(explode(split(col(textCol), splitRe)).as("__para"))
      .filter(trim(col("__para")) =!= "")
      .select(md5(col("__para").cast("binary")).as("pfp"))
      .dropDuplicates()

  /** Compaction fold for the streaming paragraph dedup: merge a run's
    * SURVIVOR rows ([[graft.streaming.StreamingOps.paragraphDedupStream]]
    * output — `para` text per surviving paragraph) into the persisted
    * corpus fingerprint table. The widened table is what the restarted
    * query (fresh checkpoint) anti-joins against, so every paragraph
    * the previous run admitted is corpus state, not stream state —
    * this is how the stream's otherwise-unbounded fingerprint store is
    * periodically drained back to the table it extends. Fingerprints
    * are computed exactly as [[paragraphFpTable]] and the stream do
    * (md5 of the paragraph bytes), so a fold-then-replay run admits
    * nothing twice. One shuffle (the distinct); survivors-sized, not
    * corpus-sized, on the stream side. */
  def foldParagraphFps(corpusFps: DataFrame, survivors: DataFrame,
                       paraCol: String = "para"): DataFrame =
    corpusFps.select(col("pfp"))
      .unionByName(survivors
        .select(md5(col(paraCol).cast("binary")).as("pfp"))
        .filter(col("pfp").isNotNull))
      .dropDuplicates()

  /** Incremental [[dedupParagraphs]]: dedup a NEW batch against a
    * persisted corpus fingerprint table ([[paragraphFpTable]]) and
    * within itself. A batch paragraph survives iff its fingerprint is
    * absent from the corpus AND this is its first (id, pos) occurrence
    * within the batch. Work scales with the BATCH on its side; the
    * corpus side is one anti-join on fingerprints — the same
    * batch-not-corpus discipline as the incremental document dedups
    * above. Union `corpusFps` with `paragraphFpTable(batch)` after
    * accepting the batch to roll the corpus state forward. */
  def dedupParagraphsAgainst(corpusFps: DataFrame, batch: DataFrame,
                             idCol: String, textCol: String,
                             splitRe: String = "\n{2,}",
                             joinSep: String = "\n\n"): DataFrame = {
    Seq("__pos", "__para", "__fp", "__drop").foreach(c =>
      require(!batch.columns.contains(c),
        s"input already has a $c column — rename it first"))
    // same int-only-shuffle shape as dedupParagraphs: batch paragraph
    // text never enters a join — occurrences already in the corpus are
    // removals outright (semi-join on fingerprints), the remainder run
    // the within-batch election, and both removal sets reduce to one
    // position list per affected document before meeting the text
    val meta = paragraphMeta(batch, idCol, textCol, splitRe)
      .localCheckpoint(eager = false) // read twice: corpus semi + anti
    val corpusHits = meta
      .join(corpusFps.select(col("pfp").as("__fp")), Seq("__fp"), "left_semi")
      .select(col(idCol), col("__pos"))
    val fresh = meta
      .join(corpusFps.select(col("pfp").as("__fp")), Seq("__fp"), "left_anti")
    val removed = corpusHits.union(losingOccurrences(fresh, idCol))
      .groupBy(col(idCol))
      .agg(collect_list(col("__pos")).as("__drop"))
    rebuildText(batch.join(removed, Seq(idCol), "left_outer"),
      batch.columns.toSeq, textCol, splitRe, joinSep)
  }
}
