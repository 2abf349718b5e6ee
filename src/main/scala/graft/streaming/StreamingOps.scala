package graft.streaming

import graft.pipeline.{Dedup, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming variants of the pipeline operators.
  *
  * The reference is batch-only (SURVEY.md §2.9), so none of this is
  * parity surface — it is the streaming face of the training-data
  * pipeline: the same column expressions run incrementally with
  * watermarked state, so a 100 TB backfill and its live tail share one
  * code path (`readStream` in, `writeStream` out).
  */
object StreamingOps {

  /** Continuous N-Triples/N-Quads ingest: watch a directory for new
    * line-delimited RDF files and emit quads incrementally — the
    * streaming face of [[graft.io.QuadsIO.readNTriples]], same native
    * parse expression (stateless map-only, so it composes with any
    * downstream watermarked operator or writeStream sink). A 100 TB
    * backfill (batch readNTriples) and its live tail (this) share one
    * parse path. `skipMalformed` as in the batch reader. */
  def ntriplesStream(spark: org.apache.spark.sql.SparkSession, dir: String,
                     skipMalformed: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.explode
    spark.readStream.text(dir)
      .select(explode(graft.functions.NtParse
        .parseNTripleCol(col("value"), permissive = skipMalformed)).as("q"))
      .select(col("q.s").as("s"), col("q.p").as("p"),
        col("q.o").as("o"), col("q.g").as("g"))
  }

  /** Continuous whole-file RDF ingest: watch a directory for new
    * Turtle/TriG/RDF-XML/JSON-LD/TriX (or mixed) files and emit quads
    * incrementally — the streaming face of
    * [[graft.io.QuadsIO.readFiles]], same per-file extension dispatch
    * and native parse expression, one file per task. Stateless
    * map-only, so it composes with any downstream watermarked operator
    * or sink; a batch backfill via readFiles and its live tail share
    * one parse path. `skipMalformed` drops undecodable FILES (batch
    * semantics), not lines. */
  def rdfFilesStream(spark: org.apache.spark.sql.SparkSession, dir: String,
                     skipMalformed: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.explode
    import org.apache.spark.sql.types._
    // file-based streaming sources require an explicit schema; this is
    // BinaryFileFormat's fixed one
    val binaryFileSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    spark.readStream.format("binaryFile").schema(binaryFileSchema).load(dir)
      .select(explode(graft.functions.NtParse
        .parseRdfFileCol(col("path"), col("content"),
          permissive = skipMalformed)).as("q"))
      .select(col("q.s").as("s"), col("q.p").as("p"),
        col("q.o").as("o"), col("q.g").as("g"))
  }

  /** Streaming exact dedup on a content fingerprint. State is scoped
    * by the event-time watermark (dropDuplicatesWithinWatermark), so
    * the dedup map cannot grow without bound on an infinite stream.
    * NULL-text rows (fingerprint NULL — e.g. media-only documents)
    * pass through UN-deduped: dropDuplicates treats NULL keys as
    * equal, which would silently collapse all of them into one
    * surviving row per window; NULL content is not duplicate
    * content. */
  def dedupStream(docs: DataFrame, textCol: String, tsCol: String,
                  watermark: String = "1 hour"): DataFrame = {
    val fpd = docs
      .withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
    fpd.filter(col("fp").isNotNull)
      .dropDuplicatesWithinWatermark("fp")
      .unionByName(fpd.filter(col("fp").isNull))
  }

  /** Streaming NEAR-dup detection against a persisted signed corpus —
    * the streaming face of [[graft.pipeline.Dedup.minHashCandidatesAgainst]].
    * Each micro-batch of documents is signed MAP-ONLY (the scalar
    * signature expressions keep this stateless — no aggregation state
    * at all), banded, and stream-static-joined against the corpus
    * bands; pairs verify with exact Jaccard. Output rows are named
    * (idNew, idCorpus). With an event-time column (`tsCol`) the
    * multi-band duplicates COLLAPSE BY DEFAULT via a watermarked
    * dedup on the pair key; without one (or with
    * `collapsePairs=false`) a pair surfaces once PER AGREEING BAND
    * (up to `bands` times — stateless streams cannot dedup pairs), so
    * collapse in foreachBatch before counting matches. The corpus
    * signature table comes from
    * [[graft.pipeline.Dedup.minHashSignTable]], persisted once;
    * re-sign and swap it to pick up corpus growth. */
  def nearDupStream(docs: DataFrame, idCol: String, textCol: String,
                    corpusSigs: DataFrame, numHashes: Int = 64,
                    bands: Int = 16, shingleK: Int = 3,
                    threshold: Double = 0.5,
                    tsCol: Option[String] = None,
                    watermark: String = "1 hour",
                    collapsePairs: Boolean = true): DataFrame = {
    // default pair-collapse (round-11 hygiene item): given an
    // event-time column, the multi-band duplicates collapse HERE with
    // a watermarked dedup on (idNew, idCorpus) — each pair surfaces
    // exactly once per watermark window and the output carries the
    // event time. Opt out with collapsePairs=false (or no tsCol) to
    // get the raw once-per-agreeing-band contract above.
    val keep = tsCol.toSeq
    val signed = Dedup.minHashSignTable(
      tsCol.fold(docs)(t => docs.withWatermark(t, watermark)),
      idCol, textCol, numHashes, shingleK, keep)
    val pairs = Dedup.minHashCandidatesAgainstStream(
      signed, corpusSigs, numHashes, bands, threshold, keep = keep)
    if (tsCol.isDefined && collapsePairs)
      pairs.dropDuplicatesWithinWatermark("idNew", "idCorpus")
    else pairs
  }

  /** Streaming media near-dup against a persisted signed corpus —
    * the perceptual face of [[nearDupStream]]: each micro-batch of
    * media rows is signed MAP-SIDE with its kind's dHash
    * ([[graft.pipeline.Multimodal.mediaSignTable]] — a stateless UDF
    * projection; bytes never leave the batch), and the signatures
    * stream-static-join the corpus table per kind (an image hash and
    * an audio hash sharing bits is noise, not similarity). Output
    * rows are (kind, idNew, idCorpus, hamming). With an event-time
    * column (`tsCol`) the combination-key duplicates COLLAPSE BY
    * DEFAULT via a watermarked dedup on the pair key; without one
    * (or with `collapsePairs=false`) a pair surfaces once PER
    * AGREEING COMBINATION KEY (up to C(maxHamming+cleanChunks,
    * cleanChunks) times — stateless streams cannot dedup pairs), so
    * collapse in foreachBatch before counting, the [[nearDupStream]]
    * contract. The corpus table comes from
    * `Multimodal.mediaSignTable`, persisted once; re-sign and swap
    * to pick up corpus growth. */
  def mediaNearDupStream(media: DataFrame, corpusSigs: DataFrame,
                         maxHamming: Int = 6, cleanChunks: Int = 2,
                         maxBucketSize: Int = 100000,
                         tsCol: Option[String] = None,
                         watermark: String = "1 hour",
                         collapsePairs: Boolean = true): DataFrame = {
    // same default watermarked pair-collapse as [[nearDupStream]]:
    // with an event-time column, combination-key duplicates collapse
    // on (kind, idNew, idCorpus); opt out via collapsePairs=false
    val keep = tsCol.toSeq
    val pairs = graft.pipeline.Multimodal.perKindPairs(
      graft.pipeline.Multimodal.mediaSignTable(
        tsCol.fold(media)(t => media.withWatermark(t, watermark)), keep),
      corpusSigs,
      Dedup.simHashCandidatesAgainstStream(_, _, maxHamming, cleanChunks,
        maxBucketSize, keep),
      keep)
    if (tsCol.isDefined && collapsePairs)
      pairs.dropDuplicatesWithinWatermark("kind", "idNew", "idCorpus")
    else pairs
  }

  /** Streaming EMBEDDING near-dup guard — the vector modality's
    * [[nearDupStream]]: each micro-batch signs map-only (RHP bucket),
    * stream-static-joins the persisted corpus signature table
    * ([[graft.pipeline.Dedup.embeddingSignTable]], SAME dim/planes/
    * portable flag) and verifies exact cosine. Emits `(idNew,
    * idCorpus, cos)` once per pair (one bucket per vector — no
    * multi-band duplicates, so no watermark collapse needed).
    * Stateless: no aggregation, no stream-stream join. */
  def embeddingNearDupStream(vecs: DataFrame, idCol: String,
                             embCol: String, corpusSigs: DataFrame,
                             dim: Int, numPlanes: Int = 12,
                             threshold: Double = 0.9,
                             portable: Boolean = false): DataFrame =
    graft.pipeline.Dedup.embeddingCandidatesAgainstStream(
      graft.pipeline.Dedup.embeddingSignTable(
        vecs, idCol, embCol, dim, numPlanes, portable),
      corpusSigs, threshold)

  /** Streaming SEMANTIC near-dup guard — the SemDeDup modality's
    * [[nearDupStream]]: each micro-batch assigns to the FROZEN
    * centroid matrix and RHP-signs map-only
    * ([[graft.pipeline.Clustering.semanticSignTable]]), then
    * stream-static-joins the persisted corpus signature table (SAME
    * centroids/planes/portable flag) and verifies exact cosine
    * within the cluster. Emits `(idNew, idCorpus, cluster, cos)`
    * once per pair (one `(cluster, bucket)` key per vector — no
    * multi-band duplicates, so no watermark collapse needed).
    * Stateless: no aggregation, no stream-stream join. Centroids are
    * the frozen model — re-train, re-sign the corpus and restart the
    * stream to move clusters. Corpus GROWTH follows the same restart
    * discipline (the static side's file listing is fixed at plan
    * time): stop, fold the processed batches' signatures into the
    * corpus table, restart — per-step and cumulative output is
    * EXACTLY the repeated batch against-form
    * (SemanticIncrementalSpec's 3-batch differential). Drift of the
    * frozen model itself is measured by [[graft.SemanticDrift]]
    * (committed SEMANTIC_DRIFT artifacts): twin recall survives pure
    * mean shift; watch max_cluster_share for the re-train signal. */
  def semanticNearDupStream(vecs: DataFrame, idCol: String,
                            embCol: String, corpusSigs: DataFrame,
                            centroids: Seq[Seq[Double]],
                            numPlanes: Int = 8,
                            threshold: Double = 0.95,
                            portable: Boolean = false): DataFrame =
    graft.pipeline.Clustering.semanticCandidatesAgainstStream(
      graft.pipeline.Clustering.semanticSignTable(
        vecs, idCol, embCol, centroids, numPlanes, portable),
      corpusSigs, threshold)

  /** Streaming INCREMENTAL paragraph dedup — the streaming face of
    * [[graft.pipeline.Dedup.dedupParagraphsAgainst]]: each arriving
    * document splits into paragraphs, paragraphs the persisted corpus
    * already holds are dropped by a stream-static ANTI-join on
    * `corpusFps` (the [[graft.pipeline.Dedup.paragraphFpTable]]
    * history from before the stream started), and within the stream a
    * per-fingerprint boolean state suppresses every later copy — a
    * cross-micro-batch duplicate survives exactly once. Within one
    * micro-batch the winner is elected DETERMINISTICALLY as the
    * minimal (id, pos) occurrence, matching the batch operator's
    * first-occurrence ordering (so a batch backfill and the live tail
    * agree on which copy survives whenever arrival order respects id
    * order).
    *
    * Emits SURVIVING PARAGRAPH rows (`idCol`, `pos`, `para`) in
    * append mode — not reassembled documents: a document's paragraphs
    * can win in different micro-batches, so "the document's final
    * text" is only known at corpus compaction time; reassemble at the
    * sink (`groupBy(id)` over the stored paragraph rows — the batch
    * rebuild discipline) when document granularity is needed.
    *
    * Scale shape: paragraph text reaches the state shuffle but the
    * state itself stores NOTHING per key (presence of the fingerprint
    * key is the fact) — growth is one 16-byte binary digest key per
    * distinct paragraph, the same asymptote as the persisted
    * fingerprint table it extends (that table IS corpus state);
    * compact with [[graft.pipeline.Dedup.foldParagraphFps]] (fold the
    * stream's survivor rows into `corpusFps`, restart the query on
    * the widened table with a fresh checkpoint — replayed paragraphs
    * are then dropped by the anti-join before ever reaching state),
    * the same swap discipline as [[nearDupStream]]'s signature table.
    * CHECKPOINT COMPATIBILITY: the state key is the raw 16-byte
    * digest (BinaryType) since the round-13 hygiene pass — a query
    * checkpointed under the older 32-char hex-string key CANNOT
    * resume (Spark's state-schema validation rejects the key-type
    * change); migrate via the foldParagraphFps + fresh-checkpoint
    * path above, which is also the no-duplicate-output upgrade.
    * `idCol` must be an integral or string column (the id round-trips
    * through state in string form — the [[funnelStream]] contract);
    * rows with a NULL id are dropped — an id-less document cannot
    * claim first-occurrence identity. */
  def paragraphDedupStream(docs: DataFrame, idCol: String, textCol: String,
                           corpusFps: Option[DataFrame] = None,
                           splitRe: String = "\n{2,}"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.types._
    val spark = docs.sparkSession
    import spark.implicits._
    val idType = docs.schema(idCol).dataType
    val numericId = idType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case StringType => false
      case other => throw new IllegalArgumentException(
        s"paragraphDedupStream id `$idCol` has type ${other.simpleString}; " +
          "only integral/string ids round-trip exactly through " +
          "streaming state — cast or hash the id upstream")
    }
    // NULL-id rows are dropped LOUDLY-documented rather than crashed
    // on: an id-less document cannot claim first-occurrence identity
    // (the batch contract already requires a unique orderable id),
    // and a null inside the state operator's minBy would NPE and
    // kill the whole query on the first dirty row
    val meta = docs
      .filter(col(idCol).isNotNull)
      .select(col(idCol), posexplode(split(col(textCol), splitRe))
        .as(Seq("pos", "para")))
      .filter(trim(col("para")) =!= "")
      .withColumn("fp", md5(col("para").cast("binary")))
    val fresh = corpusFps.fold(meta)(c =>
      meta.join(c.select(col("pfp").as("fp")), Seq("fp"), "left_anti"))
    // the state key is the RAW 16-byte digest (unhex), not the 32-char
    // hex string the anti-join uses: at one key per distinct paragraph
    // forever, halving the key bytes halves the dominant term of the
    // store (round-11 hygiene item); UnsafeRow compares BinaryType
    // keys by content, so grouping semantics are unchanged
    val won = fresh
      .select(unhex(col("fp")).as("fpb"),
        col(idCol).cast("string").as("id"), col("pos"), col("para"))
      .as[(Array[Byte], String, Int, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (String, Int, String)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, occs, state) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            val w =
              if (numericId) occs.minBy(o => (o._2.toLong, o._3))
              else occs.minBy(o => (o._2, o._3))
            Iterator.single((w._2, w._3, w._4))
          }
      }
      .toDF("id", "pos", "para")
    won.select(col("id").cast(idType).as(idCol), col("pos"), col("para"))
  }

  /** Streaming decontamination: keep only stream rows sharing fewer
    * than `minHits` window hashes with a STATIC benchmark set — the
    * ingest-time guard of [[graft.pipeline.Decontaminate]]. The
    * benchmark fingerprints are collected ONCE driver-side into a
    * sorted array (bounded by the benchmark size — the batch path's
    * small-side broadcast contract) and ride into the stream as a
    * codegen reference, so the guard is a pure map-only filter: no
    * state, no watermark, no stream join, and the stream's own
    * fingerprints never leave their row. NULL-text rows carry no
    * fingerprints and always survive. */
  def decontaminateStream(docs: DataFrame, textCol: String,
                          bench: DataFrame, benchId: String,
                          benchText: String, window: Int = 8,
                          minHits: Int = 1): DataFrame = {
    val set = graft.pipeline.Decontaminate
      .benchFingerprintSet(bench, benchId, benchText, window)
    if (set.isEmpty) docs
    else docs.filter(
      coalesce(
        graft.functions.TextHashExprs.countInSortedSetCol(
          TextAnalysis.portableRollingFingerprints(
            col(textCol), window, Int.MaxValue), set),
        lit(0)) < minHits)
  }

  /** Streaming duplicated-span cut: rewrite each arriving document
    * with every window whose hash is in the driver-built span BANK
    * removed — map-only (the bank rides into generated code as a
    * sorted array, binary-searched per window), so it fuses into the
    * source scan with no stream join and no state. The bank is the
    * curated-boilerplate contract of [[graft.pipeline.Dedup
    * .spanBankSet]] (license headers, cookie banners — bounded),
    * not a full-corpus inventory. Output schema matches the batch
    * [[graft.pipeline.Dedup.removeRepeatedSpans]], so a fold-then-
    * replay run admits one oracle. */
  def spanCutStream(docs: DataFrame, idCol: String, textCol: String,
                    bank: Array[Long], window: Int = 8): DataFrame =
    graft.pipeline.Dedup.removeSpansWithBank(docs, idCol, textCol,
      bank, window)

  /** Streaming INCREMENTAL duplicated-span cut — the stream face of
    * [[graft.pipeline.Dedup.removeRepeatedSpansAgainst]], mirroring
    * [[paragraphDedupStream]]'s architecture: window hashes join
    * STREAM-STATIC against the persisted corpus inventory
    * ([[graft.pipeline.Dedup.spanInventoryTable]]), per-hash state
    * accumulates the distinct-document count seen on the stream so
    * far, and a second keyed pass reunites each document's verdicts
    * with its text and rewrites it (output schema matches the batch
    * form: `(id, text_clean, n_tokens, removed_tokens, n_spans)`).
    *
    * A window is cut when `batch-distinct-docs + stream-state-docs +
    * corpus-docs >= minDocs` AT THE DOCUMENT'S ARRIVAL — within one
    * micro-batch this is exactly the batch operator's union count
    * (StreamingSpanCutSpec pins single-batch parity); across batches
    * it is the same append-mode asymmetry as [[paragraphDedupStream]]:
    * an already-emitted document is never retro-cut when a later
    * batch pushes its span over the threshold (the later documents
    * ARE cut). Batch ids must be new to the stream and to the corpus
    * — the incremental contract of the batch form.
    *
    * Scale shape: signing is map-only; the inventory join carries
    * only the matched 12-byte `(fp, docs)` rows; state is one long
    * per distinct stream span hash; the reunite pass ships each
    * document's text ONCE (a single `pos = -1` row) plus its cut
    * positions — never per-window text amplification. Transient
    * per-group memory (both keyed passes stream their iterator once,
    * buffering only what the emit decision needs): pass 1 holds one
    * `(id, pos)` pair per occurrence of ONE span hash in ONE
    * micro-batch — a mega-hot boilerplate hash concentrates its
    * batch occurrences in one task, so size micro-batches so the
    * hottest hash's per-batch occurrence list fits in executor
    * memory; pass 2 holds one document's text plus one int per cut.
    *
    * State lifecycle at 100 TB (the `NoTimeout` state otherwise grows
    * one long per distinct stream span hash, forever): periodically
    * STOP the stream, fold the documents it processed into the
    * persisted inventory with [[graft.pipeline.Dedup
    * .foldSpanInventory]], and restart against the folded inventory
    * with a FRESH checkpoint. Restart parity is exact, not
    * approximate: batch ids are new each batch (the incremental
    * contract), so the stream state's per-hash count equals the
    * distinct-doc delta the fold adds to `docs`, and every post-
    * restart union count `batch + 0 + folded-corpus` equals the
    * uninterrupted `batch + state + corpus` — SpanCutRestartSpec
    * pins fold→restart ≡ uninterrupted on a seeded multi-batch run. */
  def spanCutAgainstStream(docs: DataFrame, idCol: String, textCol: String,
                           corpusInv: DataFrame, window: Int = 8,
                           minDocs: Int = 2): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.types._
    require(window >= 1, s"window=$window must be >= 1")
    require(minDocs >= 2,
      s"minDocs=$minDocs must be >= 2 (every span occurs in its own document)")
    val spark = docs.sparkSession
    import spark.implicits._
    val idType = docs.schema(idCol).dataType
    idType match {
      case ByteType | ShortType | IntegerType | LongType | StringType => ()
      case other => throw new IllegalArgumentException(
        s"spanCutAgainstStream id `$idCol` has type ${other.simpleString}; " +
          "only integral/string ids round-trip exactly through " +
          "streaming state — cast or hash the id upstream")
    }
    // NULL-id rows dropped for the same reason as paragraphDedupStream:
    // an id-less document cannot carry identity through the keyed state
    val base = docs.filter(col(idCol).isNotNull)
      .select(col(idCol).cast(StringType).as("id"),
        col(textCol).as("text"),
        graft.functions.TextHashExprs.positionalFingerprintsCol(
          graft.pipeline.Dedup.tokens(col(textCol)), window).as("__fps"))
    val wins = base.select(col("id"),
      posexplode(col("__fps")).as(Seq("pos", "fp")))
    val joined = wins.join(
        corpusInv.select(col("fp"),
          col("docs").cast(LongType).as("cdocs")), Seq("fp"), "left")
      .select(col("fp"), col("id"), col("pos"),
        coalesce(col("cdocs"), lit(0L)).as("cdocs"))
      .as[(Long, String, Int, Long)]
    // pass 1, keyed by span hash: union doc count vs minDocs; the
    // state is the distinct-document count this stream has seen
    val cut = joined.groupByKey(_._1)
      .flatMapGroupsWithState[Long, (String, Int)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, occs, state) =>
          // one streaming pass: buffer only the (id, pos) pairs that
          // might be emitted (fp/cdocs never amplify) while counting
          // distinct docs — the buffer is unavoidable because the
          // emit decision needs the group's full distinct-doc count
          val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
          val docs = scala.collection.mutable.HashSet.empty[String]
          var cdocs = 0L
          occs.foreach { r =>
            buf += ((r._2, r._3)); docs += r._2; cdocs = r._4
          }
          val batchDocs = docs.size.toLong
          val prior = state.getOption.getOrElse(0L)
          state.update(prior + batchDocs)
          if (batchDocs + prior + cdocs >= minDocs) buf.iterator
          else Iterator.empty
      }.toDF("id", "pos")
    // pass 2, keyed by document: one pos = -1 row carries the text,
    // the rest are cut window starts — both branches derive from the
    // same source batch, so a document and its verdicts always share
    // a micro-batch
    val docRows = base.select(col("id"), lit(-1).as("pos"),
      col("text").as("payload"))
    val cutRows = cut.select(col("id"), col("pos"),
      lit(null).cast(StringType).as("payload"))
    val out = docRows.unionByName(cutRows)
      .as[(String, Int, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (String, String, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (id, rows0, _) =>
          // one streaming pass: the text is held ONCE and the verdicts
          // compact to an int buffer — never a Seq of full rows
          var seenDoc = false
          var text: String = null
          val dups = scala.collection.mutable.ArrayBuffer.empty[Int]
          rows0.foreach { case (_, p, payload) =>
            if (p == -1) { seenDoc = true; text = payload } else dups += p
          }
          if (!seenDoc) Iterator.empty // defensive: verdicts only
          else if (text == null)
            Iterator.single((id, null: String, 0L, 0L, 0L))
          else {
            val (clean, n, removed, spans) =
              spanRewriteLocal(text, dups.toArray, window)
            Iterator.single((id, clean, n, removed, spans))
          }
      }
      .toDF("id", "text_clean", "n_tokens", "removed_tokens", "n_spans")
    out.select(col("id").cast(idType).as(idCol), col("text_clean"),
      col("n_tokens"), col("removed_tokens"), col("n_spans"))
  }

  /** Plain-Scala mirror of [[graft.pipeline.Dedup]]'s pure-column
    * `spanRewrite` (same island split: break when the gap to the
    * previous start exceeds `window`; same edge sentinels) — the
    * rewrite must run inside the keyed state operator where column
    * expressions cannot. Parity with the batch form is pinned by
    * StreamingSpanCutSpec. */
  private def spanRewriteLocal(text: String, dups0: Array[Int],
                               window: Int): (String, Long, Long, Long) = {
    val tso = text.trim.split("\\s+").filter(_.nonEmpty)
    val n = tso.length
    if (dups0.isEmpty) return (tso.mkString(" "), n.toLong, 0L, 0L)
    val dups = dups0.sorted
    val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
    val ends = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < dups.length) {
      if (i == 0 || dups(i) > dups(i - 1) + window) starts += dups(i)
      if (i == dups.length - 1 || dups(i + 1) > dups(i) + window)
        ends += math.min(dups(i) + window, n) - 1
      i += 1
    }
    val sb = new StringBuilder
    var kept = 0L
    var j = 0
    while (j <= starts.length) {
      val gs = if (j == 0) 0 else ends(j - 1) + 1
      val ge = if (j == starts.length) n - 1 else starts(j) - 1
      var p = gs
      while (p <= ge) {
        if (sb.nonEmpty) sb.append(' ')
        sb.append(tso(p)); kept += 1; p += 1
      }
      j += 1
    }
    (sb.toString, n.toLong, n - kept, starts.length.toLong)
  }

  /** Streaming curation: attach quality signals and keep rows above
    * threshold — map-only, fuses into the source scan incrementally.
    * The TRAINED model score ([[graft.functions.QualityExprs]], round
    * 16) rides along as `model_score`; pass `minModelScore` to gate
    * on it beside the heuristic (Some(0) = the NB decision boundary).
    * Both scorers are stateless codegen expressions, so the stream
    * stays a pure map. */
  def curateStream(docs: DataFrame, textCol: String,
                   minQuality: Double = 0.3,
                   minModelScore: Option[Long] = None): DataFrame = {
    val scored = docs
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
      .withColumn("lang_pred", TextAnalysis.langId(col(textCol)))
      .withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)))
      .withColumn("model_score", graft.functions.QualityExprs
        .qualityModelScoreCol(col(textCol)).getField("score"))
      .filter(col("quality") >= minQuality)
    minModelScore.fold(scored)(t => scored.filter(col("model_score") > t))
  }

  /** Streaming SPARQL: run a SELECT query incrementally over a
    * STREAMING quads DataFrame (`readStream` → parquet/kafka → quads
    * schema). Restricted to the stateless operator subset — scans,
    * FILTER, BIND, VALUES, UNION, projection, and multi-pattern BGPs
    * whose joins Spark can execute as stream-static or
    * stream-stream — validated eagerly so unsupported shapes
    * (aggregates, ORDER/LIMIT, DISTINCT, OPTIONAL/MINUS/EXISTS, paths)
    * fail at submission with a clear message instead of at runtime
    * inside the stream. The compiled plan is the SAME column plan the
    * batch path runs — one engine, two execution modes. */
  /** Hold an algebra tree to the streamable stateless subset: scans,
    * FILTER, BIND, VALUES, UNION, projection, SERVICE (the service side
    * is a registered STATIC dataset → stream-static join; its child is
    * conservatively held to the same subset). Everything stateful
    * (aggregates, ORDER/LIMIT, DISTINCT, OPTIONAL/MINUS/EXISTS, paths)
    * fails at submission with a clear message. */
  private def validateStreamable(op0: graft.sparql.Algebra.Op): Unit = {
    import graft.sparql.Algebra
    def validateExpr(e: Algebra.Expr): Unit = e match {
      case _: Algebra.ExistsE => throw new IllegalArgumentException(
        "FILTER (NOT) EXISTS is not streamable (plans a semi-join of the stream)")
      case Algebra.FuncE(_, args) => args.foreach(validateExpr)
      case Algebra.InE(x, list, _) => validateExpr(x); list.foreach(validateExpr)
      case _ => ()
    }
    def validate(op: Algebra.Op): Unit = op match {
      case Algebra.Scan(_, _, _, _) | Algebra.Singleton |
           Algebra.Values(_, _) => ()
      case Algebra.Join(l, r) =>
        // a BGP join over ONE stream is a stream-stream self-join:
        // Spark executes it only with an EQUALITY predicate, which the
        // compiler produces exactly when ≥1 shared var is assured on
        // BOTH sides. A shared-nothing (cross) or compat-only
        // (possibly-null shared vars) join would fail at RUNTIME
        // inside the stream — reject it here, at submission, instead.
        // EXEMPT joins where one side is a static local relation
        // (Singleton — parser output for `{ {} ?s ?p ?o }` — or
        // VALUES): those compile to a 1-row/local-relation
        // stream-static join Spark runs fine, equality key or not
        def isLocal(op: Algebra.Op): Boolean = op match {
          case Algebra.Singleton | Algebra.Values(_, _) => true
          case _ => false
        }
        if (!isLocal(l) && !isLocal(r)) {
          val shared = Algebra.vars(l).intersect(Algebra.vars(r))
          val assured = Algebra.assuredVars(l).intersect(Algebra.assuredVars(r))
          if (shared.intersect(assured).isEmpty)
            throw new IllegalArgumentException(
              "join without an assured shared variable is not streamable " +
                "(a stream-stream join needs an equality key; Spark " +
                "rejects cross/compat-only joins at runtime)")
        }
        validate(l); validate(r)
      case Algebra.Union(l, r) => validate(l); validate(r)
      case Algebra.Filter(c, cond) => validateExpr(cond); validate(c)
      case Algebra.Extend(c, _, e) => validateExpr(e); validate(c)
      case Algebra.Project(c, _) => validate(c)
      case Algebra.Service(_, c, _) => validate(c)
      case other => throw new IllegalArgumentException(
        s"operator ${other.getClass.getSimpleName} is not streamable " +
          "(stateless subset: BGP/FILTER/BIND/VALUES/UNION/projection)")
    }
    validate(op0)
  }

  /** Submission-time validation for [[sparqlStreamAgg]]: exactly one
    * GROUP BY/aggregate layer over the stateless subset, with the
    * restrictions Spark's streaming aggregation actually enforces
    * surfaced HERE instead of at runtime inside the stream. */
  private def validateStreamableAgg(op0: graft.sparql.Algebra.Op): Unit = {
    import graft.sparql.Algebra
    def unwrap(op: Algebra.Op): Algebra.Group = op match {
      case Algebra.Project(c, _) => unwrap(c)
      case Algebra.Extend(c, _, _) => unwrap(c) // SELECT exprs over aggs
      case Algebra.Filter(c, _) => unwrap(c) // HAVING: stateless post-filter
      case g: Algebra.Group => g
      case _: Algebra.Order | _: Algebra.Slice =>
        throw new IllegalArgumentException(
          "ORDER BY / LIMIT over a streaming aggregate is not " +
            "streamable (a stream's result order is only final at " +
            "completion; rank in the sink or use the batch engine)")
      case _: Algebra.Distinct | _: Algebra.Reduced =>
        throw new IllegalArgumentException(
          "DISTINCT over a streaming aggregate is not streamable " +
            "(it would stack a second stateful operator on the " +
            "aggregation; aggregate keys are already distinct)")
      case other => throw new IllegalArgumentException(
        s"sparqlStreamAgg needs a GROUP BY/aggregate query; got " +
          s"${other.getClass.getSimpleName} — use sparqlStream for the " +
          "stateless subset")
    }
    val g = unwrap(op0)
    g.aggs.foreach { case (_, agg) =>
      if (agg.distinct) throw new IllegalArgumentException(
        s"${agg.func}(DISTINCT …) is not streamable (Spark keeps no " +
          "per-group distinct-value state; pre-deduplicate with a " +
          "watermark upstream or use the batch engine)")
    }
    g.child match {
      case _: Algebra.Group => throw new IllegalArgumentException(
        "nested streaming aggregates are not streamable")
      case body => validateStreamable(body)
    }
  }

  def sparqlStream(quadsStream: DataFrame, query: String): DataFrame = {
    import graft.sparql.{BgpOptimizer, Compiler, SparqlParser}
    val (op0, dataset) = SparqlParser.parseAny(query) match {
      case SparqlParser.SelectQuery(op, ds) => (op, ds)
      case other => throw new IllegalArgumentException(
        s"sparqlStream supports SELECT only, got ${other.getClass.getSimpleName}")
    }
    validateStreamable(op0)
    Compiler.run(graft.sparql.Sparql.applyDataset(quadsStream, dataset),
      BgpOptimizer.optimize(op0))
  }

  /** Streaming SPARQL AGGREGATION: GROUP BY + COUNT/SUM/MIN/MAX/AVG/
    * SAMPLE/GROUP_CONCAT over a streaming quads frame — Spark's native
    * streaming aggregation carries the per-group state, so each
    * micro-batch folds into running results (write with
    * `outputMode("update")` for changed groups per batch, or
    * `"complete"` for the full table — append would wait for a
    * watermark the SPARQL surface does not carry). The WHERE body is
    * held to the same stateless subset as [[sparqlStream]]; HAVING
    * and SELECT expressions over the aggregates ride along
    * (stateless, post-aggregation). Submission-time validation
    * rejects what the state store cannot run — COUNT(DISTINCT …),
    * nested aggregates, ORDER/LIMIT — instead of failing inside the
    * stream.
    *
    * State: one buffer per group key — the bounded-key contract
    * (predicates, languages, types: group keys with corpus-scale
    * cardinality belong in the batch engine). The SPARQL-aggregate
    * buffers are the SAME Catalyst aggregates the batch path runs
    * (value-order MIN/MAX, xsd:decimal AVG, sorted GROUP_CONCAT), so
    * a streaming result and its batch replay agree exactly. */
  def sparqlStreamAgg(quadsStream: DataFrame, query: String): DataFrame = {
    import graft.sparql.{BgpOptimizer, Compiler, SparqlParser}
    val (op0, dataset) = SparqlParser.parseAny(query) match {
      case SparqlParser.SelectQuery(op, ds) => (op, ds)
      case other => throw new IllegalArgumentException(
        s"sparqlStreamAgg supports SELECT only, got ${other.getClass.getSimpleName}")
    }
    validateStreamableAgg(op0)
    Compiler.run(graft.sparql.Sparql.applyDataset(quadsStream, dataset),
      BgpOptimizer.optimize(op0))
  }

  /** Streaming CONSTRUCT: continuous RDF→RDF transformation — the WHERE
    * pattern is held to the same stateless subset as [[sparqlStream]],
    * the template instantiates per micro-batch, and output is a BAG of
    * quads (dedup is stateful: add a watermark +
    * dropDuplicatesWithinWatermark downstream for set semantics). */
  def constructStream(quadsStream: DataFrame, query: String): DataFrame = {
    import graft.sparql.{BgpOptimizer, Compiler, SparqlParser}
    val (template, op0, dataset) = SparqlParser.parseAny(query) match {
      case SparqlParser.ConstructQuery(t, op, ds) => (t, op, ds)
      case other => throw new IllegalArgumentException(
        s"constructStream supports CONSTRUCT only, got ${other.getClass.getSimpleName}")
    }
    validateStreamable(op0)
    Compiler.runConstructStream(
      graft.sparql.Sparql.applyDataset(quadsStream, dataset),
      template, BgpOptimizer.optimize(op0))
  }

  /** Watermarked tumbling-window event aggregation (the events-table
    * shape): counts and value sums per (window, event_type). */
  def eventCounts(events: DataFrame, tsCol: String,
                  windowLen: String = "1 hour",
                  watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n"), col("total_value"))

  /** Watermarked stream-STREAM interval join: every (left, right) pair
    * with equal `keyCol` whose event times are within
    * [`lowerBound`, `upperBound`] of each other (e.g. "views within
    * the hour before each click" = bounds ("-1 hour", "0 seconds") on
    * right minus left... stated as right.ts BETWEEN left.ts + lower
    * AND left.ts + upper). The time bounds are what make this FEASIBLE
    * as a stream-stream join: they cap how long either side's rows
    * stay in state, and the watermark evicts the rest — unbounded
    * stream-stream equi-joins cannot exist. Inner join (Spark's
    * append-mode stream-stream contract); right columns are prefixed.
    *
    * This is the pair-complete counterpart of the as-of family: as-of
    * picks THE latest admissible right row; the interval join emits
    * EVERY admissible pair. */
  def intervalJoinStream(left: DataFrame, right: DataFrame,
                         keyCol: String, tsCol: String,
                         lowerBound: String, upperBound: String,
                         watermark: String,
                         rightPrefix: String = "r_"): DataFrame = {
    val renamed = right.columns.map(rightPrefix + _)
    require(!right.columns.exists(_.startsWith(rightPrefix)),
      s"right columns already carry the prefix '$rightPrefix': " +
        right.columns.filter(_.startsWith(rightPrefix)).mkString(", ") +
        " — a rename cascade would corrupt them; pick another prefix")
    require(!left.columns.exists(renamed.contains),
      s"prefixed right columns collide with left columns: " +
        renamed.filter(left.columns.contains).mkString(", "))
    val l = left.withWatermark(tsCol, watermark).alias("l")
    // one select, not a withColumnRenamed fold (a fold would cascade
    // into columns renamed by earlier steps)
    val r0 = right.select(right.columns.map(c =>
      col(c).as(rightPrefix + c)): _*)
    val r = r0.withWatermark(rightPrefix + tsCol, watermark).alias("r")
    l.join(r,
      col(keyCol) === col(rightPrefix + keyCol) &&
        col(rightPrefix + tsCol) >= expr(
          s"`$tsCol` + INTERVAL '$lowerBound'") &&
        col(rightPrefix + tsCol) <= expr(
          s"`$tsCol` + INTERVAL '$upperBound'"))
      .drop(rightPrefix + keyCol)
  }

  /** Stateful streaming funnel — the incremental face of
    * [[graft.pipeline.Temporal.funnel]], and the one streaming shape
    * that needs CUSTOM state (`mapGroupsWithState`): ordered-step
    * progression is not a windowed aggregate — each key carries its
    * per-step earliest-event times forward indefinitely, and a late
    * out-of-order event can LOWER a step's minimum and re-order the
    * chain, so the depth must be recomputed from retained state, not
    * accumulated. Emits `(keyCol, funnel_depth)` for every key touched
    * by each micro-batch (Update output mode — the sink sees a key's
    * latest depth each time it changes). State per key is one
    * `steps.length`-element array of optional longs — bounded and
    * tiny; keys are retained for the life of the query (wire
    * GroupStateTimeout eviction upstream if the key space is
    * unbounded). `tsCol` must be numeric (the battery's epoch-µs
    * convention); rows whose step matches no `steps` entry update
    * nothing but still re-emit the key's current depth. The emitted
    * `keyCol` keeps the INPUT's type (matching the batch operator, so
    * stream output joins back to batch results with no cast): the key
    * rides through state in its canonical string form and is cast
    * back on emit — exact for the atomic key types (integral, string,
    * date) a funnel key should be. */
  def funnelStream(events: DataFrame, keyCol: String, stepCol: String,
                   tsCol: String,
                   steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "steps must name at least one stage")
    require(steps.distinct == steps, s"steps repeat: ${steps.mkString(", ")}")
    // the key rides state as its string form and is cast back on emit;
    // that round-trip is exact ONLY for these types. Fail loudly on the
    // rest: binary keys with invalid UTF-8 would silently MERGE, and
    // float keys split -0.0/0.0 that the batch funnel groups together.
    locally {
      import org.apache.spark.sql.types._
      val kt = events.schema(keyCol).dataType
      val ok = kt match {
        case StringType | ByteType | ShortType | IntegerType | LongType |
             DateType | BooleanType => true
        case _ => false
      }
      require(ok, s"funnelStream key `$keyCol` has type ${kt.simpleString}; " +
        "only string/integral/date/boolean keys round-trip exactly " +
        "through streaming state — cast or hash the key upstream")
    }
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val n = steps.length
    val stepIdx = steps.zipWithIndex
      .foldLeft(lit(-1)) { case (acc, (s, i)) =>
        when(col(stepCol) === s, lit(i)).otherwise(acc)
      }
    def depthOf(mins: IndexedSeq[Option[Long]]): Int = {
      var d = 0
      while (d < n && mins(d).isDefined &&
        (d == 0 || mins(d).get >= mins(d - 1).get)) d += 1
      d
    }
    events
      .select(col(keyCol).cast("string").as("__k"),
        stepIdx.as("__si"), col(tsCol).cast("long").as("__t"))
      .as[(String, Int, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[Seq[Option[Long]], (String, Int)](
        GroupStateTimeout.NoTimeout) { case (k, it, state) =>
        val mins = state.getOption
          .getOrElse(Seq.fill(n)(Option.empty[Long])).toArray
        it.foreach { case (_, si, t) =>
          if (si >= 0 && mins(si).forall(t < _)) mins(si) = Some(t)
        }
        state.update(mins.toSeq)
        (k, depthOf(mins.toIndexedSeq))
      }
      .toDF("__k", "funnel_depth")
      .select(col("__k").cast(events.schema(keyCol).dataType).as(keyCol),
        col("funnel_depth"))
  }

  /** Streaming gap sessionization — the incremental face of
    * [[graft.pipeline.Temporal.sessionize]]: Spark's native
    * `session_window` merges events of one key into state while gaps
    * stay under `gap`, and the watermark both bounds that state and
    * FINALIZES sessions (a session row is emitted only once no
    * event can extend it — append mode, so the sink sees each closed
    * session exactly once; the batch operator is the replay path for
    * reprocessing). `tsCol` must be a TIMESTAMP column here — event
    * time with a watermark — unlike the batch form's numeric axis.
    * Session identity differs from the batch form on purpose:
    * streams have no stable per-key ordinal (a late-but-in-watermark
    * event can merge two open sessions), so sessions are identified
    * by their (key, start) instead of an index. */
  def sessionizeStream(events: DataFrame, keyCol: String, tsCol: String,
                       gap: String, watermark: String,
                       aggs: Seq[org.apache.spark.sql.Column] = Nil): DataFrame = {
    val agged = events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"), aggs: _*)
    agged.select(col(keyCol) +:
      col("session_window.start").as("session_start") +:
      col("session_window.end").as("session_end") +:
      agged.columns.toSeq
        .filterNot(c => c == "session_window" || c == keyCol).map(col): _*)
  }
}
