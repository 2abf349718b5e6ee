package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Connected components over candidate-pair edge lists — the step that
  * turns pairwise near-duplicate hits (MinHash / SimHash / embedding
  * LSH output) into whole duplicate CLUSTERS with one canonical
  * representative each. Pairs alone under-delete: A~B and B~C often
  * arrive without A~C (LSH recall, chained edits), so dedup must drop
  * the transitive closure of the pair graph, not just pair members.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the
  * published MapReduce-native CC algorithm:
  *
  *  - large-star(u): with m = min(Γ(u) ∪ {u}), emit (v, m) for every
  *    neighbor v > u;
  *  - small-star(u) on (big → small) directed edges: with m = min of
  *    the smaller neighborhood, re-point u and all its smaller
  *    neighbors at m.
  *
  * Each operation is ONE hash shuffle (a window min over the node key —
  * no join) and strictly decreases a monotone potential; the paper
  * proves O(log² n) rounds to convergence regardless of graph shape, so
  * a 100 TB pair set with billion-node chains converges in tens of
  * rounds, each linear in |E|. High-degree nodes are what the LARGE
  * star is for: a hub's edges re-point to its minimum in one round,
  * so skew never concentrates on one reducer beyond its own adjacency.
  * Every round re-materializes the frontier as a fresh checkpointed
  * leaf (same discipline as the SPARQL transitive closure) — lineage
  * stays O(1) and exprId reuse across self-unions cannot trip Catalyst.
  *
  * Determinism: pure min-propagation — no randomness; the component id
  * is always the component's minimum node id.
  */
object Clustering {

  /** Connected components of the undirected graph given by two-column
    * `pairs` (any orderable, non-null node type; self-loops ignored).
    * Returns (`id`, `component`) for every node APPEARING IN `pairs`,
    * where `component` is the smallest node id in its component.
    * Callers dedup against a full table by treating absent nodes as
    * their own singleton component (see [[assignComponents]]). */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 50): DataFrame = {
    val spark = pairs.sparkSession
    require(pairs.columns.length == 2,
      s"pairs must have exactly two columns, got ${pairs.columns.length}")
    val Array(a, b) = pairs.columns

    // fresh checkpointed leaf: truncates lineage AND guards the
    // iterated-self-union exprId hazard (see memory: Catalyst Union
    // constraint rewrite with reused exprIds)
    def leaf(df: DataFrame): DataFrame =
      org.apache.spark.sql.GraftColumnBridge.freshLeaf(
        df.localCheckpoint(eager = true))

    def withMin(df: DataFrame, key: String): DataFrame =
      df.withColumn("m",
        least(min(col("v")).over(Window.partitionBy(col(key))), col(key)))

    // large-star over the symmetric edge set: (v, m) for neighbors v > u
    def largeStar(edges: DataFrame): DataFrame = {
      val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      withMin(sym, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
    }

    // small-star over (big → small) edges: re-point u and its smaller
    // neighbors at the neighborhood minimum
    def smallStar(edges: DataFrame): DataFrame = {
      val directed = edges.select(
        greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      val m = withMin(directed, "u")
      m.select(col("v").as("u"), col("m").as("v"))
        .union(m.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    var edges = leaf(pairs
      .select(col(a).as("u"), col(b).as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull)
      .filter(col("u") =!= col("v"))
      .distinct())

    // convergence = canonical edge set unchanged; one aggregate action
    // per round (count + order-insensitive hash XORs — never sum, which
    // overflows under ANSI), never a full set-difference over the edges
    def fingerprint(df: DataFrame): (Long, Long, Long) = {
      val r = df.agg(count(lit(1)),
        call_function("bit_xor", xxhash64(col("u"))),
        call_function("bit_xor", xxhash64(col("u"), col("v")))).head()
      (r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))
    }

    var prev = fingerprint(edges)
    var round = 0
    var converged = prev._1 == 0L
    while (!converged && round < maxRounds) {
      edges = leaf(smallStar(largeStar(edges)))
      val cur = fingerprint(edges)
      converged = cur == prev
      prev = cur
      round += 1
    }
    require(converged, s"connected components did not converge in $maxRounds rounds")

    // converged edge set is a forest of stars (node → component min)
    edges.select(col("u").as("id"), col("v").as("component"))
      .union(edges.select(col("v").as("id"), col("v").as("component")))
      .distinct()
  }

  /** Attach a `component` column to `df` (replacing any existing one):
    * the connected component of `idCol` under the `pairs` graph, or the
    * row's own id for nodes in no pair (singleton clusters). One
    * broadcast-or-hash left join. */
  def assignComponents(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val base = df.drop("component") // avoid an ambiguous post-join reference
    val comps = connectedComponents(pairs)
      .select(col("id").as("__cc_id"), col("component").as("__cc_comp"))
    base.join(comps, base(idCol) === col("__cc_id"), "left")
      .withColumn("component", coalesce(col("__cc_comp"), base(idCol)))
      .drop("__cc_id", "__cc_comp")
  }

  /** End-to-end near-duplicate clustering: MinHash-LSH candidate pairs
    * → connected components → one surviving row per cluster (smallest
    * id), i.e. the transitive version of [[Dedup.exact]] for near-dups.
    *
    * EXACT duplicates are additionally chained by content fingerprint —
    * one window pass, no quadratic pair set — so identical documents
    * always share a cluster even when a mega-cluster's LSH buckets
    * exceed `maxBucketSize` and drop out of candidate generation. */
  def nearDupClusters(df: DataFrame, idCol: String, textCol: String,
                      numHashes: Int = 64, bands: Int = 16,
                      shingleK: Int = 3, threshold: Double = 0.5,
                      maxBucketSize: Int = 100000): DataFrame = {
    val lshPairs = Dedup.minHashCandidates(df, idCol, textCol, numHashes, bands,
      shingleK, threshold, maxBucketSize).select("idA", "idB")
    val w = Window.partitionBy("__fp").orderBy(col("__id"))
    val exactPairs = df
      .select(col(idCol).as("__id"),
        TextAnalysis.fingerprint(col(textCol)).as("__fp"))
      // fingerprint(NULL text) is NULL; the window would partition all
      // NULL rows TOGETHER and chain millions of unrelated failed-
      // extraction documents into one mega-cluster (and one straggler
      // partition) — NULL content is not duplicate content
      .filter(col("__fp").isNotNull)
      .withColumn("__nxt", lead("__id", 1).over(w))
      .filter(col("__nxt").isNotNull)
      .select(col("__id").as("idA"), col("__nxt").as("idB"))
    assignComponents(df, idCol, lshPairs.union(exactPairs))
  }

  // ----- semantic dedup (SemDeDup) -----

  /** SemDeDup-style semantic dedup (Abbas et al., "SemDeDup: Data-
    * efficient learning at web-scale through semantic deduplication",
    * arXiv:2303.09540): cluster-then-prune over an embedding column.
    * assign each vector to its nearest centroid (the semantic
    * cluster) → cosine candidate pairs WITHIN the cluster → connected
    * components → keep the component minimum as the canonical copy.
    * Output one row per non-NULL-embedding input row:
    * `(id, cluster, component, keep)`.
    *
    * Deliberate, documented divergences from the paper, both on the
    * side of determinism and scale:
    *  - the survivor is the component's MINIMUM id (the paper keeps a
    *    low-centroid-similarity exemplar; min-id is a pure function of
    *    the data — the [[Dedup.exact]] reproducible-corpus contract);
    *  - in-cluster candidate generation is RHP-bucketed
    *    (`(cluster, signature)` keys), never all-pairs: the paper's
    *    dense within-cluster similarity matrix is quadratic in cluster
    *    size, which a skewed web corpus cannot afford — near-identical
    *    vectors almost always share the short signature, and
    *    `maxBucketSize` caps the residual quadratic work exactly like
    *    the LSH families ([[Dedup.embeddingCandidates]]) —
    *    `numPlanes = 0` disables sub-bucketing for the paper-exact
    *    all-pairs-within-cluster regime, affordable only on small or
    *    capped clusters;
    *  - pairs never cross clusters (that IS the paper's design — and
    *    its approximation: a near-dup pair split by the centroid
    *    boundary survives; SemanticDedupSpec plants that decoy).
    *
    * Scale shape: assignment and signatures are one map-only pass;
    * candidates are one `(cluster, bucket)` self-join; verification
    * joins vectors back by id; components are the O(log² n) star
    * rounds of [[connectedComponents]]. Use
    * [[graft.pipeline.Ivf.trainCentroids]] for the centroid matrix. */
  def semanticDedup(df: DataFrame, idCol: String, embCol: String,
                    centroids: Seq[Seq[Double]], threshold: Double = 0.95,
                    numPlanes: Int = 8,
                    maxBucketSize: Int = 100000): DataFrame =
    semanticDedupWith(df, idCol, embCol, centroids,
      if (numPlanes == 0) Nil
      else Dedup.hyperplanes(numPlanes, centroids.head.size), threshold,
      maxBucketSize)

  /** ±1 centroid matrix derived from md5 bits (salt `"sc:<c>:<i>"` —
    * disjoint from the `"p:i"` plane family), the assignment analogue
    * of [[Dedup.portableHyperplanes]]: ±1 × float dot products are
    * exact in double and all centroids share one norm, so any engine
    * re-derives the exact argmax-dot cluster of every vector. */
  def portableSemanticCentroids(k: Int, dim: Int): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until k).map { c =>
      (0 until dim).map { i =>
        val d = md.digest(s"sc:$c:$i".getBytes("UTF-8"))
        if ((d(0) & 1) == 1) 1.0 else -1.0
      }
    }
  }

  /** The ±1 centroid matrix as SQL list literals for the oracle. */
  def portableSemanticCentroidLiterals(k: Int, dim: Int): Seq[String] =
    portableSemanticCentroids(k, dim).map(
      _.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ", ", "]"))

  /** [[semanticDedup]] with the fully replayable hash family: ±1
    * centroids ([[portableSemanticCentroids]]), ±1 candidate planes
    * ([[Dedup.portableHyperplanes]]), uncapped buckets and 6-decimal
    * cosine — the semantic-dedup family's end-to-end hash-checked
    * form (assignment, buckets, pairs, cosines and components all
    * re-derivable by an external SQL engine). */
  def portableSemanticDedup(df: DataFrame, idCol: String, embCol: String,
                            dim: Int, numCentroids: Int = 8,
                            threshold: Double = 0.2,
                            numPlanes: Int = 4): DataFrame =
    semanticDedupWith(df, idCol, embCol,
      portableSemanticCentroids(numCentroids, dim),
      Dedup.portableHyperplanes(numPlanes, dim), threshold,
      maxBucketSize = 0)

  /** Persistable SEMANTIC signature table `(id, emb, cluster, bucket)`
    * — the semantic family's [[Dedup.embeddingSignTable]] analogue and
    * the incremental half of [[semanticDedup]]: assign the corpus to
    * its FROZEN centroids and RHP-sign it ONCE (both map-only),
    * persist, and every later incremental batch
    * ([[semanticCandidatesAgainst]]) or stream
    * ([[graft.streaming.StreamingOps.semanticNearDupStream]]) starts
    * from it. The centroid matrix is the frozen model — re-train and
    * re-sign to move clusters (assignments against stale centroids
    * are the SemDeDup approximation drifting, not an error). A table
    * persisted partitioned by `cluster` turns the incremental join's
    * corpus scan into a pruned read. `numPlanes = 0` disables
    * sub-bucketing (bucket 0 for every row — the paper-exact
    * all-pairs-within-cluster regime). */
  def semanticSignTable(df: DataFrame, idCol: String, embCol: String,
                        centroids: Seq[Seq[Double]], numPlanes: Int = 8,
                        portable: Boolean = false): DataFrame = {
    val dim = centroids.head.size
    val planes =
      if (numPlanes == 0) Nil
      else if (portable) Dedup.portableHyperplanes(numPlanes, dim)
      else Dedup.hyperplanes(numPlanes, dim)
    df.select(col(idCol).as("id"), col(embCol).as("emb"))
      .filter(col("emb").isNotNull)
      .withColumn("cluster",
        graft.functions.VectorExprs.nearestCentroid(col("emb"), centroids)
          .cast("long"))
      .withColumn("bucket",
        if (planes.isEmpty) lit(0L)
        else graft.functions.VectorExprs.rhpSignature(col("emb"), planes))
  }

  /** [[semanticSignTable]] under the fully replayable hash family
    * (±1 [[portableSemanticCentroids]] + ±1 portable planes) — the
    * corpus half of the hash-checked incremental entry. */
  def portableSemanticSignTable(df: DataFrame, idCol: String,
                                embCol: String, dim: Int,
                                numCentroids: Int = 8,
                                numPlanes: Int = 4): DataFrame =
    semanticSignTable(df, idCol, embCol,
      portableSemanticCentroids(numCentroids, dim), numPlanes,
      portable = true)

  /** Incremental semantic near-dup: a NEW batch's signatures
    * ([[semanticSignTable]], SAME centroids/planes) against the
    * persisted corpus table — the semantic analogue of
    * [[Dedup.embeddingCandidatesAgainst]]. Output
    * `(idNew, idCorpus, cluster, cos)` for cross-side candidate pairs
    * at cosine ≥ `threshold`; within-batch duplicates are NOT
    * reported (run [[semanticDedup]] on the batch for those), and
    * pairs never cross clusters (the SemDeDup contract).
    *
    * Scale shape: corpus rows are SEMI-JOINED against the broadcast
    * set of the batch's `(cluster, bucket)` keys before pair
    * generation, so post-scan corpus work scales with the batch; hot
    * keys are capped on both sides like every LSH family. Each vector
    * has ONE `(cluster, bucket)` key, so a pair surfaces at most
    * once — no dedup pass needed. */
  def semanticCandidatesAgainst(newSigs: DataFrame, corpusSigs: DataFrame,
                                threshold: Double = 0.95,
                                maxBucketSize: Int = 100000,
                                roundCos: Boolean = false): DataFrame = {
    val keyCols = Seq("cluster", "bucket")
    val nb = Dedup.capBuckets(
      newSigs.select(col("id").as("idNew"), col("emb").as("__embA"),
        col("cluster"), col("bucket")),
      keyCols, maxBucketSize)
      .localCheckpoint(eager = false) // feeds the key set AND the pair join
    val keys = nb.select(keyCols.map(col): _*).distinct()
    val cb = Dedup.capBuckets(
      corpusSigs.select(col("id").as("idCorpus"), col("emb").as("__embB"),
          col("cluster"), col("bucket"))
        .join(broadcast(keys), keyCols, "left_semi"),
      keyCols, maxBucketSize)
    nb.join(cb, keyCols)
      .filter(col("idNew") =!= col("idCorpus"))
      .withColumn("cos", Dedup.cosine(col("__embA"), col("__embB")))
      .filter(col("cos") >= threshold)
      .select(col("idNew"), col("idCorpus"), col("cluster"),
        (if (roundCos) round(col("cos"), 6) else col("cos")).as("cos"))
  }

  /** Stream-safe [[semanticCandidatesAgainst]]: the new side may be a
    * STREAMING signature table (assignment + signing are map-only —
    * no state), stream-static-joined against the capped persisted
    * corpus. No broadcast key-set prune (a streaming key set cannot
    * be collected — the per-batch stream side is small, so the static
    * side carries the join); pairs still surface at most once because
    * each vector has one `(cluster, bucket)` key. */
  private[graft] def semanticCandidatesAgainstStream(
      newSigs: DataFrame, corpusSigs: DataFrame, threshold: Double = 0.95,
      maxBucketSize: Int = 100000): DataFrame = {
    val keyCols = Seq("cluster", "bucket")
    val nb = newSigs.select(col("id").as("idNew"), col("emb").as("__embA"),
      col("cluster"), col("bucket"))
    val cb = Dedup.capBuckets(
      corpusSigs.select(col("id").as("idCorpus"), col("emb").as("__embB"),
        col("cluster"), col("bucket")),
      keyCols, maxBucketSize)
    nb.join(cb, keyCols)
      .filter(col("idNew") =!= col("idCorpus"))
      .withColumn("cos", Dedup.cosine(col("__embA"), col("__embB")))
      .filter(col("cos") >= threshold)
      .select(col("idNew"), col("idCorpus"), col("cluster"), col("cos"))
  }

  private def semanticDedupWith(df: DataFrame, idCol: String,
                                embCol: String,
                                centroids: Seq[Seq[Double]],
                                planes: Seq[Seq[Double]],
                                threshold: Double,
                                maxBucketSize: Int): DataFrame = {
    // NULL embeddings carry no semantics to dedup on — same contract
    // as the candidate generators (and a NULL would poison
    // nearestCentroid's dim check)
    val base = df.select(col(idCol).as("__sid"), col(embCol).as("__emb"))
      .filter(col("__emb").isNotNull)
    val assigned = base.withColumn("__cluster",
      graft.functions.VectorExprs.nearestCentroid(col("__emb"), centroids))
      .localCheckpoint(eager = false) // sig join + verify + output read it
    // an empty plane matrix = no sub-bucketing: the paper-exact
    // all-pairs-within-cluster regime, affordable only under a cap or
    // on small clusters
    val bucketCol =
      if (planes.isEmpty) lit(0L)
      else graft.functions.VectorExprs.rhpSignature(col("__emb"), planes)
    val sigs = Dedup.capBuckets(
      assigned.select(col("__sid"), col("__cluster"),
        bucketCol.as("__bucket")),
      Seq("__cluster", "__bucket"), maxBucketSize)
    val pairs = sigs.select(col("__cluster"), col("__bucket"),
        col("__sid").as("idA"))
      .join(sigs.select(col("__cluster"), col("__bucket"),
        col("__sid").as("idB")), Seq("__cluster", "__bucket"))
      .filter(col("idA") < col("idB"))
      .select("idA", "idB")
      .dropDuplicates("idA", "idB")
    val verified = pairs
      .join(assigned.select(col("__sid").as("idA"),
        col("__emb").as("__embA")), Seq("idA"))
      .join(assigned.select(col("__sid").as("idB"),
        col("__emb").as("__embB")), Seq("idB"))
      .filter(Dedup.cosine(col("__embA"), col("__embB")) >= threshold)
      .select("idA", "idB")
    assignComponents(
      assigned.select(col("__sid").as(idCol),
        col("__cluster").cast("long").as("cluster")),
      idCol, verified)
      .withColumn("keep", col("component") === col(idCol))
  }
}
