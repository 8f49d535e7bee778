package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-space clustering and semantic deduplication — the corpus
  * organization layer over the vector column: k-means cluster assignment
  * (domain discovery, sharding, stratification keys) and SemDeDup-style
  * semantic dedup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
  * at web-scale through semantic deduplication"): cluster the embeddings
  * with a cheap coarse model, then search for near-duplicate pairs ONLY
  * within clusters — the pruning that turns the O(n²) all-pairs cosine
  * into n² / k per-cluster work while keeping exact scoring.
  *
  * Shares the deterministic sampled-Lloyd trainer with
  * [[Similarity.ivfTopK]] (seeding by lowest vec_id, decimal-exact means),
  * so cluster models are partition-layout- and retry-independent: the same
  * corpus always clusters the same way, on any cluster.
  *
  * Reference seed: the reference's semantic layer stops at pairwise
  * gen↔ref cosine (SURVEY §2.9 M3); this generalizes it to corpus-scale
  * organization, the same growth path as Similarity/Dedup.
  */
object Clustering {

  /** Resolve `nClusters <= 0` to the auto operating point: enough cells to
    * keep expected membership ~`targetClusterSize`, clamped to [8, 65536].
    * A FIXED k is the scale trap of every bucketed method (per-cell
    * membership — and hence the per-cell quadratic pair expansion — grows
    * linearly with the corpus); scaling k with n keeps SemDeDup's candidate
    * volume ~n * targetClusterSize, linear in corpus size. SemDeDup itself
    * ran 50k clusters at LAION scale — exactly this rule. The n lookup is
    * one count() (metadata-only on parquet sources).
    */
  /** Returns (k, the corpus count when one was run). The count is threaded
    * to [[Similarity.trainKmeans]]'s `knownCount` so auto-k and the
    * training-sample ceiling share one job instead of scanning twice.
    */
  private def resolveK(emb: DataFrame, nClusters: Int,
      targetClusterSize: Int, knownCount: Option[Long] = None)
      : (Int, Option[Long]) =
    if (nClusters > 0) (nClusters, None)
    else {
      val n = math.max(1L, knownCount.getOrElse(emb.count()))
      val raw = math.ceil(n.toDouble / targetClusterSize).toInt
      (math.min(65536, math.max(8, raw)), Some(n))
    }

  /** K-means cluster assignment: (vec_id, cluster) for every vector.
    * Training runs on a deterministic 1/trainSampleMod sample; assignment
    * covers every row as one map-only pass against broadcast centroids.
    * `nClusters <= 0` resolves through [[resolveK]] — the same auto
    * operating point as [[semDedupPairs]], so the Clustering API is
    * uniform (r4 advice).
    */
  def kmeansAssign(emb: DataFrame, nClusters: Int, iterations: Int = 2,
      trainSampleMod: Int = 1, targetClusterSize: Int = 128,
      assignGroups: Int = 0): DataFrame = {
    val (k, nKnown) = resolveK(emb, nClusters, targetClusterSize)
    val centroids = Similarity.trainKmeans(
      emb.select(col("vec_id"), col("embedding")), k, iterations,
      trainSampleMod, nKnown, assignGroups)
    emb.select(col("vec_id"),
      Similarity.bestCellUdf(emb.sparkSession, centroids, assignGroups)(
        col("embedding")).as("cluster"))
  }

  /** Cluster cardinality profile: (cluster, n_vectors) — the one-line
    * report that sizes downstream per-cluster work and exposes degenerate
    * models (everything in one cell). One hash-aggregate over the
    * assignment pass.
    */
  def clusterSizes(emb: DataFrame, nClusters: Int, iterations: Int = 2,
      trainSampleMod: Int = 1): DataFrame =
    kmeansAssign(emb, nClusters, iterations, trainSampleMod)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vectors"))

  /** SemDeDup near-duplicate pairs: all (id_a < id_b) pairs with cosine >=
    * `minCosine` that SHARE AT LEAST ONE of their `nAssign` nearest
    * clusters. Approximate like every clustered method — a pair whose two
    * vectors share none of their assigned cells is missed; `nAssign = 2`
    * (default) recovers the dominant failure mode, centroid-boundary
    * straddlers, exactly as [[Similarity.lshTopK]]'s multiprobe shell
    * recovers near-miss sign flips (measured on the planted near-dup
    * corpus: pair recall 0.87 single-assign → ~1.0 at nAssign=2, for 2×
    * the pair-stage rows). Measure with [[Similarity.pairRecall]].
    *
    * Scale shape: assignment is map-only; pair generation is the bucketed
    * collect + local expansion of the Dedup family keyed on the cluster id
    * — per-cluster quadratic, never corpus-quadratic, and `maxClusterSize`
    * caps degenerate cells the way the LSH operators cap hot buckets (at
    * web scale nClusters is chosen so n/k is bounded; SemDeDup used 50k
    * clusters for LAION-scale corpora).
    */
  /** `assignGroups` (default 0 = provably-exact assignment): with a
    * positive value every centroid-assignment pass — Lloyd training
    * rounds AND the nAssign multi-assignment — is capped at that many
    * coarse groups of the two-level index
    * ([[CentroidIndex.searchApprox]]). This is the ANN-ASSISTED
    * assignment that closes the auto-k scale wall: exact assignment is
    * O(n·k) = n²/targetClusterSize FLOPs when the triangle-inequality
    * bounds cannot prune (measured: the 100× dd13b probe, killed at ~1 h
    * extrapolated); capped, it is O(n·√k·(1+assignGroups)·d) — at the
    * 100× probe the same operator completes in minutes (SCALE.md r10).
    * Assignment becomes approximate the same way the nAssign/multiprobe
    * shells already are: a boundary vector may land in its second-best
    * cell, which perturbs WHICH cluster verifies a pair, never the exact
    * cosine scoring — the dd13c gate holds the same lexical-recall
    * contract as the exact form.
    */
  def semDedupPairs(emb: DataFrame, minCosine: Double, nClusters: Int = 0,
      iterations: Int = 2, trainSampleMod: Int = 1,
      maxClusterSize: Option[Int] = Some(4096), nAssign: Int = 2,
      targetClusterSize: Int = 128, assignGroups: Int = 0): DataFrame = {
    import graft.functions.vecNormF
    // Materialized: consumed by the k-means/assignment pass AND both
    // sides of the verify join (construction is already eager through the
    // centroid training).
    val base = Materialize(emb.select(col("vec_id").as("id"),
      col("embedding"), vecNormF(col("embedding")).as("norm")))
    semDedupPairsNormed(base, minCosine, nClusters, iterations,
      trainSampleMod, maxClusterSize, nAssign, targetClusterSize,
      assignGroups, knownCount = None)
  }

  /** [[semDedupPairs]] over a PRE-NORMED, already-Materialized base
    * (id, embedding, norm), with the corpus count optionally known — the
    * entry point for [[semDedupPairsRouted]], which pays the norm pass
    * and the count ONCE and shares them between its probe and both
    * branches (r10 verdict: the routed entry re-derived both).
    */
  private[graft] def semDedupPairsNormed(base: DataFrame, minCosine: Double,
      nClusters: Int = 0, iterations: Int = 2, trainSampleMod: Int = 1,
      maxClusterSize: Option[Int] = Some(4096), nAssign: Int = 2,
      targetClusterSize: Int = 128, assignGroups: Int = 0,
      knownCount: Option[Long] = None): DataFrame = {
    import graft.functions.{r4, vecDotF}
    val (k, nKnown) = resolveK(
      base.select(col("id").as("vec_id"), col("embedding")),
      nClusters, targetClusterSize, knownCount)
    require(nAssign >= 1 && nAssign <= k)
    val centroids = Similarity.trainKmeans(
      base.select(col("id").as("vec_id"), col("embedding")), k, iterations,
      trainSampleMod, nKnown, assignGroups)
    // Ids only through the cluster aggregation; vectors come back via the
    // verify join — the same memory shape as Dedup.embeddingCosinePairsLsh
    // after its 100x-probe OOM fix: collecting struct(id, norm, embedding)
    // per member held every cluster's vectors in aggregation state.
    val assigned = base.select(
      explode(Similarity.bestCellsUdf(base.sparkSession, centroids, nAssign,
        assignGroups)(col("embedding"))).as("cluster"),
      col("id"))
    val clusters = assigned.groupBy(col("cluster"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    val capped = maxClusterSize.fold(clusters)(m =>
      clusters.filter(size(col("ids")) <= m))
    val cand = capped
      .select(explode(Dedup.pairCombinations(col("ids"))).as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
      .distinct() // a pair sharing two cells scores identically in both
    val denom = col("na") * col("nb")
    cand
      .join(base.select(col("id").as("id_a"), col("embedding").as("ea"),
        col("norm").as("na")), "id_a")
      .join(base.select(col("id").as("id_b"), col("embedding").as("eb"),
        col("norm").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        r4(when(denom === 0.0, 0.0)
          .otherwise(vecDotF(col("ea"), col("eb")) / denom))
          .as("cosine"))
      .filter(col("cosine") >= minCosine)
  }

  /** SemDeDup-deduplicated corpus: resolve [[semDedupPairs]] through
    * connected components (min-id keeper per semantic group) and drop the
    * losers. The end-to-end form of Abbas et al.'s recipe: cluster →
    * within-cluster pairs → keep one representative per duplicate group.
    */
  def semDedupCorpus(emb: DataFrame, minCosine: Double, nClusters: Int = 0,
      iterations: Int = 2, trainSampleMod: Int = 1,
      maxClusterSize: Option[Int] = Some(4096), nAssign: Int = 2,
      targetClusterSize: Int = 128, assignGroups: Int = 0): DataFrame = {
    val pairs = semDedupPairs(emb, minCosine, nClusters, iterations,
      trainSampleMod, maxClusterSize, nAssign, targetClusterSize,
      assignGroups)
    val losers = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .filter(col("doc_id") =!= col("component"))
      .select(col("doc_id").as("vec_id"))
    emb.join(losers, Seq("vec_id"), "left_anti")
  }

  /** The semantic-dedup ROUTER, as code (the ev7c/sessionWindowSkewSafe
    * precedent): choose between the two measured shapes of
    * semantic-pair listing from a MEASURED pair-mass estimate, instead
    * of leaving the dd13-vs-dd13b rule as prose.
    *
    * The two shapes (both hold the same recall contract; SCALE.md
    * §dd13-vs-dd13b measured both at 1×/10×/100×):
    *  - LSH pair scan ([[Dedup.embeddingCosinePairsLsh]], the dd13
    *    shape): CPU-cheapest, but its shuffle/spill footprint IS the
    *    output pair mass — on a pair-dense corpus the ≥threshold mass
    *    grows quadratically (the 100× probe exhausted 74 GB of spill).
    *  - clustered SemDeDup with ANN-assisted assignment
    *    ([[semDedupPairs]] `assignGroups`, the dd13b/dd13c shape):
    *    candidate volume bounded at ~n·targetClusterSize and capped per
    *    cell, so spill stays linear whatever the pair mass; costs the
    *    clustering passes.
    *
    * The probe: a deterministic `vec_id % mod` sample of ~`sampleTarget`
    * vectors (the trainKmeans sampling convention — layout- and
    * retry-independent), all-pairs cosine ON THE DRIVER (metadata-scale:
    * 1024 vectors = 524k cosines, milliseconds), giving p̂ = the
    * fraction of pairs at/above `minCosine`; expected output pairs per
    * doc = p̂·(n−1)/2. At or under `pairBudgetPerDoc` the output is
    * LINEAR in the corpus and the LSH listing is safe; over it, the
    * listing's own output is the scale hazard and the clustered shape
    * wins. `knownPairsPerDoc` skips the probe (the
    * sessionWindowSkewSafe `knownTopShare` convention) — also the
    * deterministic branch-pin for tests.
    *
    * Routing is a PLAN choice within one contract (both branches are
    * approximate pair listings holding the same recall gate), not a
    * semantics switch: callers must not depend on which near-miss pairs
    * an individual branch recovers.
    */
  def semDedupPairsRouted(emb: DataFrame, minCosine: Double, dim: Int,
      pairBudgetPerDoc: Double = 32.0, sampleTarget: Int = 1024,
      assignGroups: Int = 4, targetClusterSize: Int = 128,
      knownPairsPerDoc: Option[Double] = None): DataFrame = {
    require(pairBudgetPerDoc > 0, s"pairBudgetPerDoc: $pairBudgetPerDoc")
    require(sampleTarget >= 16 && sampleTarget <= 8192,
      s"sampleTarget out of [16, 8192]: $sampleTarget")
    import graft.functions.vecNormF
    // ONE normed Materialized base, shared by the count, the probe
    // sample, and the chosen branch's full scan: both branches need
    // (id, embedding, norm), so deriving norms here means neither
    // re-computes them (r10 verdict item — the routed entry paid the
    // norm pass and the corpus count once per branch on top of the
    // router's own).
    val base = Materialize(emb.select(col("vec_id"), col("embedding"),
      vecNormF(col("embedding")).as("norm")))
    val n = math.max(0L, base.count())
    val estPairsPerDoc = knownPairsPerDoc.getOrElse(
      probePairMass(base, n, minCosine, sampleTarget)._2)
    val normed = base.select(col("vec_id").as("id"), col("embedding"),
      col("norm"))
    if (estPairsPerDoc <= pairBudgetPerDoc)
      Dedup.embeddingCosinePairsLshNormed(normed, minCosine, dim,
        tables = 16, planes = Dedup.autoPlanes(n), maxBucketSize = Some(1024))
    else
      semDedupPairsNormed(normed, minCosine,
        targetClusterSize = targetClusterSize, assignGroups = assignGroups,
        knownCount = Some(n))
  }

  /** The router's pair-mass probe, exposed for its driver-bound spec:
    * (rows collected, estimated ≥minCosine pairs per doc). The sample is
    * keyed on a HASH of vec_id, not the raw id — a sparse or structured
    * id space (ids all sharing a factor with the modulus) would make
    * `vec_id % mod` select far more than sampleTarget rows — and the
    * orderBy+limit is the hard driver-memory bound on top (TakeOrdered —
    * per-partition top-k, no full shuffle): whatever the id
    * distribution, at most 2·sampleTarget vectors reach the driver, and
    * deterministically so (the lowest vec_ids among the hash-selected —
    * layout- and retry-independent). All-pairs cosine on ≤ 2·sampleTarget
    * vectors is metadata-scale driver work (2048 vectors ≈ 2M cosines).
    */
  private[graft] def probePairMass(base: DataFrame, n: Long,
      minCosine: Double, sampleTarget: Int): (Int, Double) = {
    if (n < 2) return (0, 0.0)
    val mod = math.max(1L, n / sampleTarget)
    val sample = base
      .filter(col("embedding").isNotNull)
      .filter(pmod(xxhash64(col("vec_id")), lit(mod)) === 0)
      .orderBy(col("vec_id"))
      .limit(2 * sampleTarget)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    val s = sample.length
    var hits = 0L
    var i = 0
    while (i < s) {
      var j = i + 1
      while (j < s) {
        if (Similarity.cosLocal(sample(i), sample(j)) >= minCosine)
          hits += 1
        j += 1
      }
      i += 1
    }
    val tot = s.toLong * (s - 1) / 2
    (s, if (tot == 0L) 0.0 else hits.toDouble / tot * (n - 1).toDouble / 2.0)
  }
}
