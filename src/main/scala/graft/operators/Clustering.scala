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
      targetClusterSize: Int): (Int, Option[Long]) =
    if (nClusters > 0) (nClusters, None)
    else {
      val n = math.max(1L, emb.count())
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
      trainSampleMod: Int = 1, targetClusterSize: Int = 128): DataFrame = {
    val (k, nKnown) = resolveK(emb, nClusters, targetClusterSize)
    val centroids = Similarity.trainKmeans(
      emb.select(col("vec_id"), col("embedding")), k, iterations,
      trainSampleMod, nKnown)
    emb.select(col("vec_id"),
      Similarity.bestCellUdf(emb.sparkSession, centroids)(col("embedding"))
        .as("cluster"))
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
  def semDedupPairs(emb: DataFrame, minCosine: Double, nClusters: Int = 0,
      iterations: Int = 2, trainSampleMod: Int = 1,
      maxClusterSize: Option[Int] = Some(4096), nAssign: Int = 2,
      targetClusterSize: Int = 128): DataFrame = {
    import graft.functions.{r4, vecDotF, vecNormF}
    val (k, nKnown) = resolveK(emb, nClusters, targetClusterSize)
    require(nAssign >= 1 && nAssign <= k)
    // Materialized: consumed by the k-means/assignment pass AND both
    // sides of the verify join (construction is already eager through the
    // centroid training).
    val base = Materialize(emb.select(col("vec_id").as("id"),
      col("embedding"), vecNormF(col("embedding")).as("norm")))
    val centroids = Similarity.trainKmeans(
      base.select(col("id").as("vec_id"), col("embedding")), k, iterations,
      trainSampleMod, nKnown)
    // Ids only through the cluster aggregation; vectors come back via the
    // verify join — the same memory shape as Dedup.embeddingCosinePairsLsh
    // after its 100x-probe OOM fix: collecting struct(id, norm, embedding)
    // per member held every cluster's vectors in aggregation state.
    val assigned = base.select(
      explode(Similarity.bestCellsUdf(base.sparkSession, centroids, nAssign)(
        col("embedding"))).as("cluster"),
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
      targetClusterSize: Int = 128): DataFrame = {
    val pairs = semDedupPairs(emb, minCosine, nClusters, iterations,
      trainSampleMod, maxClusterSize, nAssign, targetClusterSize)
    val losers = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .filter(col("doc_id") =!= col("component"))
      .select(col("doc_id").as("vec_id"))
    emb.join(losers, Seq("vec_id"), "left_anti")
  }
}
