package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph-based approximate nearest neighbor — the fourth index family
  * next to sign-LSH ([[Similarity.lshTopK]]), IVF ([[Similarity.ivfTopK]])
  * and IVF-PQ ([[Pq.ivfPqSearch]]): a k-NN NEIGHBOR GRAPH over the corpus
  * plus per-query BEAM SEARCH along its edges — the HNSW/NSG paradigm
  * (Malkov & Yashunin 2018), re-expressed for a BSP engine.
  *
  * Why a fourth family: graph indexes win where the others leak — no
  * bucketing geometry to mis-tune (LSH), no cell-boundary misses (IVF),
  * no reconstruction error (PQ); search cost grows with the graph's hop
  * diameter, not the corpus size. The published structures are
  * sequential-insert (HNSW's layered insertion is a per-element loop over
  * a mutable graph), which is exactly what a distributed engine must NOT
  * do — so this module keeps the PARADIGM and swaps the construction and
  * traversal for set-at-a-time equivalents:
  *
  *  - BUILD: candidate pairs from the already-registered sign-LSH
  *    bucketing (bounded buckets, union over tables — the
  *    [[graft.operators.Dedup.embeddingCosinePairsLsh]] shape), exact
  *    cosine scoring, then per-node top-`m` out-edges by (cosine desc,
  *    id asc), SYMMETRIZED (reverse edges unioned in) so greedy search
  *    cannot strand in a sink — the NN-descent/EFANNA construction
  *    family, one shuffle per stage, never corpus-quadratic.
  *  - SEARCH: `rounds` synchronized beam steps — expand every frontier
  *    node's out-edges (one equi-join against the edge table), score new
  *    candidates exactly (one join against the corpus), keep the top
  *    `beam` per query (window rank) — BSP beam search, the standard BFS
  *    relaxation of HNSW's priority queue. Every query advances in the
  *    same jobs, so 10^6 queries cost the same NUMBER of shuffles as one.
  *
  * Determinism: every rank uses the family tie-break (cosine desc, id
  * asc); LSH planes are the seeded constants; no randomness anywhere —
  * same corpus, same graph, same results, any partitioning (spec-pinned).
  *
  * Scale shape: the edge table is n·m rows (m ≈ 8-32 — the index is
  * LINEAR in the corpus, like the inverted file); build cost is the LSH
  * pair scan + one window; a search round is two equi-joins + one
  * window over q·beam·m rows. At 100 TB the graph partitions by src and
  * the per-round candidate volume is budget-bounded by (beam, m, rounds)
  * — no round touches the corpus beyond the rows it joins.
  *
  * Recall contract: approximate like its siblings — floored against the
  * exact scan by `ss13_gate` (the ss2/ss3/m3tb convention), and the
  * whole chain (graph build included) replays in the DuckDB oracle via
  * the literal hyperplane tables (`OracleSqlGen`), so unlike classic
  * HNSW the index here is hash-CHECKABLE, not just benchmarked.
  */
object GraphAnn {

  /** The REGISTERED operating point (ss13 family) — one source for the
    * Spark query and the DuckDB oracle generator, so the two sides
    * cannot drift. Chosen on the near-uniform synthetic corpus (every
    * ANN family's worst case here): measured recall@5 = 1.0 / 1.0 / 0.92
    * at sf0.001/0.01/0.1 (ProbeGraphWrite sweep), floored at 0.80 by
    * ss13_gate — the recallGate slack convention.
    */
  val RegM = 16
  val RegBeam = 48
  val RegRounds = 4
  val RegEntry = 32

  /** Fresh ExprIds for every output column: union children that embed
    * the SAME (checkpointed) plan share attribute ids, and Catalyst's
    * UnionBase.rewriteConstraints throws `key not found: <attr>` on the
    * collision — re-aliasing either side is the documented-by-stack-trace
    * workaround (found by the verify writer on every ss13 plan).
    */
  private def realias(df: DataFrame): DataFrame =
    df.select(df.columns.map(c => col(c).as(c)).toIndexedSeq: _*)

  /** The kept candidate-rank set for ~`m` out-edges: ranks 1..m/2, then
    * m/2 + 2^j until `m` ranks are selected — shared by the operator and
    * the oracle generator so the literal rank list cannot drift.
    */
  private[graft] def graphEdgeRanks(m: Int): Seq[Int] = {
    val near = (1 to math.max(1, m / 2)).toList
    val spaced = (1 to (m - near.length))
      .map(j => near.length + (1 << j))
    (near ++ spaced).distinct.sorted
  }

  /** The symmetrized k-NN graph: (src, dst, cosine), ~`m` out-edges per
    * node from LSH candidate pairs plus every reverse edge (a node may
    * therefore have more than `m` in-edges — the connectivity HNSW gets
    * from its bidirectional insert).
    *
    * Edge selection is NOT plain top-m: the nearest `m/2` candidate ranks
    * plus exponentially SPACED ranks (m/2 + 2^j) — near edges carry
    * accuracy, spaced edges carry the small-world shortcuts (Kleinberg
    * 2000) that plain top-m loses when near-duplicates exist: a cos-1.0
    * twin pair monopolizes each other's top slots and severs the pair
    * from the rest of the graph (measured on the GraphAnnSpec clustered
    * fixture — the beam reached the cluster but never the twins). NSG/
    * DiskANN solve the same problem with pairwise α-pruning; rank
    * spacing is the BSP-cheap form (one window, no candidate-candidate
    * cosines, and it replays in the SQL oracle as a literal rank set).
    */
  /** `planes <= 0` (default) resolves through [[Dedup.autoPlanes]] —
    * plane count MUST scale with the corpus or bucket size (and the
    * per-bucket QUADRATIC pair expansion) grows linearly with n: the
    * fixed-8-planes first cut filled the probe host's spill disk at the
    * 100× decade point (200k vectors → ~780-member buckets → ~600M
    * candidate pairs) exactly the way the r10 dd13 postmortem predicts.
    */
  def knnGraph(emb: DataFrame, dim: Int, m: Int = 8, tables: Int = 8,
      planes: Int = 0, maxBucketSize: Option[Int] = Some(1024)): DataFrame = {
    import graft.functions.{r4, vecDotF, vecNormF}
    require(m >= 1 && tables >= 1)
    val base = Materialize(emb.select(col("vec_id").as("id"),
      col("embedding"), vecNormF(col("embedding")).as("norm")))
    val k = if (planes > 0) planes else Dedup.autoPlanes(base.count())
    // ids-only through the bucket aggregation; vectors come back via the
    // verify joins (the embeddingCosinePairsLsh memory discipline)
    val keyed = Similarity.lshBucketed(base, dim, tables, k)
      .select(col("tbl"), col("bkt"), col("id"))
    val buckets = keyed.groupBy(col("tbl"), col("bkt"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    val capped = maxBucketSize.fold(buckets)(mx =>
      buckets.filter(size(col("ids")) <= mx))
    val cand = capped
      .select(explode(Dedup.pairCombinations(col("ids"))).as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
      .distinct()
    val denom = col("na") * col("nb")
    val scored = cand
      .join(base.select(col("id").as("id_a"), col("embedding").as("ea"),
        col("norm").as("na")), "id_a")
      .join(base.select(col("id").as("id_b"), col("embedding").as("eb"),
        col("norm").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        r4(when(denom === 0.0, 0.0)
          .otherwise(vecDotF(col("ea"), col("eb")) / denom)).as("cosine"))
    // both directions, top-m out-edges per src, then symmetrize
    val directed = scored
      .select(col("id_a").as("src"), col("id_b").as("dst"), col("cosine"))
      .unionByName(realias(scored.select(col("id_b").as("src"),
        col("id_a").as("dst"), col("cosine"))))
    val w = Window.partitionBy(col("src"))
      .orderBy(col("cosine").desc, col("dst").asc)
    // kept candidate ranks: 1..m/2 (near) + m/2 + 2^j (spaced shortcuts)
    val keepRanks = graphEdgeRanks(m)
    val topM = directed.withColumn("rk", row_number().over(w))
      .filter(col("rk").isInCollection(keepRanks))
      .select(col("src"), col("dst"), col("cosine"))
    topM.unionByName(
        realias(topM.select(col("dst").as("src"), col("src").as("dst"),
          col("cosine"))))
      .dropDuplicates("src", "dst")
  }

  /** Beam search over a prebuilt graph: top-`k` per query after `rounds`
    * synchronized expand-score-prune steps. Entry points are a STRIDED
    * deterministic sample of ~`entry` corpus vectors (ids ≡ 0 mod n/entry
    * — the trainKmeans sampling convention): a flat k-NN graph over a
    * clustered corpus can be near-disconnected across clusters (measured:
    * lowest-id-only entries stranded the beam in the wrong cluster on the
    * GraphAnnSpec fixture), and strided multi-entry is the standard flat-
    * graph answer (HNSW buys the same property with its layer hierarchy;
    * multi-seeded search is the published alternative). Every region of
    * the id space seeds, so the beam starts within edge distance of any
    * cluster that holds ≥ n/entry vectors. Output
    * (query_id, vec_id, cosine, rank) — the family shape.
    */
  def beamSearch(graph: DataFrame, corpus: DataFrame, queries: DataFrame,
      k: Int, beam: Int = 16, rounds: Int = 3, entry: Int = 8,
      maxQueries: Int = 100000): DataFrame = {
    import graft.functions.{r4, vecDotF, vecNormF}
    require(k >= 1 && beam >= k && rounds >= 1 && entry >= 1,
      s"need beam >= k >= 1, rounds/entry >= 1: k=$k beam=$beam " +
        s"rounds=$rounds entry=$entry")
    // the exact-scan family's fail-loud tripwire: the query side is
    // BROADCAST into every scoring round, so an unbounded query table
    // would blow the broadcast silently (beam search amortizes SHUFFLES
    // over queries, not broadcast bytes)
    Similarity.requireQueryCap(queries, maxQueries, "GraphAnn.beamSearch")
    val base = Materialize(corpus.select(col("vec_id"),
      col("embedding").as("emb_c"), vecNormF(col("embedding")).as("norm_c")))
    val q = Materialize(queries.select(col("query_id"),
      col("embedding").as("emb_q"), vecNormF(col("embedding")).as("norm_q")))
    val edges = Materialize(graph.select(col("src"), col("dst")))
    val denom = col("norm_c") * col("norm_q")
    def score(cands: DataFrame): DataFrame = cands
      .join(base, Seq("vec_id"))
      .join(broadcast(q), Seq("query_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        r4(when(denom === 0.0, 0.0)
          .otherwise(vecDotF(col("emb_q"), col("emb_c")) / denom))
          .as("cosine"))
    val wBeam = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    val mod = math.max(1L, base.count() / entry)
    // seeds re-derive from the raw corpus, not from `base`: seeds feed a
    // join back AGAINST base inside score(), and a self-join of one
    // checkpointed plan trips attribute resolution under the verify
    // writer's coalesce (key not found: vec_id#N)
    val seeds = corpus.select(col("vec_id"))
      .filter(pmod(col("vec_id"), lit(mod)) === 0)
    var best = Materialize(score(
      broadcast(seeds).crossJoin(q.select(col("query_id")))))
    var r = 0
    while (r < rounds) {
      val expanded = best.withColumn("rk", row_number().over(wBeam))
        .filter(col("rk") <= beam)
        .select(col("query_id"), col("vec_id").as("src"))
        .join(edges, Seq("src"))
        .select(col("query_id"), col("dst").as("vec_id"))
        .distinct()
      // rescoring an already-seen pair yields the identical cosine, so
      // the dedup after the union is value-safe; Materialize per round
      // keeps the loop's lineage flat (the connectedComponents shape).
      // Both union children embed the SAME checkpointed base plan, so
      // their attribute ids collide — re-alias each side (see [[realias]]).
      val merged = Materialize(realias(score(expanded))
        .unionByName(realias(best))
        .dropDuplicates("query_id", "vec_id"))
      // hard attribute reset: re-wrap the checkpointed rows as a brand-new
      // LogicalRDD (fresh ExprIds, empty constraint set). localCheckpoint
      // keeps the old attribute ids, and after two loop rounds the
      // accumulated id-sharing between union children makes Catalyst's
      // UnionBase.rewriteConstraints throw `key not found: vec_id#N`
      // (ProbeGraphWrite: rounds=1 writes fine, rounds=3 fails). The
      // Row round-trip is metadata-scale: |best| <= q·(entry+rounds·beam·m).
      best = merged.sparkSession.createDataFrame(merged.rdd, merged.schema)
      r += 1
    }
    best.withColumn("rank", row_number().over(wBeam))
      .filter(col("rank") <= k)
  }

  /** Build + search in one call at the registered operating point. */
  def graphTopK(emb: DataFrame, queries: DataFrame, k: Int, dim: Int,
      m: Int = RegM, tables: Int = 8, planes: Int = 0, beam: Int = RegBeam,
      rounds: Int = RegRounds, entry: Int = RegEntry): DataFrame = {
    val g = knnGraph(emb, dim, m, tables, planes)
    beamSearch(g, emb.select(col("vec_id"), col("embedding")), queries,
      k, beam, rounds, entry)
  }
}
