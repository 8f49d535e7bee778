package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.exactSum

/** Graph analytics over edge tables — the iterative-computation family
  * next to [[Dedup.connectedComponents]]: PageRank centrality (corpus/
  * source authority scoring, crawl prioritization, influence weighting for
  * mixture construction) and degree statistics. Like CC, every iteration
  * is joins + hash-aggregates over the edge table — no graph library, no
  * driver-side adjacency, so the shape survives arbitrarily large graphs.
  *
  * Determinism discipline: ranks live on a 9dp decimal grid and every
  * per-edge contribution is rounded to that grid BEFORE the
  * order-independent decimal sum (`exactSum`), so results are independent
  * of partitioning, aggregation order, and engine — PageRank is
  * oracle-checkable bit-for-bit, iteration by iteration.
  */
object Graph {

  /** PageRank with uniform teleport and dangling-mass redistribution, a
    * fixed number of power iterations:
    * rank'(v) = (1−d)/n + d·(Σ_{u→v} rank(u)/outdeg(u) + D/n), where D is
    * the total rank on dangling nodes (no out-edges). Edges are
    * deduplicated (multi-edges carry no weight — the unweighted form).
    * Output: (node, rank) over all nodes appearing as src or dst.
    *
    * Scale shape: one distinct + two hash-aggs of setup; per iteration one
    * edge⋈rank join (keyed on src), one hash-agg keyed on dst, a left
    * join back to the node set, and two one-row scalar broadcasts (n,
    * dangling mass). Each round's rank table is materialized through
    * [[Materialize]] (localCheckpoint, or reliable checkpoint when
    * `spark.graft.checkpointDir` is set) — the same lineage-truncation
    * rule as connected components: the next round references this round's
    * output more than once, and untruncated lineage grows exponentially
    * in rounds. The edge and node tables persist across rounds and are
    * released before returning.
    *
    * Celebrity-dst skew: `saltBuckets > 1` switches the per-round
    * contribution aggregate to a two-phase salted form — partial decimal
    * sums keyed on (dst, hash(src) % saltBuckets), then a final sum of the
    * ≤saltBuckets partials per dst. Decimal addition is associative, so the
    * salted result is bit-identical to the flat form (held to the same
    * oracle as `gr1`). Spark's map-side partial aggregation already
    * compresses per-task duplicates; the explicit salt additionally bounds
    * the FINAL reducer's per-key row count when one dst receives edges from
    * a large fraction of the graph (a hub node at 10^9+ edges) and partial
    * aggs spill or fall back — the same insurance `concatBinsSalted` gives
    * the ordered-collect family.
    */
  def pageRank(edges: DataFrame, iterations: Int = 3,
      damping: Double = 0.85, srcCol: String = "src",
      dstCol: String = "dst", saltBuckets: Int = 0): DataFrame = {
    require(iterations >= 0 && iterations <= 100, "bounded power iteration")
    require(damping > 0.0 && damping < 1.0)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nDf = nodes.agg(count(lit(1)).cast("double").as("n"))
    val outDeg = e.groupBy(col("src"))
      .agg(count(lit(1)).cast("double").as("outdeg"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var rank = Materialize(nodes.crossJoin(broadcast(nDf))
      .select(col("node"), round(lit(1.0) / col("n"), 9).as("rank")))
    for (_ <- 1 to iterations) {
      // rank stranded on dangling nodes, redistributed uniformly (grid
      // values -> the decimal sum is exact and order-independent)
      val dm = rank.join(outDeg, col("node") === col("src"), "left_anti")
        .agg(coalesce(exactSum(col("rank")), lit(0.0)).as("dm"))
      val perEdge = e.join(rank.withColumnRenamed("node", "src"), Seq("src"))
        .join(outDeg, Seq("src"))
        .select(col("src"), col("dst").as("node"),
          round(col("rank") / col("outdeg"), 9).as("c"))
      val contrib =
        if (saltBuckets > 1)
          // two-phase: keep partials in decimal (exact, associative) so the
          // salted sum is bit-identical to the flat exactSum
          perEdge
            .withColumn("salt", pmod(hash(col("src")), lit(saltBuckets)))
            .groupBy(col("node"), col("salt"))
            .agg(sum(col("c").cast("decimal(38,10)")).as("ps"))
            .groupBy(col("node"))
            .agg(sum(col("ps")).cast("double").as("s"))
        else
          perEdge.groupBy(col("node")).agg(exactSum(col("c")).as("s"))
      val prev = rank
      rank = Materialize(nodes.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(nDf)).crossJoin(broadcast(dm))
        .select(col("node"),
          round(lit(1.0 - damping) / col("n") +
            lit(damping) * (coalesce(col("s"), lit(0.0)) +
              col("dm") / col("n")), 9).as("rank")))
      // release the previous round's checkpoint blocks once the new round
      // is materialized (the CC-loop rule) — at iterations up to 100 the
      // per-round tables would otherwise accumulate for the whole job
      prev.unpersist()
    }
    e.unpersist(); nodes.unpersist(); outDeg.unpersist()
    rank
  }

  /** Per-node degree profile: (node, out_deg, in_deg) over the
    * deduplicated edge set — the one-pass report that sizes PageRank /
    * CC work and exposes hubs (the skew keys every downstream join
    * needs to know about). Two hash-aggs + one full outer join.
    */
  def degreeStats(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val out = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("out_deg"))
    val in = e.groupBy(col("dst").as("node")).agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("node"), "full_outer")
      .select(col("node"), coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }
}
