package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{GraphAnn, Similarity}

/** Graph-ANN contracts: edge-table shape (top-m, symmetrized), beam
  * search finds planted near neighbors through the graph, determinism /
  * layout independence, and the guard rails.
  */
final class GraphAnnSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  /** Clustered synthetic corpus: `nClusters` well-separated directions,
    * members = the direction plus a small deterministic per-member
    * perturbation — nearest neighbors are same-cluster by construction.
    */
  private def clusteredEmb(n: Int, nClusters: Int, dim: Int = 16) = {
    import spark.implicits._
    (0 until n).map { i =>
      val c = i % nClusters
      val v = Array.tabulate(dim) { d =>
        val base = if (d == c) 4.0f else 0.0f
        base + 0.1f * (((i * 31 + d * 17) % 7) - 3)
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  test("knnGraph: out-degree <= m before symmetrize, edges symmetric, " +
      "no self-loops, same-cluster edges dominate") {
    val emb = clusteredEmb(60, 4)
    val g = GraphAnn.knnGraph(emb, 16, m = 4).cache()
    val rows = g.collect()
    assert(rows.nonEmpty)
    assert(!rows.exists(r => r.getLong(0) == r.getLong(1)), "self-loop")
    // symmetrized: every (src, dst) has (dst, src)
    val set = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(set.forall { case (a, b) => set.contains((b, a)) })
    // same-cluster edges dominate (nearest neighbors are in-cluster)
    val same = rows.count(r => r.getLong(0) % 4 == r.getLong(1) % 4)
    assert(same.toDouble / rows.length > 0.9,
      s"cross-cluster edge share too high: ${rows.length - same}/${rows.length}")
    g.unpersist()
  }

  test("beamSearch matches the exact scan on the clustered corpus and is " +
      "layout-independent") {
    val emb = clusteredEmb(60, 4)
    val q = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val exact = Similarity.bruteForceTopK(emb, q, 3)
      .select("query_id", "vec_id", "cosine", "rank").collect().toSet
    val approx = GraphAnn.graphTopK(emb, q, 3, 16, m = 4)
      .select("query_id", "vec_id", "cosine", "rank").collect().toSet
    // on a well-separated clustered corpus the graph search is exact
    assert(approx == exact)
    val repart = GraphAnn.graphTopK(emb.repartition(7), q.repartition(3),
      3, 16, m = 4)
      .select("query_id", "vec_id", "cosine", "rank").collect().toSet
    assert(repart == approx, "partitioning changed the result")
  }

  test("strided entries rescue a near-disconnected graph: single-entry " +
      "strands, multi-entry finds the twin") {
    // a flat k-NN graph over well-separated clusters is near-disconnected
    // across them (the measured failure that motivated strided entry):
    // entry = 1 seeds only near vec 0 and the beam strands outside the
    // query's cluster; the strided default covers every cluster and the
    // planted twin is found exactly
    val emb = clusteredEmb(60, 4)
    val q = emb.filter(col("vec_id") === 7) // cluster 3
      .select(col("vec_id").as("query_id"), col("embedding"))
    val g = GraphAnn.knnGraph(emb, 16, m = 4)
    val exact1 = Similarity.bruteForceTopK(emb, q, 1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val multi = GraphAnn.beamSearch(g, emb, q, 1, beam = 8, rounds = 3,
      entry = 8).select("vec_id").collect().map(_.getLong(0)).toSet
    assert(multi == exact1, s"strided entry missed the twin: $multi vs $exact1")
  }

  test("recall holds on a near-uniform random corpus (the registry's " +
      "hard case for every ANN family)") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val emb = (0 until 300).map(i =>
      (i.toLong, Array.fill(16)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val rec = Similarity.recallAtK(
        Similarity.bruteForceTopK(emb, q, 3),
        GraphAnn.graphTopK(emb, q, 3, 16))
      .agg(avg(col("recall"))).collect()(0).getDouble(0)
    assert(rec >= 0.6, f"graph recall too low on the uniform corpus: $rec%.3f")
  }

  test("guard rails: beam < k and bad params reject") {
    val emb = clusteredEmb(12, 2)
    val q = emb.select(col("vec_id").as("query_id"), col("embedding"))
    intercept[IllegalArgumentException] {
      GraphAnn.beamSearch(GraphAnn.knnGraph(emb, 16), emb, q,
        k = 8, beam = 4)
    }
    intercept[IllegalArgumentException] {
      GraphAnn.knnGraph(emb, 16, m = 0)
    }
  }
}
