package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Clustering, Dedup}

/** Clustering + SemDeDup: determinism, coverage, precision (every emitted
  * pair is exact-scored so it must appear in the cartesian baseline), and
  * end-to-end group resolution. Recall floors live in RecallSpec.
  */
class ClusteringSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  import spark.implicits._

  private val dim = 16
  private val k = 4

  /** Deterministic clustered corpus (spec-pinned LCG): `k` well-separated
    * centers, 20 points each at small perturbation, plus one exact
    * duplicate pair planted inside cluster 0 (ids 1000/1001).
    */
  private lazy val rows: Seq[(Long, Array[Float])] = {
    val rnd = new java.util.Random(7)
    val centers = Array.fill(k, dim)(rnd.nextGaussian().toFloat * 3f)
    val base = (0 until k * 20).map { i =>
      val c = centers(i % k)
      (i.toLong, Array.tabulate(dim)(d => c(d) + 0.1f * rnd.nextGaussian().toFloat))
    }
    val dup = base.head._2.clone()
    base ++ Seq((1000L, dup), (1001L, dup.map(x => x * 1.001f)))
  }

  test("training-sample ceiling: capped auto-modulus trains the same model as the explicit modulus") {
    // 1.2M tiny vectors exceed MaxTrainVectors (2^20): the ceiling raises
    // the modulus to 2, which must be indistinguishable from the caller
    // passing trainSampleMod = 2 — model AND assignment identical.
    val emb = spark.range(1200000L).select(col("id").as("vec_id"),
      array((col("id") % 17).cast("float"), (col("id") % 5).cast("float"))
        .as("embedding"))
    val capped = Clustering.kmeansAssign(emb, 4, iterations = 1)
    val explicit = Clustering.kmeansAssign(emb, 4, iterations = 1,
      trainSampleMod = 2)
    assert(capped.exceptAll(explicit).isEmpty && explicit.exceptAll(capped).isEmpty,
      "auto-capped training must equal the explicit-modulus training")
  }

  test("kmeansAssign: every vector assigned, clusters within range, deterministic") {
    val emb = rows.toDF("vec_id", "embedding")
    val a = Clustering.kmeansAssign(emb, k, iterations = 2)
      .as[(Long, Int)].collect().toMap
    assert(a.size == rows.size)
    assert(a.values.forall(c => c >= 0 && c < k))
    // partition-layout independence: same model, any physical layout
    val b = Clustering.kmeansAssign(emb.repartition(7, col("vec_id")), k, 2)
      .as[(Long, Int)].collect().toMap
    assert(a == b)
  }

  test("kmeansAssign separates the planted clusters") {
    val emb = rows.toDF("vec_id", "embedding")
    val byCluster = Clustering.kmeansAssign(emb, k, iterations = 2)
      .as[(Long, Int)].collect()
      .groupBy { case (id, _) => if (id >= 1000L) 0L else id % k }
    // all members of one generated cluster land in one learned cell
    byCluster.foreach { case (gen, members) =>
      assert(members.map(_._2).distinct.length == 1,
        s"generated cluster $gen split across cells")
    }
  }

  test("clusterSizes sums to the corpus and reflects the planted duplicates") {
    val emb = rows.toDF("vec_id", "embedding")
    val sizes = Clustering.clusterSizes(emb, k, 2).as[(Int, Long)].collect().toMap
    assert(sizes.values.sum == rows.size)
    assert(sizes.values.max == 22L) // cluster 0 carries the two planted dups
  }

  test("semDedupPairs: precision 1.0 (subset of the exact cartesian) and finds planted dups") {
    val emb = rows.toDF("vec_id", "embedding")
    val sem = Clustering.semDedupPairs(emb, 0.95, k, 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = Dedup.embeddingCosinePairs(emb, 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sem.subsetOf(exact), "within-cluster exact scoring cannot invent pairs")
    assert(sem.contains((1000L, 1001L)), "planted duplicate pair missed")
    assert(sem.contains((0L, 1000L)), "exact copy of vector 0 missed")
  }

  test("maxClusterSize caps degenerate cells") {
    val emb = rows.toDF("vec_id", "embedding")
    val capped = Clustering.semDedupPairs(emb, 0.95, k, 2, maxClusterSize = Some(5))
    // every cell has >= 20 members, so the cap drops all of them
    assert(capped.isEmpty)
  }

  test("CentroidIndex: two-level pruned search identical to the flat scan") {
    import graft.operators.CentroidIndex
    // a model big enough that the auto build genuinely splits into many
    // coarse groups and prunes (256 cells -> 16 groups), over queries that
    // include centroid-boundary points, exact centroid copies (ties), a
    // zero vector, and a zero-norm centroid
    val rnd = new java.util.Random(11)
    val d = 24
    val cs: Array[Array[Float]] =
      Array.tabulate(255)(_ => Array.fill(d)(rnd.nextGaussian().toFloat)) :+
        Array.fill(d)(0f)
    val idx = CentroidIndex.build(cs)
    val queries: Seq[Array[Float]] =
      (0 until 200).map(_ => Array.fill(d)(rnd.nextGaussian().toFloat)) ++
        Seq(cs(17).clone(), cs(254).clone(), Array.fill(d)(0f),
          // exact midpoint of two centroids: a near-tie for the bound
          Array.tabulate(d)(i => (cs(3)(i) + cs(4)(i)) / 2f))
    for (q <- queries; n <- Seq(1, 2, 6)) {
      assert(idx.search(q, n).toSeq == idx.flatSearch(q, n).toSeq,
        s"pruned search diverged from flat at n=$n")
    }
    // a forced fine-grained coarse model (more pruning pressure) agrees too
    val idx64 = CentroidIndex.build(cs, nCoarse = 64)
    for (q <- queries)
      assert(idx64.search(q, 2).toSeq == idx64.flatSearch(q, 2).toSeq)
  }

  test("CentroidIndex.searchApprox: bounded groups, structured accuracy, twin consistency") {
    import graft.operators.CentroidIndex
    val rnd = new java.util.Random(13)
    val d = 24
    // STRUCTURED centroid model — the regime a TRAINED k-means actually
    // produces (centroids concentrate around the data's modes, so the
    // coarse Lloyd grouping recovers real structure): 16 super-centers,
    // 16 centroids each at small spread
    val supers = Array.fill(16, d)(rnd.nextGaussian().toFloat * 3f)
    val cs: Array[Array[Float]] = Array.tabulate(256) { i =>
      val s = supers(i / 16)
      Array.tabulate(d)(j => s(j) + 0.2f * rnd.nextGaussian().toFloat)
    }
    val idx = CentroidIndex.build(cs)
    val queries = (0 until 300).map { _ =>
      val s = supers(rnd.nextInt(16))
      Array.tabulate(d)(j => s(j) + 0.5f * rnd.nextGaussian().toFloat)
    }
    // a huge cap IS the exact search (the prune path is shared)
    for (q <- queries.take(50))
      assert(idx.searchApprox(q, 2, Int.MaxValue).toSeq == idx.search(q, 2).toSeq)
    // a tight cap (4 of ~16 groups) recovers the true nearest cell on
    // structured models essentially always
    val agree = queries.count(q =>
      idx.searchApprox(q, 1, 4).headOption == idx.search(q, 1).headOption)
    assert(agree >= (queries.size * 0.97).toInt,
      s"approx top-1 agreement too low on structured model: $agree/${queries.size}")
    // TWIN CONSISTENCY — the property SemDeDup actually rides: a
    // near-duplicate pair must land in the SAME cells even when the
    // absolute assignment is the second-best (both vectors walk the same
    // group order), else the pair is never co-candidate. Worst case
    // (UNSTRUCTURED random centroids, where coarse search degrades):
    val randCs: Array[Array[Float]] =
      Array.tabulate(256)(_ => Array.fill(d)(rnd.nextGaussian().toFloat))
    val randIdx = CentroidIndex.build(randCs)
    val twinsAgree = (0 until 200).count { _ =>
      val v = Array.fill(d)(rnd.nextGaussian().toFloat)
      val w = Array.tabulate(d)(j => v(j) * 1.001f + 0.001f) // jittered twin
      randIdx.searchApprox(v, 2, 4).toSeq == randIdx.searchApprox(w, 2, 4).toSeq
    }
    assert(twinsAgree >= 196, s"near-dup twins split cells: $twinsAgree/200")
    // always top-n distinct, never more than n, never empty on live data
    for (q <- queries.take(20)) {
      val r = idx.searchApprox(q, 3, 2)
      assert(r.length <= 3 && r.distinct.length == r.length && r.nonEmpty)
    }
    intercept[IllegalArgumentException] { idx.searchApprox(queries.head, 1, 0) }
  }

  test("semDedupPairs assignGroups: ANN-assisted form keeps precision and the planted dups") {
    val emb = rows.toDF("vec_id", "embedding")
    val ann = Clustering.semDedupPairs(emb, 0.95, k, 2, assignGroups = 4)
      .select("id_a", "id_b", "cosine")
      .as[(Long, Long, Double)].collect().toSet
    // precision 1.0: scoring is the exact formula whatever assigned the
    // cluster — every pair is in the exact cartesian at the threshold
    val exact = Dedup.embeddingCosinePairs(emb, 0.95)
      .select("id_a", "id_b", "cosine")
      .as[(Long, Long, Double)].collect().toSet
    assert(ann.subsetOf(exact))
    // the planted near-dup group still surfaces
    val ids = ann.flatMap(p => Seq(p._1, p._2))
    assert(ids.contains(0L) && ids.contains(1000L) && ids.contains(1001L))
    // deterministic across layouts
    val ann2 = Clustering.semDedupPairs(emb.repartition(7), 0.95, k, 2,
        assignGroups = 4)
      .select("id_a", "id_b", "cosine").as[(Long, Long, Double)].collect().toSet
    assert(ann2 == ann)
  }

  test("semDedupPairsRouted: measured probe picks a branch; both branches hold the contract") {
    val emb = rows.toDF("vec_id", "embedding")
    // this corpus is pair-sparse at 0.95 (only the planted group), so the
    // probe routes to the LSH listing — identical rows to calling it
    val routed = Clustering.semDedupPairsRouted(emb, 0.95, dim)
      .select("id_a", "id_b", "cosine").as[(Long, Long, Double)].collect().toSet
    val lsh = Dedup.embeddingCosinePairsLsh(emb, 0.95, dim)
      .select("id_a", "id_b", "cosine").as[(Long, Long, Double)].collect().toSet
    assert(routed == lsh && routed.nonEmpty)
    // knownPairsPerDoc pins the branch (the sessionWindowSkewSafe
    // convention): forcing "pair-dense" routes to the clustered shape,
    // which must still surface the planted group with exact cosines
    val clustered = Clustering.semDedupPairsRouted(emb, 0.95, dim,
        knownPairsPerDoc = Some(1e9))
      .select("id_a", "id_b", "cosine").as[(Long, Long, Double)].collect().toSet
    val exact = Dedup.embeddingCosinePairs(emb, 0.95)
      .select("id_a", "id_b", "cosine").as[(Long, Long, Double)].collect().toSet
    assert(clustered.subsetOf(exact))
    val ids = clustered.flatMap(p => Seq(p._1, p._2))
    assert(ids.contains(0L) && ids.contains(1000L) && ids.contains(1001L))
    // schema identical whichever branch fires
    assert(Clustering.semDedupPairsRouted(emb, 0.95, dim).columns.toSeq ==
      Clustering.semDedupPairsRouted(emb, 0.95, dim,
        knownPairsPerDoc = Some(1e9)).columns.toSeq)
    intercept[IllegalArgumentException] {
      Clustering.semDedupPairsRouted(emb, 0.95, dim, pairBudgetPerDoc = 0.0)
    }
  }

  test("router probe: structured id space stays driver-bounded, routing unchanged") {
    // ids all multiples of 1024 with n/sampleTarget = 4 and 4 | 1024 —
    // the adversarial case for raw `vec_id % mod` sampling, which would
    // select EVERY row (r11 verdict wrong #1). The hash-keyed sample plus
    // TakeOrdered cap must keep driver rows <= 2*sampleTarget whatever
    // the id structure.
    val structured = rows.take(64).zipWithIndex
      .map { case ((_, e), i) => (i.toLong * 1024L, e) }
      .toDF("vec_id", "embedding")
    val (sampled, est) = Clustering.probePairMass(structured, 64L, 0.95, 16)
    assert(sampled > 0 && sampled <= 32, s"driver sample: $sampled")
    assert(est >= 0.0)
    // the routed entry's rows are unchanged by the id structure: still
    // identical to the LSH branch it picks on this pair-sparse corpus
    val routed = Clustering.semDedupPairsRouted(structured, 0.95, dim,
        sampleTarget = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingCosinePairsLsh(structured, 0.95, dim)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(routed == lsh)
  }

  test("kmeansAssign auto-k (nClusters <= 0) resolves like semDedupPairs") {
    val emb = rows.toDF("vec_id", "embedding")
    // 82 rows at targetClusterSize 16 -> ceil(82/16) = 6 cells, floor 8
    val a = Clustering.kmeansAssign(emb, 0, iterations = 1,
      targetClusterSize = 16).as[(Long, Int)].collect()
    assert(a.length == rows.size)
    assert(a.forall { case (_, c) => c >= 0 && c < 8 })
  }

  test("semDedupCorpus keeps one representative per semantic group") {
    val emb = rows.toDF("vec_id", "embedding")
    val kept = Clustering.semDedupCorpus(emb, 0.95, k, 2)
      .select("vec_id").as[Long].collect().toSet
    // the {0, 1000, 1001} group resolves to its min id
    assert(kept.contains(0L))
    assert(!kept.contains(1000L) && !kept.contains(1001L))
    // nothing outside flagged groups is dropped
    val losers = rows.map(_._1).toSet -- kept
    val pairMembers = Clustering.semDedupPairs(emb, 0.95, k, 2)
      .select("id_a", "id_b").as[(Long, Long)].collect()
      .flatMap(p => Seq(p._1, p._2)).toSet
    assert(losers.subsetOf(pairMembers))
  }
}
