package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}

/** Quantitative recall floors for every approximate ANN path against its
  * exact baseline — "finds the identical vector" smoke tests pass even at
  * 10% recall, so an LSH/IVF parameter regression needs a measured floor to
  * be caught. Data is a deterministic clustered corpus (the workload these
  * indexes exist for: real embedding spaces cluster); the registered
  * ss2_recall / ss3_recall / dd6b_recall queries measure the same numbers
  * on the driver's near-uniform synthetic corpus (the adversarial case —
  * operating points recorded in SCALE.md).
  */
class RecallSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  import spark.implicits._

  private val dim = 64
  private val nClusters = 8
  private val perCluster = 25

  /** java.util.Random's LCG is spec-pinned, so this corpus is identical on
    * every platform/run: `nClusters` unit-ish centers, `perCluster` points
    * each at a small angular perturbation (intra-cluster cosine ~0.95+,
    * inter-cluster ~0 in 64-dim).
    */
  private lazy val corpusRows: Seq[(Long, Array[Float])] = {
    val rnd = new java.util.Random(42)
    val centers = Array.fill(nClusters, dim)(rnd.nextGaussian().toFloat)
    (0 until nClusters * perCluster).map { i =>
      val c = centers(i % nClusters)
      val v = Array.tabulate(dim)(d => c(d) + 0.15f * rnd.nextGaussian().toFloat)
      (i.toLong, v)
    }
  }

  private def meanRecall(df: org.apache.spark.sql.DataFrame): Double = {
    val rows = df.select("recall").as[Double].collect()
    rows.sum / rows.length
  }

  test("SS2 sign-LSH top-k: recall@5 >= 0.9 at default parameters") {
    val corpus = corpusRows.toDF("vec_id", "embedding")
    val queries = corpusRows.take(6)
      .map { case (id, v) => (id + 1000L, v) }
      .toDF("query_id", "embedding")
    val exact = Similarity.bruteForceTopK(corpus, queries, 5)
    val approx = Similarity.lshTopK(corpus, queries, 5, dim)
    val r = meanRecall(Similarity.recallAtK(exact, approx))
    assert(r >= 0.9, s"sign-LSH mean recall@5 $r below floor 0.9")
  }

  test("SS2 without multiprobe loses recall (the probe shell earns its cost)") {
    val corpus = corpusRows.toDF("vec_id", "embedding")
    val queries = corpusRows.take(6)
      .map { case (id, v) => (id + 1000L, v) }
      .toDF("query_id", "embedding")
    val exact = Similarity.bruteForceTopK(corpus, queries, 5)
    val on = meanRecall(Similarity.recallAtK(exact,
      Similarity.lshTopK(corpus, queries, 5, dim, multiProbe1 = true)))
    val off = meanRecall(Similarity.recallAtK(exact,
      Similarity.lshTopK(corpus, queries, 5, dim, multiProbe1 = false)))
    assert(on >= off, s"multiprobe on=$on must not trail off=$off")
  }

  test("SS3 IVF top-k: recall@5 >= 0.9 at default parameters on clustered data") {
    val corpus = corpusRows.toDF("vec_id", "embedding")
    val queries = corpusRows.take(6)
      .map { case (id, v) => (id + 1000L, v) }
      .toDF("query_id", "embedding")
    val exact = Similarity.bruteForceTopK(corpus, queries, 5)
    val approx = Similarity.ivfTopK(corpus, queries, 5, dim)
    val r = meanRecall(Similarity.recallAtK(exact, approx))
    assert(r >= 0.9, s"IVF mean recall@5 $r below floor 0.9")
  }

  test("DD6b LSH near-dup pairs: pair-recall >= 0.9 vs the exact baseline") {
    val emb = corpusRows.toDF("vec_id", "embedding")
    val exact = Dedup.embeddingCosinePairs(emb, 0.85)
    val approx = Dedup.embeddingCosinePairsLsh(emb, 0.85, dim)
    val row = Similarity.pairRecall(exact, approx)
      .select("n_exact", "n_approx", "n_hit", "recall")
      .as[(Long, Long, Long, Double)].head()
    assert(row._1 > 100, s"degenerate fixture: only ${row._1} exact pairs")
    assert(row._4 >= 0.9, s"dd6b pair-recall ${row._4} below floor 0.9")
  }

  test("SemDeDup pairs: pair-recall >= 0.9 vs the exact baseline on clustered data") {
    val emb = corpusRows.toDF("vec_id", "embedding")
    val exact = Dedup.embeddingCosinePairs(emb, 0.85)
    val approx = graft.operators.Clustering.semDedupPairs(emb, 0.85, nClusters)
    val row = Similarity.pairRecall(exact, approx)
      .select("n_exact", "n_approx", "n_hit", "recall")
      .as[(Long, Long, Long, Double)].head()
    assert(row._1 > 100, s"degenerate fixture: only ${row._1} exact pairs")
    assert(row._4 >= 0.9, s"SemDeDup pair-recall ${row._4} below floor 0.9")
    // precision is exactly 1.0: within-cluster pairs are exact-scored
    assert(row._2 == row._3, "SemDeDup emitted a pair the exact baseline lacks")
  }
}
