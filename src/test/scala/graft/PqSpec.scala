package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Pq, Similarity}

/** Product-quantization invariants: deterministic training/encoding, code
  * shape, ADC+rerank recall floor on the clustered fixture (RecallSpec's
  * corpus shape), and the rerank-exactness property — every emitted cosine
  * must be bit-identical to the exact brute-force value for that pair,
  * because stage 2 reranks with the same split-cosine arithmetic.
  */
class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  import spark.implicits._

  private val dim = 64
  private val nClusters = 8
  private val perCluster = 25

  private lazy val corpusRows: Seq[(Long, Array[Float])] = {
    val rnd = new java.util.Random(42)
    val centers = Array.fill(nClusters, dim)(rnd.nextGaussian().toFloat)
    (0 until nClusters * perCluster).map { i =>
      val c = centers(i % nClusters)
      val v = Array.tabulate(dim)(d => c(d) + 0.15f * rnd.nextGaussian().toFloat)
      (i.toLong, v)
    }
  }

  test("trainPq is deterministic and shaped (m x ksub x dsub)") {
    val corpus = corpusRows.toDF("vec_id", "embedding")
    val a = Pq.trainPq(corpus, m = 8, ksub = 16, iterations = 2)
    val b = Pq.trainPq(corpus, m = 8, ksub = 16, iterations = 2)
    assert(a.length == 8 && a.forall(_.length == 16) &&
      a.forall(_.forall(_.length == dim / 8)))
    assert(a.flatten.flatten.toSeq == b.flatten.flatten.toSeq,
      "two trainings on the same corpus must produce identical codebooks")
  }

  test("pqEncode: m bytes per vector, deterministic, ragged rows dropped") {
    val corpus = corpusRows.toDF("vec_id", "embedding")
    val cb = Pq.trainPq(corpus, m = 8, ksub = 16, iterations = 1)
    val ragged = corpusRows.take(3)
      .map { case (id, v) => (id + 5000L, v.take(10)) }
    val withRagged = (corpusRows ++ ragged).toDF("vec_id", "embedding")
    val enc = Pq.pqEncode(withRagged, cb)
      .as[(Long, Array[Byte])].collect().sortBy(_._1)
    assert(enc.length == corpusRows.length, "ragged rows must be dropped")
    assert(enc.forall(_._2.length == 8), "every code vector is m bytes")
    val enc2 = Pq.pqEncode(withRagged, cb)
      .as[(Long, Array[Byte])].collect().sortBy(_._1)
    assert(enc.map(_._2.toSeq).toSeq == enc2.map(_._2.toSeq).toSeq)
  }

  test("PQ ADC+rerank top-k: recall@5 >= 0.9 on clustered data") {
    val corpus = corpusRows.toDF("vec_id", "embedding")
    val queries = corpusRows.take(6)
      .map { case (id, v) => (id + 1000L, v) }
      .toDF("query_id", "embedding")
    val exact = Similarity.bruteForceTopK(corpus, queries, 5)
    val approx = Pq.pqTopK(corpus, queries, 5)
    val recalls = Similarity.recallAtK(exact, approx)
      .select("recall").as[Double].collect()
    val r = recalls.sum / recalls.length
    assert(r >= 0.9, s"PQ mean recall@5 $r below floor 0.9")
  }

  test("rerank exactness: every emitted cosine equals the brute-force value") {
    val corpus = corpusRows.toDF("vec_id", "embedding")
    val queries = corpusRows.take(6)
      .map { case (id, v) => (id + 1000L, v) }
      .toDF("query_id", "embedding")
    // brute-force at full depth = the exact cosine for EVERY candidate pair
    val exactAll = Similarity.bruteForceTopK(corpus, queries, corpusRows.length)
      .select($"query_id", $"vec_id", $"cosine".as("cos_exact"))
    val pq = Pq.pqTopK(corpus, queries, 5)
      .select($"query_id", $"vec_id", $"cosine")
    val joined = pq.join(exactAll, Seq("query_id", "vec_id"))
    assert(joined.count() == pq.count(), "every PQ row must match a pair")
    val mismatches = joined.filter($"cosine" =!= $"cos_exact").count()
    assert(mismatches == 0,
      "reranked cosines must be bit-identical to the exact arithmetic")
  }
}
