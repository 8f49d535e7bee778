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

  test("IVF-PQ: deterministic, recall floor on clustered data, index shape") {
    val corpus = corpusRows.toDF("vec_id", "embedding")
    val queries = corpusRows.take(6)
      .map { case (id, v) => (id + 1000L, v) }
      .toDF("query_id", "embedding")
    val (index, cs, cbs) = Pq.buildIvfPqIndex(corpus, nCells = 8)
    // inverted file: one row per vector, m code bytes, cell in range
    val rows = index.select($"vec_id", $"cell",
        org.apache.spark.sql.functions.length($"codes").as("nb"))
      .as[(Long, Int, Int)].collect()
    assert(rows.length == corpusRows.length)
    assert(rows.forall { case (_, c, nb) => c >= 0 && c < 8 && nb == 8 })
    // clustered fixture: the coarse cells recover the planted clusters
    // well enough that probe-6-of-8 + shortlist-50 clears 0.9
    val exact = Similarity.bruteForceTopK(corpus, queries, 5)
    val approx = Pq.ivfPqSearch(index, cs, cbs, corpus, queries, 5, nProbe = 6)
    val recalls = Similarity.recallAtK(exact, approx)
      .select("recall").as[Double].collect()
    val r = recalls.sum / recalls.length
    assert(r >= 0.9, s"IVF-PQ mean recall@5 $r below floor 0.9")
    // two builds + searches are row-identical (all seeding is keyed)
    val again = Pq.ivfPqTopK(corpus, queries, 5, nCells = 8, nProbe = 6)
    val once = Pq.ivfPqTopK(corpus, queries, 5, nCells = 8, nProbe = 6)
    assert(again.exceptAll(once).count() == 0 &&
      once.exceptAll(again).count() == 0)
  }

  test("IVF-PQ rerank exactness and probe pruning") {
    val corpus = corpusRows.toDF("vec_id", "embedding")
    val queries = corpusRows.take(4)
      .map { case (id, v) => (id + 1000L, v) }
      .toDF("query_id", "embedding")
    val (index, cs, cbs) = Pq.buildIvfPqIndex(corpus, nCells = 8)
    // emitted cosines are the exact brute-force arithmetic (stage-2 rerank)
    val exactAll = Similarity.bruteForceTopK(corpus, queries, corpusRows.length)
      .select($"query_id", $"vec_id", $"cosine".as("cos_exact"))
    val got = Pq.ivfPqSearch(index, cs, cbs, corpus, queries, 5, nProbe = 6)
      .select($"query_id", $"vec_id", $"cosine")
    val joined = got.join(exactAll, Seq("query_id", "vec_id"))
    assert(joined.count() == got.count())
    assert(joined.filter($"cosine" =!= $"cos_exact").count() == 0)
    // probe pruning: with nProbe = 1 every hit lies in the query's own
    // nearest cell — no result may come from an unprobed cell
    val one = Pq.ivfPqSearch(index, cs, cbs, corpus, queries, 5, nProbe = 1)
      .select($"query_id", $"vec_id")
    val cellOf = index.select($"vec_id", $"cell").as[(Long, Int)]
      .collect().toMap
    val qCells = corpusRows.take(4).map { case (id, v) =>
      (id + 1000L) -> cellOf(id) // query vector == corpus vector id
    }.toMap
    val hits = one.as[(Long, Long)].collect()
    assert(hits.nonEmpty)
    assert(hits.forall { case (qid, vid) => cellOf(vid) == qCells(qid) },
      "nProbe=1 results must all come from the single probed cell")
  }

  test("ivfPqSearch maxQueries contract: over-cap fails loudly, at-cap serves") {
    val corpus = corpusRows.toDF("vec_id", "embedding")
    val queries = corpusRows.take(4)
      .map { case (id, v) => (id + 1000L, v) }
      .toDF("query_id", "embedding")
    val (index, cs, cbs) = Pq.buildIvfPqIndex(corpus, nCells = 8)
    // the ADC tables are built per query ON THE DRIVER - a corpus-sized
    // query set must trip the limit+require guard, not OOM silently
    val e = intercept[IllegalArgumentException] {
      Pq.ivfPqSearch(index, cs, cbs, corpus, queries, 5, nProbe = 6,
        maxQueries = 3)
    }
    assert(e.getMessage.contains("maxQueries"))
    // exactly at the cap serves normally, and the one-shot form plumbs
    // the parameter through
    assert(Pq.ivfPqSearch(index, cs, cbs, corpus, queries, 5, nProbe = 6,
      maxQueries = 4).count() > 0)
    assert(intercept[IllegalArgumentException] {
      Pq.ivfPqTopK(corpus, queries, 5, nCells = 8, maxQueries = 3)
    }.getMessage.contains("maxQueries"))
  }
}
