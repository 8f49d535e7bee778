package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Quantize, Similarity}

class QuantizeSpec extends AnyFunSuite {
  private val spark = SparkSuite.spark
  import spark.implicits._

  test("QZ1 quantizeInt8: exact values, clamp, zero vector, error bound") {
    val emb = Seq(
      (1L, Array(1.0f, -0.6f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)), // zero vector
      (3L, Array(-2.0f, 1.0f, 0.5f, -0.25f)))
      .toDF("vec_id", "embedding")
    val got = Quantize.quantizeInt8(emb).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Double]("scale"),
          r.getAs[scala.collection.Seq[Byte]]("qvec").toSeq,
          r.getAs[Double]("max_abs_err")))).toMap
    // vec 1: scale = 1/127; q = round(x*127) = 127, -76, 32, 0 (no value
    // lands on a .5 rounding tie — tie direction under float dust is not a
    // contract this operator makes)
    val (s1, q1, e1) = got(1L)
    assert(math.abs(s1 - 1.0 / 127) < 1e-12)
    assert(q1 == Seq[Byte](127, -76, 32, 0))
    assert(e1 <= s1 / 2 + 1e-12)
    // zero vector: scale 0, all-zero qvec, zero error
    val (s2, q2, e2) = got(2L)
    assert(s2 == 0.0 && q2 == Seq[Byte](0, 0, 0, 0) && e2 == 0.0)
    // vec 3: max|x| lands exactly on +-127
    val (s3, q3, e3) = got(3L)
    assert(math.abs(s3 - 2.0 / 127) < 1e-12)
    assert(q3.head == -127)
    assert(e3 <= s3 / 2 + 1e-12)
  }

  test("QZ2 quantizedTopK: matches exact ranking on separated clusters") {
    // three well-separated directions; queries are members of each cluster
    def jitter(base: Array[Float], eps: Float) = base.map(_ + eps)
    val a = Array(1.0f, 0.0f, 0.0f, 0.1f)
    val b = Array(0.0f, 1.0f, 0.0f, 0.1f)
    val c = Array(0.0f, 0.0f, 1.0f, 0.1f)
    val corpus = (0 until 30).map { i =>
      val base = (i % 3) match { case 0 => a; case 1 => b; case _ => c }
      (i.toLong, jitter(base, 0.001f * (i / 3)))
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val exact = Similarity.bruteForceTopK(corpus, queries, 5)
    val quant = Quantize.quantizedTopK(corpus, queries, 5)
    val recall = Similarity.recallAtK(exact, quant)
      .agg(min("recall")).as[Double].head()
    assert(recall >= 0.8, s"int8 recall collapsed: $recall")
    // top-1 (nearest same-cluster member) must survive quantization
    val top1e = exact.filter(col("rank") === 1)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val top1q = quant.filter(col("rank") === 1)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(top1e == top1q)
  }

  test("QZ5 matryoshkaTruncate: prefix slice; info-bearing prefix keeps the ranking") {
    val emb = Seq((0L, Array(1f, 2f, 3f, 4f))).toDF("vec_id", "embedding")
    val t = Quantize.matryoshkaTruncate(emb, 2)
      .as[(Long, Array[Float])].head()
    assert(t._2.toSeq == Seq(1f, 2f))
    // MRL-shaped corpus: direction lives in the first 2 dims, the tail is
    // a constant pad — truncated search must reproduce the full ranking
    val vecs = (0 until 12).map { i =>
      val v = Array.fill(4)(0.1f); v(i % 2) = 1f + i * 0.01f; (i.toLong, v)
    }
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val full = Similarity.bruteForceTopK(corpus, queries, 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val tc = Quantize.matryoshkaTruncate(corpus, 2)
    val tq = tc.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val trunc = Similarity.bruteForceTopK(tc, tq, 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = full.intersect(trunc).size.toDouble / full.size
    assert(recall >= 0.8, s"prefix search lost the ranking: $recall")
  }

  test("QZ6 signBits/signTopK: exact packing, Hamming order, octant recovery") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Quantize
    // dim 40 -> 2 words (32 + 8 bits); known pattern: alternating signs
    val v = Array.tabulate(40)(i => if (i % 2 == 0) 1f else -1f)
    val sig = Seq((1L, v)).toDF("vec_id", "embedding")
      .select(Quantize.signBits(col("embedding"), 40).as("s"))
      .as[Array[Long]].head()
    // bits 0,2,4,..,30 of word 0 -> 0x55555555; bits 0,2,4,6 of word 1
    assert(sig.toSeq == Seq(0x55555555L, 0x55L))
    // identical vector -> hamming 0 -> rank 1; sign-flipped -> last
    val base = Array.tabulate(16)(i => 0.1f * (i % 5) + 0.05f) // all positive
    def flip(n: Int) = Array.tabulate(16)(i => if (i < n) -base(i) else base(i))
    val corpus = Seq((10L, base), (11L, flip(2)), (12L, flip(8)),
      (13L, flip(16))).toDF("vec_id", "embedding")
    val q = Seq((100L, base)).toDF("query_id", "embedding")
    val got = Quantize.signTopK(corpus, q, 4, 16)
      .orderBy(col("rank")).select("vec_id", "hamming")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((10L, 0L), (11L, 2L), (12L, 8L), (13L, 16L)))
    // two-stage: shortlist by hamming, rank by EXACT cosine — emitted
    // cosines must be bit-identical to brute force on the same pairs
    val rr = Quantize.signTopKReranked(corpus, q, 3, 16, shortlist = 4)
      .select($"query_id", $"vec_id", $"cosine")
    val exact = graft.operators.Similarity.bruteForceTopK(corpus, q, 4)
      .select($"query_id", $"vec_id", $"cosine".as("cos_exact"))
    val joined = rr.join(exact, Seq("query_id", "vec_id"))
    assert(joined.count() == rr.count())
    assert(joined.filter($"cosine" =!= $"cos_exact").count() == 0)
  }
}
