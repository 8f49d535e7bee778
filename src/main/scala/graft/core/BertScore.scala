package graft.core

/** BERTScore-shaped greedy token matching (SURVEY.md §2.9 M2; reference:
  * evaluate/evaluate_summaries_semantic.py:150-166).
  *
  * The FORMULA is BERTScore's: precision = mean over candidate tokens of
  * the best cosine against any reference token, recall symmetric, F1 the
  * harmonic mean. The reference computes it over contextual transformer
  * embeddings; our default embedder is the deterministic hashing-TF one
  * (graft.llm.HashingTfEmbedder applied per token), which makes the score
  * a soft token-overlap — a model-backed `Embedder` slots in without
  * touching this code (pure function over vectors).
  */
object BertScore {

  private def sqrtNormSq(a: Array[Float]): Double = {
    var na = 0.0
    var i = 0
    while (i < a.length) { val v = a(i).toDouble; na += v * v; i += 1 }
    math.sqrt(na)
  }

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var d = 0.0
    var i = 0
    while (i < n) { d += a(i).toDouble * b(i).toDouble; i += 1 }
    d
  }

  /** Greedy-match P/R/F1 between two token-embedding sequences. Empty
    * either side => all zeros (the reference's degenerate-case behavior).
    *
    * Norms are computed once per token and each pair's cosine once (the
    * precision and recall passes share the score matrix) — the same double
    * operations in the same order as the naive per-pair form, so results
    * are bit-identical, at a quarter of the flops.
    */
  def greedyMatch(cand: Array[Array[Float]], ref: Array[Array[Float]])
      : (Double, Double, Double) = {
    if (cand.isEmpty || ref.isEmpty) return (0.0, 0.0, 0.0)
    val cN = cand.map(sqrtNormSq)
    val rN = ref.map(sqrtNormSq)
    val s = Array.ofDim[Double](cand.length, ref.length)
    var i = 0
    while (i < cand.length) {
      var j = 0
      while (j < ref.length) {
        val den = cN(i) * rN(j)
        s(i)(j) = if (den == 0.0) 0.0 else dot(cand(i), ref(j)) / den
        j += 1
      }
      i += 1
    }
    var pSum = 0.0
    i = 0
    while (i < cand.length) {
      var best = Double.NegativeInfinity
      var j = 0
      while (j < ref.length) { if (s(i)(j) > best) best = s(i)(j); j += 1 }
      pSum += best
      i += 1
    }
    var rSum = 0.0
    var j = 0
    while (j < ref.length) {
      var best = Double.NegativeInfinity
      var i2 = 0
      while (i2 < cand.length) { if (s(i2)(j) > best) best = s(i2)(j); i2 += 1 }
      rSum += best
      j += 1
    }
    val p = pSum / cand.length
    val r = rSum / ref.length
    val f = if (p + r == 0.0) 0.0 else 2 * p * r / (p + r)
    (p, r, f)
  }
}
