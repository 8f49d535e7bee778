package graft.llm

import graft.core.Text

/** In-process MODEL-backed extractive summarizer — the embedding-space
  * member of the scalar family (extractive = corpus-free TF, textrank =
  * graph centrality, mmr = semantic relevance − redundancy):
  *
  *  - every sentence embeds with the hermetic transformer
  *    ([[TinyTransformer]] — deterministic seeded weights, no endpoint);
  *  - relevance = cosine(sentence, document centroid) where the centroid
  *    is the mean sentence embedding;
  *  - the RANKING is Maximal Marginal Relevance (Carbonell & Goldstein
  *    1998): repeatedly take argmax of
  *    `lambda·rel(s) − (1−lambda)·max_{p ranked} cos(s, p)` —
  *    relevance first, redundancy penalized as the summary grows. Ties
  *    break to the earlier sentence.
  *  - selection + emission reuse [[ExtractiveSummarizer]]'s exact greedy
  *    budget walk (first pick always taken, skip-if-over-budget,
  *    original-order join, final truncation), so the family's scalars
  *    differ ONLY in how sentences are ordered.
  *
  * Deterministic: the encoder is bit-stable and the MMR loop is pure
  * double arithmetic with a positional tie-break. Bounded: `MaxSents`
  * caps the O(n²) sentence-pair similarities per doc (the TextRank
  * bound — 100 TB is many docs, never a big per-doc problem); sentences
  * past the cap rank after the capped prefix in original order.
  */
object MmrSummarizer extends Summarizer {
  val Lambda = 0.7
  val MaxSents = 256
  private val model = TinyTransformer()

  override def summarize(text: String, maxTokens: Int): String =
    prepared(text)(maxTokens)

  override def prepared(text: String): Int => String = {
    val sents = Text.sentences(text)
    if (sents.isEmpty) return _ => ""
    val n = sents.length
    val m = math.min(n, MaxSents)
    val embs = sents.take(m).map(model.embed)
    val dim = model.dim
    // centroid of the (unit-norm) sentence embeddings
    val centroid = new Array[Double](dim)
    embs.foreach { e =>
      var d = 0
      while (d < dim) { centroid(d) += e(d); d += 1 }
    }
    def cosD(a: Array[Float], b: Array[Double]): Double = {
      var dot = 0.0
      var nb = 0.0
      var d = 0
      while (d < dim) { dot += a(d) * b(d); nb += b(d) * b(d); d += 1 }
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (na * math.sqrt(nb))
    }
    def cosF(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0
      var d = 0
      while (d < dim) { dot += a(d).toDouble * b(d); d += 1 }
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (na * nb)
    }
    val rel = embs.map(cosD(_, centroid))
    // MMR ranking over the capped prefix
    val order = new Array[Int](m)
    val maxSim = Array.fill(m)(Double.NegativeInfinity)
    val picked = new Array[Boolean](m)
    var r = 0
    while (r < m) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < m) {
        if (!picked(i)) {
          val red = if (r == 0) 0.0 else (1.0 - Lambda) * maxSim(i)
          val s = Lambda * rel(i) - red
          if (s > bestScore) { bestScore = s; best = i }
        }
        i += 1
      }
      order(r) = best
      picked(best) = true
      var j = 0
      while (j < m) {
        if (!picked(j)) {
          val s = cosF(embs(j), embs(best))
          if (s > maxSim(j)) maxSim(j) = s
        }
        j += 1
      }
      r += 1
    }
    val ranking = order.toSeq ++ (m until n) // past-cap tail in doc order
    BudgetWalk.emitter(sents, ranking)
  }
}
