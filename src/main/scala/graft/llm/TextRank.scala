package graft.llm

import graft.core.Text

/** TextRank extractive summarizer (Mihalcea & Tarau 2004, "TextRank:
  * Bringing Order into Text" §4) — the standard non-neural extractive
  * baseline, as the in-process quality upgrade over the TF-scored
  * [[ExtractiveSummarizer]]: sentence salience is GLOBAL (a sentence
  * scores high when the sentences most similar to it are themselves
  * central) instead of local term frequency.
  *
  * Algorithm, pinned for oracle replay (the q6 oracle re-runs every step
  * in SQL, so each choice here is frozen deliberately):
  *  - similarity(i, j) = |shared distinct metric tokens| /
  *    (ln|Ti| + ln|Tj|), Ti = sentence i's DISTINCT metric-token set
  *    (the paper's overlap/log-length normalization, on token types so
  *    the overlap and the normalizer count the same universe); pairs
  *    with zero overlap or non-positive denominator (single-token
  *    sentences) get weight 0.
  *  - undirected graph over the first [[MaxSents]] sentences (the n^2
  *    pair loop must be bounded per document — 100 TB is many documents,
  *    never a big per-doc graph; sentences past the cap rank 0 and sort
  *    last, they are not silently dropped from selection).
  *  - [[Iterations]] fixed power-iteration rounds of
  *    r_i = (1-d)/m + d * sum_j w_ij / W_j * r_j  (W_j = sum_k w_jk,
  *    dangling sentences contribute nothing), d = [[Damping]]; fixed
  *    round count, not convergence-tested — determinism over elegance.
  *  - ranks are snapped to a 1e-6 grid BEFORE ordering, and the snap is
  *    the LITERAL double expression `floor(r * 1e6 + 0.5) / 1e6` in both
  *    engines (decimal-rounding library calls differ between JVM
  *    BigDecimal and DuckDB round() — the cross-engine round(double)
  *    divergence class the LM means hit; identical IEEE ops sidestep it),
  *    so a mathematically-tied pair computed in different summation
  *    orders cannot flip order across engines; ties break by earlier
  *    position.
  *  - selection + emission reuse [[ExtractiveSummarizer]]'s exact greedy
  *    budget walk (first sentence always taken, skip-if-over-budget,
  *    original-order join, final token truncation) so the two extractive
  *    scalars differ ONLY in the scoring function.
  */
object TextRankSummarizer extends Summarizer {
  val Damping = 0.85
  val Iterations = 10
  val MaxSents = 256

  override def summarize(text: String, maxTokens: Int): String =
    prepared(text)(maxTokens)

  /** Graph build + power iteration happen ONCE per text; each budget call
    * only walks the precomputed ranking.
    */
  override def prepared(text: String): Int => String = {
    val sents = Text.sentences(text)
    if (sents.isEmpty) return _ => ""
    val n = sents.length
    val m = math.min(n, MaxSents)
    val toks = sents.map(s => Text.metricTokens(s).distinct)
    val sets = toks.map(_.toSet)
    val sizes = toks.map(_.length)

    // symmetric edge weights over the ranked prefix
    val w = Array.ofDim[Double](m, m)
    val outW = new Array[Double](m)
    var i = 0
    while (i < m) {
      var j = i + 1
      while (j < m) {
        val ov =
          if (sizes(i) <= sizes(j)) toks(i).count(sets(j).contains)
          else toks(j).count(sets(i).contains)
        val denom = math.log(sizes(i).toDouble) + math.log(sizes(j).toDouble)
        val wt = if (ov > 0 && denom > 0) ov / denom else 0.0
        w(i)(j) = wt; w(j)(i) = wt
        outW(i) += wt; outW(j) += wt
        j += 1
      }
      i += 1
    }

    var r = Array.fill(m)(1.0 / m)
    var t = 0
    while (t < Iterations) {
      val next = new Array[Double](m)
      var ii = 0
      while (ii < m) {
        var acc = 0.0
        var jj = 0
        // ascending-j accumulation; the oracle's SUM() has no order
        // guarantee, so the engines drift ~1e-15 — absorbed by the shared
        // 1e-6 grid snap below before any ordering sees a rank
        while (jj < m) {
          if (jj != ii && outW(jj) > 0) acc += w(jj)(ii) / outW(jj) * r(jj)
          jj += 1
        }
        next(ii) = (1 - Damping) / m + Damping * acc
        ii += 1
      }
      r = next
      t += 1
    }

    // 1e-6 grid snap before ordering — the literal IEEE expression the
    // oracle also computes (see scaladoc); beyond-cap sentences score 0
    // and sort last
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val byScore = sents.indices
      .map(k => (k, if (k < m) r6(r(k)) else 0.0))
      .sortBy { case (k, s) => (-s, k) }
    BudgetWalk.emitter(sents, byScore.map(_._1))
  }
}
