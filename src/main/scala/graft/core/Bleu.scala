package graft.core

import scala.collection.mutable

/** Sentence BLEU (Papineni et al. 2002) with add-one smoothing on every
  * n-gram precision (the Lin & Och 2004 smoothing family's simplest
  * member, applied uniformly so the score is defined for short
  * candidates). Complements the M-family: ROUGE (recall-oriented),
  * BERTScore (soft semantic), BLEU (clipped-precision + brevity).
  *
  * Exactness discipline (the ta16 micro-grid convention): every
  * ln-precision snaps to the 6dp grid and becomes integer micro-nats
  * BEFORE summing; the brevity-penalty exponent (1 - r/c, already the
  * log of BP) snaps the same way. The combined log-score is an exact
  * integer in quarter-micro-nat units (maxN·bp + Σ ln pₙ), so the value
  * a DuckDB oracle must reproduce is integer arithmetic end-to-end; only
  * the final `exp` is floating point, and its cross-engine ulp drift is
  * absorbed by the 4dp snap (the same absorption the summation-order
  * note in OracleSqlGen documents).
  */
object Bleu {

  /** Spark/DuckDB-parity 6dp round -> micro units (HALF_UP, the engine
    * round semantics the ta16 oracles validated cross-engine).
    */
  private def micro6(x: Double): Long = {
    val r = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    math.rint(r * 1e6).toLong
  }

  private def gramCounts(toks: Array[String], n: Int): mutable.HashMap[String, Int] = {
    val m = mutable.HashMap.empty[String, Int]
    var i = 0
    while (i + n <= toks.length) {
      val g = toks.slice(i, i + n).mkString(" ")
      m.update(g, m.getOrElse(g, 0) + 1)
      i += 1
    }
    m
  }

  /** (clipped matches, candidate gram total) for each n in 1..maxN. */
  def clippedCounts(cand: Array[String], ref: Array[String], maxN: Int)
      : Array[(Long, Long)] =
    Array.tabulate(maxN) { i =>
      val n = i + 1
      val rc = gramCounts(ref, n)
      var m = 0L
      var t = 0L
      gramCounts(cand, n).foreach { case (g, c) =>
        t += c
        m += math.min(c, rc.getOrElse(g, 0))
      }
      (m, t)
    }

  /** (bleu snapped to 4dp, exact log-score in maxN-quarter micro-nats).
    * Callers handle the degenerate empty-side case (the convention is
    * score 0, null log — see [[graft.eval.Metrics.bleuScores]]).
    */
  def sentenceBleu(cand: Array[String], ref: Array[String], maxN: Int = 4)
      : (Double, Long) = {
    require(cand.nonEmpty && ref.nonEmpty, "empty sides are the caller's case")
    require(maxN >= 1, s"maxN must be >= 1: $maxN")
    val lnSum = clippedCounts(cand, ref, maxN).map { case (m, t) =>
      micro6(math.log((m + 1.0) / (t + 1.0)))
    }.sum
    val bp =
      if (cand.length >= ref.length) 0L
      else micro6(1.0 - ref.length.toDouble / cand.length.toDouble)
    val q = maxN.toLong * bp + lnSum
    val bleu = java.math.BigDecimal
      .valueOf(math.exp(q.toDouble / (maxN * 1e6)))
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    (bleu, q)
  }
}
