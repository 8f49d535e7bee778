package graft.core

import scala.collection.mutable

/** chrF (Popović 2015, "chrF: character n-gram F-score for automatic MT
  * evaluation") at the standard β=2 operating point (chrF2, the sacrebleu
  * default) — the character-level member of the M-family next to ROUGE
  * (token recall), BLEU (token clipped precision), and BERTScore (soft
  * semantic). Character n-grams make the score robust to tokenization
  * and morphology differences — for Vietnamese summaries (the reference's
  * domain, evaluate/evaluate_summaries.py's metric suite) that means
  * diacritic-level partial credit where token metrics see a miss.
  *
  * Definition implemented (the published core, stated precisely so the
  * SQL oracle can replay it): whitespace is removed entirely (Popović §2:
  * spaces are not considered); for each n in 1..maxN, Pₙ = clipped
  * multiset match / candidate gram count and Rₙ = the same over the
  * reference count; orders with an empty denominator are skipped from
  * that side's average; P and R are the arithmetic means of the
  * per-order values; chrF2 = 5·P·R / (4·P + R), 0 when the denominator
  * is 0.
  *
  * Exactness discipline (the Bleu/ta16 micro-grid convention, taken one
  * step further): each Pₙ and Rₙ snaps to the 6dp grid and becomes
  * integer micro units BEFORE averaging, and the averages AND the final
  * F then stay in exact integer arithmetic all the way to the 4dp snap —
  * P = a/A and R = b/B are integer rationals, F = 5ab/(4aB + bA) is one
  * too, and each 4dp value is the half-up integer division
  * (2·num·10⁴ + den) // (2·den) divided by 10⁴. No double is ever
  * rounded, so the .5-grid-boundary divergence between BigDecimal
  * string rounding and binary-double rounding (caught by the sf0.001
  * verify on this very operator) cannot occur on any engine.
  */
object ChrF {

  private def micro6(x: Double): Long = {
    val r = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    math.rint(r * 1e6).toLong
  }

  /** Half-up num/den on the 4dp grid, in pure integer arithmetic. */
  private def snap4(num: Long, den: Long): Double =
    if (den == 0L) 0.0
    else ((2L * num * 10000L + den) / (2L * den)).toDouble / 1e4

  /** Grams over CODE POINTS, not UTF-16 units — chrF counts characters
    * (sacrebleu counts code points), and Spark SQL / DuckDB length and
    * substr are code-point based, so a surrogate pair must be one
    * character here too or the oracle diverges on any non-BMP text.
    */
  private def gramCounts(cps: Array[Int], n: Int): mutable.HashMap[String, Int] = {
    val m = mutable.HashMap.empty[String, Int]
    var i = 0
    while (i + n <= cps.length) {
      val g = new String(cps, i, n)
      m.update(g, m.getOrElse(g, 0) + 1)
      i += 1
    }
    m
  }

  /** (chrF2, mean char precision, mean char recall), each snapped to 4dp.
    * Null-safe: a null side is the empty string.
    */
  def chrF2(cand: String, ref: String, maxN: Int = 4): (Double, Double, Double) = {
    def strip(s: String): Array[Int] =
      (if (s == null) "" else s.replaceAll("\\s+", ""))
        .codePoints().toArray
    val c = strip(cand)
    val r = strip(ref)
    var pSum = 0L; var pK = 0
    var rSum = 0L; var rK = 0
    var n = 1
    while (n <= maxN) {
      val cg = gramCounts(c, n)
      val rg = gramCounts(r, n)
      val cTot = math.max(c.length - n + 1, 0)
      val rTot = math.max(r.length - n + 1, 0)
      var m = 0L
      cg.foreach { case (g, cc) => m += math.min(cc, rg.getOrElse(g, 0)) }
      if (cTot > 0) { pSum += micro6(m.toDouble / cTot); pK += 1 }
      if (rTot > 0) { rSum += micro6(m.toDouble / rTot); rK += 1 }
      n += 1
    }
    // P = a/A, R = b/B as integer rationals; F = 5ab/(4aB + bA).
    // Bounds: a,b <= maxN*10^6, so 2*5ab*10^4 <= 2^61 at maxN=4 — exact.
    val a = pSum; val bigA = pK.toLong * 1000000L
    val b = rSum; val bigB = rK.toLong * 1000000L
    val dF = if (bigA == 0L || bigB == 0L) 0L else 4L * a * bigB + b * bigA
    (snap4(5L * a * b, dF), snap4(a, bigA), snap4(b, bigB))
  }
}
