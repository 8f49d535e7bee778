package graft.core

import org.scalatest.funsuite.AnyFunSuite

class BleuSpec extends AnyFunSuite {
  private def t(s: String) = s.split(" ")

  test("identical sequences score exactly 1.0 (add-one cancels)") {
    val (b, q) = Bleu.sentenceBleu(t("the cat sat on the mat"),
      t("the cat sat on the mat"))
    assert(b == 1.0 && q == 0L)
  }

  test("hand-computed: 2/3 unigrams, 1/2 bigrams, 0/1 trigrams, no 4-grams") {
    // p1=(2+1)/(3+1), p2=(1+1)/(2+1), p3=(0+1)/(1+1), p4=(0+1)/(0+1)=1
    val (b, q) = Bleu.sentenceBleu(t("the cat sat"), t("the cat slept"))
    def m(x: Double) = math.rint(java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue() * 1e6).toLong
    val expectQ = m(math.log(0.75)) + m(math.log(2.0 / 3)) + m(math.log(0.5))
    assert(q == expectQ)
    assert(b == java.math.BigDecimal.valueOf(math.exp(expectQ / 4e6))
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue())
  }

  test("clipping: repeating a matched token does not inflate precision") {
    // classic BLEU degenerate: cand 'the the the' vs ref with 1 'the'
    // -> m1 clipped to 1 of 3
    val Array((m1, t1), _, _, _) =
      Bleu.clippedCounts(t("the the the"), t("the cat"), 4)
    assert(m1 == 1L && t1 == 3L)
  }

  test("brevity penalty fires only when candidate is shorter") {
    val long = t("a b c d e f g h")
    val (bShort, _) = Bleu.sentenceBleu(t("a b c d"), long)
    val (bFull, _) = Bleu.sentenceBleu(long, long)
    assert(bShort < bFull)
    // candidate longer than ref: no penalty term (precision handles it)
    val (_, qLong) = Bleu.sentenceBleu(t("a b c d e f g h i j"), long)
    val (_, qSame) = Bleu.sentenceBleu(long, long)
    assert(qSame == 0L && qLong < 0L)
  }

  test("empty sides are the caller's case; degenerate maxN contracts") {
    intercept[IllegalArgumentException] {
      Bleu.sentenceBleu(Array.empty[String], t("a"))
    }
    intercept[IllegalArgumentException] { Bleu.sentenceBleu(t("a"), t("a"), 0) }
    // maxN beyond both lengths: all orders ride add-one smoothing
    val (b, _) = Bleu.sentenceBleu(t("a"), t("a"), 4)
    assert(b == 1.0)
  }
}
