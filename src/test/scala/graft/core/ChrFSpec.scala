package graft.core

import org.scalatest.funsuite.AnyFunSuite

class ChrFSpec extends AnyFunSuite {

  test("identical strings score exactly 1.0") {
    val (f, p, r) = ChrF.chrF2("the cat sat", "the cat sat")
    assert(f == 1.0 && p == 1.0 && r == 1.0)
  }

  test("whitespace is not considered: spacing variants are identical") {
    assert(ChrF.chrF2("ab c", "a bc") == ChrF.chrF2("abc", "abc"))
    assert(ChrF.chrF2("a\tb\nc", "abc")._1 == 1.0)
  }

  test("disjoint alphabets score 0") {
    val (f, p, r) = ChrF.chrF2("aaaa", "bbbb")
    assert(f == 0.0 && p == 0.0 && r == 0.0)
  }

  test("hand-computed partial overlap at maxN=2") {
    // cand "abc", ref "abd" (no whitespace): 1-grams {a,b,c} vs {a,b,d}
    // -> m=2, P1=R1=2/3; 2-grams {ab,bc} vs {ab,bd} -> m=1, P2=R2=1/2
    // P=R=(2/3+1/2)/2 on the 6dp micro grid; F(beta=2)=P when P=R
    val (f, p, r) = ChrF.chrF2("abc", "abd", maxN = 2)
    val exp = (math.round(2.0 / 3 * 1e6) + 500000L).toDouble / 2e6
    assert(p == math.rint(exp * 1e4) / 1e4 && r == p && f == p)
  }

  test("beta=2 weighs recall 4x: over-generation hurts less than omission") {
    // cand ⊃ ref -> recall 1.0, precision < 1; the reverse flips them
    val (fLong, pLong, rLong) = ChrF.chrF2("abcdef", "abc")
    val (fShort, pShort, rShort) = ChrF.chrF2("abc", "abcdef")
    assert(rShort < 1.0 && pShort == 1.0)
    assert(pLong < 1.0 && rLong == 1.0)
    assert(fLong > fShort) // recall-heavy F prefers the covering candidate
  }

  test("orders longer than the string are skipped, not zero-averaged") {
    // "ab": only 1-grams and 2-grams exist; identical -> still exactly 1.0
    assert(ChrF.chrF2("ab", "ab")._1 == 1.0)
    assert(ChrF.chrF2("a", "a") == ((1.0, 1.0, 1.0)))
  }

  test("grams count code points, not UTF-16 units (the SQL-oracle contract)") {
    // U+1F600 is a surrogate pair in Java; chrF must see ONE character,
    // like DuckDB/Spark SQL length/substr do
    val smile = new String(Character.toChars(0x1F600))
    assert(ChrF.chrF2(smile, smile) == ((1.0, 1.0, 1.0)))
    // "😀a" vs "😀b": 1-grams m=1 of 2 -> P1=R1=0.5; 2-grams m=0 of 1
    val (f, p, r) = ChrF.chrF2(smile + "a", smile + "b", maxN = 2)
    assert(p == 0.25 && r == 0.25 && f == 0.25)
  }

  test("null and empty sides score 0 without error") {
    assert(ChrF.chrF2(null, "abc")._1 == 0.0)
    assert(ChrF.chrF2("abc", "")._1 == 0.0)
    assert(ChrF.chrF2("", "")._1 == 0.0)
    assert(ChrF.chrF2(null, null)._1 == 0.0)
  }
}
