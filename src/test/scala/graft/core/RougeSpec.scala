package graft.core

import org.scalatest.funsuite.AnyFunSuite

class RougeSpec extends AnyFunSuite {
  private val eps = 1e-9

  test("identical texts score 1.0 on all variants") {
    val s = "the quick brown fox jumps"
    assert(math.abs(Rouge.rouge1(s, s).f - 1.0) < eps)
    assert(math.abs(Rouge.rouge2(s, s).f - 1.0) < eps)
    assert(math.abs(Rouge.rougeL(s, s).f - 1.0) < eps)
  }

  test("disjoint texts score 0.0") {
    assert(Rouge.rouge1("aaa bbb", "ccc ddd").f == 0.0)
    assert(Rouge.rouge2("aaa bbb", "ccc ddd").f == 0.0)
    assert(Rouge.rougeL("aaa bbb", "ccc ddd").f == 0.0)
  }

  test("hand-computed rouge-1: 'the cat sat' vs 'the cat ran'") {
    val sc = Rouge.rouge1("the cat sat", "the cat ran")
    assert(math.abs(sc.p - 2.0 / 3) < eps)
    assert(math.abs(sc.r - 2.0 / 3) < eps)
    assert(math.abs(sc.f - 2.0 / 3) < eps)
  }

  test("hand-computed rouge-2: one shared bigram of two") {
    val sc = Rouge.rouge2("the cat sat", "the cat ran")
    assert(math.abs(sc.f - 0.5) < eps)
  }

  test("hand-computed rouge-L: LCS length 2 of 3") {
    val sc = Rouge.rougeL("the cat sat", "the cat ran")
    assert(math.abs(sc.f - 2.0 / 3) < eps)
  }

  test("rouge-N multiset semantics: repeated tokens clip to reference count") {
    // cand has 'a' three times, ref only once -> overlap clipped to 1
    val sc = Rouge.rouge1("a a a", "a b")
    assert(math.abs(sc.p - 1.0 / 3) < eps)
    assert(math.abs(sc.r - 0.5) < eps)
  }

  test("LCS: non-contiguous subsequence counts") {
    assert(Rouge.lcsLength(Array("a", "x", "b", "y", "c"), Array("a", "b", "c")) == 3)
    assert(Rouge.lcsLength(Array.empty[String], Array("a")) == 0)
  }

  test("empty candidate or reference scores 0 without dividing by zero") {
    assert(Rouge.rouge1("", "something").f == 0.0)
    assert(Rouge.rougeL("something", "").f == 0.0)
  }

  test("Vietnamese text: diacritics survive tokenization and score exactly") {
    // the reference corpus is Vietnamese; \p{L} tokenization must keep
    // diacritic letters intact (the reference's ASCII stemmer-tokenizer
    // mangles them — documented deviation, SURVEY §2.9 M1)
    val viet = "Việt Nam là một quốc gia nằm ở Đông Nam Á"
    assert(Text.metricTokens(viet).toSeq ==
      Seq("việt", "nam", "là", "một", "quốc", "gia", "nằm", "ở", "đông", "nam", "á"))
    assert(Rouge.rouge1(viet, viet).f == 1.0)
    assert(Rouge.rougeL(viet, viet).f == 1.0)
    // partial overlap is scored on the diacritic-preserved tokens
    val cand = "Việt Nam là quốc gia"
    val s = Rouge.rouge1(cand, viet)
    assert(s.p == 1.0) // every candidate token appears in the reference
    assert(s.r > 0.0 && s.r < 1.0)
  }
}
