package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Text

class MmrSummarizerSpec extends AnyFunSuite {

  test("redundancy penalty: the duplicate sentence loses to diverse content") {
    // two copies of the dominant sentence + one different: TF scoring
    // would take both copies (their tokens have tf 2); MMR's penalty
    // (cos = 1.0 between identical embeddings) demotes the copy
    val a = "alpha beta gamma delta epsilon"
    val b = "completely different closing thought here"
    val doc = s"$a. $a. $b."
    val out = MmrSummarizer.summarize(doc, 10)
    assert(out.contains("alpha") && out.contains("different"))
    // the duplicate would need 15 tokens of budget; 10 fits exactly one
    // copy + b — and the copy is NOT what got picked second
    assert(Text.tokenCount(out) <= 10)
    val extractive = ExtractiveSummarizer.summarize(doc, 10)
    assert(!extractive.contains("different")) // TF takes the two copies
  }

  test("budget walk: original order, truncation, empty input") {
    val doc = "one two three. four five six. seven eight nine."
    val full = MmrSummarizer.summarize(doc, 100)
    // all sentences fit -> emitted in ORIGINAL order regardless of rank
    assert(full == "one two three. four five six. seven eight nine.")
    assert(MmrSummarizer.summarize("", 10) == "")
    assert(Text.tokenCount(MmrSummarizer.summarize(doc, 4)) <= 4)
  }

  test("deterministic across calls and prepared() agrees with summarize()") {
    val doc = "the quick brown fox. jumps over the lazy dog. " +
      "pack my box with five dozen liquor jugs."
    val p = MmrSummarizer.prepared(doc)
    assert(p(8) == MmrSummarizer.summarize(doc, 8))
    assert(MmrSummarizer.summarize(doc, 8) == MmrSummarizer.summarize(doc, 8))
  }
}
