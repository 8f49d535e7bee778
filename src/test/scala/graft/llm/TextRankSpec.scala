package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Text

class TextRankSpec extends AnyFunSuite {

  test("central sentence outranks peripheral ones") {
    // s0 shares vocabulary with every other sentence; s1..s3 only with s0.
    val text = "alpha beta gamma delta. alpha beta one two. " +
      "gamma delta three four. alpha delta five six. seven eight nine ten."
    val out = TextRankSummarizer.summarize(text, 6)
    assert(out.startsWith("alpha beta gamma delta."))
  }

  test("deterministic; prepared agrees with summarize across budgets") {
    val text = "the cat sat. the dog sat. a bird flew. the cat ran. fish swim deep."
    val p = TextRankSummarizer.prepared(text)
    for (b <- Seq(2, 5, 9, 50)) {
      assert(p(b) == TextRankSummarizer.summarize(text, b))
      assert(TextRankSummarizer.summarize(text, b) ==
        TextRankSummarizer.summarize(text, b))
    }
  }

  test("budget semantics mirror ExtractiveSummarizer's walk") {
    val text = "one two three four five. six seven. eight nine ten eleven twelve thirteen."
    // first-ranked sentence always taken even when over budget, then truncated
    val tiny = TextRankSummarizer.summarize(text, 3)
    assert(Text.tokenCount(tiny) <= 3 && tiny.nonEmpty)
    // a budget covering everything returns all sentences in original order
    val all = TextRankSummarizer.summarize(text, 100)
    assert(all == Text.sentences(text).mkString(" "))
  }

  test("degenerate inputs") {
    assert(TextRankSummarizer.summarize("", 10) == "")
    assert(TextRankSummarizer.summarize("   ", 10) == "")
    // single sentence: rank trivially 1.0/1, emitted as-is within budget
    assert(TextRankSummarizer.summarize("just one sentence here", 10) ==
      "just one sentence here")
    // sentences with no shared vocabulary: all ranks equal, position wins
    val iso = "aa bb. cc dd. ee ff."
    assert(TextRankSummarizer.summarize(iso, 2) == "aa bb.")
  }

  test("equal-score ties break by earlier position") {
    // two identical sentences flanking a distinct one: the earlier twin
    // must be picked first
    val text = "same words here. unrelated thing entirely. same words here."
    val out = TextRankSummarizer.summarize(text, 3)
    assert(out == "same words here.")
  }

  test("plugs into the Strategies scalar slot") {
    val spark = graft.SparkSuite.spark
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma. alpha beta one. gamma two three. four five six."),
      (2L, "")).toDF("doc_id", "text")
    val got = new graft.strategy.Strategies(TextRankSummarizer)
      .truncated(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("summary")).toMap
    assert(got(1L).nonEmpty)
    assert(got(2L) == "")
  }
}
