package graft.core

import org.scalatest.funsuite.AnyFunSuite

class TextSpec extends AnyFunSuite {

  test("F1 cleanThinking strips closed thinking blocks") {
    assert(Text.cleanThinking("a<think>hidden</think>b") == "ab")
    assert(Text.cleanThinking("a<THINKING>x\ny</THINKING>b") == "ab")
    assert(Text.cleanThinking("a< thought >x</ thought >b") == "ab")
  }

  test("F1 cleanThinking drops dangling open tag to end of text") {
    assert(Text.cleanThinking("keep this<reasoning>never closed") == "keep this")
  }

  test("F1 cleanThinking squeezes 3+ newlines to 2 and trims") {
    assert(Text.cleanThinking("  a\n\n\n\nb  ") == "a\n\nb")
    assert(Text.cleanThinking("a\n\nb") == "a\n\nb")
  }

  test("F1 flat variant squeezes all whitespace") {
    assert(Text.cleanThinkingFlat("a\n\nb\t c") == "a b c")
  }

  test("F2 tokenCount: whitespace words, blank => 0") {
    assert(Text.tokenCount("one two  three") == 3)
    assert(Text.tokenCount("") == 0)
    assert(Text.tokenCount("   \n\t ") == 0)
  }

  test("C3 truncateTokens keeps first k tokens") {
    assert(Text.truncateTokens("a b c d", 2) == "a b")
    assert(Text.truncateTokens("a b", 5) == "a b")
    assert(Text.truncateTokens("", 3) == "")
  }

  test("sentence segmentation keeps delimiters, splits on newlines") {
    assert(Text.sentences("A b. C d! E") == Vector("A b.", "C d!", "E"))
    assert(Text.sentences("line one\nline two") == Vector("line one", "line two"))
    assert(Text.sentences("") == Vector.empty)
  }

  test("metricTokens: lowercase unicode alphanumeric") {
    assert(Text.metricTokens("Hello, Việt-Nam 123!").toSeq ==
      Seq("hello", "việt", "nam", "123"))
  }

  test("F8 stem strips directory and extension") {
    assert(Text.stem("/a/b/doc1.txt") == "doc1")
    assert(Text.stem("doc2.tar.gz") == "doc2.tar")
    assert(Text.stem(".hidden") == ".hidden")
  }

  test("F7 safeName replaces : and .") {
    assert(Text.safeName("llama3.2:3b") == "llama3_2_3b")
  }

  test("F9 stripCodeFence extracts fenced payload, passthrough otherwise") {
    assert(Text.stripCodeFence("```json\n{\"a\":1}\n```") == "{\"a\":1}")
    assert(Text.stripCodeFence("plain") == "plain")
  }
}
