package graft.core

import org.scalatest.funsuite.AnyFunSuite

class SplitterSpec extends AnyFunSuite {

  test("C1 characterSplit: pieces merge greedily under the size cap") {
    assert(Splitter.characterSplit("aa\n\nbb\n\ncc", 5, 0) == Vector("aa", "bb", "cc"))
  }

  test("C1 characterSplit: overlap carries trailing pieces forward") {
    assert(Splitter.characterSplit("aa\n\nbb\n\ncc", 8, 4) ==
      Vector("aa\n\nbb", "bb\n\ncc"))
  }

  test("C2 recursiveSplit: every chunk within size when finer separators exist") {
    val text = ("sentence one. sentence two. " * 20).trim
    val chunks = Splitter.recursiveSplit(text, 10, 2, lengthFn = Splitter.TokenLen)
    assert(chunks.nonEmpty)
    chunks.foreach(c => assert(Text.tokenCount(c) <= 10, s"oversized chunk: '$c'"))
  }

  test("C2 recursiveSplit: content is preserved (all words appear)") {
    val text = "alpha beta. gamma delta.\n\nepsilon zeta. eta theta."
    val chunks = Splitter.recursiveSplit(text, 4, 0, lengthFn = Splitter.TokenLen)
    val joined = chunks.mkString(" ")
    Text.metricTokens(text).foreach(w => assert(joined.toLowerCase.contains(w)))
  }

  test("C2 recursiveSplit: falls through to character slicing on separator-free text") {
    val text = "x" * 25
    val chunks = Splitter.recursiveSplit(text, 10, 2, lengthFn = Splitter.CharLen)
    assert(chunks.forall(_.length <= 10))
    assert(chunks.head == "x" * 10)
  }

  test("C2 recursiveSplit: empty and blank inputs give no chunks") {
    assert(Splitter.recursiveSplit("", 10, 2).isEmpty)
    assert(Splitter.recursiveSplit("   \n\n  ", 10, 2).isEmpty)
  }

  test("fixedStride: windows at stride size-overlap, last window may be short") {
    assert(Splitter.fixedStride("abcdefgh", 5, 2) == Vector("abcde", "defgh", "gh"))
    assert(Splitter.fixedStride("", 5, 2).isEmpty)
    assert(Splitter.fixedStride("ab", 5, 2) == Vector("ab"))
  }

  test("determinism: same input, same output") {
    val text = "one two three. four five six! seven eight nine?\n\nten eleven."
    val a = Splitter.recursiveSplit(text, 6, 1, lengthFn = Splitter.TokenLen)
    val b = Splitter.recursiveSplit(text, 6, 1, lengthFn = Splitter.TokenLen)
    assert(a == b)
  }
}
