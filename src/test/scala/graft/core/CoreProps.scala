package graft.core

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants for the pure core (no Spark): the splitter,
  * greedy bin-packer, ROUGE and token utilities are the engine's most-used
  * scalar logic — randomized inputs catch edge cases fixtures miss.
  *
  * Uses ScalaCheck generators with a fixed seed chain (the
  * scalatest-scalacheck bridge artifact is not in the offline dep set, and
  * a deterministic sample stream reproduces failures exactly anyway).
  */
class CoreProps extends AnyFunSuite {

  private val params = Gen.Parameters.default
  private def forAll[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(params, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(p => f(p._1, p._2))
  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])
      (f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc))(p => f(p._1, p._2, p._3))

  private val word: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))
  private val text: Gen[String] = for {
    n <- Gen.chooseNum(0, 120)
    ws <- Gen.listOfN(n, word)
    sep <- Gen.listOfN(math.max(n - 1, 0), Gen.oneOf(" ", " ", "\n", "\n\n", ". "))
  } yield ws.zipAll(sep, "", "").map { case (w, s) => w + s }.mkString

  test("greedyBins: ids start at 0, are consecutive and non-decreasing") {
    forAll(Gen.listOf(Gen.chooseNum(0L, 50L)), Gen.chooseNum(1L, 60L)) {
      (ws: List[Long], budget: Long) =>
        val bins = BinPack.greedyBins(ws, budget)
        assert(bins.length == ws.length)
        if (bins.nonEmpty) {
          assert(bins.head == 0)
          bins.sliding(2).foreach {
            case Seq(a, b) => assert(b == a || b == a + 1)
            case _ =>
          }
        }
    }
  }

  test("greedyBins: every bin fits the budget unless it is a single item") {
    forAll(Gen.listOf(Gen.chooseNum(0L, 50L)), Gen.chooseNum(1L, 60L)) {
      (ws: List[Long], budget: Long) =>
        val byBin = ws.zip(BinPack.greedyBins(ws, budget)).groupBy(_._2)
        byBin.values.foreach { items =>
          assert(items.map(_._1).sum <= budget || items.length == 1)
        }
    }
  }

  test("greedyBins is maximal: a bin never closes while the next item fits") {
    forAll(Gen.listOf(Gen.chooseNum(1L, 30L)), Gen.chooseNum(1L, 60L)) {
      (ws: List[Long], budget: Long) =>
        val bins = BinPack.greedyBins(ws, budget)
        val totals = ws.zip(bins).groupBy(_._2).view.mapValues(_.map(_._1).sum)
        bins.zip(ws).zipWithIndex.drop(1).foreach { case ((bin, w), i) =>
          val prevBin = bins(i - 1)
          if (bin != prevBin) // item opened a new bin -> it must not have fit
            assert(totals(prevBin) + w > budget)
        }
    }
  }

  test("recursiveSplit: chunks respect the size bound (or are atomic)") {
    forAll(text, Gen.chooseNum(4, 40)) { (t: String, size: Int) =>
      val chunks = Splitter.recursiveSplit(t, size, overlap = 2,
        Splitter.DefaultSeparators, Splitter.CharLen)
      chunks.foreach { c =>
        // a chunk may exceed the bound only if it is a single unsplittable
        // token longer than the bound at every separator level
        assert(c.length <= size || !c.exists(_.isWhitespace))
      }
    }
  }

  test("recursiveSplit: letter content is preserved exactly, in order") {
    forAll(text, Gen.chooseNum(6, 40)) { (t: String, size: Int) =>
      val chunks = Splitter.recursiveSplit(t, size, overlap = 0,
        Splitter.DefaultSeparators, Splitter.CharLen)
      // with zero overlap the concatenated chunks carry every letter of the
      // source in order — splitting may cut inside words (last-resort ""
      // separator) and normalize separators, but never drops content
      val srcLetters = t.filter(_.isLetter)
      val outLetters = chunks.mkString.filter(_.isLetter)
      assert(outLetters == srcLetters)
    }
  }

  test("ROUGE F1s are in [0,1]; identical texts score 1 on rouge1/rougeL") {
    forAll(text, text) { (a: String, b: String) =>
      val (r1, r2, rl) = Rouge.all(a, b)
      Seq(r1, r2, rl).foreach(v => assert(v >= 0.0 && v <= 1.0))
    }
    forAll(text.suchThat(t => Text.metricTokens(t).nonEmpty)) { (t: String) =>
      assert(Rouge.rouge1(t, t).f == 1.0)
      assert(Rouge.rougeL(t, t).f == 1.0)
    }
  }

  test("ROUGE is symmetric in F1 (precision/recall swap)") {
    forAll(text, text) { (a: String, b: String) =>
      assert(math.abs(Rouge.rouge1(a, b).f - Rouge.rouge1(b, a).f) < 1e-12)
      assert(math.abs(Rouge.rougeL(a, b).f - Rouge.rougeL(b, a).f) < 1e-12)
    }
  }

  test("truncateTokens: result has at most k tokens and is a prefix stream") {
    forAll(text, Gen.chooseNum(0, 30)) { (t: String, k: Int) =>
      val out = Text.truncateTokens(t, k)
      assert(Text.tokenCount(out) <= math.max(k, 0))
      assert(Text.wsTokens(out).sameElements(Text.wsTokens(t).take(math.max(k, 0))))
    }
  }

  test("cleanThinking removes every think-tag block") {
    forAll(text, text, text) { (pre: String, inner: String, post: String) =>
      val dirty = s"$pre <think>$inner</think> $post"
      val cleaned = Text.cleanThinking(dirty)
      assert(!cleaned.toLowerCase.contains("<think>"))
    }
  }
}
