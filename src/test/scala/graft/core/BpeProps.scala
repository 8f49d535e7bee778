package graft.core

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants for the BPE tokenizer (same deterministic
  * ScalaCheck harness as CoreProps): arbitrary unicode input must never
  * crash, counts must agree with encodings, merges must only ever shorten,
  * and training must be deterministic and lossless over its own corpus.
  */
class BpeProps extends AnyFunSuite {

  private val params = Gen.Parameters.default
  private def forAll[A](gen: Gen[A], n: Int = 150)(f: A => Unit): Unit = {
    var seed = Seed(1337L)
    var i = 0
    while (i < n) {
      gen.apply(params, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  // mixed text: ascii words, digits, punctuation, Vietnamese, emoji
  private val piece: Gen[String] = Gen.oneOf(
    Gen.chooseNum(1, 8).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar)),
    Gen.chooseNum(1, 5).flatMap(n => Gen.stringOfN(n, Gen.numChar)),
    Gen.oneOf("...", "?!", ",", "--", "'s", "'ll"),
    Gen.oneOf("tiếng", "Việt", "được", "của", "và"),
    Gen.oneOf("😀", "éè", "中文"))
  private val text: Gen[String] = for {
    n <- Gen.chooseNum(0, 40)
    ps <- Gen.listOfN(n, piece)
    sep <- Gen.oneOf(" ", "  ", "\n", "\t")
  } yield ps.mkString(sep)

  test("count == encode.length on arbitrary unicode, both tokenizers") {
    val noMerge = new BpeTokenizer(Vector.empty, Bpe.Gpt2Pretokenizer, byteLevel = true)
    forAll(text) { t =>
      assert(Bpe.demo.count(t) == Bpe.demo.encode(t).length)
      assert(noMerge.count(t) == noMerge.encode(t).length)
    }
  }

  test("merges only shorten: demo count <= char-level no-merge count") {
    val noMerge = new BpeTokenizer(Vector.empty, Bpe.SimplePretokenizer, byteLevel = false)
    forAll(text) { t =>
      assert(Bpe.demo.count(t) <= noMerge.count(t))
    }
  }

  test("byte-level no-merge count == total UTF-8 bytes of the pretokens") {
    val noMerge = new BpeTokenizer(Vector.empty, Bpe.Gpt2Pretokenizer, byteLevel = true)
    forAll(text) { t =>
      val bytes = noMerge.pretokens(t)
        .map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8).length).sum
      assert(noMerge.count(t) == bytes)
    }
  }

  test("encode concatenation reconstructs the pretokens (lossless)") {
    forAll(text) { t =>
      val pres = Bpe.demo.pretokens(t)
      assert(Bpe.demo.encode(t).mkString == pres.mkString)
    }
  }

  test("training on random corpora is deterministic and never errors") {
    forAll(Gen.listOfN(5, text), n = 40) { corpus =>
      val a = Bpe.train(corpus, numMerges = 12, byteLevel = false,
        pretokenRegex = Bpe.SimplePretokenizer)
      val b = Bpe.train(corpus, numMerges = 12, byteLevel = false,
        pretokenRegex = Bpe.SimplePretokenizer)
      assert(a.merges == b.merges)
      // a learned table still reconstructs (losslessly segments) its corpus
      corpus.foreach { t =>
        assert(a.encode(t).mkString == a.pretokens(t).mkString)
      }
    }
  }
}
