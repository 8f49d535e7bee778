package graft.llm

import org.scalatest.funsuite.AnyFunSuite

class TinyTransformerSpec extends AnyFunSuite {

  private val m = TinyTransformer()

  test("shape: one contextual vector per metric token, truncated at maxTokens") {
    assert(m.encode("one two three").length == 3)
    assert(m.encode("one two three").forall(_.length == m.dim))
    assert(m.encode("").isEmpty && m.encode(null).isEmpty)
    assert(m.encode("...!!!").isEmpty)
    val long = (1 to 300).map(i => s"t$i").mkString(" ")
    assert(m.encode(long).length == m.maxTokens)
  }

  test("determinism: two independent instances agree bit-for-bit") {
    val m2 = TinyTransformer()
    val t = "The quick brown fox jumps over the lazy dog"
    assert(m.encode(t).map(_.toSeq).toSeq == m2.encode(t).map(_.toSeq).toSeq)
    assert(m.embed(t).toSeq == m2.embed(t).toSeq)
    // different seed = a genuinely different model
    val m3 = TinyTransformer(seed = 99L)
    assert(m.embed(t).toSeq != m3.embed(t).toSeq)
  }

  test("contextuality: the same token gets different vectors in different contexts") {
    // "bank" as token 2 of both texts: a bag embedder gives it ONE vector;
    // attention mixes in the neighbors, so the contextual vectors differ
    val a = m.encode("river bank erosion")(1)
    val b = m.encode("central bank policy")(1)
    assert(a.toSeq != b.toSeq)
    // and position alone changes the vector too (same neighbors)
    val c = m.encode("alpha beta")(0)
    val d = m.encode("beta alpha")(1)
    assert(c.toSeq != d.toSeq)
  }

  test("pooled embedding: unit norm, order-sensitive, zero for empty") {
    val v = m.embed("a sentence with several distinct tokens")
    val n = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(n - 1.0) < 1e-5)
    assert(m.embed("").forall(_ == 0f))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d // both unit-norm
    }
    val fwd = m.embed("alpha beta gamma delta epsilon")
    val rev = m.embed("epsilon delta gamma beta alpha")
    assert(cos(fwd, rev) < 0.9999)
    // near-dup (one token dropped) stays closer than unrelated text
    val near = m.embed("alpha beta gamma delta")
    val far = m.embed("completely unrelated financial news report")
    assert(cos(fwd, near) > cos(fwd, far))
  }

  test("self-BERTScore over contextual vectors is exactly 1 after the 4dp snap") {
    val e = m.encode("some text to score against itself verbatim")
    val (p, r, f) = graft.core.BertScore.greedyMatch(e, e)
    assert(math.abs(p - 1.0) < 1e-9 && math.abs(r - 1.0) < 1e-9 &&
      math.abs(f - 1.0) < 1e-9)
  }

  test("hyperparameter contracts fail loudly") {
    intercept[IllegalArgumentException] { TinyTransformer(dim = 30, heads = 4) }
    intercept[IllegalArgumentException] { TinyTransformer(layers = 0) }
  }

  test("serializes and embeds identically after the round-trip (executor shipping)") {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(m); oos.close()
    val ois = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    val back = ois.readObject().asInstanceOf[TinyTransformer]
    val t = "ship me to an executor"
    assert(back.embed(t).toSeq == m.embed(t).toSeq)
  }
}
