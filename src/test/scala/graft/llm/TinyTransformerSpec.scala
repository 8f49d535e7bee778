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

  test("checkpoint round-trip: saved weights load back bit-identically") {
    val p = java.nio.file.Files.createTempDirectory("graft_tx_")
      .resolve("ckpt.safetensors").toString
    m.saveWeights(p)
    val loaded = TinyTransformer(weightsPath = Some(p))
    val t = "checkpointed weights must reproduce the seeded model exactly"
    assert(loaded.embed(t).toSeq == m.embed(t).toSeq)
    assert(loaded.encode(t).map(_.toSeq).toSeq == m.encode(t).map(_.toSeq).toSeq)
    // F32 interchange: a float-rounded checkpoint still loads and embeds
    // (values differ from F64 only at float precision)
    val p32 = p + ".f32"
    TensorFile.save(p32, TensorFile.load(p).toSeq.map {
      case (n, tns) => n -> tns }, dtype = "F32")
    val v32 = TinyTransformer(weightsPath = Some(p32)).embed(t)
    assert(v32.zip(m.embed(t)).forall { case (a, b) => math.abs(a - b) < 1e-3 })
  }

  test("checkpoint loader fails loudly on missing tensors and wrong shapes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tx_bad_")
    val missing = dir.resolve("missing.safetensors").toString
    TensorFile.save(missing, Seq(
      "layers.0.wq" -> TensorFile.Tensor(Array(2, 2), Array(1.0, 0, 0, 1))))
    val e1 = intercept[RuntimeException] {
      TinyTransformer(dim = 2, heads = 1, layers = 1,
        weightsPath = Some(missing)).embed("x")
    }
    assert(e1.getMessage.contains("missing tensor"))
    val wrong = dir.resolve("wrong.safetensors").toString
    val m2 = TinyTransformer(dim = 2, heads = 1, layers = 1, ffMult = 1)
    m2.saveWeights(wrong)
    val e2 = intercept[IllegalArgumentException] {
      TinyTransformer(dim = 4, heads = 1, layers = 1, ffMult = 1,
        weightsPath = Some(wrong)).embed("x")
    }
    assert(e2.getMessage.contains("shape"))
    // a checkpoint with MORE layers than the model must not half-load
    val deep = dir.resolve("deep.safetensors").toString
    TinyTransformer(dim = 2, heads = 1, layers = 2, ffMult = 1)
      .saveWeights(deep)
    val e3 = intercept[IllegalArgumentException] {
      TinyTransformer(dim = 2, heads = 1, layers = 1, ffMult = 1,
        weightsPath = Some(deep)).embed("x")
    }
    assert(e3.getMessage.contains("unconsumed"))
    // header-unsafe tensor names are rejected at save time
    intercept[IllegalArgumentException] {
      TensorFile.save(dir.resolve("bad.safetensors").toString,
        Seq("a\"b" -> TensorFile.Tensor(Array(1), Array(1.0))))
    }
  }

  test("committed fixture checkpoint produces the pinned vectors") {
    val url = getClass.getResource("/fixtures/tiny_tx.safetensors")
    assert(url != null, "fixture checkpoint not on the test classpath")
    val path = java.nio.file.Paths.get(url.toURI).toString
    // the fixture was exported from a seed-4242 model by GenTxFixture;
    // the loading model keeps the DEFAULT seed (token base vectors ride
    // the model seed), so its output is reproducible only by actually
    // loading the checkpoint tensors — the seeded fallback embeds
    // differently, and so does the 4242 model itself
    val loaded = TinyTransformer(dim = 8, layers = 1, heads = 2, ffMult = 2,
      maxTokens = 16, weightsPath = Some(path))
    val t = "pinned fixture forward pass"
    assert(loaded.embed(t).toSeq != TinyTransformer(dim = 8, layers = 1,
      heads = 2, ffMult = 2, maxTokens = 16).embed(t).toSeq)
    // absolute pin (StrictMath end-to-end => bit-stable across platforms):
    // first three components of the pooled vector, exact float literals
    assert(loaded.embed(t).take(3).toSeq == FixturePin.first3)
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
